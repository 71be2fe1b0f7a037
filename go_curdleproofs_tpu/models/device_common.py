"""Shared device-prover building blocks: Fr plumbing, device transcript
absorption, masked vector helpers.

Used by the device-resident prover (models/device_prover2.py): everything
here stays on-device — Fr scalars as limb Elements, points as PointVecs,
and the STROBE transcript as an ops/strobe_dev.py SState — so prover rounds
chain as async device programs with no host round-trips.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops import compress_dev, fr, strobe_dev
from ..ops import field_backend as fp
from ..ops.curve import PointVec
from ..utils import field_host as fh
from ..utils.transcript import Transcript

# transcript labels (must match the host modules byte-for-byte;
# /root/reference/innerproductargument/innerproductargument.go:15-21,
# samemultiscalarargument/samemultiscalarargument.go:15-20)
LABEL_STEP1 = b"ipa_step1"
LABEL_ALPHA = b"ipa_alpha"
LABEL_BETA = b"ipa_beta"
LABEL_LOOP = b"ipa_loop"
LABEL_GAMMA = b"ipa_gamma"

SM_LABEL_STEP1 = b"same_msm_step1"
SM_LABEL_ALPHA = b"same_msm_alpha"
SM_LABEL_LOOP = b"same_msm_loop"
SM_LABEL_GAMMA = b"same_msm_gamma"


def fr_const(vals: Sequence[int]) -> fr.Element:
    return fr.from_ints([int(v) % fh.R for v in vals])


def fr_scalar(v: int) -> fr.Element:
    return fr.from_ints([int(v) % fh.R])


def challenge_to_fr(chal_be: jnp.ndarray) -> fr.Element:
    """32 big-endian challenge bytes -> canonical Fr element (33 limbs LE)."""
    le = chal_be[::-1]
    limbs = jnp.concatenate([le, jnp.zeros(1, jnp.int32)]).astype(fr.DTYPE)
    return fr.Element(limbs.reshape(1, fr.NLIMBS), fr.CANONICAL)


def fr_digits(x: fr.Element) -> jnp.ndarray:
    """fr Element [n] -> [2n, NUM_WINDOWS] interleaved signed GLV window
    digits (device Barrett split + bias recode, ops/glv_dev.py)."""
    from ..ops import glv_dev
    return glv_dev.glv_split_digits(x)


def fr_bytes_be(x: fr.Element) -> jnp.ndarray:
    """fr Element [n] -> [n, 32] big-endian bytes (device)."""
    d = fr.canonical_digits(x)
    return d[..., :32][..., ::-1].astype(jnp.int32)


def broadcast_scalar(a: fr.Element, n: int) -> fr.Element:
    return fr.Element(jnp.broadcast_to(a.limbs, (n, fr.NLIMBS)), a.iv)


def append_scalars_dev(ts: "strobe_dev.TState", label: bytes,
                       x: fr.Element) -> None:
    """Absorb each row of x as a 32-byte BE scalar (transcript.append_scalars)
    — ONE static-layout bulk absorb (scan over rate blocks), not k chained
    message programs."""
    rows = fr_bytes_be(x)
    ts.append_rows(label, rows)


def append_points_dev(ts: "strobe_dev.TState", label: bytes,
                      pv: PointVec) -> None:
    """Compress points on device and absorb (transcript.append_points)."""
    ts.append_rows(label, compress_dev.compress(pv))


def challenge_fr(ts: "strobe_dev.TState", label: bytes) -> fr.Element:
    return challenge_to_fr(ts.get_and_append_challenge(label))


def transcript_to_device(t: Transcript):
    """Host transcript -> (traced state bytes, STATIC pos, STATIC pos_begin).
    The positions are concrete host ints; every device piece burns them in
    as static args (ops/strobe_dev.py TState)."""
    s = t.inner.strobe
    import numpy as np
    st = jnp.asarray(np.frombuffer(bytes(s.state), np.uint8).astype(np.int32))
    return st, s.pos, s.pos_begin


def _roll_fr(vec: fr.Element, shift) -> fr.Element:
    return fr.Element(jnp.roll(vec.limbs, shift, axis=0), vec.iv)


def _masked_inner(a: fr.Element, b: fr.Element, h) -> fr.Element:
    """<a[0:h], b[0:h]> with traced h; returns a [1]-batch element."""
    n = a.limbs.shape[0]
    lane = jnp.arange(n, dtype=jnp.int32)
    am = fr.Element(jnp.where((lane < h)[:, None], a.limbs, 0), a.iv)
    ip = fr.inner_product(am, b)
    return fr.fmap(lambda t: t[None], ip)


def _stack_points(pvs: List[PointVec]) -> PointVec:
    def cat(get):
        rows = [fp.fmap(lambda t: t if t.ndim > 1 else t[None], get(p))
                for p in pvs]
        return fp.concat(rows, axis=0)

    return PointVec(cat(lambda p: p.x), cat(lambda p: p.y),
                    cat(lambda p: p.z))
