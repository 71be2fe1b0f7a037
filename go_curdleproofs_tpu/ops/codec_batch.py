"""Batched point decompression + subgroup checking on device.

The reference's verifier spends a large share of its time decompressing
~500 compressed points (gnark's SetBytes does a per-point sqrt + subgroup
check; SURVEY.md §3.2 "HOT"). Here the WHOLE decode pipeline — sqrt
ladder, on-curve validation, lexicographic y-selection, and Scott's
half-width subgroup criterion [lambda]P == phi(P) — runs as ONE device
program with ONE fetch.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from . import curve
from . import field_backend as fp
from . import glv
from .exe_cache import cached_jit
from ..utils import field_host as fh
from ..utils.field_host import Affine

_M_MASK = 0b111 << 5
_M_COMPRESSED_SMALLEST = 0b100 << 5
_M_COMPRESSED_LARGEST = 0b101 << 5
_M_COMPRESSED_INFINITY = 0b110 << 5

_HALF_P_DIGITS = np.frombuffer(((fh.P - 1) // 2).to_bytes(49, "little"),
                               np.uint8).astype(np.int32)


def _sqrt_batch(values: List[int]) -> List[int]:
    """Batched device sqrt candidates (caller validates cand^2 == v)."""
    n = curve._pad_pow2(len(values), minimum=8)
    vs = values + [0] * (n - len(values))
    out = curve._compiled("sqrt", fp.sqrt_candidate)(fp.from_ints(vs))
    return fp.to_ints(out)[: len(values)]


def _lex_gt_half(digits: jnp.ndarray) -> jnp.ndarray:
    """y > (p-1)/2 over canonical base-256 digit arrays [n, 49] (LE)."""
    gt = digits > _HALF_P_DIGITS
    lt = digits < _HALF_P_DIGITS
    result = jnp.zeros(digits.shape[:-1], jnp.bool_)
    decided = jnp.zeros(digits.shape[:-1], jnp.bool_)
    for i in range(digits.shape[-1] - 1, -1, -1):
        result = jnp.where(~decided & gt[..., i], True, result)
        decided = decided | gt[..., i] | lt[..., i]
    # ties (y == (p-1)/2 exactly) are NOT largest: strict >, matching
    # fp_lexicographically_largest / gnark's LexicographicallyLargest
    return result


@cached_jit
def _decode_program(xe, want_largest, lam_digits):
    """x coords [n] -> (y digits [n,49], ok flags [n]).

    ok = on-curve AND in-subgroup. y is the sign-selected square root of
    x^3 + 4; subgroup membership via the honest half-width [lambda]P
    compared against phi(P) = (beta*x, y) (see ops/glv.py; replaces the
    reference's full-width [r]P check at half the scalar-mul chain)."""
    rhs = fp.carry_to(
        fp.add(fp.mul(fp.mul(xe, xe), xe),
               fp.mul_small(fp.carry_to(_one(xe), fp.CANONICAL), 4)),
        fp.REDUCED)
    cand = fp.sqrt_candidate(rhs)
    on_curve = jnp.all(
        fp.canonical_digits(
            fp.carry_to(fp.sub(fp.mul(cand, cand), rhs), fp.REDUCED)) == 0,
        axis=-1)

    cd = fp.canonical_digits(cand)
    cand_large = _lex_gt_half(cd)
    flip = cand_large != want_largest
    y_dig = jnp.where(flip[..., None],
                      fp.canonical_digits(fp.neg(cand)), cd)

    # subgroup: S = [lambda]P with zeroed phi lanes (honest), S == phi(P)
    ye = fp.where(~flip, cand, fp.neg(cand))
    pv = curve.PointVec(xe, ye, _one(xe))
    s = curve.scalar_mul_device(pv, lam_digits)
    bx = fp.carry_to(fp.mul(xe, curve._beta_elem()), fp.REDUCED)
    d1 = fp.sub(s.x, fp.mul(bx, s.z))
    d2 = fp.sub(s.y, fp.mul(ye, s.z))
    in_sub = (jnp.all(fp.canonical_digits(d1) == 0, axis=-1)
              & jnp.all(fp.canonical_digits(d2) == 0, axis=-1))
    return y_dig, on_curve & in_sub


def _one(like: fp.Element) -> fp.Element:
    """A broadcastable canonical 1 with `like`'s batch shape."""
    import numpy as _np
    arr = _np.asarray(fp.from_int(1))
    return fp.Element(jnp.broadcast_to(jnp.asarray(arr),
                                       like.limbs.shape), fp.CANONICAL)


def batch_subgroup_check(points: Sequence[Affine]) -> bool:
    """All points in the prime-order subgroup? One batched device program
    (Scott's [lambda]P == phi(P) criterion; tests/test_glv.py verifies it
    against the full-order [r]P == O oracle)."""
    pts = [p for p in points if p is not None]
    if not pts:
        return True
    n = curve._pad_pow2(len(pts), minimum=8)
    padded = list(pts) + [None] * (n - len(pts))
    pv = curve.from_affine_host(padded)
    digits = jnp.asarray(glv.digits_nophi(glv.LAMBDA, n))
    out = np.asarray(curve._compiled("subgroup", _lambda_check_device)(
        pv, digits))
    d1 = fp.ints_from_fetched(out[0])[: len(pts)]
    d2 = fp.ints_from_fetched(out[1])[: len(pts)]
    return all(a == 0 and b == 0 for a, b in zip(d1, d2))


def _lambda_check_device(pv, digits):
    """[lambda]P (honest: phi lanes carry zero digits) vs phi(P)."""
    s = curve.scalar_mul_device(pv, digits)
    bx = fp.carry_to(fp.mul(pv.x, curve._beta_elem()), curve.REDUCED)
    d1 = fp.sub(s.x, fp.mul(bx, s.z))
    d2 = fp.sub(s.y, fp.mul(pv.y, s.z))
    return jnp.stack([fp.prepare_fetch(d1), fp.prepare_fetch(d2)])


def batch_decompress(blobs: Sequence[bytes],
                     subgroup_check: bool = True) -> List[Affine]:
    """Decode many 48-byte compressed G1 points: host flag/canonicality
    parsing, then ONE device program (sqrt + on-curve + y-select +
    subgroup) and ONE fetch. Byte-semantics identical to
    codec.g1_from_bytes."""
    results: List[Affine] = [None] * len(blobs)
    idxs: List[int] = []
    xs: List[int] = []
    wants_largest: List[bool] = []

    for i, b in enumerate(blobs):
        if len(b) < 48:
            raise ValueError("short buffer for G1 point")
        meta = b[0] & _M_MASK
        if meta == _M_COMPRESSED_INFINITY:
            if any(bytes([b[0] & ~_M_MASK & 0xFF]) + bytes(b[1:48])):
                raise ValueError("invalid infinity encoding")
            results[i] = None
            continue
        if meta not in (_M_COMPRESSED_SMALLEST, _M_COMPRESSED_LARGEST):
            raise ValueError(f"invalid point encoding flags: {b[0]:#x}")
        xb = bytearray(b[:48])
        xb[0] &= ~_M_MASK & 0xFF
        x = int.from_bytes(xb, "big")
        if x >= fh.P:
            raise ValueError("x coordinate not canonical")
        idxs.append(i)
        xs.append(x)
        wants_largest.append(meta == _M_COMPRESSED_LARGEST)

    if xs:
        n = curve._pad_pow2(len(xs), minimum=8)
        xe = fp.from_ints(xs + [1] * (n - len(xs)))   # pad with x=1 lanes
        wl = jnp.asarray(np.array(wants_largest + [False] * (n - len(xs)),
                                  np.bool_))
        lam = jnp.asarray(glv.digits_nophi(glv.LAMBDA, n))
        y_dig, ok = _decode_program(xe, wl, lam)
        y_dig, ok = np.asarray(y_dig), np.asarray(ok)
        ys = [sum(int(v) << (8 * j) for j, v in enumerate(row))
              for row in y_dig[: len(xs)]]
        for t, (i, x, y) in enumerate(zip(idxs, xs, ys)):
            rhs = (x * x % fh.P * x + fh.B_COEFF) % fh.P
            if y * y % fh.P != rhs:
                raise ValueError("point not on curve")
            results[i] = (x, y)
        if subgroup_check and not all(ok[: len(xs)]):
            # distinguish on-curve failures (already raised) from
            # subgroup failures for the reference's error semantics
            raise ValueError("point not in prime-order subgroup")
    return results
