"""fp-API-compatible facade over the RNS-Montgomery core (ops/rns.py).

Drop-in field backend for the curve/MSM layer: exposes the same names as
ops/fp.py (Element/Fp with `.limbs`/`.iv`, add/sub/mul/..., REDUCED/CANONICAL)
but `.limbs` holds the 74 RNS channels (Montgomery domain) and `.iv` is the
static VALUE BOUND in units of p (int) instead of a limb interval:

  * CANONICAL -> bound 1 (value < p), REDUCED -> bound 6 (all point-formula
    outputs are sums/differences of two bound-3 mont_mul results);
  * carry_to(e, t) retags when the true bound already fits, otherwise
    squashes with one mont_mul — point formulas never need the squash;
  * there are NO carries: adds/subs/neg are one channelwise op each.

Selected via ops/field_backend.py (CURDLE_FP=rns|limb|auto).
"""

from __future__ import annotations

import os
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.field_host import P
from . import rns

DTYPE = rns.DTYPE
NLIMBS = 2 * rns.J          # channel count (array width)

CANONICAL = 1
REDUCED = 6

Element = rns.RElem
Fp = Element


def _b(iv) -> int:
    """Accept either an int bound or a limb-style tuple (mapped defensively)."""
    if isinstance(iv, tuple):
        return REDUCED
    return int(iv)


def _mk(ch, bound) -> Element:
    return Element(ch, _b(bound))


# RElem uses .ch/.bound; the curve layer speaks .limbs/.iv. Alias at the
# class level so both views are the same object.
if not hasattr(rns.RElem, "limbs"):
    rns.RElem.limbs = property(lambda self: self.ch)
    rns.RElem.iv = property(lambda self: self.bound)


def from_ints(vs: Sequence[int]) -> Element:
    return rns.from_ints(vs)


def from_int(v: int) -> np.ndarray:
    return np.asarray(rns.from_ints([v]).ch[0])


def constant(v: int, shape=()) -> Element:
    C = rns.consts()
    row = C.to_channels_int((int(v) % P) * C.M1 % P)
    arr = np.broadcast_to(row, tuple(shape) + (NLIMBS,))
    return Element(jnp.asarray(arr, dtype=DTYPE), 1)


def zeros(shape=()) -> Element:
    return Element(jnp.zeros(tuple(shape) + (NLIMBS,), dtype=DTYPE), 1)


def add(a: Element, b: Element) -> Element:
    return rns.add(a, b)


def sub(a: Element, b: Element) -> Element:
    return rns.sub(a, b)


def neg(a: Element) -> Element:
    return rns.neg(a)


def mul(a: Element, b: Element) -> Element:
    return rns.mont_mul(a, b)


def square(a: Element) -> Element:
    return rns.mont_mul(a, a)


def mul_small(a: Element, c: int) -> Element:
    return rns.mul_small(a, c)


def carry_to(a: Element, target=REDUCED) -> Element:
    """Retag to exactly `target` (pytree-stable aux for lax loop carries,
    like the limb path's settle); squashes with one mont_mul only when the
    true bound exceeds the target."""
    t = _b(target)
    if a.bound <= t:
        return Element(a.ch, t)
    return Element(rns.squash(a).ch, t if t >= 3 else 3)


_POW_KERNEL_MODE = os.environ.get("CURDLE_RNS_KERNEL", "auto")
_pow_kernel_on = None


def _pow_kernel() -> bool:
    """Pow ladders as one Pallas kernel on TPU (vs a lax.scan of tiny
    mont_muls, whose per-step op dispatch dominates)."""
    global _pow_kernel_on
    if _pow_kernel_on is None:
        if _POW_KERNEL_MODE in ("0", "1"):
            _pow_kernel_on = _POW_KERNEL_MODE == "1"
        else:
            _pow_kernel_on = jax.default_backend() == "tpu"
    return _pow_kernel_on


def pow_fixed(a: Element, exponent: int) -> Element:
    """Square-and-multiply with mont_mul; Pallas ladder kernel on TPU for
    small batches, lax.scan elsewhere."""
    if _pow_kernel():
        size = int(np.prod(a.batch_shape)) if a.batch_shape else 1
        if size <= 1024:
            from . import rns_kernels
            return rns_kernels.pow_fixed(a, exponent)
    bits_arr = jnp.asarray(
        np.array([int(bb) for bb in bin(exponent)[2:]], dtype=np.int32))
    # scan carry must be pytree-stable: bound 3 (squash if above)
    a = rns.squash(a) if a.bound > 3 else Element(a.ch, 3)

    def body(acc, bit):
        acc_sq = rns.mont_mul(acc, acc)
        nxt = rns.mont_mul(acc_sq, a)
        keep = jnp.broadcast_to(bit > 0, acc_sq.batch_shape)
        out = jnp.where(keep[..., None], nxt.ch, acc_sq.ch)
        return Element(out, 3), None

    acc, _ = jax.lax.scan(body, a, bits_arr[1:])
    return acc


def inv(a: Element) -> Element:
    return pow_fixed(a, P - 2)


def sqrt_candidate(a: Element) -> Element:
    return pow_fixed(a, (P + 1) // 4)


def to_ints(x) -> List[int]:
    """Element or raw channel array -> python ints mod p (exits Montgomery).

    Vectorized host CRT (rns.to_ints_np); accepts fetched numpy arrays.
    """
    return rns.to_ints_np(x.ch if isinstance(x, Element) else x, mont=True)


def to_int(x) -> int:
    o = to_ints(x)
    assert len(o) == 1
    return o[0]


# -- pytree-style helpers (mirror limb_field) ---------------------------------

def where(mask: jnp.ndarray, a: Element, b: Element) -> Element:
    return Element(jnp.where(mask[..., None], a.ch, b.ch),
                   max(a.bound, b.bound))


def fmap(fn, x: Element) -> Element:
    return Element(fn(x.ch), x.bound)


def stack(xs: Sequence[Element], axis: int = 0) -> Element:
    return Element(jnp.stack([x.ch for x in xs], axis=axis),
                   max(x.bound for x in xs))


def concat(xs: Sequence[Element], axis: int = 0) -> Element:
    return Element(jnp.concatenate([x.ch for x in xs], axis=axis),
                   max(x.bound for x in xs))


# -- fetch helpers (curve.to_affine_host) --------------------------------------

def prepare_fetch(e: Element) -> jnp.ndarray:
    """Fetch RAW channels; the host does one vectorized CRT matmul.

    (The previous design canonicalized on device via canonical_digits —
    ~900 eagerly-dispatched ops per fetch, ~2.4 s each through the TPU
    tunnel. Raw channels + numpy CRT is ~ms.)"""
    return e.ch


def ints_from_fetched(arr) -> List[int]:
    return rns.to_ints_np(arr, mont=True)


# -- canonical digits (device) -------------------------------------------------

def canonical_digits(a: Element) -> jnp.ndarray:
    """Exact base-256 digits of the canonical value in [0, p) (device).

    Exits the Montgomery domain, CRT-folds the B1 channels onto 49-limb
    space with 6-bit-split constant matmuls (keeping every integer < 2^24
    and the folded VALUE < 2^13*p), then finishes with the limb engine's
    exact canonicalizer.
    """
    from . import fp as limb_fp

    C = rns.consts()
    x = rns.mont_mul(a, Element(jnp.asarray(C.ONE), 1))   # plain value, <3p
    xi = rns._mod(x.ch[..., :rns.J] * C.xi_mul_crt, C.qf, C.inv_qf)
    gamma = jnp.floor(
        jnp.einsum("...j,j->...", xi, C.inv_qf,
                   precision=jax.lax.Precision.HIGHEST) + 0.5)
    xi_hi = jnp.floor(xi * (1.0 / 64.0))
    xi_lo = xi - xi_hi * 64.0

    def fold(vals, mat):
        return jax.lax.dot_general(
            vals, mat, (((vals.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=DTYPE,
            precision=jax.lax.Precision.HIGHEST)

    limbs = (fold(xi_hi, C.m1q64_modp_limbs) + fold(xi_lo, C.m1q_modp_limbs)
             + gamma[..., None] * C.negM1_modp_limbs)
    # per-limb bound: 37*(2^5*255 + 2^6*255) + 37*255 < 2^20; value < 2^13 * p
    el = limb_fp.Element(limbs, (0, 37 * (32 * 255 + 64 * 255) + 37 * 255,
                                 0, 0))
    return limb_fp.canonical_digits(el)
