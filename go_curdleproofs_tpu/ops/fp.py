"""BLS12-381 base-field (Fp, 381-bit) arithmetic as batched TPU array ops.

TPU-native replacement for gnark-crypto's amd64-assembly `fp.Element`
(SURVEY.md §2.2) — the innermost hot kernel of the framework.

Representation (see ops/limb_field.py for the shared machinery): a length-49
vector of base-2^8 *lazy signed* limbs in float32; a static interval analyzer
proves every intermediate stays within f32's exact-integer range (2^24),
inserting carry passes only where the proof requires. Multiplication is a
limb convolution plus ONE constant-matrix reduction (limbs of 2^(8k) mod p) —
no Montgomery factor, so values correspond 1:1 with the reference's integers.
"""

from __future__ import annotations

import os

import numpy as np

from ..utils.field_host import P
from . import limb_field as _lf
from .limb_field import (CANONICAL, DTYPE, REDUCED, Element,  # noqa: F401
                         concat, fmap, stack, where)

NLIMBS = 49

_F = _lf.Field(P, NLIMBS)

RED = _F.RED
FOLD = _F.FOLD

# Element alias kept for existing call sites
Fp = Element

from_int = _F.from_int
from_ints = _F.from_ints
constant = _F.constant
zeros = _F.zeros
to_int = _F.to_int
to_ints = _F.to_ints
carry_to = _F.carry_to
add = _F.add
sub = _F.sub
neg = _F.neg
mul_small = _F.mul_small
pow_fixed = _F.pow_fixed
inv = _F.inv
canonical_digits = _F.canonical_digits
field = _F

# -- multiply dispatch --------------------------------------------------------
#
# On TPU, large-batch multiplies route through the fused Mosaic kernel
# (ops/pallas_field.py): one VMEM-resident program per 256-lane block vs
# XLA's materialized conv chain. CURDLE_PALLAS=0/1 forces; "auto" = TPU only.

_PALLAS_MODE = os.environ.get("CURDLE_PALLAS", "auto")
_PALLAS_MIN_LANES = 256
_pallas_on = None


def _pallas_enabled() -> bool:
    global _pallas_on
    if _pallas_on is None:
        if _PALLAS_MODE in ("0", "1"):
            _pallas_on = _PALLAS_MODE == "1"
        else:
            try:
                import jax
                _pallas_on = jax.default_backend() != "cpu"
            except Exception:  # pragma: no cover
                _pallas_on = False
    return _pallas_on


def mul(a: Element, b: Element) -> Element:
    if _pallas_enabled():
        batch = a.limbs.shape[:-1]
        lanes = int(np.prod(batch)) if batch else 1
        if lanes >= _PALLAS_MIN_LANES and batch == b.limbs.shape[:-1]:
            from . import pallas_field
            lim = 1 << 14
            if max(-a.iv[0], a.iv[1], -a.iv[2], a.iv[3]) > lim:
                a = _F.carry_to(a, REDUCED)
            if max(-b.iv[0], b.iv[1], -b.iv[2], b.iv[3]) > lim:
                b = _F.carry_to(b, REDUCED)
            return pallas_field.mul(a, b)
    return _F.mul(a, b)


def square(a: Element) -> Element:
    return mul(a, a)


def sqrt_candidate(a: Element) -> Element:
    """a^((p+1)/4): a square root if a is a QR (p = 3 mod 4); caller must
    verify cand^2 == a."""
    return _F.pow_fixed(a, (P + 1) // 4)


# -- fetch helpers (curve.to_affine_host); backend-uniform API ----------------

def prepare_fetch(a: Element):
    """Limb backend: limbs are already host-decodable; fetch as-is."""
    return a.limbs


def ints_from_fetched(arr):
    return to_ints(arr)
