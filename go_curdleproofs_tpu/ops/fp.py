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

# The limb Fp backend is the wire-format-native ORACLE used for CPU
# cross-checks of the rns backend; the shipped TPU configuration uses
# ops/fp_rns.py (see ops/field_backend.py), so limb multiplies stay plain
# XLA convolutions — no Mosaic kernel path here.


def mul(a: Element, b: Element) -> Element:
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
