"""BLS12-381 scalar-field (Fr, 255-bit) arithmetic as batched TPU array ops.

TPU-native replacement for gnark-crypto's `fr.Element` (SURVEY.md §2.2).
Host protocol code uses python ints; THIS module exists for the
device-resident prover pipeline, where Fiat-Shamir scalar folds, inner
products, prefix products and blinder solves run on device between group
ops — eliminating host round-trips (each D2H fetch costs ~25ms through the
TPU tunnel).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.field_host import R
from . import limb_field as _lf
from .limb_field import (CANONICAL, DTYPE, REDUCED, Element,  # noqa: F401
                         concat, fmap, stack, where)

NLIMBS = 33  # 255-bit modulus + one spare limb

_F = _lf.Field(R, NLIMBS)

Fr = Element

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
mul = _F.mul
square = _F.square
mul_small = _F.mul_small
pow_fixed = _F.pow_fixed
inv = _F.inv
canonical_digits = _F.canonical_digits
field = _F


def inner_product(a: Element, b: Element) -> Element:
    """<a, b> over the leading axis: [n, 33] x [n, 33] -> [33].

    Mirrors common.IPA (/root/reference/common/util.go:26) as one device op:
    products then a log-depth tree sum (sums stay within the interval
    analyzer's exact bounds via carry_to between levels)."""
    prod = mul(a, b)
    cur = prod
    n = cur.limbs.shape[0]
    while n > 1:
        half = n // 2
        lo = fmap(lambda t: t[:half], cur)
        hi = fmap(lambda t: t[half: 2 * (n // 2)], cur)
        s = add(lo, hi)
        if n % 2:
            s = add(s, fmap(lambda t: t[n - 1:], cur))
        cur = carry_to(s, REDUCED)
        n = half
    return fmap(lambda t: t[0], cur)


def prefix_products(b: Element) -> Element:
    """cs[0]=1, cs[i] = b[0]*...*b[i-1] — the grand-product partial products
    (/root/reference/grandproductargument/grandproductargument.go:57-61) as a
    log-depth associative scan on device."""
    one = constant(1, b.batch_shape[:1])

    def combine(x, y):
        return mul(x, y)

    shifted = concat([fmap(lambda t: t[:1], one),
                      fmap(lambda t: t[:-1], b)])
    return jax.lax.associative_scan(combine, shifted, axis=0)


# MSM window digits are produced by ops/glv_dev.glv_split_digits (GLV
# Barrett split + signed recode), replacing the former unsigned
# digits_from_canonical path.
