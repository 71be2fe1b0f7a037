"""Generic prime-field arithmetic as batched TPU array ops, parameterized by
modulus. Instantiated twice:

  * ops/fp.py — BLS12-381 base field (381 bits, 49 limbs): the curve/MSM hot
    kernels;
  * ops/fr.py — BLS12-381 scalar field (255 bits, 33 limbs): device-resident
    protocol scalars, enabling the zero-host-roundtrip prover pipeline (the
    Fiat-Shamir scalar folds run on device next to the group ops).

See ops/fp.py's original docstring for the representation design: base-2^8
lazy signed limbs in float32, exactness guaranteed by a static interval
analyzer, reduction via a constant matrix (limbs of 2^(8k) mod m).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

LIMB_BITS = 8
BASE = 1 << LIMB_BITS

_USE_INT = os.environ.get("CURDLE_FP_DTYPE", "float32") == "int32"
DTYPE = jnp.int32 if _USE_INT else jnp.float32
NP_DTYPE = np.int32 if _USE_INT else np.float32
EXACT_LIMIT = (1 << 31) - 1 if _USE_INT else (1 << 24)

Interval = Tuple[int, int, int, int]

CANONICAL: Interval = (0, 255, 0, 0)
REDUCED: Interval = (-576, 576, -320, 320)


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class Element:
    """A (batch of) lazy field element(s): limbs [..., L] + static interval."""
    limbs: jnp.ndarray
    iv: Interval

    def tree_flatten(self):
        return (self.limbs,), self.iv

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], tuple(aux))

    @property
    def batch_shape(self):
        return self.limbs.shape[:-1]


def _join(a: Interval, b: Interval) -> Interval:
    return (min(a[0], b[0]), max(a[1], b[1]),
            min(a[2], b[2]), max(a[3], b[3]))


def _check(iv: Interval) -> Interval:
    if max(-iv[0], iv[1], -iv[2], iv[3]) >= EXACT_LIMIT:
        raise OverflowError(f"interval {iv} exceeds exact limit {EXACT_LIMIT}")
    return iv


def _within(iv: Interval, target: Interval) -> bool:
    return (iv[0] >= target[0] and iv[1] <= target[1]
            and iv[2] >= target[2] and iv[3] <= target[3])


def _floor_shift(x: jnp.ndarray):
    if _USE_INT:
        c = jnp.right_shift(x, LIMB_BITS)
    else:
        c = jnp.floor(x * (1.0 / BASE))
    return c, x - c * BASE


class Field:
    """Modular arithmetic over a fixed prime, on lazy limb vectors."""

    def __init__(self, modulus: int, nlimbs: int):
        assert modulus < (1 << (LIMB_BITS * (nlimbs - 1))), \
            "need one spare limb above the modulus"
        self.modulus = modulus
        self.nlimbs = nlimbs
        self.conv_limbs = 2 * nlimbs - 1
        self._red_rows = nlimbs + 2
        self.RED = np.stack([
            self._int_to_limbs(pow(2, LIMB_BITS * (nlimbs - 1 + j), modulus))
            for j in range(self._red_rows)]).astype(NP_DTYPE)
        self.FOLD = self._int_to_limbs(
            pow(2, LIMB_BITS * nlimbs, modulus)).astype(NP_DTYPE)
        assert self.FOLD[nlimbs - 1] == 0 and all(self.RED[:, nlimbs - 1] == 0), \
            "reduction constants must leave the top limb free"

    # -- host conversion -----------------------------------------------------

    def _int_to_limbs(self, v: int) -> np.ndarray:
        out = np.zeros(self.nlimbs, dtype=np.int64)
        for i in range(self.nlimbs):
            out[i] = v & (BASE - 1)
            v >>= LIMB_BITS
        assert v == 0
        return out

    def from_int(self, v: int) -> np.ndarray:
        return self._int_to_limbs(v % self.modulus)

    def from_ints(self, vs: Sequence[int]) -> Element:
        m = self.modulus
        buf = b"".join(int(int(v) % m).to_bytes(self.nlimbs, "little")
                       for v in vs)
        arr = np.frombuffer(buf, np.uint8).reshape(len(vs), self.nlimbs)
        return Element(jnp.asarray(arr, dtype=DTYPE), CANONICAL)

    def constant(self, v: int, shape=()) -> Element:
        arr = np.broadcast_to(self.from_int(v), tuple(shape) + (self.nlimbs,))
        return Element(jnp.asarray(arr, dtype=DTYPE), CANONICAL)

    def zeros(self, shape=()) -> Element:
        return Element(jnp.zeros(tuple(shape) + (self.nlimbs,), dtype=DTYPE),
                       (0, 0, 0, 0))

    def to_int(self, x) -> int:
        out = self.to_ints(x)
        assert len(out) == 1
        return out[0]

    def to_ints(self, x) -> list:
        arr = np.asarray(x.limbs if isinstance(x, Element) else x).astype(np.int64)
        shifts = [1 << (LIMB_BITS * i) for i in range(arr.shape[-1])]
        return [sum(int(l) * s for l, s in zip(row, shifts)) % self.modulus
                for row in arr.reshape(-1, arr.shape[-1])]

    # -- carries -------------------------------------------------------------

    def _carry_iv(self, iv: Interval) -> Interval:
        lo, hi, tlo, thi = iv
        c_lo, c_hi = lo // BASE, hi // BASE
        ct_lo, ct_hi = tlo // BASE, thi // BASE
        return (min(c_lo, 0) + 255 * min(ct_lo, 0),
                255 + max(c_hi, 0) + 255 * max(ct_hi, 0),
                min(c_lo, 0), 255 + max(c_hi, 0))

    def _carry_fold_pass(self, x: jnp.ndarray) -> jnp.ndarray:
        c, low = _floor_shift(x)
        c_top = c[..., -1:]
        shifted = jnp.concatenate(
            [jnp.zeros_like(c[..., :1]), c[..., :-1]], axis=-1)
        return low + shifted + c_top * self.FOLD

    def carry_to(self, x: Element, target: Interval = REDUCED) -> Element:
        iv = x.iv
        limbs = x.limbs
        for _ in range(24):
            if _within(iv, target):
                return Element(limbs, target)
            limbs = self._carry_fold_pass(limbs)
            niv = _check(self._carry_iv(iv))
            if niv == iv and not _within(iv, target):
                raise OverflowError(f"carry_to stuck at {iv} -> {target}")
            iv = niv
        raise OverflowError(f"carry_to did not converge: {x.iv} -> {iv}")

    # -- ring ops ------------------------------------------------------------

    def add(self, a: Element, b: Element) -> Element:
        iv = _check((a.iv[0] + b.iv[0], a.iv[1] + b.iv[1],
                     a.iv[2] + b.iv[2], a.iv[3] + b.iv[3]))
        return Element(a.limbs + b.limbs, iv)

    def sub(self, a: Element, b: Element) -> Element:
        iv = _check((a.iv[0] - b.iv[1], a.iv[1] - b.iv[0],
                     a.iv[2] - b.iv[3], a.iv[3] - b.iv[2]))
        return Element(a.limbs - b.limbs, iv)

    def neg(self, a: Element) -> Element:
        return Element(-a.limbs, _check((-a.iv[1], -a.iv[0],
                                         -a.iv[3], -a.iv[2])))

    def _conv(self, a: Element, b: Element):
        amax = max(-a.iv[0], a.iv[1], -a.iv[2], a.iv[3])
        bmax = max(-b.iv[0], b.iv[1], -b.iv[2], b.iv[3])
        bound = self.nlimbs * amax * bmax
        if bound >= EXACT_LIMIT:
            raise OverflowError(f"conv bound {bound} exceeds exact limit")
        al, bl = a.limbs, b.limbs
        nd = al.ndim
        # sequential accumulation: keeps exactly two buffers live (a balanced
        # pad-tree made XLA materialize all 49 shifted terms at once — 15GB+
        # at the MSM reduce phase's lane counts)
        acc = None
        for i in range(self.nlimbs):
            term = jnp.pad(al[..., i: i + 1] * bl,
                           [(0, 0)] * (nd - 1)
                           + [(i, self.conv_limbs - self.nlimbs - i)])
            acc = term if acc is None else acc + term
        return acc, (-bound, bound)

    def _carry_expand(self, t: jnp.ndarray, iv, passes: int):
        lo, hi = iv
        for _ in range(passes):
            c, low = _floor_shift(t)
            t = (jnp.pad(low, [(0, 0)] * (t.ndim - 1) + [(0, 1)])
                 + jnp.pad(c, [(0, 0)] * (t.ndim - 1) + [(1, 0)]))
            lo, hi = min(lo // BASE, 0), 255 + max(hi // BASE, 0)
        return t, (lo, hi)

    def _reduce_wide(self, t: jnp.ndarray, iv) -> Element:
        lo, hi = iv
        wide = t.shape[-1]
        rows = wide - (self.nlimbs - 1)
        assert 0 < rows <= self._red_rows
        bound = 255 * rows * max(-lo, hi)
        if bound + max(-lo, hi) >= EXACT_LIMIT:
            raise OverflowError(f"reduce bound {bound} exceeds exact limit")
        high = t[..., self.nlimbs - 1:]
        folded = jax.lax.dot_general(
            high, self.RED[:rows],
            dimension_numbers=(((high.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=DTYPE,
            precision=jax.lax.Precision.HIGHEST)
        low = jnp.pad(t[..., : self.nlimbs - 1],
                      [(0, 0)] * (t.ndim - 1) + [(0, 1)])
        out = folded + low
        olo = 255 * rows * min(lo, 0) + min(lo, 0)
        ohi = 255 * rows * max(hi, 0) + max(hi, 0)
        return Element(out, _check((olo, ohi, min(lo, 0), max(hi, 0))))

    def mul(self, a: Element, b: Element) -> Element:
        def fits(x, y):
            xm = max(-x.iv[0], x.iv[1], -x.iv[2], x.iv[3])
            ym = max(-y.iv[0], y.iv[1], -y.iv[2], y.iv[3])
            return self.nlimbs * xm * ym < EXACT_LIMIT

        if not fits(a, b):
            a = self.carry_to(a, REDUCED)
        if not fits(a, b):
            b = self.carry_to(b, REDUCED)
        t, iv = self._conv(a, b)
        t, iv = self._carry_expand(t, iv, 2)
        r = self._reduce_wide(t, iv)
        return self.carry_to(r, REDUCED)

    def square(self, a: Element) -> Element:
        return self.mul(a, a)

    def mul_small(self, a: Element, c: int) -> Element:
        assert 0 <= c < BASE
        iv = _check((a.iv[0] * c, a.iv[1] * c, a.iv[2] * c, a.iv[3] * c))
        return self.carry_to(Element(a.limbs * c, iv), REDUCED)

    def pow_fixed(self, a: Element, exponent: int) -> Element:
        bits_arr = jnp.asarray(
            np.array([int(b) for b in bin(exponent)[2:]], dtype=np.int32))
        a = self.carry_to(a, REDUCED)

        def body(acc, bit):
            acc_sq = self.mul(acc, acc)
            acc_next = where(jnp.broadcast_to(bit > 0, acc_sq.batch_shape),
                             self.mul(acc_sq, a), acc_sq)
            return acc_next, None

        acc, _ = jax.lax.scan(body, a, bits_arr[1:])
        return acc

    def inv(self, a: Element) -> Element:
        """Fermat inverse a^(m-2); 0 -> 0."""
        return self.pow_fixed(a, self.modulus - 2)

    # -- exact canonicalization (device) ------------------------------------

    def canonical_digits(self, a: Element) -> jnp.ndarray:
        """Exact base-256 digits of the canonical value in [0, m).

        Device-side (needed by the on-device transcript to compress points).
        Strategy: shift into non-negative territory by adding k*m, run an
        exact LSB-first ripple carry (fori over limbs — cheap), then reduce
        the (< (k+1)*m) value by a float-estimated quotient times m and two
        conditional subtractions.
        """
        # TIGHT is the fixed point of the carry pass: limbs in [-258, 512],
        # top limb in [-3, 257]; value in (-5m, ~2^11 * m).
        TIGHT = (-258, 512, -3, 257)
        a = self.carry_to(a, TIGHT)
        # Pass 1: subtract an under-estimated quotient computed on the LAZY
        # limbs (slack 8 covers the estimate error and the negative range),
        # leaving a non-negative value < ~12m < limb capacity — so the exact
        # ripple cannot overflow.
        q1 = self._quotient_estimate(a.limbs, slack=8.0)
        x = a.limbs - q1[..., None] * self._m_limbs()
        x = self._exact_ripple(x)
        # Pass 2: now digits are canonical; a second estimate is within 2.
        q2 = self._quotient_estimate(x, slack=0.5)
        x = self._exact_ripple(x - q2[..., None] * self._m_limbs())
        # residual < 3m: finish with conditional subtracts
        for _ in range(3):
            ge = self._geq_digits(x, self._m_limbs())
            x = x - jnp.where(ge[..., None], self._m_limbs(), 0).astype(x.dtype)
            x = self._exact_ripple(x)
        return x

    def _m_limbs(self):
        if not hasattr(self, "_m_limbs_cache"):
            self._m_limbs_cache = self._int_to_limbs(self.modulus).astype(NP_DTYPE)
        return self._m_limbs_cache

    def _int_to_limbs_wide(self, v: int) -> np.ndarray:
        out = np.zeros(self.nlimbs, dtype=np.int64)
        for i in range(self.nlimbs):
            out[i] = v & (BASE - 1)
            v >>= LIMB_BITS
        # v may be nonzero: fold the excess mod modulus back (only used for
        # offsets that are multiples of m, so excess folding keeps value
        # equivalent; assert instead to be safe)
        assert v == 0, "offset too large for limb count"
        return out

    def _exact_ripple(self, x: jnp.ndarray) -> jnp.ndarray:
        """LSB-first exact carry propagation (signed-safe floor semantics).
        After this, digits are in [0,255] iff the value is non-negative.

        Unrolled (static limb count): nesting a fori here inside the callers'
        round loops made the TPU compiler pathologically slow."""
        n = x.shape[-1]
        cols = []
        carry = jnp.zeros(x.shape[:-1], dtype=x.dtype)
        for i in range(n):
            v = x[..., i] + carry
            carry, low = _floor_shift(v)
            cols.append(low)
        return jnp.stack(cols, axis=-1)
        # carry out must be folded by callers if value >= 2^(8n)

    def _quotient_estimate(self, limbs: jnp.ndarray,
                           slack: float) -> jnp.ndarray:
        """floor(value/m) under-estimate for limb arrays (lazy or canonical)
        with |value| < 2^14 * m, via float scaling. `slack` is subtracted
        before flooring; it must dominate the float summation error plus,
        for lazy inputs, the estimate/negative-value margin. May be
        negative (callers subtract q*m, which then ADDS multiples of m)."""
        nl = self.nlimbs
        top_bits = self.modulus.bit_length()
        scale = np.array([float(2.0 ** (8 * k - top_bits))
                          for k in range(nl)], dtype=np.float32)
        approx = jnp.sum(limbs.astype(jnp.float32) * scale, axis=-1)
        m_norm = np.float32(self.modulus / (2.0 ** top_bits))
        return jnp.floor(approx / m_norm - slack).astype(DTYPE)

    def _geq_digits(self, x: jnp.ndarray, m_limbs: np.ndarray) -> jnp.ndarray:
        """Lexicographic >= for canonical digit arrays."""
        gt = x > m_limbs
        lt = x < m_limbs
        result = jnp.zeros(x.shape[:-1], dtype=jnp.bool_)
        decided = jnp.zeros(x.shape[:-1], dtype=jnp.bool_)
        for i in range(x.shape[-1] - 1, -1, -1):
            result = jnp.where(~decided & gt[..., i], True, result)
            decided = decided | gt[..., i] | lt[..., i]
        return result | ~decided


def where(mask: jnp.ndarray, a: Element, b: Element) -> Element:
    return Element(jnp.where(mask[..., None], a.limbs, b.limbs),
                   _join(a.iv, b.iv))


def fmap(fn, x: Element) -> Element:
    return Element(fn(x.limbs), x.iv)


def stack(xs: Sequence[Element], axis: int = 0) -> Element:
    iv = xs[0].iv
    for x in xs[1:]:
        iv = _join(iv, x.iv)
    return Element(jnp.stack([x.limbs for x in xs], axis=axis), iv)


def concat(xs: Sequence[Element], axis: int = 0) -> Element:
    iv = xs[0].iv
    for x in xs[1:]:
        iv = _join(iv, x.iv)
    return Element(jnp.concatenate([x.limbs for x in xs], axis=axis), iv)
