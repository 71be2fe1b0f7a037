"""BLS12-381 base-field (Fp, 381-bit) arithmetic as batched TPU array ops.

TPU-native replacement for gnark-crypto's amd64-assembly `fp.Element`
(SURVEY.md §2.2) — the innermost hot kernel of the framework.

Representation
--------------
An Fp element is a length-49 vector of base-2^8 "limbs" in a *lazy (redundant,
signed)* representation: only the value  sum_k limb[k] * 2^(8k)  (mod p) is
meaningful. Limbs are stored as float32 (default) or int32:

  * float32 keeps every op on the TPU's native VPU/MXU paths — f32 arithmetic
    is exact on integers up to 2^24, and
  * a static *interval analyzer* rides along with every array (class `Fp`
    below, carrying per-limb lower/upper bounds as trace-time Python ints)
    and proves that no intermediate ever leaves the exact range. If a bound
    would be violated the op inserts carry passes (or raises), so overflow is
    impossible by construction rather than by convention.

Core ops:
  * mul: schoolbook limb convolution (49 static shift-FMAs, fuses into one
    VPU kernel) followed by modular reduction as ONE constant matrix multiply:
    RED[j][:] = limbs(2^(8*(48+j)) mod p) maps the high half of the
    double-width product back down — XLA lowers this to an MXU dot.
  * carries: data-parallel shift-adds; the top limb's carry-out folds back
    via FOLD = limbs(2^392 mod p). No ripple loops anywhere.
  * inverse / sqrt: fixed-exponent square-and-multiply ladders under lax.scan
    (used by the batched point-decompression and normalization paths).

No Montgomery factor: values correspond 1:1 with the reference's integers, so
host<->device crossings are trivially bit-exact.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.field_host import P

NLIMBS = 49                    # element limbs (one spare above 384 bits)
CONV_LIMBS = 2 * NLIMBS - 1    # 97: full product width
LIMB_BITS = 8
BASE = 1 << LIMB_BITS

_USE_INT = os.environ.get("CURDLE_FP_DTYPE", "float32") == "int32"
DTYPE = jnp.int32 if _USE_INT else jnp.float32
# values must stay exactly representable: 2^24 for f32, 2^31 for int32
EXACT_LIMIT = (1 << 31) - 1 if _USE_INT else (1 << 24)


def _int_to_limbs(v: int, n: int) -> np.ndarray:
    out = np.zeros(n, dtype=np.int64)
    for i in range(n):
        out[i] = v & (BASE - 1)
        v >>= LIMB_BITS
    assert v == 0
    return out


# RED[j] = limbs of 2^(8*(48+j)) mod p, j = 0..50 (covers the high half of a
# 97-limb product plus two carry-widening limbs).
_RED_ROWS = NLIMBS + 2
RED_NP = np.stack([
    _int_to_limbs(pow(2, LIMB_BITS * (NLIMBS - 1 + j), P), NLIMBS)
    for j in range(_RED_ROWS)
])
FOLD_NP = _int_to_limbs(pow(2, LIMB_BITS * NLIMBS, P), NLIMBS)
assert FOLD_NP[NLIMBS - 1] == 0 and all(RED_NP[:, NLIMBS - 1] == 0), \
    "reduction constants must leave the top limb free"

# NOTE: kept as numpy so tracing/lowering embeds them as literals instead of
# fetching a committed device buffer (expensive under the remote-TPU tunnel).
_NP_DTYPE = np.int32 if _USE_INT else np.float32
RED = RED_NP.astype(_NP_DTYPE)
FOLD = FOLD_NP.astype(_NP_DTYPE)


# ---------------------------------------------------------------------------
# Static interval bookkeeping.
#
# An interval is (lo, hi, tlo, thi): bounds for limbs 0..47 and separately for
# the top limb 48 (the top limb never receives the modular fold, so it shrinks
# faster — tracking it separately is what makes the carry analysis converge).

Interval = Tuple[int, int, int, int]

CANONICAL: Interval = (0, 255, 0, 0)
# The standard post-op contract: every mul/carried op relabels to this.
REDUCED: Interval = (-576, 576, -320, 320)


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class Fp:
    """A (batch of) lazy Fp element(s): limbs [..., 49] + static interval."""
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
        raise OverflowError(f"Fp interval {iv} exceeds exact limit {EXACT_LIMIT}")
    return iv


def _within(iv: Interval, target: Interval) -> bool:
    return (iv[0] >= target[0] and iv[1] <= target[1]
            and iv[2] >= target[2] and iv[3] <= target[3])


def _fdiv(lo: int) -> int:
    return lo // BASE  # python floor div matches device floor semantics


def _carry_iv(iv: Interval) -> Interval:
    """Interval transfer function of one carry_fold pass."""
    lo, hi, tlo, thi = iv
    c_lo, c_hi = _fdiv(lo), _fdiv(hi)
    ct_lo, ct_hi = _fdiv(tlo), _fdiv(thi)
    fold_lo = 255 * min(ct_lo, 0)
    fold_hi = 255 * max(ct_hi, 0)
    nlo = 0 + min(c_lo, 0) + fold_lo
    nhi = 255 + max(c_hi, 0) + fold_hi
    ntlo = 0 + min(c_lo, 0)
    nthi = 255 + max(c_hi, 0)
    return (nlo, nhi, ntlo, nthi)


# -- device helpers ----------------------------------------------------------

def _floor_shift(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(carry, low) = (floor(x/256), x - 256*floor(x/256)); exact."""
    if _USE_INT:
        c = jnp.right_shift(x, LIMB_BITS)
    else:
        c = jnp.floor(x * (1.0 / BASE))
    return c, x - c * BASE


def _carry_fold_pass(x: jnp.ndarray) -> jnp.ndarray:
    c, low = _floor_shift(x)
    c_top = c[..., -1:]
    shifted = jnp.concatenate([jnp.zeros_like(c[..., :1]), c[..., :-1]], axis=-1)
    return low + shifted + c_top * FOLD


def carry_to(x: Fp, target: Interval = REDUCED) -> Fp:
    """Apply carry passes until the statically-proven interval fits target,
    then relabel to exactly `target` (a sound weakening)."""
    iv = x.iv
    limbs = x.limbs
    for _ in range(24):
        if _within(iv, target):
            return Fp(limbs, target)
        limbs = _carry_fold_pass(limbs)
        niv = _check(_carry_iv(iv))
        if niv == iv and not _within(iv, target):
            raise OverflowError(f"carry_to stuck at {iv}, target {target}")
        iv = niv
    raise OverflowError(f"carry_to did not converge: {x.iv} -> {iv}")


# -- construction / host conversion -----------------------------------------

def from_int(v: int) -> np.ndarray:
    return _int_to_limbs(v % P, NLIMBS)


def from_ints(vs: Sequence[int]) -> Fp:
    arr = np.stack([from_int(v) for v in vs])
    return Fp(jnp.asarray(arr, dtype=DTYPE), CANONICAL)


def constant(v: int, shape=()) -> Fp:
    arr = np.broadcast_to(from_int(v), tuple(shape) + (NLIMBS,))
    return Fp(jnp.asarray(arr, dtype=DTYPE), CANONICAL)


def zeros(shape=()) -> Fp:
    return Fp(jnp.zeros(tuple(shape) + (NLIMBS,), dtype=DTYPE), (0, 0, 0, 0))


def to_int(x) -> int:
    """Lazy limbs -> canonical int in [0, p). Accepts Fp or raw array."""
    arr = np.asarray(x.limbs if isinstance(x, Fp) else x)
    flat = arr.reshape(-1, arr.shape[-1]).astype(np.int64)
    assert flat.shape[0] == 1
    val = 0
    for i in range(arr.shape[-1] - 1, -1, -1):
        val = (val << LIMB_BITS) + int(flat[0, i])
    return val % P


def to_ints(x) -> list:
    arr = np.asarray(x.limbs if isinstance(x, Fp) else x).astype(np.int64)
    shifts = [1 << (LIMB_BITS * i) for i in range(arr.shape[-1])]
    out = []
    for row in arr.reshape(-1, arr.shape[-1]):
        out.append(sum(int(l) * s for l, s in zip(row, shifts)) % P)
    return out


# -- ring ops ----------------------------------------------------------------

def add(a: Fp, b: Fp) -> Fp:
    iv = _check((a.iv[0] + b.iv[0], a.iv[1] + b.iv[1],
                 a.iv[2] + b.iv[2], a.iv[3] + b.iv[3]))
    return Fp(a.limbs + b.limbs, iv)


def sub(a: Fp, b: Fp) -> Fp:
    iv = _check((a.iv[0] - b.iv[1], a.iv[1] - b.iv[0],
                 a.iv[2] - b.iv[3], a.iv[3] - b.iv[2]))
    return Fp(a.limbs - b.limbs, iv)


def neg(a: Fp) -> Fp:
    return Fp(-a.limbs, _check((-a.iv[1], -a.iv[0], -a.iv[3], -a.iv[2])))


def _conv(a: Fp, b: Fp) -> Tuple[jnp.ndarray, Tuple[int, int]]:
    """Schoolbook limb convolution -> ([..., 97] array, value interval)."""
    amax = max(-a.iv[0], a.iv[1], -a.iv[2], a.iv[3])
    bmax = max(-b.iv[0], b.iv[1], -b.iv[2], b.iv[3])
    bound = NLIMBS * amax * bmax
    if bound >= EXACT_LIMIT:
        raise OverflowError(f"conv bound {bound} exceeds exact limit")
    al, bl = a.limbs, b.limbs
    nd = al.ndim
    terms = [
        jnp.pad(al[..., i: i + 1] * bl,
                [(0, 0)] * (nd - 1) + [(i, CONV_LIMBS - NLIMBS - i)])
        for i in range(NLIMBS)
    ]
    # pairwise tree reduction keeps the expression shallow for the compiler
    while len(terms) > 1:
        nxt = [terms[j] + terms[j + 1] for j in range(0, len(terms) - 1, 2)]
        if len(terms) % 2:
            nxt.append(terms[-1])
        terms = nxt
    return terms[0], (-bound, bound)


def _carry_expand(t: jnp.ndarray, iv: Tuple[int, int], passes: int):
    lo, hi = iv
    for _ in range(passes):
        c, low = _floor_shift(t)
        t = (jnp.pad(low, [(0, 0)] * (t.ndim - 1) + [(0, 1)])
             + jnp.pad(c, [(0, 0)] * (t.ndim - 1) + [(1, 0)]))
        lo, hi = min(_fdiv(lo), 0), 255 + max(_fdiv(hi), 0)
    return t, (lo, hi)


def _reduce_wide(t: jnp.ndarray, iv: Tuple[int, int]) -> Fp:
    """Fold a wide lazy value (width <= 48 + 51) down to 49 limbs mod p."""
    lo, hi = iv
    wide = t.shape[-1]
    rows = wide - (NLIMBS - 1)
    assert 0 < rows <= _RED_ROWS
    bound = 255 * rows * max(-lo, hi)
    if bound + max(-lo, hi) >= EXACT_LIMIT:
        raise OverflowError(f"reduce bound {bound} exceeds exact limit")
    high = t[..., NLIMBS - 1:]
    folded = jax.lax.dot_general(
        high, RED[:rows],
        dimension_numbers=(((high.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=DTYPE,
        precision=jax.lax.Precision.HIGHEST)
    low = jnp.pad(t[..., : NLIMBS - 1],
                  [(0, 0)] * (t.ndim - 1) + [(0, 1)])
    out = folded + low
    # limbs 0..47: fold sum + low term; limb 48: low-part limb only (RED rows
    # and FOLD have zero top limb by construction)
    olo, ohi = 255 * rows * min(lo, 0) + min(lo, 0), 255 * rows * max(hi, 0) + max(hi, 0)
    return Fp(out, _check((olo, ohi, min(lo, 0), max(hi, 0))))


def mul(a: Fp, b: Fp) -> Fp:
    """Modular multiply; always returns the REDUCED interval contract."""
    # carry inputs just enough for an exact convolution
    def fits(x: Fp, y: Fp) -> bool:
        xm = max(-x.iv[0], x.iv[1], -x.iv[2], x.iv[3])
        ym = max(-y.iv[0], y.iv[1], -y.iv[2], y.iv[3])
        return NLIMBS * xm * ym < EXACT_LIMIT

    if not fits(a, b):
        a = carry_to(a, REDUCED)
    if not fits(a, b):
        b = carry_to(b, REDUCED)
    t, iv = _conv(a, b)
    t, iv = _carry_expand(t, iv, 2)
    r = _reduce_wide(t, iv)
    return carry_to(r, REDUCED)


def square(a: Fp) -> Fp:
    return mul(a, a)


def mul_small(a: Fp, c: int) -> Fp:
    """Multiply by a small non-negative constant."""
    assert 0 <= c < BASE
    iv = _check((a.iv[0] * c, a.iv[1] * c, a.iv[2] * c, a.iv[3] * c))
    return carry_to(Fp(a.limbs * c, iv), REDUCED)


def where(mask: jnp.ndarray, a: Fp, b: Fp) -> Fp:
    """Per-lane select; mask is batch-shaped bool."""
    return Fp(jnp.where(mask[..., None], a.limbs, b.limbs), _join(a.iv, b.iv))


def fmap(fn, x: Fp) -> Fp:
    """Apply a shape-transforming (value-preserving) fn to the limb array."""
    return Fp(fn(x.limbs), x.iv)


def stack(xs: Sequence[Fp], axis: int = 0) -> Fp:
    iv = xs[0].iv
    for x in xs[1:]:
        iv = _join(iv, x.iv)
    return Fp(jnp.stack([x.limbs for x in xs], axis=axis), iv)


def concat(xs: Sequence[Fp], axis: int = 0) -> Fp:
    iv = xs[0].iv
    for x in xs[1:]:
        iv = _join(iv, x.iv)
    return Fp(jnp.concatenate([x.limbs for x in xs], axis=axis), iv)


def _pow_fixed(a: Fp, exponent: int) -> Fp:
    """a^exponent, fixed public exponent, MSB-first ladder under lax.scan."""
    bits_arr = jnp.asarray(
        np.array([int(b) for b in bin(exponent)[2:]], dtype=np.int32))
    a = carry_to(a, REDUCED)

    def body(acc, bit):
        acc_sq = mul(acc, acc)
        acc_next = where(jnp.broadcast_to(bit > 0, acc_sq.batch_shape),
                         mul(acc_sq, a), acc_sq)
        return Fp(acc_next.limbs, REDUCED), None

    acc, _ = jax.lax.scan(body, a, bits_arr[1:])
    return acc


def inv(a: Fp) -> Fp:
    """Batched inverse via Fermat: a^(p-2); returns 0 for 0."""
    return _pow_fixed(a, P - 2)


def sqrt_candidate(a: Fp) -> Fp:
    """a^((p+1)/4): a root if a is a QR (p = 3 mod 4); caller verifies."""
    return _pow_fixed(a, (P + 1) // 4)
