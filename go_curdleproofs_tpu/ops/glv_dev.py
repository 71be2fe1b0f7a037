"""Device-side GLV decomposition + signed-digit recode for fr.Elements.

The device-resident prover (models/device_prover2.py) computes MSM window
digits ON DEVICE from folded Fr vectors (zero host round-trips). This module
lifts that digit computation to the GLV scheme of ops/glv.py:

    s (canonical, 33 base-256 limbs) -> (s1, s2) = (s mod LAMBDA, s div
    LAMBDA) via a Barrett division by the fixed 128-bit constant LAMBDA,
    then the bias-trick signed recode (digits of half+BIAS in base 16,
    minus 8) -> [2n, NUM_WINDOWS] interleaved signed digits.

All arithmetic is exact small-integer limb work in int32 (byte limbs;
products <= 255*255*17 ~ 1.1e6), bit-exact against the host reference
(glv.scalars_to_digits_glv — tested in tests/test_glv.py).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from . import fr, glv

_MU = np.frombuffer(glv.MU.to_bytes(17, "little"), np.uint8).astype(np.int32)
_LAM = np.frombuffer(glv.LAMBDA.to_bytes(16, "little"),
                     np.uint8).astype(np.int32)
_BIAS = np.frombuffer(glv.BIAS.to_bytes(17, "little"),
                      np.uint8).astype(np.int32)


def _ripple(x: jnp.ndarray) -> jnp.ndarray:
    """LSB-first exact carry/borrow propagation to canonical bytes.
    Unrolled over the (static, <=50) limb count; carry out is dropped
    (callers guarantee the value fits)."""
    cols = []
    carry = jnp.zeros(x.shape[:-1], jnp.int32)
    for i in range(x.shape[-1]):
        v = x[..., i] + carry
        carry = v >> 8
        cols.append(v - (carry << 8))
    return jnp.stack(cols, axis=-1)


def _mul_const(x: jnp.ndarray, c: np.ndarray, out_limbs: int) -> jnp.ndarray:
    """[n, L] byte limbs times a constant byte vector -> [n, out_limbs]
    rippled bytes (schoolbook over the constant's static limbs)."""
    n_l = x.shape[-1]
    acc = jnp.zeros(x.shape[:-1] + (out_limbs,), jnp.int32)
    for j, cj in enumerate(c):
        if cj == 0:
            continue
        w = min(n_l, out_limbs - j)
        acc = acc.at[..., j:j + w].add(x[..., :w] * int(cj))
    return _ripple(acc)


def _geq(x: jnp.ndarray, m: np.ndarray) -> jnp.ndarray:
    """Lexicographic x >= m over canonical byte limbs ([..., L] vs [L])."""
    m_full = np.zeros(x.shape[-1], np.int32)
    m_full[: len(m)] = m
    gt = x > m_full
    lt = x < m_full
    result = jnp.zeros(x.shape[:-1], jnp.bool_)
    decided = jnp.zeros(x.shape[:-1], jnp.bool_)
    for i in range(x.shape[-1] - 1, -1, -1):
        result = jnp.where(~decided & gt[..., i], True, result)
        decided = decided | gt[..., i] | lt[..., i]
    return result | ~decided


def _sub_const(x: jnp.ndarray, m: np.ndarray,
               mask: jnp.ndarray) -> jnp.ndarray:
    """x - m where mask (canonical bytes in, canonical bytes out)."""
    m_full = np.zeros(x.shape[-1], np.int32)
    m_full[: len(m)] = m
    d = x - jnp.where(mask[..., None], m_full, 0)
    return _ripple(d)


def glv_split_digits(x: fr.Element) -> jnp.ndarray:
    """fr Element [n] -> [2n, NUM_WINDOWS] interleaved signed GLV digits
    (row 2i = s1_i for P lanes, 2i+1 = s2_i for phi lanes), MSB first."""
    s = fr.canonical_digits(x).astype(jnp.int32)        # [n, 33]

    # Barrett: q_hat = (s * MU) >> 256, at most 2 under the true quotient
    prod = _mul_const(s, _MU, 33 + 17)                  # [n, 50]
    q = prod[..., 32:49]                                # [n, 17]

    # r_hat = s - q*LAMBDA  (fits 33 bytes; non-negative by construction)
    ql = _mul_const(q, _LAM, 33)
    r_ = _ripple(s - ql)
    for _ in range(2):                                  # <= 2 corrections
        ge = _geq(r_, _LAM)
        r_ = _sub_const(r_, _LAM, ge)
        q = _ripple(q + jnp.where(ge[..., None],
                                  np.eye(1, 17, 0, np.int32)[0], 0))

    # signed recode via the bias trick: nibbles of (half + BIAS) minus 8
    def recode(half17: jnp.ndarray) -> jnp.ndarray:
        v = _ripple(half17 + _BIAS)                     # [n, 17]
        lo = v & 15
        hi = v >> 4
        nibs = jnp.stack([lo, hi], axis=-1).reshape(v.shape[:-1] + (34,))
        digs = nibs[..., :glv.SIG_WINDOWS]
        bias = np.zeros(glv.SIG_WINDOWS, np.int32)
        bias[:32] = 8
        return (digs - bias)[..., ::-1]          # MSB window first

    d1 = recode(r_[..., :17])
    d2 = recode(q)
    inter = jnp.stack([d1, d2], axis=-2)                # [n, 2, W]
    return inter.reshape(inter.shape[:-3] + (2 * inter.shape[-3],
                                             glv.NUM_WINDOWS))
