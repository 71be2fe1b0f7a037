"""Residue-number-system (RNS) Montgomery arithmetic for Fp on TPU.

The idiomatic TPU answer to 381-bit modular multiplication. The limb path
(ops/limb_field.py) is a 49-step convolution: measured ~86 ns/lane on a v5e —
VPU-bound with lane-crossing rolls. In RNS, a value is its residues modulo 74
small (11-bit) primes: multiplication is *channelwise* (74 independent f32
mul+mod, no carries, no lane crossing), and the only cross-channel work —
Montgomery reduction's two base extensions — is four small matmuls against
CONSTANT matrices, which XLA places on the MXU. That converts the field
multiply from a bandwidth/shuffle problem into an MXU problem.

Algorithm: Bajard–Imbert / Kawamura RNS Montgomery reduction.
  bases B1 (J primes q_j, M1 = prod q) and B2 (J primes r_k, M2 = prod r)
  stored value X (Montgomery form x*M1 mod p), invariant X < BOUND_P_MAX*p
  mont_mul(X, Y):
    s      = X*Y channelwise (both bases)
    xi_j   = s_j * (-p^-1 * (M1/q_j)^-1 mod q_j) mod q_j          (B1)
    gamma  = floor(sum_j xi_j/q_j - eps)     # may undershoot by 1: OK, the
                                             # extension then returns w + M1,
                                             # absorbed by the p-multiple slack
    w_k    = sum_j xi_j*(M1/q_j mod r_k) + gamma*(-M1 mod r_k)    (B1 -> B2)
    t_k    = (s_k + w_k*p_k) * (M1^-1 mod r_k) mod r_k            (B2)
    zeta_k = t_k * ((M2/r_k)^-1 mod r_k) mod r_k
    gamma2 = round(sum_k zeta_k/r_k)         # exact: t < 4p << M2
    t_j    = sum_k zeta_k*(M2/r_k mod q_j) + gamma2*(-M2 mod q_j) (B2 -> B1)
  result = t = X*Y/M1 mod-p-equivalent, t < 3p.

Exactness in f32 (all integers kept < 2^24):
  * channels < 2^11 so products < 2^22;
  * extension matrices split into hi/lo 6-bit halves -> per-matmul terms
    < 2^17, sums over J=37 < 2^22.2;
  * float-mod uses two conditional corrections, exact for v < 2^23;
  * gamma estimates carry a 2^-12 slack against the <= 2^-13.5 dot error
    (see _gamma_slack), with the undershoot-by-one case absorbed by value
    bounds (M1 > 2^16 * p gives plenty of p-multiple headroom).

Replaces (TPU-native): gnark-crypto's fp.Element Montgomery assembly
(/root/reference go.mod:6; used by every curve op / MultiExp call site).
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.field_host import P

DTYPE = jnp.float32

J = 37                    # primes per base
PRIME_BITS = 11
# value-bound invariant (in units of p): mont_mul inputs must satisfy
# bound(x)*bound(y) <= BOUND_PROD_MAX; outputs have bound 3.
BOUND_PROD_MAX = 1 << 16
BOUND_P_MAX = 256         # largest representable bound tag (neg-table size)

_gamma_slack = 2.0 ** -12


def _gen_primes():
    """Largest 11-bit primes, 2*J of them, descending."""
    out = []
    n = (1 << PRIME_BITS) - 1
    while len(out) < 2 * J and n > 1 << (PRIME_BITS - 1):
        is_p = n > 1 and all(n % d for d in range(2, int(n ** 0.5) + 1))
        if is_p:
            out.append(n)
        n -= 1
    assert len(out) == 2 * J
    return out


class _Consts:
    def __init__(self):
        pr = _gen_primes()
        self.q = np.array(pr[:J], dtype=np.int64)          # base 1
        self.r = np.array(pr[J:], dtype=np.int64)          # base 2
        self.M1 = 1
        for v in self.q:
            self.M1 *= int(v)
        self.M2 = 1
        for v in self.r:
            self.M2 *= int(v)
        assert self.M1 > BOUND_PROD_MAX * P, "M1 slack too small"
        assert self.M2 > 8 * P, "M2 too small"

        f32 = lambda a: np.asarray(a, dtype=np.float32)
        self.qf = f32(self.q)
        self.rf = f32(self.r)
        self.inv_qf = f32(1.0 / self.qf.astype(np.float64))
        self.inv_rf = f32(1.0 / self.rf.astype(np.float64))

        # B1 -> B2 extension
        # xi_j = s_j * (-(p * (M1/q_j))^-1 mod q_j): then
        # w = sum xi_j*(M1/q_j) satisfies s + w*p ≡ 0 (mod M1).
        M1q = [self.M1 // int(qj) for qj in self.q]
        self.xi_mul = f32([(-pow(P * m, -1, int(qj))) % int(qj)
                           for m, qj in zip(M1q, self.q)])
        c1 = np.array([[int(m % int(rk)) for rk in self.r] for m in M1q],
                      dtype=np.int64)                         # [J, J]
        self.c1_hi = f32(c1 >> 6)
        self.c1_lo = f32(c1 & 63)
        self.negM1_r = f32([(-self.M1) % int(rk) for rk in self.r])
        self.p_r = f32([P % int(rk) for rk in self.r])
        self.M1inv_r = f32([pow(self.M1, -1, int(rk)) for rk in self.r])

        # B2 -> B1 extension
        M2r = [self.M2 // int(rk) for rk in self.r]
        self.zeta_mul = f32([pow(m % int(rk), -1, int(rk))
                             for m, rk in zip(M2r, self.r)])
        c2 = np.array([[int(m % int(qj)) for qj in self.q] for m in M2r],
                      dtype=np.int64)                         # [J, J]
        self.c2_hi = f32(c2 >> 6)
        self.c2_lo = f32(c2 & 63)
        self.negM2_q = f32([(-self.M2) % int(qj) for qj in self.q])

        # negation table: channels of b*p for b = 0..BOUND_P_MAX
        bp = np.array([[int((b * P) % int(m)) for m in pr]
                       for b in range(BOUND_P_MAX + 1)], dtype=np.int64)
        self.bp_table = f32(bp)                               # [B+1, 2J]

        # Montgomery domain constants (channels over both bases)
        self.M1SQ = self.to_channels_int((self.M1 * self.M1) % P)
        self.ONE = self.to_channels_int(1)
        self.M1_modp = self.to_channels_int(self.M1 % P)

        # 2^(8i) mod q/r for limbs -> channels conversion (int64 for numpy)
        NLIMB = 49
        pw = np.array([[pow(256, i, int(m)) for m in pr]
                       for i in range(NLIMB)], dtype=np.int64)  # [49, 2J]
        self.pw_int = pw
        self.m_int = np.array(pr, dtype=np.int64)               # [2J]
        self.M1_mod_p = self.M1 % P

        # host vectorized CRT (to_ints_np): weights w_j = (M1/q_j) *
        # ((M1/q_j)^-1 mod q_j), decomposed into base-2^24 limbs so the
        # channel-weighted sum is an exact int64 matmul.
        crt_w = [(self.M1 // int(q)) * pow((self.M1 // int(q)) % int(q),
                                           -1, int(q)) for q in self.q]
        nw = (self.M1.bit_length() + 23) // 24 + 1
        self.crt_w_limbs = np.array(
            [[(w >> (24 * k)) & 0xFFFFFF for k in range(nw)] for w in crt_w],
            dtype=np.int64)                                     # [J, nw]
        self.crt_nw = nw
        self.M1_inv_p = pow(self.M1, -1, P)

        # device RNS -> canonical-limb CRT (fp_rns.canonical_digits):
        # value ≡ sum_j (64*xi_hi_j + xi_lo_j)*(M1/q_j) - gamma*M1 (mod p),
        # folded onto 49-limb space via mod-p constants (6-bit xi split keeps
        # every dot term < 2^13 and the folded value < 2^13 * p).
        self.xi_mul_crt = f32([pow(m % int(qj), -1, int(qj))
                               for m, qj in zip(M1q, self.q)])
        limbs_of = lambda v: [(int(v) >> (8 * i)) & 255 for i in range(NLIMB)]
        self.m1q_modp_limbs = f32([limbs_of(m % P) for m in M1q])     # [J,49]
        self.m1q64_modp_limbs = f32([limbs_of(64 * m % P) for m in M1q])
        self.negM1_modp_limbs = f32(limbs_of((-self.M1) % P))         # [49]

    def to_channels_int(self, v: int) -> np.ndarray:
        both = list(self.q) + list(self.r)
        return np.array([v % int(m) for m in both], dtype=np.float32)


_C = None


def consts() -> _Consts:
    global _C
    if _C is None:
        _C = _Consts()
    return _C


# -- channel helpers ----------------------------------------------------------

def _mod(v, m, inv_m):
    """Exact v mod m for 0 <= v < 2^23 (elementwise, two corrections)."""
    t = jnp.floor(v * inv_m)
    rr = v - t * m
    rr = jnp.where(rr < 0, rr + m, rr)
    rr = jnp.where(rr >= m, rr - m, rr)
    return rr


class RElem:
    """Channels [..., 2J] (B1 then B2), canonical per channel; `bound` is the
    static value bound in units of p (value in [0, bound*p))."""

    __slots__ = ("ch", "bound")

    def __init__(self, ch, bound: int):
        assert bound <= BOUND_P_MAX, f"bound {bound} too large"
        self.ch = ch
        self.bound = bound

    @property
    def batch_shape(self):
        return self.ch.shape[:-1]

    def __repr__(self):
        # stable (pointer-free) repr: exe_cache call signatures embed it;
        # after the signature's descriptor tree_map, ch is a string
        ch = self.ch if isinstance(self.ch, str) \
            else getattr(self.ch, "shape", "?")
        return f"RElem(ch={ch}, bound={self.bound})"


jax.tree_util.register_pytree_node(
    RElem,
    lambda e: ((e.ch,), e.bound),
    lambda bound, ch: RElem(ch[0], bound))


def add(a: RElem, b: RElem) -> RElem:
    C = consts()
    m = np.concatenate([C.qf, C.rf])
    s = a.ch + b.ch
    s = jnp.where(s >= m, s - m, s)
    return RElem(s, a.bound + b.bound)


def neg(a: RElem) -> RElem:
    """-(a) as bound(a)*p - a (exact non-negative representative)."""
    C = consts()
    b = a.bound
    m = np.concatenate([C.qf, C.rf])
    s = C.bp_table[b] - a.ch
    s = jnp.where(s < 0, s + m, s)
    return RElem(s, b)


def sub(a: RElem, b: RElem) -> RElem:
    return add(a, neg(b))


def mul_small(a: RElem, c: int) -> RElem:
    C = consts()
    m = np.concatenate([C.qf, C.rf])
    inv = np.float32(1.0) / m
    assert a.bound * c <= BOUND_P_MAX
    v = a.ch * float(c)          # < 2^11 * c; c <= 255 -> < 2^19
    return RElem(_mod(v, m, inv), a.bound * c)


def mont_mul(a: RElem, b: RElem) -> RElem:
    """(a*b/M1) mod-p-equivalent; output bound 3."""
    C = consts()
    assert a.bound * b.bound <= BOUND_PROD_MAX, (a.bound, b.bound)
    m = np.concatenate([C.qf, C.rf])
    inv = np.float32(1.0) / m
    s = _mod(a.ch * b.ch, m, inv)                         # [..., 2J]
    s1 = s[..., :J]
    s2 = s[..., J:]

    # xi over B1
    xi = _mod(s1 * C.xi_mul, C.qf, C.inv_qf)
    gamma = jnp.floor(
        jnp.einsum("...j,j->...", xi, C.inv_qf,
                   precision=jax.lax.Precision.HIGHEST) - _gamma_slack)

    def ext(vals, c_hi, c_lo, neg_m, gam, mf, inv_mf):
        hi = jax.lax.dot_general(
            vals, c_hi, (((vals.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=DTYPE,
            precision=jax.lax.Precision.HIGHEST)
        lo = jax.lax.dot_general(
            vals, c_lo, (((vals.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=DTYPE,
            precision=jax.lax.Precision.HIGHEST)
        hi = _mod(hi, mf, inv_mf)
        v = hi * 64.0 + _mod(lo, mf, inv_mf) + gam[..., None] * neg_m
        return _mod(v, mf, inv_mf)

    w2 = ext(xi, C.c1_hi, C.c1_lo, C.negM1_r, gamma, C.rf, C.inv_rf)

    t2 = _mod(_mod(s2 + w2 * C.p_r, C.rf, C.inv_rf) * C.M1inv_r,
              C.rf, C.inv_rf)

    zeta = _mod(t2 * C.zeta_mul, C.rf, C.inv_rf)
    gamma2 = jnp.floor(
        jnp.einsum("...k,k->...", zeta, C.inv_rf,
                   precision=jax.lax.Precision.HIGHEST) + 0.5)
    t1 = ext(zeta, C.c2_hi, C.c2_lo, C.negM2_q, gamma2, C.qf, C.inv_qf)

    return RElem(jnp.concatenate([t1, t2], axis=-1), 3)


def squash(a: RElem) -> RElem:
    """Reduce the value bound back to 3 (one mont_mul by M1 mod p)."""
    C = consts()
    one = RElem(jnp.asarray(C.M1_modp), 1)
    return mont_mul(a, one)


# -- host conversions ---------------------------------------------------------

def from_ints(vals: Sequence[int], mont: bool = True) -> RElem:
    """Python ints -> device RElem (Montgomery domain by default).

    Pure host: the Montgomery factor is applied per value mod p (one bigint
    mul each), then ints -> little-endian bytes -> numpy int64 matmul with
    the 2^(8i)-mod-m table -> channels. No device work at all, so callers
    never pay an eager dispatch."""
    C = consts()
    if mont:
        m1p = C.M1_mod_p
        vals = [int(v) * m1p % P for v in vals]
    buf = b"".join(int(int(v) % P).to_bytes(49, "little") for v in vals)
    byts = np.frombuffer(buf, np.uint8).reshape(len(vals), 49).astype(np.int64)
    ch = (byts @ C.pw_int) % C.m_int          # terms < 2^25: int64-exact
    # np-backed (jax lifts it lazily): keeps this TRULY host-pure even when
    # called inside a jit trace (jnp.asarray would stage a traced constant)
    return RElem(np.asarray(ch, dtype=np.float32)
                 if DTYPE == jnp.float32 else np.asarray(ch, np.int32), 1)


def to_ints_np(ch_arr: np.ndarray, mont: bool = True) -> List[int]:
    """Fetched raw channels [..., 2J] -> python ints mod p.

    Vectorized host CRT over the B1 channels: one int64 matmul against the
    base-2^24 CRT weight limbs (terms < 2^35, sums < 2^41: exact), then a
    cheap per-element recompose + mod. Exits the Montgomery domain if mont.
    """
    C = consts()
    arr = np.asarray(ch_arr).astype(np.int64)
    flat = arr.reshape(-1, arr.shape[-1])[:, :J]     # B1 channels
    acc = flat @ C.crt_w_limbs                        # [N, nw]
    shifts = [1 << (24 * k) for k in range(C.crt_nw)]
    out = []
    minv = C.M1_inv_p if mont else 1
    for row in acc:
        v = sum(int(c) * s for c, s in zip(row, shifts)) % C.M1
        out.append(v * minv % P if mont else v % P)
    return out


def to_ints(e: RElem) -> List[int]:
    """Device RElem -> python ints mod p (exits Montgomery domain)."""
    return to_ints_np(np.asarray(e.ch), mont=True)
