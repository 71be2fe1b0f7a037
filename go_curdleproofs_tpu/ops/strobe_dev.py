"""STROBE-128 / Merlin / curdleproofs-transcript as TPU device programs.

Companion to ops/keccak_dev.py: the full Fiat-Shamir transcript runs on
device so the prover pipeline never syncs with the host mid-proof. Byte-exact
with utils/strobe.py + utils/merlin.py + utils/transcript.py (tested against
them), which are themselves byte-exact with merlin / jsign-merlin.

Key structural facts exploited:
  * messages are short (<= ~52 bytes), so an absorb/squeeze crosses the
    STROBE rate boundary (166) at most once -> single lax.cond, vectorized
    XOR windows, no byte loops;
  * op flags and message LENGTHS are static (only contents are traced);
  * transcript prefixes with host-known data (protocol label, instance
    points) are absorbed host-side and uploaded as the initial state.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import keccak_dev
from ..utils import strobe as strobe_host
from ..utils.field_host import R

STROBE_R = 166

FLAG_I = 1
FLAG_A = 1 << 1
FLAG_C = 1 << 2
FLAG_M = 1 << 4

_IOTA166 = np.arange(166, dtype=np.int32)
_IOTA200 = np.arange(200, dtype=np.int32)


class SState(NamedTuple):
    st: jnp.ndarray         # [200] int32 bytes
    pos: jnp.ndarray        # int32 scalar
    pos_begin: jnp.ndarray  # int32 scalar


def from_host(h: strobe_host.Strobe128) -> SState:
    """Snapshot a host-side Strobe128 into a device state."""
    return SState(
        jnp.asarray(np.frombuffer(bytes(h.state), np.uint8).astype(np.int32)),
        jnp.int32(h.pos), jnp.int32(h.pos_begin))


def to_host(s: SState, template: strobe_host.Strobe128,
            cur_flags: int) -> strobe_host.Strobe128:
    """Materialize a device state back into a host Strobe128 (tests)."""
    h = strobe_host.Strobe128.__new__(strobe_host.Strobe128)
    h.state = bytearray(np.asarray(s.st).astype(np.uint8).tobytes())
    h.pos = int(s.pos)
    h.pos_begin = int(s.pos_begin)
    h.cur_flags = cur_flags
    return h


def _xor_at(st: jnp.ndarray, idx, val) -> jnp.ndarray:
    return jnp.where(_IOTA200 == idx, st ^ val, st)


def _run_f(s: SState) -> SState:
    st = _xor_at(s.st, s.pos, s.pos_begin)
    st = _xor_at(st, s.pos + 1, 0x04)
    st = st.at[STROBE_R + 1].set(st[STROBE_R + 1] ^ 0x80)
    st = keccak_dev.f1600(st.reshape(25, 8)).reshape(200)
    return SState(st, jnp.int32(0), jnp.int32(0))


def absorb(s: SState, data: jnp.ndarray) -> SState:
    """XOR `data` (static length k <= 166) into the rate at pos."""
    k = data.shape[0]
    assert k <= STROBE_R
    buf = jnp.zeros(2 * STROBE_R, dtype=jnp.int32)
    buf = jax.lax.dynamic_update_slice(buf, data.astype(jnp.int32), (s.pos,))
    st1 = s.st.at[:STROBE_R].set(s.st[:STROBE_R] ^ buf[:STROBE_R])

    def crossed(_):
        s2 = _run_f(SState(st1, jnp.int32(STROBE_R), s.pos_begin))
        st2 = s2.st.at[:STROBE_R].set(
            s2.st[:STROBE_R] ^ buf[STROBE_R: 2 * STROBE_R])
        return SState(st2, s.pos + k - STROBE_R, jnp.int32(0))

    def normal(_):
        return SState(st1, s.pos + k, s.pos_begin)

    return jax.lax.cond(s.pos + k >= STROBE_R, crossed, normal, None)


def squeeze(s: SState, k: int) -> Tuple[SState, jnp.ndarray]:
    """Read k bytes (static k <= 166) from the rate; consumed bytes zeroed."""
    assert k <= STROBE_R
    st166 = s.st[:STROBE_R]
    padded = jnp.concatenate([st166, jnp.zeros(k, jnp.int32)])
    part1 = jax.lax.dynamic_slice(padded, (s.pos,), (k,))
    window = (_IOTA166 >= s.pos) & (_IOTA166 < s.pos + k)
    st1 = s.st.at[:STROBE_R].set(jnp.where(window, 0, st166))

    def crossed(_):
        s2 = _run_f(SState(st1, jnp.int32(STROBE_R), s.pos_begin))
        k2 = s.pos + k - STROBE_R
        buf2 = jnp.zeros(2 * STROBE_R, jnp.int32)
        buf2 = jax.lax.dynamic_update_slice(
            buf2, s2.st[:STROBE_R], (STROBE_R - s.pos,))
        out2 = buf2[:k]
        iota_k = np.arange(k, dtype=np.int32)
        out = jnp.where(iota_k < STROBE_R - s.pos, part1, out2)
        window2 = _IOTA166 < k2
        st3 = s2.st.at[:STROBE_R].set(
            jnp.where(window2, 0, s2.st[:STROBE_R]))
        return SState(st3, k2, jnp.int32(0)), out

    def normal(_):
        return SState(st1, s.pos + k, s.pos_begin), part1

    return jax.lax.cond(s.pos + k >= STROBE_R, crossed, normal, None)


def _begin_op(s: SState, flags: int, force_f: bool) -> SState:
    old_begin = s.pos_begin
    s = SState(s.st, s.pos, s.pos + 1)
    s = absorb(s, jnp.stack([old_begin, jnp.int32(flags)]))
    if force_f:
        s = jax.lax.cond(s.pos != 0, lambda _: _run_f(s), lambda _: s, None)
    return s


def meta_ad(s: SState, data: jnp.ndarray, more: bool) -> SState:
    if not more:
        s = _begin_op(s, FLAG_M | FLAG_A, False)
    return absorb(s, data)


def ad(s: SState, data: jnp.ndarray, more: bool) -> SState:
    if not more:
        s = _begin_op(s, FLAG_A, False)
    return absorb(s, data)


def prf(s: SState, k: int) -> Tuple[SState, jnp.ndarray]:
    s = _begin_op(s, FLAG_I | FLAG_A | FLAG_C, force_f=True)
    return squeeze(s, k)


# ---------------------------------------------------------------------------
# Merlin layer (static labels, traced message bytes)

def _const_bytes(b: bytes) -> np.ndarray:
    return np.frombuffer(b, np.uint8).astype(np.int32)


def _u32le(n: int) -> np.ndarray:
    return np.array([n & 255, (n >> 8) & 255, (n >> 16) & 255,
                     (n >> 24) & 255], dtype=np.int32)


def append_message(s: SState, label: bytes, message: jnp.ndarray) -> SState:
    s = meta_ad(s, jnp.asarray(_const_bytes(label)), False)
    s = meta_ad(s, jnp.asarray(_u32le(message.shape[0])), True)
    return ad(s, message, False)


def challenge_bytes(s: SState, label: bytes, n: int):
    s = meta_ad(s, jnp.asarray(_const_bytes(label)), False)
    s = meta_ad(s, jnp.asarray(_u32le(n)), True)
    return prf(s, n)


# ---------------------------------------------------------------------------
# curdleproofs transcript layer (utils/transcript.py semantics, on device)

_R_BYTES_BE = np.frombuffer(R.to_bytes(32, "big"), np.uint8).astype(np.int32)


def _lt_r(chal_be: jnp.ndarray) -> jnp.ndarray:
    """Big-endian 32-byte value < r? (lexicographic compare)."""
    gt = chal_be > _R_BYTES_BE
    lt = chal_be < _R_BYTES_BE
    result = jnp.bool_(False)
    decided = jnp.bool_(False)
    for i in range(32):
        result = jnp.where(~decided & lt[i], True, result)
        decided = decided | gt[i] | lt[i]
    return result  # equality -> not canonical (r itself rejected)


def get_and_append_challenge(s: SState, label: bytes):
    """Rejection-sampled canonical Fr challenge, re-absorbed on acceptance
    (utils/transcript.py get_and_append_challenge). Returns (state,
    bytes_be[32])."""

    def attempt(s):
        return challenge_bytes(s, label, 32)

    s0, c0 = attempt(s)

    def cond(carry):
        s, c = carry
        return ~_lt_r(c)

    def body(carry):
        s, _ = carry
        return attempt(s)

    s1, c1 = jax.lax.while_loop(cond, body, (s0, c0))
    s1 = append_message(s1, label, c1)
    return s1, c1
