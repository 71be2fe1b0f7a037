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


# ---------------------------------------------------------------------------
# STATIC-POSITION engine.
#
# Every transcript absorb in the protocol has a STATIC length, and every
# challenge ends with run_f + a fixed-layout re-absorption, so the STROBE
# position/pos_begin at every point of the prover are trace-time constants
# (the rejection-resampling loop re-enters at pos=32 every attempt). That
# makes the whole duplex static-schedulable:
#   * single absorbs become static-index slice XORs (no lax.cond, no
#     dynamic_update_slice, keccak only where the layout crosses the rate);
#   * BULK absorbs (k points/scalars under one label — the prover's ~1.5k
#     sequential message chain) become ONE template scatter + ONE lax.scan
#     over 166-byte rate blocks with a single keccak instance in the body.
# The dynamic SState engine above remains for arbitrary-position use.


class TState:
    """Trace-time STROBE state: traced [200] int32 bytes + STATIC pos /
    pos_begin (Python ints burned into the compiled program)."""

    __slots__ = ("st", "pos", "pos_begin")

    def __init__(self, st: jnp.ndarray, pos: int, pos_begin: int):
        self.st = st
        self.pos = int(pos)
        self.pos_begin = int(pos_begin)

    # -- primitives ---------------------------------------------------------

    def _run_f(self) -> None:
        st = self.st
        st = st.at[self.pos].set(st[self.pos] ^ self.pos_begin)
        st = st.at[self.pos + 1].set(st[self.pos + 1] ^ 0x04)
        st = st.at[STROBE_R + 1].set(st[STROBE_R + 1] ^ 0x80)
        self.st = keccak_dev.f1600(st.reshape(25, 8)).reshape(200)
        self.pos = 0
        self.pos_begin = 0

    def _absorb(self, data) -> None:
        """XOR `data` (traced [n] int32 or host bytes/np) at static pos."""
        if isinstance(data, (bytes, bytearray)):
            data = np.frombuffer(bytes(data), np.uint8).astype(np.int32)
        n = data.shape[0]
        off = 0
        while off < n:
            take = min(STROBE_R - self.pos, n - off)
            seg = jnp.asarray(data[off:off + take])
            p = self.pos
            self.st = self.st.at[p:p + take].set(self.st[p:p + take] ^ seg)
            self.pos += take
            off += take
            if self.pos == STROBE_R:
                self._run_f()

    def _begin_op(self, flags: int, force_f: bool) -> None:
        old = self.pos_begin
        self.pos_begin = self.pos + 1
        self._absorb(np.array([old, flags], np.int32))
        if force_f and self.pos != 0:
            self._run_f()

    def _squeeze(self, k: int) -> jnp.ndarray:
        assert self.pos + k <= STROBE_R
        p = self.pos
        out = self.st[p:p + k]
        self.st = self.st.at[p:p + k].set(0)
        self.pos += k
        return out

    # -- Merlin layer -------------------------------------------------------

    def append_message(self, label: bytes, message) -> None:
        self._begin_op(FLAG_M | FLAG_A, False)
        self._absorb(_const_bytes(label))
        L = message.shape[0] if hasattr(message, "shape") else len(message)
        self._absorb(_u32le(L))
        self._begin_op(FLAG_A, False)
        self._absorb(message)

    def append_rows(self, label: bytes, rows) -> None:
        """Absorb k equal-length messages under one label as ONE scatter +
        ONE scan over rate blocks (rows: [k, L] traced or host np)."""
        if rows.ndim == 1:
            rows = rows[None]
        k, L = rows.shape
        traced = not isinstance(rows, np.ndarray)
        template, tr_pos, pbs, pos1, pb1 = _bulk_layout(
            self.pos, self.pos_begin, label, k, L,
            const_rows=None if traced else rows)
        if traced:
            flat = jnp.asarray(template).at[jnp.asarray(tr_pos)].set(
                rows.reshape(-1).astype(jnp.int32))
        else:
            flat = jnp.asarray(template)
        self._absorb_stream(flat, int(template.shape[0]), pbs)
        assert self.pos == pos1, (self.pos, pos1)
        self.pos_begin = pb1   # pb evolution inside the stream is sim-tracked

    def _absorb_stream(self, flat, n: int, pbs) -> None:
        """Absorb a precomputed n-byte stream whose rate-crossing pos_begin
        values `pbs` are known statically (scan-based; one keccak body)."""
        off = 0
        ci = 0
        head = min(STROBE_R - self.pos, n)
        p = self.pos
        self.st = self.st.at[p:p + head].set(self.st[p:p + head]
                                             ^ flat[:head])
        self.pos += head
        off += head
        if self.pos == STROBE_R:
            self.pos_begin = pbs[ci]
            self._run_f()
            ci += 1
        nb = (n - off) // STROBE_R
        if nb > 0:
            blocks = flat[off:off + nb * STROBE_R].reshape(nb, STROBE_R)
            pb_arr = jnp.asarray(np.array(pbs[ci:ci + nb], np.int32))

            def body(st, xs):
                block, pb = xs
                st = st.at[:STROBE_R].set(st[:STROBE_R] ^ block)
                st = st.at[STROBE_R].set(st[STROBE_R] ^ pb)
                st = st.at[STROBE_R + 1].set(st[STROBE_R + 1] ^ 0x84)
                return keccak_dev.f1600(st.reshape(25, 8)).reshape(200), None

            self.st, _ = jax.lax.scan(body, self.st, (blocks, pb_arr))
            ci += nb
            off += nb * STROBE_R
            self.pos = 0
            self.pos_begin = 0
        tail = n - off
        if tail:
            self.st = self.st.at[self.pos:self.pos + tail].set(
                self.st[self.pos:self.pos + tail] ^ flat[off:])
            self.pos += tail
        # pos_begin across the stream is layout-dependent; the caller
        # (append_rows) sets it from the layout sim.

    def challenge_bytes32(self, label: bytes) -> jnp.ndarray:
        self._begin_op(FLAG_M | FLAG_A, False)
        self._absorb(_const_bytes(label))
        self._absorb(_u32le(32))
        self._begin_op(FLAG_I | FLAG_A | FLAG_C, force_f=True)
        return self._squeeze(32)

    def get_and_append_challenge(self, label: bytes) -> jnp.ndarray:
        """Rejection-sampled canonical challenge; every attempt re-enters at
        pos=32 / pos_begin=0, so the loop body has one static layout."""
        c0 = self.challenge_bytes32(label)
        assert (self.pos, self.pos_begin) == (32, 0)

        def body(carry):
            st, _ = carry
            ts = TState(st, 32, 0)
            c = ts.challenge_bytes32(label)
            assert (ts.pos, ts.pos_begin) == (32, 0)
            return ts.st, c

        st1, c1 = jax.lax.while_loop(lambda cr: ~_lt_r(cr[1]), body,
                                     (self.st, c0))
        self.st = st1
        self.pos, self.pos_begin = 32, 0
        self.append_message(label, c1)
        return c1


def _bulk_layout(pos0: int, pb0: int, label: bytes, k: int, L: int,
                 const_rows=None):
    """Static layout of k Merlin messages: returns (template [N] int32,
    traced-byte stream positions [k*L], pos_begin at each rate crossing,
    final pos, final pos_begin). With const_rows, row bytes are baked into
    the template instead (no traced positions)."""
    lbl = np.frombuffer(label, np.uint8)
    l4 = _u32le(L)
    template = []
    tr_pos = []
    pbs = []
    state = {"pos": pos0, "pb": pb0}

    def emit(b):
        template.append(int(b))
        state["pos"] += 1
        if state["pos"] == STROBE_R:
            pbs.append(state["pb"])
            state["pos"] = 0
            state["pb"] = 0

    for r in range(k):
        # meta_ad(label, False)
        old = state["pb"]
        state["pb"] = state["pos"] + 1
        emit(old)
        emit(FLAG_M | FLAG_A)
        for b in lbl:
            emit(b)
        for b in l4:           # meta_ad(u32le(L), more=True)
            emit(b)
        # ad(msg, False)
        old = state["pb"]
        state["pb"] = state["pos"] + 1
        emit(old)
        emit(FLAG_A)
        for c in range(L):
            if const_rows is None:
                tr_pos.append(len(template))
                emit(0)
            else:
                emit(int(const_rows[r, c]))
    return (np.asarray(template, np.int32), np.asarray(tr_pos, np.int32),
            pbs, state["pos"], state["pb"])


def _sim_msgs_pos(pos: int, pb: int, msgs) -> tuple:
    """Advance (pos, pos_begin) across append_message calls [(label_len,
    msg_len), ...] — the host-side twin of the static layout."""
    def adv(n):
        nonlocal pos, pb
        while n:
            take = min(STROBE_R - pos, n)
            pos += take
            n -= take
            if pos == STROBE_R:
                pos, pb = 0, 0

    for (ll, ml) in msgs:
        pb = pos + 1
        adv(2 + ll + 4)
        pb = pos + 1
        adv(2 + ml)
    return pos, pb


def post_challenge_pos(label: bytes) -> tuple:
    """(pos, pos_begin) right after get_and_append_challenge(label): the
    squeeze always exits at pos=32/pb=0, then the accepted challenge is
    re-absorbed — a static function of the label alone. This is what lets
    the host orchestrator thread static positions between device pieces
    without fetching transcript state."""
    return _sim_msgs_pos(32, 0, [(len(label), 32)])
