"""Keccak-f[1600] as a TPU device program.

Why: every device->host fetch through the TPU tunnel costs ~25ms, and the
Fiat-Shamir transcript forces ~20 host round-trips per proof in a
host-orchestrated design. Running the STROBE/Merlin transcript ON DEVICE
makes the whole prover a device-resident pipeline with a single final fetch.

Layout: the 200-byte state is a [25, 8] int32 array — one BYTE per element
(lane l = sum_i state[l, i] << 8*i, little-endian). Byte-planar layout makes
the sponge's absorb/squeeze trivial, and the 64-bit rotations become a
constant byte-permutation gather plus per-lane bit shifts — all uniform
vector ops, no 64-bit integers needed.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_RC = [
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A,
    0x8000000080008000, 0x000000000000808B, 0x0000000080000001,
    0x8000000080008081, 0x8000000000008009, 0x000000000000008A,
    0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089,
    0x8000000000008003, 0x8000000000008002, 0x8000000000000080,
    0x000000000000800A, 0x800000008000000A, 0x8000000080008081,
    0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
]

_ROT = np.array([
    [0, 36, 3, 41, 18],
    [1, 44, 10, 45, 2],
    [62, 6, 43, 15, 61],
    [28, 55, 25, 21, 56],
    [27, 20, 39, 8, 14],
], dtype=np.int64)  # r[x][y] for lane x + 5*y

# Precompute, per round-stage, the constant index/shift tables.
# pi: B[y + 5*((2x+3y)%5)] = rot(A[x+5y], r[x][y])
_PI_SRC = np.zeros(25, dtype=np.int32)
_PI_ROT = np.zeros(25, dtype=np.int32)
for x in range(5):
    for y in range(5):
        _PI_SRC[y + 5 * ((2 * x + 3 * y) % 5)] = x + 5 * y
        _PI_ROT[y + 5 * ((2 * x + 3 * y) % 5)] = int(_ROT[x][y])

# rotl64 of a byte-planar lane by r bits == byte-roll by r//8 then a
# cross-byte bit shift by r%8:
#   out[i] = ((b[(i - k) % 8] << s) | (b[(i - k - 1) % 8] >> (8 - s))) & 255
_BYTE_IDX_A = np.zeros((25, 8), dtype=np.int32)   # (i - k) % 8 per lane
_BYTE_IDX_B = np.zeros((25, 8), dtype=np.int32)   # (i - k - 1) % 8
_SHIFT_S = np.zeros((25, 1), dtype=np.int32)
for l in range(25):
    r = int(_PI_ROT[l])
    k, s = r // 8, r % 8
    for i in range(8):
        _BYTE_IDX_A[l, i] = (i - k) % 8
        _BYTE_IDX_B[l, i] = (i - k - 1) % 8
    _SHIFT_S[l, 0] = s

_RC_BYTES = np.zeros((24, 8), dtype=np.int32)
for rnd, rc in enumerate(_RC):
    for i in range(8):
        _RC_BYTES[rnd, i] = (rc >> (8 * i)) & 255

# chi ring indices: for output lane x+5y, neighbours (x+1)%5+5y, (x+2)%5+5y
_CHI_1 = np.array([(x + 1) % 5 + 5 * y for y in range(5) for x in range(5)],
                  dtype=np.int32)
_CHI_2 = np.array([(x + 2) % 5 + 5 * y for y in range(5) for x in range(5)],
                  dtype=np.int32)


def f1600(state: jnp.ndarray) -> jnp.ndarray:
    """One permutation on a [..., 25, 8] int32 byte-planar state."""
    a = state
    for rnd in range(24):
        # theta
        c = (a[..., 0:5, :] ^ a[..., 5:10, :] ^ a[..., 10:15, :]
             ^ a[..., 15:20, :] ^ a[..., 20:25, :])          # [5, 8] by x
        # d[x] = c[x-1] ^ rotl64(c[x+1], 1)
        c_prev = jnp.roll(c, 1, axis=-2)
        c_next = jnp.roll(c, -1, axis=-2)
        rot1 = ((c_next << 1) | (jnp.roll(c_next, 1, axis=-1) >> 7)) & 255
        d = c_prev ^ rot1                                     # [5, 8]
        a = a ^ jnp.tile(d, (1,) * (a.ndim - 2) + (5, 1))
        # rho + pi (constant gather + per-lane bit shift)
        src = a[..., _PI_SRC, :]                              # [25, 8]
        pa = jnp.take_along_axis(src, jnp.broadcast_to(_BYTE_IDX_A, src.shape),
                                 axis=-1)
        pb = jnp.take_along_axis(src, jnp.broadcast_to(_BYTE_IDX_B, src.shape),
                                 axis=-1)
        b = ((pa << _SHIFT_S) | (pb >> (8 - _SHIFT_S))) & 255
        # chi: a[x] = b[x] ^ (~b[x+1] & b[x+2]) along the x ring
        bx1 = b[..., _CHI_1, :]
        bx2 = b[..., _CHI_2, :]
        a = b ^ ((bx1 ^ 255) & bx2)
        # iota
        a = a.at[..., 0, :].set(a[..., 0, :] ^ _RC_BYTES[rnd])
    return a
