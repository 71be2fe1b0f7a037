"""Device-side point compression (projective -> 48-byte ZCash encoding).

Needed by the device-resident transcript: prover-computed points are absorbed
as compressed bytes without leaving the device. Byte-exact with
utils/codec.py g1_to_bytes.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from . import field_backend as fp
from .curve import PointVec
from ..utils.field_host import P

_HALF_P_BE = np.frombuffer(((P - 1) // 2).to_bytes(48, "big"),
                           np.uint8).astype(np.int32)


def _digits_to_be_bytes(digits: jnp.ndarray) -> jnp.ndarray:
    """[.., 49] canonical base-256 digits (LE) -> [.., 48] big-endian bytes
    (top digit is zero for canonical values < p < 2^384)."""
    return digits[..., :48][..., ::-1].astype(jnp.int32)


def _lex_gt(a_be: jnp.ndarray, b_be: np.ndarray) -> jnp.ndarray:
    """a > b for big-endian byte arrays; batched over leading dims."""
    gt = a_be > b_be
    lt = a_be < b_be
    result = jnp.zeros(a_be.shape[:-1], dtype=jnp.bool_)
    decided = jnp.zeros(a_be.shape[:-1], dtype=jnp.bool_)
    for i in range(a_be.shape[-1]):
        result = jnp.where(~decided & gt[..., i], True, result)
        decided = decided | gt[..., i] | lt[..., i]
    return result


def compress_xy(points: PointVec) -> jnp.ndarray:
    """[n] projective points -> [n, 96] int32: the 48 compressed bytes
    (transcript format) followed by the affine y big-endian bytes.

    The y plane lets the host recover (x, y) WITHOUT a per-point sqrt
    (the compressed form alone would force one): proof assembly after the
    one-fetch prove decodes ~100 points; sqrt-free decode keeps that off
    the host's critical path."""
    zinv = fp.inv(points.z)               # 0 for infinity
    x = fp.mul(points.x, zinv)
    y = fp.mul(points.y, zinv)
    xd = fp.canonical_digits(x)
    yd = fp.canonical_digits(y)
    zd = fp.canonical_digits(points.z)
    is_inf = jnp.all(zd == 0, axis=-1)

    xb = _digits_to_be_bytes(xd)
    y_be = _digits_to_be_bytes(yd)
    largest = _lex_gt(y_be, _HALF_P_BE)
    flag = jnp.where(largest, 0xA0, 0x80).astype(jnp.int32)
    blob = xb.at[..., 0].set(xb[..., 0] + flag)
    inf_bytes = jnp.zeros_like(blob).at[..., 0].set(0xC0)
    blob = jnp.where(is_inf[..., None], inf_bytes, blob)
    y_be = jnp.where(is_inf[..., None], jnp.zeros_like(y_be), y_be)
    return jnp.concatenate([blob, y_be], axis=-1)


def decode_xy_host(row96) -> "tuple | None":
    """Host decode of one compress_xy row -> Affine (no sqrt)."""
    import numpy as np
    b = bytes(np.asarray(row96).astype(np.uint8))
    if b[0] & 0xC0 == 0xC0:
        return None
    x = int.from_bytes(bytes([b[0] & 0x1F]) + b[1:48], "big")
    y = int.from_bytes(b[48:96], "big")
    return (x, y)


def compress(points: PointVec) -> jnp.ndarray:
    """[n] projective points -> [n, 48] int32 compressed bytes."""
    zinv = fp.inv(points.z)               # 0 for infinity
    x = fp.mul(points.x, zinv)
    y = fp.mul(points.y, zinv)
    xd = fp.canonical_digits(x)
    yd = fp.canonical_digits(y)
    zd = fp.canonical_digits(points.z)
    is_inf = jnp.all(zd == 0, axis=-1)

    xb = _digits_to_be_bytes(xd)
    y_be = _digits_to_be_bytes(yd)
    largest = _lex_gt(y_be, _HALF_P_BE)

    flag = jnp.where(largest, 0xA0, 0x80).astype(jnp.int32)
    out = xb.at[..., 0].set(xb[..., 0] + flag)
    inf_bytes = jnp.zeros_like(out).at[..., 0].set(0xC0)
    return jnp.where(is_inf[..., None], inf_bytes, out)
