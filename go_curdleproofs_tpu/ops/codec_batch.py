"""Batched point decompression + subgroup checking on device.

The reference's verifier spends a large share of its time decompressing
~500 compressed points (gnark's SetBytes does a per-point sqrt + subgroup
check; SURVEY.md §3.2 "HOT"). Here the sqrt ladders (a^((p+1)/4)) and the
subgroup scalar-mults ([r]P == O) run as single batched device programs.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp

from . import curve
from . import field_backend as fp
from ..utils import field_host as fh
from ..utils.field_host import Affine

_M_MASK = 0b111 << 5
_M_COMPRESSED_SMALLEST = 0b100 << 5
_M_COMPRESSED_LARGEST = 0b101 << 5
_M_COMPRESSED_INFINITY = 0b110 << 5


def _sqrt_batch(values: List[int]) -> List[int]:
    """Batched device sqrt candidates (caller validates cand^2 == v)."""
    n = curve._pad_pow2(len(values), minimum=8)
    vs = values + [0] * (n - len(values))
    out = curve._compiled("sqrt", jax.jit(fp.sqrt_candidate))(fp.from_ints(vs))
    return fp.to_ints(out)[: len(values)]


def batch_subgroup_check(points: Sequence[Affine]) -> bool:
    """All points in the prime-order subgroup? One batched [r]P scalar-mult."""
    pts = [p for p in points if p is not None]
    if not pts:
        return True
    n = curve._pad_pow2(len(pts), minimum=8)
    padded = list(pts) + [None] * (n - len(pts))
    pv = curve.from_affine_host(padded)
    digits = jnp.asarray(curve.scalars_to_digits([fh.R] * n))
    out = curve._compiled("smul", curve.scalar_mul_device)(pv, digits)
    zs = fp.to_ints(out.z)[: len(pts)]
    return all(z == 0 for z in zs)


def batch_decompress(blobs: Sequence[bytes],
                     subgroup_check: bool = True) -> List[Affine]:
    """Decode many 48-byte compressed G1 points with device-batched sqrt and
    subgroup validation. Byte-semantics identical to codec.g1_from_bytes."""
    results: List[Affine] = [None] * len(blobs)
    idxs: List[int] = []
    xs: List[int] = []
    wants_largest: List[bool] = []

    for i, b in enumerate(blobs):
        if len(b) < 48:
            raise ValueError("short buffer for G1 point")
        meta = b[0] & _M_MASK
        if meta == _M_COMPRESSED_INFINITY:
            if any(bytes([b[0] & ~_M_MASK & 0xFF]) + bytes(b[1:48])):
                raise ValueError("invalid infinity encoding")
            results[i] = None
            continue
        if meta not in (_M_COMPRESSED_SMALLEST, _M_COMPRESSED_LARGEST):
            raise ValueError(f"invalid point encoding flags: {b[0]:#x}")
        xb = bytearray(b[:48])
        xb[0] &= ~_M_MASK & 0xFF
        x = int.from_bytes(xb, "big")
        if x >= fh.P:
            raise ValueError("x coordinate not canonical")
        idxs.append(i)
        xs.append(x)
        wants_largest.append(meta == _M_COMPRESSED_LARGEST)

    if xs:
        rhs = [(x * x % fh.P * x + fh.B_COEFF) % fh.P for x in xs]
        cands = _sqrt_batch(rhs)
        for i, x, r, cand, largest in zip(idxs, xs, rhs, cands, wants_largest):
            if cand * cand % fh.P != r:
                raise ValueError("point not on curve")
            y = cand
            if fh.fp_lexicographically_largest(y) != largest:
                y = fh.P - y
            results[i] = (x, y)

    if subgroup_check and not batch_subgroup_check(results):
        raise ValueError("point not in prime-order subgroup")
    return results
