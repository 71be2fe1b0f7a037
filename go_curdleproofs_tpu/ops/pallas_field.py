"""Pallas TPU kernel for the fused Fp multiply.

The XLA path (ops/limb_field.py mul) is ~150 separate vector ops per multiply
(conv pad-chain + carries + reduce); fusing the whole schedule into one
Mosaic kernel keeps every intermediate in VMEM/registers:

    carry2(a), carry2(b)            # input re-bounding (floor-shift passes)
    conv via 49 lane-rolled FMAs    # b padded to 99 lanes, pltpu.roll
    carry-expand x2                 # bounded limbs for the reduction dot
    high @ RED  (MXU)               # constant reduction matrix, f32 HIGHEST
    carry-fold x4                   # REDUCED output contract

Exactness: identical op-for-op to the interval-analyzed XLA path, so the
same static proof applies (all values < 2^24; f32 exact).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.field_host import P
from . import limb_field as lf

NL = 49
WIDE = NL + 50          # 99: conv width + carry-expand headroom

_RED_ROWS = WIDE - (NL - 1)   # 51
RED = np.stack([
    np.array([(pow(2, 8 * (NL - 1 + j), P) >> (8 * i)) & 255
              for i in range(NL)], dtype=np.int64)
    for j in range(_RED_ROWS)]).astype(np.float32)
FOLD = np.array([(pow(2, 8 * NL, P) >> (8 * i)) & 255
                 for i in range(NL)], dtype=np.float32)


def _floor256(x):
    c = jnp.floor(x * (1.0 / 256.0))
    return c, x - c * 256.0


def _shift_up_one(c, lane_iota):
    """carry vector shifted one lane up (lane 0 becomes 0)."""
    from jax.experimental.pallas import tpu as pltpu
    rolled = pltpu.roll(c, 1, 1)
    return jnp.where(lane_iota == 0, 0.0, rolled)


def _carry_fold(x, lane49, fold, passes):
    for _ in range(passes):
        c, low = _floor256(x)
        c_top = c[:, NL - 1:NL]
        x = low + _shift_up_one(c, lane49) + c_top * fold
    return x


def _mul_body(a, b, red, fold, lane49, lane_wide):
    from jax.experimental.pallas import tpu as pltpu

    a = _carry_fold(a, lane49, fold, 2)
    b = _carry_fold(b, lane49, fold, 2)

    bp = jnp.concatenate([b, jnp.zeros((b.shape[0], WIDE - NL), b.dtype)],
                         axis=1)
    acc = jnp.zeros_like(bp)
    for i in range(NL):
        acc = acc + a[:, i: i + 1] * pltpu.roll(bp, i, 1)

    # two carry-expand passes within the 99-lane window
    for _ in range(2):
        c, low = _floor256(acc)
        rolled = pltpu.roll(c, 1, 1)
        acc = low + jnp.where(lane_wide == 0, 0.0, rolled)

    high = acc[:, NL - 1:]                      # [B, 51]
    folded = jax.lax.dot_general(
        high, red, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)    # [B, 49]
    low48 = acc[:, : NL - 1]
    out = folded + jnp.concatenate(
        [low48, jnp.zeros((low48.shape[0], 1), low48.dtype)], axis=1)
    return _carry_fold(out, lane49, fold, 4)


def _mul_kernel(a_ref, b_ref, red_ref, fold_ref, o_ref):
    a = a_ref[:]
    b = b_ref[:]
    red = red_ref[:]
    fold = fold_ref[:]
    lane49 = jax.lax.broadcasted_iota(jnp.int32, (a.shape[0], NL), 1)
    lane_wide = jax.lax.broadcasted_iota(jnp.int32, (a.shape[0], WIDE), 1)
    o_ref[:] = _mul_body(a, b, red, fold, lane49, lane_wide)


BLOCK = 256


@partial(jax.jit, static_argnames=("interpret",))
def mul_flat(a: jnp.ndarray, b: jnp.ndarray, interpret: bool = False):
    """[B, 49] x [B, 49] -> [B, 49] fused modular multiply (B % BLOCK == 0)."""
    from jax.experimental import pallas as pl

    n = a.shape[0]
    return pl.pallas_call(
        _mul_kernel,
        out_shape=jax.ShapeDtypeStruct((n, NL), a.dtype),
        grid=(n // BLOCK,),
        in_specs=[pl.BlockSpec((BLOCK, NL), lambda i: (i, 0)),
                  pl.BlockSpec((BLOCK, NL), lambda i: (i, 0)),
                  pl.BlockSpec((_RED_ROWS, NL), lambda i: (0, 0)),
                  pl.BlockSpec((1, NL), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((BLOCK, NL), lambda i: (i, 0)),
        interpret=interpret,
    )(a, b, RED, FOLD.reshape(1, NL))


def mul(a: lf.Element, b: lf.Element, interpret: bool = False) -> lf.Element:
    """Element-level wrapper matching fp.mul's REDUCED contract.

    Inputs must satisfy the same pre-conditions as the XLA path (the
    interval analyzer enforced |limb| <= 2^14 there; we assert statically)."""
    for e in (a, b):
        assert max(-e.iv[0], e.iv[1], -e.iv[2], e.iv[3]) <= (1 << 14), e.iv
    batch = a.limbs.shape[:-1]
    size = int(np.prod(batch)) if batch else 1
    pad = (-size) % BLOCK
    af = a.limbs.reshape(size, NL)
    bf = b.limbs.reshape(size, NL)
    if pad:
        af = jnp.concatenate([af, jnp.zeros((pad, NL), af.dtype)])
        bf = jnp.concatenate([bf, jnp.zeros((pad, NL), bf.dtype)])
    out = mul_flat(af, bf, interpret=interpret)
    if pad:
        out = out[:size]
    return lf.Element(out.reshape(batch + (NL,)), lf.REDUCED)
