"""Pallas pow-ladder kernel for the LIMB field engine (generic modulus).

Used for the device prover's per-round Fr inversions (gamma^-1,
/root/reference/innerproductargument/innerproductargument.go:153): the XLA
lax.scan Fermat chain is ~2*255 dependent tiny multiplies, each ~50
dispatched vector ops; here the whole ladder is ONE kernel (fori over an
SMEM bit vector; in-kernel conv multiply mirrors ops/limb_field.py's
interval-analyzed schedule op-for-op, so the exactness proof carries over).

Batch is expected tiny (1-8 scalars): everything fits in a handful of
vregs; the per-step pltpu.roll cost that disqualified the limb kernel for
wide point math is irrelevant here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import limb_field as lf

_pow_cache = {}


def _mul_body(F, a, b, lane_n, lane_w, red, fold):
    """In-kernel limb modular multiply: conv + carry-expand x2 + constant
    reduction dot + carry-fold x4 (REDUCED contract). a, b REDUCED."""
    from jax.experimental.pallas import tpu as pltpu

    NL = F.nlimbs
    WIDE = 2 * NL + 1
    bp = jnp.concatenate(
        [b, jnp.zeros((b.shape[0], WIDE - NL), b.dtype)], axis=1)
    acc = a[:, 0:1] * bp
    for i in range(1, NL):
        rolled = pltpu.roll(bp, i, 1)
        rolled = jnp.where(lane_w < i, 0.0, rolled)
        acc = acc + a[:, i:i + 1] * rolled
    # two carry-expand passes inside the WIDE window
    for _ in range(2):
        c = jnp.floor(acc * (1.0 / 256.0))
        low = acc - c * 256.0
        rolled = pltpu.roll(c, 1, 1)
        acc = low + jnp.where(lane_w == 0, 0.0, rolled)
    rows = WIDE - (NL - 1)
    high = acc[:, NL - 1:]
    folded = jax.lax.dot_general(
        high, red[:rows], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    low_part = acc[:, :NL]
    low_part = jnp.where(lane_n == NL - 1, 0.0, low_part)
    out = folded + low_part
    # carry-fold passes to the REDUCED window
    for _ in range(4):
        c = jnp.floor(out * (1.0 / 256.0))
        low = out - c * 256.0
        c_top = c[:, NL - 1:NL]
        rolled = pltpu.roll(c, 1, 1)
        out = low + jnp.where(lane_n == 0, 0.0, rolled) + c_top * fold
    return out


def pow_fixed(e: lf.Element, exponent: int, field: lf.Field,
              interpret: bool = False) -> lf.Element:
    """e^exponent mod field.modulus; exponent static; output REDUCED."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    NL = field.nlimbs
    bits = [int(b) for b in bin(exponent)[2:]]
    nbits = len(bits)
    batch = e.limbs.shape[:-1]
    size = int(np.prod(batch)) if batch else 1
    pad = (-size) % 8
    x = field.carry_to(e, lf.REDUCED).limbs.reshape(size, NL)
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, NL), x.dtype)])
    rows = size + pad
    assert rows <= 1024, "pow_fixed kernel is for small batches"

    key = (field.modulus, exponent, rows, interpret)
    if key not in _pow_cache:
        red = field.RED.astype(np.float32)
        fold_c = field.FOLD.astype(np.float32).reshape(1, NL)
        one = field.from_int(1).astype(np.float32).reshape(1, NL)
        bits_arr = np.asarray(bits, np.int32).reshape(1, nbits)
        WIDE = 2 * NL + 1

        def kernel(bits_ref, red_ref, fold_ref, one_ref, x_ref, o_ref):
            xv = x_ref[:]
            red_v = red_ref[:]
            fold_v = fold_ref[:]
            lane_n = jax.lax.broadcasted_iota(jnp.int32, (rows, NL), 1)
            lane_w = jax.lax.broadcasted_iota(jnp.int32, (rows, WIDE), 1)

            def body(i, acc):
                sq = _mul_body(field, acc, acc, lane_n, lane_w,
                               red_v, fold_v)
                wm = _mul_body(field, sq, xv, lane_n, lane_w,
                               red_v, fold_v)
                bit = bits_ref[0, i]
                return jnp.where(bit > 0, wm, sq)

            acc0 = _mul_body(field, xv,
                             jnp.broadcast_to(one_ref[:], xv.shape),
                             lane_n, lane_w, red_v, fold_v)
            o_ref[:] = jax.lax.fori_loop(1, nbits, body, acc0)

        def run(xf):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((rows, NL), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                          pl.BlockSpec(red.shape, lambda: (0, 0)),
                          pl.BlockSpec((1, NL), lambda: (0, 0)),
                          pl.BlockSpec((1, NL), lambda: (0, 0)),
                          pl.BlockSpec((rows, NL), lambda: (0, 0))],
                out_specs=pl.BlockSpec((rows, NL), lambda: (0, 0)),
                interpret=interpret,
            )(bits_arr, red, fold_c, one, xf)

        from . import exe_cache
        _pow_cache[key] = exe_cache.cached_jit(run, name="frpow")

    out = _pow_cache[key](x)
    if pad:
        out = out[:size]
    return lf.Element(out.reshape(batch + (NL,)), lf.REDUCED)
