"""Sweep Fp-mul kernel variants for per-block cost.

Variants: current roll-based (BLOCK 256), BLOCK 512/1024, dual-accumulator
(no roll: two 49-wide accumulators with static slices), limb-major.
All fetch-synced; reports ns/lane.
"""
import os, sys, time, random
from functools import partial
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
sys.path.insert(0, "/root/repo")
from go_curdleproofs_tpu.ops import fp, pallas_field
from go_curdleproofs_tpu.ops.pallas_field import NL, WIDE, RED, FOLD, _RED_ROWS, _mul_kernel
from go_curdleproofs_tpu.utils.field_host import P

random.seed(11)
LANES = 1 << 15
xs = [random.randrange(P) for _ in range(LANES)]
ys = [random.randrange(P) for _ in range(LANES)]
A = fp.carry_to(fp.from_ints(xs), fp.REDUCED).limbs
B = fp.carry_to(fp.from_ints(ys), fp.REDUCED).limbs

want = [(x * y) % P for x, y in zip(xs[:64], ys[:64])]

def _sync(out):
    np.asarray(jax.tree.leaves(out)[0].ravel()[0:1])

def check(out):
    got = fp.to_ints(np.asarray(out[:64]))
    assert got == want, "mul mismatch"

def timeit(name, fn, reps=5, chain=8):
    # chain dependent muls so launch+compute is measured, not pipeline fill
    def chained(a, b):
        x = a
        for _ in range(chain):
            x = fn(x, b)
        return x
    j = jax.jit(chained)
    out = j(A, B); _sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = j(A, B); _sync(out)
        ts.append(time.perf_counter() - t0)
    t = (min(ts) - FETCH) / chain
    print(f"{name:<28} {t*1e3:8.3f} ms/mul  {t/LANES*1e9:7.1f} ns/lane")
    check(jax.jit(lambda a, b: fn(a, b))(A, B))

noop = jax.jit(lambda u: u + 1.0)
_sync(noop(A))
ts = []
for _ in range(5):
    t0 = time.perf_counter(); _sync(noop(A)); ts.append(time.perf_counter() - t0)
FETCH = min(ts)
print(f"fetch floor: {FETCH*1e3:.2f} ms")

def make_call(block):
    def f(a, b):
        n = a.shape[0]
        return pl.pallas_call(
            _mul_kernel,
            out_shape=jax.ShapeDtypeStruct((n, NL), a.dtype),
            grid=(n // block,),
            in_specs=[pl.BlockSpec((block, NL), lambda i: (i, 0)),
                      pl.BlockSpec((block, NL), lambda i: (i, 0)),
                      pl.BlockSpec((_RED_ROWS, NL), lambda i: (0, 0)),
                      pl.BlockSpec((1, NL), lambda i: (0, 0))],
            out_specs=pl.BlockSpec((block, NL), lambda i: (i, 0)),
        )(a, b, RED, FOLD.reshape(1, NL))
    return f

for blk in (256, 512, 1024, 2048):
    try:
        timeit(f"roll conv, BLOCK={blk}", make_call(blk))
    except Exception as e:
        print(f"BLOCK={blk}: {type(e).__name__}: {str(e)[:120]}")
