"""Second-pass tunnel measurements: avoid _npy_value caching, separate
H2D bandwidth vs latency, pallas launch overhead, windowed_combine and
msm_many steady-state."""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

print("backend:", jax.default_backend(), flush=True)

# --- H2D: latency vs bandwidth
for nbytes in (4096, 65536, 1 << 20, 4 << 20):
    h = np.zeros(nbytes // 4, np.float32)
    jax.device_put(h).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(5):
        jax.device_put(h).block_until_ready()
    dt = (time.perf_counter() - t0) / 5 * 1e3
    print(f"H2D {nbytes/1024:.0f}KB: {dt:.2f} ms ({nbytes/1e6/dt*1e3:.0f} MB/s)", flush=True)

# --- D2H: fresh arrays each time (defeat host-side caching)
f = jax.jit(lambda x, s: x + s)
base = jnp.zeros((4096, 74), jnp.float32)
outs = [f(base, float(i)) for i in range(10)]
jax.block_until_ready(outs)
t0 = time.perf_counter()
for o in outs:
    np.asarray(o)
dt = (time.perf_counter() - t0) / 10 * 1e3
print(f"D2H fresh (4096,74) 1.2MB: {dt:.2f} ms", flush=True)

small = [f(jnp.zeros((8, 128), jnp.float32), float(i)) for i in range(10)]
jax.block_until_ready(small)
t0 = time.perf_counter()
for o in small:
    np.asarray(o)
dt = (time.perf_counter() - t0) / 10 * 1e3
print(f"D2H fresh (8,128) 4KB: {dt:.2f} ms", flush=True)

# --- pallas trivial kernel launch cost
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def triv_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:] * 2.0

@jax.jit
def triv(x):
    return pl.pallas_call(
        triv_kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)

x = jnp.zeros((256, 128), jnp.float32)
triv(x).block_until_ready()
t0 = time.perf_counter()
for _ in range(20):
    triv(x).block_until_ready()
print(f"trivial pallas kernel dispatch+block: {(time.perf_counter()-t0)/20*1e3:.3f} ms", flush=True)

# chain of 20 trivial pallas kernels (dependency)
def chain20(x):
    for _ in range(20):
        x = triv(x)
    return x
chain20(x).block_until_ready()
t0 = time.perf_counter()
for _ in range(5):
    chain20(x).block_until_ready()
print(f"chain of 20 pallas kernels: {(time.perf_counter()-t0)/5*1e3:.2f} ms", flush=True)

import sys
sys.path.insert(0, "/root/repo")
from go_curdleproofs_tpu.ops import rns, rns_kernels

# --- fused mont_mul fully jitted (no eager reshape overhead)
CH = rns_kernels.CH
a = jnp.ones((256, CH), jnp.float32)

@jax.jit
def fused_mul_jit(av):
    e = rns.RElem(av, 1)
    return rns_kernels.mont_mul(e, e).ch

fused_mul_jit(a).block_until_ready()
t0 = time.perf_counter()
for _ in range(20):
    fused_mul_jit(a).block_until_ready()
print(f"fused mont_mul jitted (256 rows): {(time.perf_counter()-t0)/20*1e3:.3f} ms", flush=True)

# --- windowed_combine steady state at prover shape (64 windows, 48 rows)
for rows in (8, 48, 512):
    sel = tuple(jnp.ones((64, rows, CH), jnp.float32) for _ in range(3))
    out = rns_kernels.windowed_combine(sel, (1, 1, 1), 64)
    jax.block_until_ready(out.x.ch)
    t0 = time.perf_counter()
    for _ in range(10):
        out = rns_kernels.windowed_combine(sel, (1, 1, 1), 64)
        jax.block_until_ready(out.x.ch)
    print(f"windowed_combine rows={rows}: {(time.perf_counter()-t0)/10*1e3:.2f} ms", flush=True)

# --- msm_many steady state, n=512, 4 jobs (IPA round shape)
from go_curdleproofs_tpu.ops import curve
from go_curdleproofs_tpu.utils import field_host as fh
import random
random.seed(7)
pts = [fh.g1_mul(fh.G1_GEN, random.randrange(1, fh.R)) for _ in range(16)]
vec = [pts[i % 16] for i in range(512)]
sv = curve.StackedVec.from_affine([vec, vec], pad_to=512)
sc = [random.randrange(fh.R) for _ in range(512)]
jobs = [[(0, sc, 0)], [(1, sc, 0)], [(0, sc, 0)], [(1, sc, 0)]]
sv.msm_many(jobs)
t0 = time.perf_counter()
for _ in range(5):
    sv.msm_many(jobs)
print(f"msm_many 4 jobs n=512 steady: {(time.perf_counter()-t0)/5*1e3:.2f} ms", flush=True)

# break down: digits prep time
t0 = time.perf_counter()
for _ in range(5):
    d = curve.scalars_to_digits(sc)
print(f"scalars_to_digits 512: {(time.perf_counter()-t0)/5*1e3:.2f} ms", flush=True)

# host combine_windows cost
out = sv.msm_many(jobs)
wins = [fh.g1_mul(fh.G1_GEN, i + 1) for i in range(64)]
t0 = time.perf_counter()
for _ in range(5):
    fh.g1_combine_windows(wins, 4)
print(f"g1_combine_windows (64): {(time.perf_counter()-t0)/5*1e3:.2f} ms", flush=True)
