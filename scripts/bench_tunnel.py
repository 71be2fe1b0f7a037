"""Measure the axon tunnel's raw costs: dispatch latency, D2H fetch
latency vs size, kernel launch overhead. These numbers set the
architecture (how many dispatches/fetches a prove can afford)."""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

print("backend:", jax.default_backend())


def timeit(label, fn, reps=20):
    fn()  # warm
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{label}: {dt:.3f} ms")
    return dt


# 1. tiny jitted op dispatch + block
f = jax.jit(lambda x: x + 1.0)
x = jnp.zeros((8, 128), jnp.float32)
timeit("tiny-op dispatch+block_until_ready", lambda: f(x).block_until_ready())

# 2. async dispatch cost (enqueue only)
def enqueue_only():
    y = f(x)
    return y
y = f(x); y.block_until_ready()
t0 = time.perf_counter()
ys = [f(x) for _ in range(100)]
t1 = time.perf_counter()
ys[-1].block_until_ready()
t2 = time.perf_counter()
print(f"enqueue-only per dispatch: {(t1-t0)/100*1e3:.3f} ms; drain 100: {(t2-t1)*1e3:.1f} ms")

# 3. D2H fetch latency vs size
for shape in [(1, 1), (8, 128), (192, 74), (4096, 74), (64*26, 74*3)]:
    a = jnp.ones(shape, jnp.float32)
    a.block_until_ready()
    timeit(f"device_get {shape}", lambda a=a: np.asarray(a), reps=10)

# 4. chained dispatches (dependency chain of 50 tiny ops), measures queue depth cost
g = jax.jit(lambda x: x * 1.000001 + 0.5)
def chain():
    z = x
    for _ in range(50):
        z = g(z)
    z.block_until_ready()
timeit("chain of 50 tiny jit ops", chain, reps=5)

# 5. H2D transfer
h = np.zeros((4096, 74), np.float32)
timeit("H2D put (4096,74)", lambda: jax.device_put(h).block_until_ready(), reps=10)

# 6. pallas kernel launch (windowed_combine, smallest shape)
import sys
sys.path.insert(0, "/root/repo")
from go_curdleproofs_tpu.ops import rns, rns_kernels
e = rns.RElem(jnp.ones((64, rns.CH if hasattr(rns, 'CH') else 74), jnp.float32), 1)
try:
    m = rns_kernels.mont_mul(e, e)
    jax.block_until_ready(m.ch)
    timeit("fused mont_mul kernel (64 rows)", lambda: jax.block_until_ready(rns_kernels.mont_mul(e, e).ch), reps=20)
except Exception as ex:
    print("mont_mul kernel failed:", ex)
