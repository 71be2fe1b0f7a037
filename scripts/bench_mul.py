"""Microbench: XLA conv-based Fp mul vs fused Pallas mul, and XLA point add."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp, numpy as np
import random

sys.path.insert(0, "/root/repo")
from go_curdleproofs_tpu.ops import fp, curve, pallas_field
from go_curdleproofs_tpu.utils.field_host import P

random.seed(1)
N = 1 << 15  # 32768 lanes

xs = [random.randrange(P) for _ in range(N)]
ys = [random.randrange(P) for _ in range(N)]
a = fp.from_ints(xs)
b = fp.from_ints(ys)
a = fp.carry_to(a, fp.REDUCED)
b = fp.carry_to(b, fp.REDUCED)

xla_mul = jax.jit(lambda u, v: fp.mul(u, v).limbs)
pal_mul = jax.jit(lambda u, v: pallas_field.mul(u, v).limbs)


def timeit(name, fn, *args, reps=20):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:<28} {dt*1e3:8.3f} ms   {N/dt/1e6:8.1f} M lanes/s")
    return out

o1 = timeit("xla fp.mul", xla_mul, a, b)
o2 = timeit("pallas fp.mul", pal_mul, a, b)
v1 = fp.to_ints(np.asarray(o1))
v2 = fp.to_ints(np.asarray(o2))
assert v1 == v2, "pallas mul mismatch"
print("mul outputs match")

# point add over the same lane count
pts_x = fp.carry_to(fp.from_ints(xs), fp.REDUCED)
pv = curve.PointVec(a, b, fp.carry_to(fp.from_ints([1]*N), fp.REDUCED))
qv = curve.PointVec(b, a, fp.carry_to(fp.from_ints([1]*N), fp.REDUCED))
xla_add = jax.jit(lambda p, q: curve.add(p, q).x.limbs)
timeit("xla curve.add", xla_add, pv, qv, reps=5)
