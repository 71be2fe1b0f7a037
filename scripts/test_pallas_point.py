"""Correctness + latency + dispatch-health test for the stage-fused kernels."""
import os, sys, time, random
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, "/root/repo")
from go_curdleproofs_tpu.ops import fp, curve, pallas_point
from go_curdleproofs_tpu.utils import field_host as fh

random.seed(9)
N = int(os.environ.get("N", "768"))
pts = [fh.g1_mul(fh.G1_GEN, random.randrange(1, fh.R)) for _ in range(N)]
qts = [fh.g1_mul(fh.G1_GEN, random.randrange(1, fh.R)) for _ in range(N)]
pv = curve._settle(curve.from_affine_host(pts))
qv = curve._settle(curve.from_affine_host(qts))

# correctness vs host
got = curve.to_affine_host(pallas_point.add(pv, qv))
want = [fh.g1_add(p, q) for p, q in zip(pts, qts)]
assert got == want, "fused add mismatch"
gd = curve.to_affine_host(pallas_point.double(pv))
wd = [fh.g1_add(p, p) for p in pts]
assert gd == wd, "fused double mismatch"
print("fused add/double match host on", N, "points")

def _sync(out):
    np.asarray(jax.tree.leaves(out)[0].ravel()[0:1])

def timeit(name, fn, *args, reps=3):
    out = fn(*args); _sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args); _sync(out)
        ts.append(time.perf_counter() - t0)
    print(f"{name:<34} min {min(ts)*1e3:9.2f} ms")

def chain(fn_add, fn_dbl, k):
    def f(px, py, pz, qx, qy, qz):
        p = curve.PointVec(px, py, pz)
        q = curve.PointVec(qx, qy, qz)
        for i in range(k):
            p = fn_dbl(p)
            if i % 4 == 3:
                p = fn_add(p, q)
        return p.x.limbs
    return jax.jit(f)

args = (pv.x, pv.y, pv.z, qv.x, qv.y, qv.z)
timeit("fused horner-like chain x40", chain(pallas_point.add, pallas_point.double, 32), *args)
timeit("xla horner-like chain x40", chain(curve.add, curve.double, 32), *args)

# dispatch health after fused kernels (poison check)
small = jnp.arange(64 * 49, dtype=jnp.float32).reshape(64, 49)
ts = []
for i in range(5):
    t0 = time.perf_counter()
    np.asarray(small + i)
    ts.append(time.perf_counter() - t0)
print("fetch after fused kernels:", [round(t*1e3,1) for t in ts])
