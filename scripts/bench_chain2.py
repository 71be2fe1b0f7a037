"""Isolate per-op costs in dependent chains (fetch-synced, fetch subtracted).

Chains of K ops at double()'s shapes: stacked pallas mul [6,768,49],
plain adds, carry passes, mul_small, and full doubles.
"""
import os, sys, time, random
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, "/root/repo")
from go_curdleproofs_tpu.ops import fp, curve, pallas_field
from go_curdleproofs_tpu.utils.field_host import P

random.seed(10)
N = 768
mk = lambda: fp.carry_to(fp.from_ints([random.randrange(P) for _ in range(N)]), fp.REDUCED)
a, b, c = mk(), mk(), mk()

def _sync(out):
    np.asarray(jax.tree.leaves(out)[0].ravel()[0:1])

FETCH = None

def timeit(name, fn, *args, reps=3, per=1):
    global FETCH
    out = fn(*args); _sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args); _sync(out)
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    if FETCH is None:
        FETCH = t
        print(f"{name:<30} {t*1e3:9.2f} ms  (fetch floor)")
    else:
        print(f"{name:<30} {t*1e3:9.2f} ms  -> {(t-FETCH)/per*1e6:8.1f} us/op")

timeit("noop (fetch floor)", jax.jit(lambda u: u.limbs + 1.0), a)

K = 64

def chain_stack6(k):
    def f(u, v, w):
        x = fp.stack([u, v, w, u, v, w])
        y = fp.stack([v, w, u, v, w, u])
        for _ in range(k):
            x = pallas_field.mul(x, y)
        return x.limbs
    return jax.jit(f)
timeit(f"stacked6 pallas mul x{K}", chain_stack6(K), a, b, c, per=K)

def chain_add(k):
    def f(u, v):
        x = u
        for _ in range(k):
            x = fp.carry_to(fp.add(x, v), fp.REDUCED)
        return x.limbs
    return jax.jit(f)
timeit(f"add+carry x{4*K}", chain_add(4 * K), a, b, per=4 * K)

def chain_ms(k):
    def f(u):
        x = u
        for _ in range(k):
            x = fp.mul_small(x, 12)
        return x.limbs
    return jax.jit(f)
timeit(f"mul_small x{4*K}", chain_ms(4 * K), a, per=4 * K)

def chain_dbl(k):
    def f(px, py, pz):
        p = curve.PointVec(px, py, pz)
        for _ in range(k):
            p = curve.double(p)
        return p.x.limbs
    return jax.jit(f)
timeit(f"double x{K}", chain_dbl(K), a, b, c, per=K)

def chain_addpt(k):
    def f(px, py, pz):
        p = curve.PointVec(px, py, pz)
        q = curve.PointVec(py, pz, px)
        for _ in range(k):
            q = curve.add(q, p)
        return q.x.limbs
    return jax.jit(f)
timeit(f"point add x{K}", chain_addpt(K), a, b, c, per=K)

from go_curdleproofs_tpu.ops import pallas_point
def chain_fdbl(k):
    def f(px, py, pz):
        p = curve.PointVec(px, py, pz)
        for _ in range(k):
            p = pallas_point.double(p)
        return p.x.limbs
    return jax.jit(f)
timeit(f"fused double x{K}", chain_fdbl(K), a, b, c, per=K)
