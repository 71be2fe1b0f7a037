"""Per-op overhead: chain of N dependent ops inside one jit, time vs N."""
import os, sys, time, random
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, "/root/repo")
from go_curdleproofs_tpu.ops import fp, curve, pallas_field
from go_curdleproofs_tpu.utils.field_host import P

random.seed(8)
LANES = int(os.environ.get("LANES", "768"))
a = fp.carry_to(fp.from_ints([random.randrange(P) for _ in range(LANES)]), fp.REDUCED)
b = fp.carry_to(fp.from_ints([random.randrange(P) for _ in range(LANES)]), fp.REDUCED)

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

def chain_pallas(n):
    def f(u, v):
        x = u
        for _ in range(n):
            x = pallas_field.mul(x, v)
        return x.limbs
    return jax.jit(f)

def chain_xla(n):
    def f(u, v):
        x = u
        for _ in range(n):
            x = fp.field.mul(x, v)
        return x.limbs
    return jax.jit(f)

def chain_dbl(n):
    def f(px, py, pz):
        p = curve.PointVec(px, py, pz)
        for _ in range(n):
            p = curve.double(p)
        return p.x.limbs
    return jax.jit(f)

timeit("pallas mul chain x8", chain_pallas(8), a, b)
timeit("pallas mul chain x64", chain_pallas(64), a, b)
timeit("xla mul chain x8", chain_xla(8), a, b)
timeit("xla mul chain x64", chain_xla(64), a, b)
timeit("double chain x8", chain_dbl(8), a, b, a)
timeit("double chain x32", chain_dbl(32), a, b, a)
