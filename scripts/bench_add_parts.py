"""Decompose curve.add cost: stacked mul (XLA vs pallas), elementwise, settle."""
import os, sys, time, random
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, "/root/repo")
from go_curdleproofs_tpu.ops import fp, curve, pallas_field
from go_curdleproofs_tpu.ops import limb_field as lf
from go_curdleproofs_tpu.utils.field_host import P

random.seed(3)
N = 1 << 15
xs = [random.randrange(P) for _ in range(N)]
a = fp.carry_to(fp.from_ints(xs), fp.REDUCED)
b = fp.carry_to(fp.from_ints(xs[::-1]), fp.REDUCED)

def timeit(name, fn, *args, reps=10):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:<30} {dt*1e3:9.3f} ms")

# stacked 6-wide mul, XLA vs pallas: six DISTINCT rows (rolled copies) so
# nothing CSEs away
def stack6(u, v):
    us = fp.stack([fp.fmap(lambda t, i=i: jnp.roll(t, i, axis=0), u)
                   for i in range(6)])
    vs = fp.stack([fp.fmap(lambda t, i=i: jnp.roll(t, -i, axis=0), v)
                   for i in range(6)])
    return us, vs

xla_m6 = jax.jit(lambda u, v: lf.Field.mul(fp.field, *stack6(u, v)).limbs)
pal_m6 = jax.jit(lambda u, v: pallas_field.mul(*stack6(u, v)).limbs)
timeit("xla mul6 (196k lanes)", xla_m6, a, b, reps=3)
timeit("pallas mul6 (196k lanes)", pal_m6, a, b)

# one full add via current code path, distinct random coordinates
cs = [random.randrange(P) for _ in range(N)]
ds = [random.randrange(P) for _ in range(N)]
c = fp.carry_to(fp.from_ints(cs), fp.REDUCED)
d = fp.carry_to(fp.from_ints(ds), fp.REDUCED)
es = [random.randrange(P) for _ in range(N)]
fs = [random.randrange(P) for _ in range(N)]
e = fp.carry_to(fp.from_ints(es), fp.REDUCED)
f = fp.carry_to(fp.from_ints(fs), fp.REDUCED)
add_j = jax.jit(lambda p, q: curve.add(p, q).x.limbs)
pv = curve.PointVec(a, b, c)
qv = curve.PointVec(d, e, f)
timeit("curve.add (dispatched)", add_j, pv, qv, reps=5)
os.environ["CURDLE_PALLAS"] = "0"
fp._pallas_on = None
fp._PALLAS_MODE = "0"
add_x = jax.jit(lambda p, q: curve.add(p, q).y.limbs)
timeit("curve.add (XLA forced)", add_x, pv, qv, reps=3)
fp._PALLAS_MODE = "auto"
fp._pallas_on = None

# elementwise-only ladder: 24 adds + 6 settle carries
def elem_only(u, v):
    t = fp.add(u, v)
    for _ in range(10):
        t = fp.carry_to(fp.add(t, v), fp.REDUCED)
    return t.limbs
timeit("10x(add+carry) 32k lanes", jax.jit(elem_only), a, b)

print("dispatch on:", fp._pallas_enabled(), "backend:", jax.default_backend())
