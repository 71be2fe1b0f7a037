import os, sys, time, random
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, "/root/repo")
from go_curdleproofs_tpu.ops import fp
from go_curdleproofs_tpu.utils.field_host import P

random.seed(7)
a = fp.carry_to(fp.from_ints([random.randrange(P) for _ in range(4096)]), fp.REDUCED)
b = fp.carry_to(fp.from_ints([random.randrange(P) for _ in range(4096)]), fp.REDUCED)

small = jnp.arange(64 * 49, dtype=jnp.float32).reshape(64, 49)
jax.block_until_ready(small)

def fetch_time(tag, reps=6):
    ts = []
    for i in range(reps):
        t0 = time.perf_counter()
        np.asarray(small + i)   # tiny compute + D2H
        ts.append(time.perf_counter() - t0)
    print(f"fetch {tag:<22} all={[round(t*1e3,1) for t in ts]}")

fetch_time("before any mul")

xla = jax.jit(lambda u, v: fp.field.mul(u, v).limbs)
jax.block_until_ready(xla(a, b))
fetch_time("after XLA mul")

pal = jax.jit(lambda u, v: fp.mul(u, v).limbs)  # dispatched -> pallas on TPU
out = pal(a, b)
jax.block_until_ready(out)
fetch_time("after pallas mul")

# run pallas a few more times
for _ in range(5):
    out = pal(a, b)
jax.block_until_ready(out)
fetch_time("after 5x pallas mul")
