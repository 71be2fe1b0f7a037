"""Compare XLA-composed point add/double vs fused Pallas stages on TPU."""
import os, sys, time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, "/root/repo")

import random
import numpy as np
import jax
import jax.numpy as jnp
from go_curdleproofs_tpu.ops import curve, pallas_point
from go_curdleproofs_tpu.utils import field_host as fh

random.seed(3)


def mk(n):
    pts = [fh.g1_mul(fh.G1_GEN, random.randrange(1, fh.R)) for _ in range(32)]
    return curve.from_affine_host([pts[i % 32] for i in range(n)])


def sync(pv):
    np.asarray(pv.x.limbs.ravel()[0:1])


def timeit(label, fn, *args, reps=5):
    out = fn(*args); sync(out)          # compile
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    print(f"{label}: {1e3*(time.time()-t0)/reps:.2f} ms", flush=True)
    return out


for n in (384, 6144, 98304):
    p = mk(n)
    q = mk(n)
    xla_add = jax.jit(curve.add)
    pal_add = jax.jit(lambda a, b: pallas_point.add(a, b))
    a1 = timeit(f"xla add    n={n}", xla_add, p, q)
    a2 = timeit(f"pallas add n={n}", pal_add, p, q)
    # cross-check canonical equality via host
    h1 = curve.to_affine_host(curve.pmap_coords(lambda t: t[:8], a1))
    h2 = curve.to_affine_host(curve.pmap_coords(lambda t: t[:8], a2))
    assert h1 == h2, f"mismatch at n={n}"
    xla_dbl = jax.jit(curve.double)
    pal_dbl = jax.jit(lambda a: pallas_point.double(a))
    d1 = timeit(f"xla dbl    n={n}", xla_dbl, p)
    d2 = timeit(f"pallas dbl n={n}", pal_dbl, p)
    h1 = curve.to_affine_host(curve.pmap_coords(lambda t: t[:8], d1))
    h2 = curve.to_affine_host(curve.pmap_coords(lambda t: t[:8], d2))
    assert h1 == h2, f"dbl mismatch at n={n}"
print("all match")
