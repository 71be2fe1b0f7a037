"""Probe: do Pallas-containing executables hit the persistent compile cache
across processes? Run twice; the second process should be fast if caching
works. Prints compilation-cache log lines and timings."""
import logging
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")

import go_curdleproofs_tpu  # noqa: F401  (wires the cache config)

logging.basicConfig(level=logging.WARNING,
                    format="%(name)s:%(levelname)s: %(message)s")
for mod in ("jax._src.compilation_cache", "jax._src.compiler",
            "jax._src.cache_key"):
    lg = logging.getLogger(mod)
    lg.setLevel(logging.DEBUG)
    h = logging.StreamHandler(sys.stderr)
    h.setLevel(logging.DEBUG)
    lg.addHandler(h)

import numpy as np

from go_curdleproofs_tpu.ops import rns, rns_kernels

t0 = time.time()
a = rns.from_ints([123 + i for i in range(256)])
b = rns.from_ints([456 + i for i in range(256)])
out = rns_kernels.mont_mul(a, b)
np.asarray(out.ch[0:1, 0:1])
print(f"pallas mont_mul first-call wall: {time.time()-t0:.1f}s")

import jax
import jax.numpy as jnp


@jax.jit
def plain(x):
    return (jnp.sin(x) @ jnp.cos(x.T)).sum()


t0 = time.time()
x = jnp.arange(256.0 * 256).reshape(256, 256)
float(np.asarray(plain(x)))
print(f"plain-XLA first-call wall: {time.time()-t0:.1f}s")
