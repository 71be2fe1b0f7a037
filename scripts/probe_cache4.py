"""Probe 4: exe_cache end-to-end — run twice; second process must skip the
deferred backend compile (fast first exec) via the persisted executable."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
import go_curdleproofs_tpu  # noqa: F401

import numpy as np

from go_curdleproofs_tpu.ops import rns, rns_kernels

a = rns.from_ints([7 + i for i in range(256)])
b = rns.from_ints([11 + i for i in range(256)])

t0 = time.time()
out = rns_kernels.mont_mul(a, b)          # goes through cached_jit now
np.asarray(out.ch[0:1, 0:1])
print(f"mont_mul first-call wall: {time.time()-t0:.2f}s", flush=True)
expect = rns_kernels.mont_mul(a, b, interpret=True)
print("matches interpret:",
      np.allclose(np.asarray(out.ch), np.asarray(expect.ch)), flush=True)
print("cache dir:", sorted(os.listdir("/root/repo/.exe_cache"))
      if os.path.isdir("/root/repo/.exe_cache") else "EMPTY", flush=True)
