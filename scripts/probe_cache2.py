"""Probe 2: where do the ~80s go for a Pallas kernel? Split trace/lower,
backend-compile, and first-execution; test executable serialization."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
import go_curdleproofs_tpu  # noqa: F401

import jax
import numpy as np

from go_curdleproofs_tpu.ops import rns, rns_kernels

a = rns.from_ints([123 + i for i in range(256)])
b = rns.from_ints([456 + i for i in range(256)])

# rebuild the same pallas_call jit fn without going through the cache dict
fn = rns_kernels._fused_call("mul", (a.bound, b.bound), 2, 1,
                             lambda F, vals: [F.mont_mul(vals[0], vals[1])],
                             False)

flats = [a.ch, b.ch]
t0 = time.time()
lowered = fn.lower(flats)
print(f"lower: {time.time()-t0:.2f}s", flush=True)

t0 = time.time()
compiled = lowered.compile()
print(f"compile: {time.time()-t0:.2f}s", flush=True)

t0 = time.time()
out = compiled(flats)
np.asarray(out[0][0:1, 0:1])
print(f"first exec+fetch: {time.time()-t0:.2f}s", flush=True)

t0 = time.time()
out = compiled(flats)
np.asarray(out[0][0:1, 0:1])
print(f"second exec+fetch: {time.time()-t0:.2f}s", flush=True)

# executable serialization probe
try:
    from jax.experimental import serialize_executable as se
    t0 = time.time()
    payload = se.serialize(compiled)
    print(f"serialize_executable: {time.time()-t0:.2f}s, "
          f"{len(payload[0]) if isinstance(payload, tuple) else len(payload)}"
          " bytes-ish", flush=True)
except Exception as e:
    print(f"serialize_executable failed: {type(e).__name__}: {e}",
          flush=True)
