"""Probe 3: serialize the compiled Pallas executable to disk (arg1=save) or
load it in a fresh process (arg1=load) and time the first execution."""
import os
import pickle
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
import go_curdleproofs_tpu  # noqa: F401

import numpy as np

from jax.experimental import serialize_executable as se
from go_curdleproofs_tpu.ops import rns, rns_kernels

PATH = "/tmp/probe_exe.pkl"

a = rns.from_ints([123 + i for i in range(256)])
b = rns.from_ints([456 + i for i in range(256)])
flats = [a.ch, b.ch]

fn = rns_kernels._fused_call("mul", (a.bound, b.bound), 2, 1,
                             lambda F, vals: [F.mont_mul(vals[0], vals[1])],
                             False)

if sys.argv[1] == "save":
    compiled = fn.lower(flats).compile()
    t0 = time.time()
    out = compiled(flats)
    np.asarray(out[0][0:1, 0:1])
    print(f"first exec (save process): {time.time()-t0:.2f}s", flush=True)
    payload = se.serialize(compiled)
    with open(PATH, "wb") as f:
        pickle.dump(payload, f)
    print(f"saved {os.path.getsize(PATH)} bytes", flush=True)
else:
    with open(PATH, "rb") as f:
        payload = pickle.load(f)
    t0 = time.time()
    compiled = se.deserialize_and_load(*payload)
    print(f"deserialize_and_load: {time.time()-t0:.2f}s", flush=True)
    t0 = time.time()
    out = compiled(flats)
    np.asarray(out[0][0:1, 0:1])
    print(f"first exec (load process): {time.time()-t0:.2f}s", flush=True)
    expect = rns_kernels.mont_mul(a, b, interpret=True)
    ok = np.allclose(np.asarray(out[0]), np.asarray(expect.ch))
    print(f"matches interpret-mode result: {ok}", flush=True)
