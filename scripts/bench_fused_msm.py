"""Fused-MSM path timing on the TPU: msm_many steady state + correctness
spot-check vs host oracle."""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import random
import sys

sys.path.insert(0, "/root/repo")
import jax

from go_curdleproofs_tpu.ops import curve
from go_curdleproofs_tpu.utils import field_host as fh

print("backend:", jax.default_backend(), "rns_kernel:", curve._rns_kernel(),
      flush=True)

random.seed(7)
base = [fh.g1_mul(fh.G1_GEN, random.randrange(1, fh.R)) for _ in range(16)]
vec = [base[i % 16] for i in range(512)]
sv = curve.StackedVec.from_affine([vec, vec], pad_to=512)
sc = [random.randrange(fh.R) for _ in range(512)]
jobs = [[(0, sc, 0)], [(1, sc, 0)], [(0, sc, 0)], [(1, sc, 0)]]

t0 = time.time()
out = sv.msm_many(jobs)
print(f"msm_many cold (compile): {time.time()-t0:.1f}s", flush=True)

# correctness vs oracle (spot check job 0)
want = fh.g1_msm(vec, sc)
assert out[0] == want and out[1] == want, "fused msm mismatch!"
print("correctness ok", flush=True)

t0 = time.time()
for _ in range(5):
    sv.msm_many(jobs)
print(f"msm_many 4 jobs n=512 steady: {(time.time()-t0)/5*1e3:.2f} ms",
      flush=True)

# single-job (verifier final MSM shape): n=2048
vec2 = [base[i % 16] for i in range(1500)]
sc2 = [random.randrange(fh.R) for _ in range(1500)]
t0 = time.time()
r = curve.msm(vec2, sc2)
print(f"msm n=1500 cold: {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
for _ in range(3):
    curve.msm(vec2, sc2)
print(f"msm n=1500 steady: {(time.time()-t0)/3*1e3:.2f} ms", flush=True)
