"""Time one folding-argument round (msm_many + fold) at prove shapes on TPU.

Round-1 profile baseline: samemsm round 331 ms, ipa round 228 ms at width 512
(device Horner included). This measures the host-combined window variant.
"""
import os, sys, time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, "/root/repo")

import random
from go_curdleproofs_tpu.ops import curve
from go_curdleproofs_tpu.utils import field_host as fh

random.seed(7)
n = int(os.environ.get("N", "512"))
k = 3
pts = [fh.g1_mul(fh.G1_GEN, random.randrange(1, fh.R)) for _ in range(16)]
vecs = [[pts[random.randrange(16)] for _ in range(n)] for _ in range(k)]
sv = curve.StackedVec.from_affine(vecs)

sc = [random.randrange(fh.R) for _ in range(n // 2)]
jobs = [[(b, sc, 0)] for b in range(k)] + [[(b, sc, n // 2)] for b in range(k)]

for it in range(3):
    t0 = time.time()
    res = sv.msm_many(jobs)
    t1 = time.time()
    f = sv.fold(12345)
    # force fold completion with a tiny fetch
    curve.to_affine_host_single(
        curve.pmap_coords(lambda t: t[0:1, 0], f.pv))
    t2 = time.time()
    print(f"iter{it}: msm_many(6 jobs) {1e3*(t1-t0):.1f} ms, "
          f"fold+sync {1e3*(t2-t1):.1f} ms", flush=True)

# correctness spot check
want = fh.g1_msm(vecs[0][: n // 2], sc)
assert res[0] == want, "msm_many mismatch"
print("correct")
