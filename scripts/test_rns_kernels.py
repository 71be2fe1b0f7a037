"""Correctness of the fused RNS Pallas kernels vs host oracle + rns.py.

Run on CPU (interpret mode) or TPU (real kernels):
  JAX_PLATFORMS=cpu python scripts/test_rns_kernels.py
  python scripts/test_rns_kernels.py
"""
import os, sys, random
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, numpy as np
sys.path.insert(0, "/root/repo")
from go_curdleproofs_tpu.ops import rns, rns_kernels
from go_curdleproofs_tpu.utils import field_host as fh
from go_curdleproofs_tpu.utils.field_host import P

INTERP = jax.default_backend() == "cpu"
random.seed(31)
N = 300   # deliberately not a BLOCK multiple (tests padding)

xs = [random.randrange(P) for _ in range(N)]
ys = [random.randrange(P) for _ in range(N)]
xs[:6] = [0, 1, P - 1, P - 2, 2, (P + 1) // 2]
ys[:6] = [0, P - 1, P - 1, 1, (P - 1) // 2, 2]
a = rns.from_ints(xs)
b = rns.from_ints(ys)

got = rns.to_ints(rns_kernels.mont_mul(a, b, interpret=INTERP))
want = [x * y % P for x, y in zip(xs, ys)]
assert got == want, "fused mont_mul mismatch"
print("fused mont_mul exact on", N, "lanes")

# points (incl. infinity and equal-point lanes -> exercises completeness)
from go_curdleproofs_tpu.ops import field_backend
assert field_backend.BACKEND == "rns", "run with CURDLE_FP unset/rns"
from go_curdleproofs_tpu.ops import curve

M = 100
pts = [fh.g1_mul(fh.G1_GEN, random.randrange(1, fh.R)) for _ in range(M)]
qts = [fh.g1_mul(fh.G1_GEN, random.randrange(1, fh.R)) for _ in range(M)]
pts[0] = None                      # infinity + finite
qts[1] = None                      # finite + infinity
pts[2] = None; qts[2] = None       # infinity + infinity
qts[3] = pts[3]                    # doubling case through add
qts[4] = (pts[4][0], (P - pts[4][1]) % P)   # inverse pair -> infinity
pv = curve.from_affine_host(pts)
qv = curve.from_affine_host(qts)

got_add = curve.to_affine_host(rns_kernels.point_add(pv, qv, interpret=INTERP))
want_add = [fh.g1_add(p, q) for p, q in zip(pts, qts)]
assert got_add == want_add, "fused point_add mismatch"
print("fused point_add matches host oracle on", M, "lanes (edge cases incl.)")

got_dbl = curve.to_affine_host(rns_kernels.point_double(pv, interpret=INTERP))
want_dbl = [fh.g1_add(p, p) for p in pts]
assert got_dbl == want_dbl, "fused point_double mismatch"
print("fused point_double matches host oracle")

# bound-6 inputs (REDUCED contract: outputs of a previous add)
r2 = rns_kernels.point_add(rns_kernels.point_add(pv, qv, interpret=INTERP),
                           rns_kernels.point_double(qv, interpret=INTERP),
                           interpret=INTERP)
want2 = [fh.g1_add(fh.g1_add(p, q), fh.g1_add(q, q))
         for p, q in zip(pts, qts)]
assert curve.to_affine_host(r2) == want2, "chained bound-6 add mismatch"
print("chained bound-6 adds exact")
print("ALL OK")
