import os, sys, random
os.environ["CURDLE_FP"] = os.environ.get("CURDLE_FP", "rns")
os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, "/root/repo")
from go_curdleproofs_tpu.ops import curve
from go_curdleproofs_tpu.utils import field_host as fh

random.seed(13)
n = 16
pts = [fh.g1_mul(fh.G1_GEN, random.randrange(1, fh.R)) for _ in range(n)]
sc = [random.randrange(fh.R) for _ in range(n)]

# msm
got = curve.msm(pts, sc)
want = None
for p, s in zip(pts, sc):
    want = fh.g1_add(want, fh.g1_mul(p, s))
assert got == want, "msm mismatch"
print("msm ok")

# batch scalar mul
outs = curve.batch_scalar_mul(pts, sc)
assert outs == [fh.g1_mul(p, s) for p, s in zip(pts, sc)], "smul mismatch"
print("batch_scalar_mul ok")

# stacked msm_many + fold
sv = curve.StackedVec.from_affine([pts, pts[::-1]])
res = sv.msm_many([[(0, sc, 0)], [(1, sc, 0)]])
w2 = None
for p, s in zip(pts[::-1], sc):
    w2 = fh.g1_add(w2, fh.g1_mul(p, s))
assert res == [want, w2], "msm_many mismatch"
print("msm_many ok")

f = sv.fold(5)
fa = curve.to_affine_host(f.pv)[:8]
expect = [fh.g1_add(pts[i], fh.g1_mul(pts[i + 8], 5)) for i in range(8)]
assert fa == expect, "fold mismatch"
print("fold ok")
