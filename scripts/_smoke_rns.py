import os, sys, random
os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, "/root/repo")
from go_curdleproofs_tpu.ops import rns
from go_curdleproofs_tpu.utils.field_host import P
random.seed(1)
xs = [random.randrange(P) for _ in range(64)]
ys = [random.randrange(P) for _ in range(64)]
xs[:3] = [0, 1, P-1]; ys[:3] = [0, P-1, P-1]
a = rns.from_ints(xs); b = rns.from_ints(ys)
got = rns.to_ints(rns.mont_mul(a, b))
want = [x*y % P for x, y in zip(xs, ys)]
print("match:", got == want)
print("bad:", [i for i,(g,w) in enumerate(zip(got,want)) if g != w][:5])
