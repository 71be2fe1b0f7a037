"""RNS Montgomery core: exactness vs python ints + TPU throughput/latency."""
import os, sys, time, random
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, "/root/repo")
from go_curdleproofs_tpu.ops import rns
from go_curdleproofs_tpu.utils.field_host import P

random.seed(12)
N = int(os.environ.get("N", "4096"))
xs = [random.randrange(P) for _ in range(N)]
ys = [random.randrange(P) for _ in range(N)]
# edge values
xs[:6] = [0, 1, P - 1, P - 2, 2, (P + 1) // 2]
ys[:6] = [0, P - 1, P - 1, 1, (P - 1) // 2, 2]

a = rns.from_ints(xs)
b = rns.from_ints(ys)

# single mul
c = rns.mont_mul(a, b)
got = rns.to_ints(c)
want = [x * y % P for x, y in zip(xs, ys)]
assert got == want, f"mont_mul mismatch at {[i for i,(g,w) in enumerate(zip(got,want)) if g!=w][:5]}"
print("mont_mul exact on", N, "lanes")

# chain: mul, add, sub, mul_small interleaved (tracks bounds)
def chain(u, v):
    x, y = u, v
    for i in range(8):
        t = rns.mont_mul(x, y)
        s = rns.add(t, rns.mul_small(x, 12))
        d = rns.sub(s, t)
        x = rns.mont_mul(d, rns.add(t, t))
        y = rns.squash(rns.add(y, t))
    return x

cj = jax.jit(chain)
got2 = rns.to_ints(cj(a, b))

def ref_chain(x, y):
    for i in range(8):
        t = x * y % P
        s = (t + 12 * x) % P
        d = (s - t) % P
        x = d * (2 * t) % P
        y = (y + t) % P
    return x

want2 = [ref_chain(x, y) for x, y in zip(xs, ys)]
assert got2 == want2, "chain mismatch"
print("mixed-op chain exact")

# RCB16 add formula in RNS vs host ECC
from go_curdleproofs_tpu.utils import field_host as fh
pts = [fh.g1_mul(fh.G1_GEN, random.randrange(1, fh.R)) for _ in range(256)]
qts = [fh.g1_mul(fh.G1_GEN, random.randrange(1, fh.R)) for _ in range(256)]

def rcb_add(x1, y1, z1, x2, y2, z2):
    mul, add, sub, ms = rns.mont_mul, rns.add, rns.sub, rns.mul_small
    t0 = mul(x1, x2); t1 = mul(y1, y2); t2 = mul(z1, z2)
    m4 = mul(add(x1, y1), add(x2, y2))
    m5 = mul(add(y1, z1), add(y2, z2))
    m6 = mul(add(x1, z1), add(x2, z2))
    t3 = sub(m4, add(t0, t1)); t4 = sub(m5, add(t1, t2))
    y3 = sub(m6, add(t0, t2))
    t0_3 = add(add(t0, t0), t0)
    t2b = ms(t2, 12)
    z3 = add(t1, t2b); t1m = sub(t1, t2b); y3b = ms(y3, 12)
    x3 = sub(mul(t3, t1m), mul(t4, y3b))
    y3o = add(mul(t1m, z3), mul(y3b, t0_3))
    z3o = add(mul(z3, t4), mul(t0_3, t3))
    return x3, y3o, z3o

px = rns.from_ints([p[0] for p in pts]); py = rns.from_ints([p[1] for p in pts])
pz = rns.from_ints([1] * 256)
qx = rns.from_ints([q[0] for q in qts]); qy = rns.from_ints([q[1] for q in qts])
qz = rns.from_ints([1] * 256)
X, Y, Z = jax.jit(rcb_add)(px, py, pz, qx, qy, qz)
xi, yi, zi = rns.to_ints(X), rns.to_ints(Y), rns.to_ints(Z)
for i in range(256):
    zinv = pow(zi[i], P - 2, P)
    got_pt = (xi[i] * zinv % P, yi[i] * zinv % P)
    assert got_pt == fh.g1_add(pts[i], qts[i]), f"rcb add mismatch @{i}"
print("RCB16 add in RNS matches host ECC on 256 points")

# -- perf ---------------------------------------------------------------------
def _sync(out):
    np.asarray(jax.tree.leaves(out)[0].ravel()[0:1])

def timeit(name, fn, *args, per=1, reps=4):
    out = fn(*args); _sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args); _sync(out)
        ts.append(time.perf_counter() - t0)
    t = min(ts) - FETCH
    print(f"{name:<30} {t*1e3/per:9.3f} ms/op   {t/per/args[0].ch.shape[0]*1e9:7.1f} ns/lane")

noop = jax.jit(lambda u: rns.RElem(u.ch + 1.0, u.bound))
_sync(noop(a)); ts = []
for _ in range(5):
    t0 = time.perf_counter(); _sync(noop(a)); ts.append(time.perf_counter() - t0)
FETCH = min(ts)
print(f"fetch floor {FETCH*1e3:.1f} ms")

K = 32
def mulchain(u, v):
    x = u
    for _ in range(K):
        x = rns.mont_mul(x, v)
    return x
timeit(f"mont_mul chain x{K} (N={N})", jax.jit(mulchain), a, b, per=K)

# wide batch
M = 1 << 16
aw = rns.RElem(jnp.tile(a.ch, (M // N, 1)), 1)
bw = rns.RElem(jnp.tile(b.ch, (M // N, 1)), 1)
timeit(f"mont_mul chain x{K} (N={M})", jax.jit(mulchain), aw, bw, per=K)
