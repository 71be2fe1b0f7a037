"""Roofline sanity: HBM bandwidth, VPU FMA throughput, pallas mul chain,
XLA elementwise chain — all synced with a real 1-element fetch.
"""
import os, sys, time, random
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, "/root/repo")
from go_curdleproofs_tpu.ops import fp, pallas_field
from go_curdleproofs_tpu.utils.field_host import P

def sync(x):
    np.asarray(jax.tree.leaves(x)[0].ravel()[:1])

def bench(name, fn, *args, reps=5, work=None):
    out = fn(*args); sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); out = fn(*args); sync(out)
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    extra = f"  {work(t):10.1f}" if work else ""
    print(f"{name:<40} {t*1e3:9.2f} ms{extra}", flush=True)
    return t

# 0) pure fetch latency
z1 = jnp.zeros((8, 128), jnp.float32)
bench("fetch-only (tiny)", jax.jit(lambda x: x + 1.0), z1)

# 1) HBM bandwidth: big copy-scale, 256MB in+out
big = jnp.zeros((64, 1024, 1024), jnp.float32)  # 256 MB
t = bench("hbm: x*1.0001 (256MB r+w)", jax.jit(lambda x: x * 1.0001), big,
          work=lambda t: 2 * big.nbytes / t / 1e9)
print(f"   -> HBM ~{2*big.nbytes/t/1e9:.0f} GB/s")

# 2) VPU FMA peak probe: K dependent FMAs on a VMEM-sized array
a = jnp.ones((512, 1024), jnp.float32)
K = 512
def fmachain(x):
    acc = x
    for i in range(K):
        acc = acc * 1.000001 + x
    return acc
t = bench(f"vpu: {K} dep FMAs on 2MB", jax.jit(fmachain), a,
          work=lambda t: K * a.size * 2 / t / 1e12)
print(f"   -> VPU ~{K*a.size*2/t/1e12:.2f} TFLOP/s (dep chain)")

# 3) pallas fused mul: chain of 16 dependent muls at 32k lanes
random.seed(7)
N = 1 << 15
xs = [random.randrange(P) for _ in range(N)]
a_e = fp.carry_to(fp.from_ints(xs), fp.REDUCED)
b_e = fp.carry_to(fp.from_ints(xs[::-1]), fp.REDUCED)
KM = 16
def mulchain(u, v):
    acc = u
    for _ in range(KM):
        acc = pallas_field.mul(acc, v)
    return acc.limbs
t1 = bench("pallas mul x2  (32k lanes)",
           jax.jit(lambda u, v: pallas_field.mul(pallas_field.mul(u, v), v).limbs), a_e, b_e)
t2 = bench(f"pallas mul x{KM} (32k lanes)", jax.jit(mulchain), a_e, b_e)
per = (t2 - t1) / (KM - 2)
print(f"   -> per pallas mul: {per*1e3:.3f} ms; conv "
      f"{N*49*99*2/per/1e12:.2f} TFLOP/s-equiv")

# 4) XLA mul chain (no pallas) for comparison
from go_curdleproofs_tpu.ops import limb_field as lf
def xmulchain(u, v):
    acc = u
    for _ in range(KM):
        acc = lf.Field.mul(fp.field, acc, v)
    return acc.limbs
t1 = bench("xla mul x2  (32k lanes)",
           jax.jit(lambda u, v: lf.Field.mul(fp.field, lf.Field.mul(fp.field, u, v), v).limbs), a_e, b_e)
t2 = bench(f"xla mul x{KM} (32k lanes)", jax.jit(xmulchain), a_e, b_e)
per = (t2 - t1) / (KM - 2)
print(f"   -> per xla mul: {per*1e3:.3f} ms")
