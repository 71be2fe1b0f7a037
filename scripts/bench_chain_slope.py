"""Per-point-op cost via chain-length slope (immune to fetch-latency and
block_until_ready artifacts): time jitted chains of K dependent adds for
two K values and report (t(K2)-t(K1))/(K2-K1), synced by a 1-element fetch.
"""
import os, sys, time, random
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, "/root/repo")
from go_curdleproofs_tpu.ops import field_backend as fp
from go_curdleproofs_tpu.ops import curve, pallas_point
from go_curdleproofs_tpu.utils.field_host import P

random.seed(5)


def mkpt(n):
    xs = [random.randrange(P) for _ in range(n)]
    ys = [random.randrange(P) for _ in range(n)]
    zs = [random.randrange(P) for _ in range(n)]
    return curve.PointVec(fp.carry_to(fp.from_ints(xs), fp.REDUCED),
                          fp.carry_to(fp.from_ints(ys), fp.REDUCED),
                          fp.carry_to(fp.from_ints(zs), fp.REDUCED))


def chain(k, impl):
    def f(p, q):
        for _ in range(k):
            p = impl(p, q)
        return p.x.limbs
    return jax.jit(f)


def run(fn, p, q, reps):
    out = fn(p, q)
    np.asarray(out.ravel()[:1])          # compile + settle
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(p, q)
        np.asarray(out.ravel()[:1])      # force a real device sync
        ts.append(time.perf_counter() - t0)
    return min(ts)


K1, K2 = 4, 20
for lanes in (512, 4096, 32768, 98304):
    p, q = mkpt(lanes), mkpt(lanes)
    for name, impl in (("xla", curve.add), ("pallas", pallas_point.add)):
        t1 = run(chain(K1, impl), p, q, 3)
        t2 = run(chain(K2, impl), p, q, 3)
        per = (t2 - t1) / (K2 - K1)
        print(f"lanes={lanes:<7} {name:<7} t({K1})={t1*1e3:8.2f}ms "
              f"t({K2})={t2*1e3:8.2f}ms  per-add={per*1e3:7.3f}ms "
              f"({lanes/per/1e6:7.1f} M addlanes/s)", flush=True)
