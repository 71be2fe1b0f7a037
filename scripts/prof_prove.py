"""Span-profile ONE steady-state n=508 prove (warmup excluded)."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ["CURDLE_PROFILE"] = "1"
sys.path.insert(0, "/root/repo")
import jax

from go_curdleproofs_tpu.models import curdleproof
from go_curdleproofs_tpu.utils.rand import Rand
from go_curdleproofs_tpu.utils import profiling

ell = int(os.environ.get("BENCH_ELL", "508"))
rand = Rand(0xC0FFEE)
crs = curdleproof.generate_crs(ell, rand)
Rs = rand.get_g1s(ell)
Ss = rand.get_g1s(ell)

def one_prove():
    r = Rand(0xBEEF)
    perm = r.generate_permutation(ell)
    k = r.get_fr()
    Ts, Us, M, rs_m = curdleproof.shuffle_permute_commit(
        crs.gs, crs.hs, Rs, Ss, perm, k, r)
    proof = curdleproof.prove(crs, Rs, Ss, Ts, Us, M, perm, k, rs_m, r)
    return proof

t0 = time.time()
one_prove()
print(f"warmup: {time.time()-t0:.1f}s", file=sys.stderr)

profiling.reset()
t0 = time.time()
one_prove()
dt = time.time() - t0
print(f"steady prove: {dt*1e3:.1f} ms", file=sys.stderr)
print(profiling.report(), file=sys.stderr)
