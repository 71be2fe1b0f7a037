import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ["CURDLE_PROFILE"] = "1"
sys.path.insert(0, "/root/repo")
from go_curdleproofs_tpu.models import curdleproof
from go_curdleproofs_tpu.utils.rand import Rand
from go_curdleproofs_tpu.utils import profiling

ell = 508
rand = Rand(0xC0FFEE)
crs = curdleproof.generate_crs(ell, rand)
Rs = rand.get_g1s(ell); Ss = rand.get_g1s(ell)
r = Rand(0xBEEF)
perm = r.generate_permutation(ell); k = r.get_fr()
Ts, Us, M, rs_m = curdleproof.shuffle_permute_commit(crs.gs, crs.hs, Rs, Ss, perm, k, r)
proof = curdleproof.prove(crs, Rs, Ss, Ts, Us, M, perm, k, rs_m, r)
print("prove done", flush=True)
assert curdleproof.verify(proof, crs, Rs, Ss, Ts, Us, M, Rand(1))
profiling.reset()
t0 = time.time()
assert curdleproof.verify(proof, crs, Rs, Ss, Ts, Us, M, Rand(2))
print(f"steady verify: {(time.time()-t0)*1e3:.1f} ms", flush=True)
print(profiling.report(), flush=True)
