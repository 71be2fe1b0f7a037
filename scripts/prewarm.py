"""Prewarm the persistent executable cache for the shipped configuration.

Run once per machine/cache-dir (first compiles through the remote-TPU
tunnel cost minutes EACH — the backend defers real compilation to first
execution, see ops/exe_cache.py; cached executables reload in <1 s):

    python scripts/prewarm.py [ell ...]      # default: 508 124

Exercises one full prove + verify at each size, which compiles every
executable the prover (device-resident) and verifier dispatch. A full
`python bench.py` run covers the same set plus the batch-verification
shapes. Prewarm with CURDLE_RNS_KERNEL=1 as well to additionally
populate the fused Mosaic-kernel executables (20-30 min per shape)."""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from go_curdleproofs_tpu.models import curdleproof            # noqa: E402
from go_curdleproofs_tpu.utils.rand import Rand               # noqa: E402


def warm(ell: int) -> None:
    t0 = time.time()
    rand = Rand(0xC0FFEE)
    crs = curdleproof.generate_crs(ell, rand)
    Rs = rand.get_g1s(ell)
    Ss = rand.get_g1s(ell)
    r = Rand(0xBEEF)
    perm = r.generate_permutation(ell)
    k = r.get_fr()
    Ts, Us, M, rs_m = curdleproof.shuffle_permute_commit(
        crs.gs, crs.hs, Rs, Ss, perm, k, r)
    proof = curdleproof.prove(crs, Rs, Ss, Ts, Us, M, perm, k, rs_m, r)
    assert curdleproof.verify(proof, crs, Rs, Ss, Ts, Us, M, Rand(1))
    print(f"ell={ell}: warmed in {time.time() - t0:.1f}s", file=sys.stderr)


if __name__ == "__main__":
    sizes = [int(a) for a in sys.argv[1:]] or [508, 124]
    for e in sizes:
        warm(e)
