"""Headline benchmark: full Curdleproofs shuffle prove for n=508 elements.

Baseline (BASELINE.md): jsign/go-curdleproofs proves 508 shuffled elements in
412.5 ms/op on a Ryzen 7 3800XT. The driver runs this on one real TPU chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

BASELINE_PROVE_508_MS = 412.5


def main():
    ell = int(os.environ.get("BENCH_ELL", "508"))
    from go_curdleproofs_tpu.models import curdleproof
    from go_curdleproofs_tpu.utils.rand import Rand

    rand = Rand(0xC0FFEE)
    t0 = time.time()
    crs = curdleproof.generate_crs(ell, rand)
    Rs = rand.get_g1s(ell)
    Ss = rand.get_g1s(ell)
    print(f"# setup (crs + instance): {time.time()-t0:.1f}s", file=sys.stderr)

    def one_prove():
        r = Rand(0xBEEF)
        perm = r.generate_permutation(ell)
        k = r.get_fr()
        Ts, Us, M, rs_m = curdleproof.shuffle_permute_commit(
            crs.gs, crs.hs, Rs, Ss, perm, k, r)
        proof = curdleproof.prove(crs, Rs, Ss, Ts, Us, M, perm, k, rs_m, r)
        return Ts, Us, M, proof

    # warmup (compiles)
    t0 = time.time()
    Ts, Us, M, proof = one_prove()
    print(f"# warmup prove (incl. compile): {time.time()-t0:.1f}s",
          file=sys.stderr)

    # verify correctness + steady-state timing (first call pays compiles)
    t0 = time.time()
    ok = curdleproof.verify(proof, crs, Rs, Ss, Ts, Us, M, Rand(1))
    verify_s = time.time() - t0
    assert ok, "benchmark proof failed to verify"
    print(f"# verify (cold, incl. compiles): {verify_s*1e3:.1f} ms",
          file=sys.stderr)
    t0 = time.time()
    assert curdleproof.verify(proof, crs, Rs, Ss, Ts, Us, M, Rand(2))
    print(f"# verify (steady): {(time.time()-t0)*1e3:.1f} ms", file=sys.stderr)

    # timed proves
    reps = int(os.environ.get("BENCH_REPS", "3"))
    times = []
    for _ in range(reps):
        t0 = time.time()
        one_prove()
        times.append(time.time() - t0)
    best_ms = min(times) * 1e3
    print(f"# prove times (ms): {[round(t*1e3,1) for t in times]}",
          file=sys.stderr)

    from go_curdleproofs_tpu.utils import profiling
    if profiling.ENABLED:
        print(profiling.report(), file=sys.stderr)

    print(json.dumps({
        "metric": f"shuffle_prove_n{ell}_latency",
        "value": round(best_ms, 2),
        "unit": "ms",
        "vs_baseline": round(BASELINE_PROVE_508_MS / best_ms, 4),
    }))


if __name__ == "__main__":
    main()
