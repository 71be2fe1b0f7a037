"""End-to-end drive at the public Whisk surface on the live backend.

Generates a shuffle proof through the top-level API, verifies it, checks the
wire size, and probes: tampered proof bytes must be rejected; CURDLE_PALLAS
on/off must produce byte-identical proofs (pass mode as argv[1])."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
if len(sys.argv) > 1:
    os.environ["CURDLE_PALLAS"] = sys.argv[1]
sys.path.insert(0, "/root/repo")

from go_curdleproofs_tpu.models import curdleproof, whisk
from go_curdleproofs_tpu.utils.rand import Rand
from go_curdleproofs_tpu.utils import codec
from go_curdleproofs_tpu.utils import field_host as fh

ELL = int(os.environ.get("ELL", "60"))
rand = Rand(11)
crs = curdleproof.generate_crs(ELL, rand)

# build ELL trackers (r*G, k_r*G) through the public codec
trackers = []
for i in range(ELL):
    r = rand.get_fr()
    kr = rand.get_fr()
    rg = fh.g1_mul(fh.G1_GEN, r)
    krg = fh.g1_mul(fh.G1_GEN, (r * kr) % fh.R)
    trackers.append(whisk.WhiskTracker.from_points(rg, krg))

t0 = time.time()
post, proof_bytes = whisk.generate_whisk_shuffle_proof(crs, trackers, Rand(42))
print(f"prove: {time.time()-t0:.1f}s; proof={len(proof_bytes)} bytes "
      f"(expected {whisk.expected_shuffle_proof_size(ELL)})")
assert len(proof_bytes) == whisk.expected_shuffle_proof_size(ELL)

t0 = time.time()
ok = whisk.is_valid_whisk_shuffle_proof(crs, trackers, post, proof_bytes,
                                        Rand(7))
print(f"verify: {time.time()-t0:.1f}s -> {ok}")
assert ok, "valid proof rejected"

# probe 1: flip one byte in the middle of the proof -> must reject
bad = bytearray(proof_bytes)
bad[len(bad) // 2] ^= 0x01
try:
    bad_ok = whisk.is_valid_whisk_shuffle_proof(crs, trackers, post,
                                                bytes(bad), Rand(7))
except Exception as e:
    bad_ok = f"rejected with {type(e).__name__}: {e}"
print(f"tampered proof -> {bad_ok}")
assert bad_ok is not True

# probe 2: shuffled trackers swapped -> must reject
try:
    swap_ok = whisk.is_valid_whisk_shuffle_proof(crs, post, trackers,
                                                 proof_bytes, Rand(7))
except Exception as e:
    swap_ok = f"rejected with {type(e).__name__}"
print(f"swapped pre/post -> {swap_ok}")
assert swap_ok is not True

import hashlib
print("proof sha256:", hashlib.sha256(proof_bytes).hexdigest())
