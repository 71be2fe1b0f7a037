"""Generate golden end-to-end vectors: serialized CRS, FS challenges, full
proof bytes for fixed seeds. Frozen into tests/golden_vectors.json; the
regression test (tests/test_golden.py) re-proves with the same seeds and
demands byte equality (VERDICT r1 item 5: any perf refactor must not be able
to silently break the wire format / transcript math).
"""
import hashlib
import io
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

from go_curdleproofs_tpu.models import curdleproof, whisk
from go_curdleproofs_tpu.utils import codec
from go_curdleproofs_tpu.utils import field_host as fh
from go_curdleproofs_tpu.utils.rand import Rand

out = {"description": "golden vectors: fixed-seed proofs, byte-frozen",
       "shuffle": [], "whisk": {}, "tracker": {}}

for ell, crs_seed, inst_seed, prove_seed in [(12, 0xA0, 0xB0, 0xC0),
                                             (60, 0xA1, 0xB1, 0xC1)]:
    crs = curdleproof.generate_crs(ell, Rand(crs_seed))
    crs_blob = b"".join(codec.g1_to_bytes(p)
                        for p in crs.gs + crs.hs + [crs.h, crs.gt, crs.gu,
                                                    crs.gsum, crs.hsum])
    r = Rand(inst_seed)
    Rs = r.get_g1s(ell)
    Ss = r.get_g1s(ell)
    rp = Rand(prove_seed)
    perm = rp.generate_permutation(ell)
    k = rp.get_fr()
    Ts, Us, M, rs_m = curdleproof.shuffle_permute_commit(
        crs.gs, crs.hs, Rs, Ss, perm, k, rp)
    proof = curdleproof.prove(crs, Rs, Ss, Ts, Us, M, perm, k, rs_m, rp)
    buf = io.BytesIO()
    proof.serialize(buf)
    pb = buf.getvalue()
    assert curdleproof.verify(proof, crs, Rs, Ss, Ts, Us, M, Rand(1))
    out["shuffle"].append({
        "ell": ell, "crs_seed": crs_seed, "inst_seed": inst_seed,
        "prove_seed": prove_seed,
        "crs_sha256": hashlib.sha256(crs_blob).hexdigest(),
        "m_hex": codec.g1_to_bytes(M).hex(),
        "proof_hex": pb.hex(),
    })
    print(f"ell={ell}: proof {len(pb)} bytes "
          f"sha256={hashlib.sha256(pb).hexdigest()[:16]}", flush=True)

# whisk shuffle proof (public API surface, ELL=12-sized CRS reused)
crs = curdleproof.generate_crs(12, Rand(0xA0))
r = Rand(0xD0)
trackers = []
for _ in range(12):
    rr = r.get_fr()
    kk = r.get_fr()
    trackers.append(whisk.WhiskTracker.from_points(
        fh.g1_mul(fh.G1_GEN, rr), fh.g1_mul(fh.G1_GEN, rr * kk % fh.R)))
post, wproof = whisk.generate_whisk_shuffle_proof(crs, trackers, Rand(0xE0))
assert whisk.is_valid_whisk_shuffle_proof(crs, trackers, post, wproof,
                                          Rand(2))
out["whisk"] = {
    "ell": 12, "crs_seed": 0xA0, "tracker_seed": 0xD0, "prove_seed": 0xE0,
    "post_trackers_hex": "".join((t.r_g + t.k_r_g).hex() for t in post),
    "proof_hex": wproof.hex(),
}
print(f"whisk: proof {len(wproof)} bytes", flush=True)

# tracker proof (128 bytes, Schnorr dleq)
k = 0x1234567890ABCDEF
rG = fh.g1_mul(fh.G1_GEN, 777)
krG = fh.g1_mul(rG, k)
tracker = whisk.WhiskTracker.from_points(rG, krG)
k_comm = codec.g1_to_bytes(fh.g1_mul(fh.G1_GEN, k))
tp = whisk.generate_whisk_tracker_proof(tracker, k, Rand(0xF0))
assert whisk.is_valid_whisk_tracker_proof(tracker, k_comm, tp)
out["tracker"] = {"k": hex(k), "r": 777, "rand_seed": 0xF0,
                  "proof_hex": tp.hex()}
print(f"tracker: proof {len(tp)} bytes", flush=True)

path = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "golden_vectors.json")
with open(path, "w") as f:
    json.dump(out, f, indent=1)
print("wrote", path)
