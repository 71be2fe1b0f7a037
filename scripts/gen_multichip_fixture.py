"""Generate the protocol-scale (ELL=124) whisk-proof fixture used by
__graft_entry__.dryrun_multichip's sharded batched verification.

Proving at ELL=124 takes minutes on a CPU backend (the dryrun host), so
the dryrun verifies pre-generated deterministic proofs instead; VERIFY is
cheap everywhere. Regenerate (on the TPU, ~seconds once warm) with:

    python scripts/gen_multichip_fixture.py

Output: tests/fixture_whisk_ell124.json
  { "crs_seed": ..., "instances": [ {"pre": [[rG,krG]...], "post": ...,
    "proof": hex }, ... ] }
The fixture is self-checking: dryrun re-verifies it through the full
stack, so a stale fixture fails loudly rather than silently passing.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from go_curdleproofs_tpu.models import whisk                    # noqa: E402
from go_curdleproofs_tpu.utils.rand import Rand                 # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "fixture_whisk_ell124.json")

CRS_SEED = 0xD124


def main():
    crs = whisk.curdleproof.generate_crs(whisk.ELL, Rand(CRS_SEED))
    instances = []
    for i in range(2):
        r = Rand(500 + i)
        pre = [whisk.WhiskTracker.from_points(r.get_g1(), r.get_g1())
               for _ in range(whisk.ELL)]
        post, proof_bytes = whisk.generate_whisk_shuffle_proof(crs, pre, r)
        instances.append({
            "pre": [[t.r_g.hex(), t.k_r_g.hex()] for t in pre],
            "post": [[t.r_g.hex(), t.k_r_g.hex()] for t in post],
            "proof": proof_bytes.hex(),
        })
    for inst in instances:      # sanity before writing
        pre = [whisk.WhiskTracker(bytes.fromhex(a), bytes.fromhex(b))
               for a, b in inst["pre"]]
        post = [whisk.WhiskTracker(bytes.fromhex(a), bytes.fromhex(b))
                for a, b in inst["post"]]
        assert whisk.is_valid_whisk_shuffle_proof(
            crs, pre, post, bytes.fromhex(inst["proof"]), Rand(1))
    with open(OUT, "w") as f:
        json.dump({"crs_seed": CRS_SEED, "ell": whisk.ELL,
                   "instances": instances}, f)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
