"""Mid-size CPU protocol test (VERDICT r4 #8): ell=28, n=32 — five folding
rounds in both recursions, exercising recursion depth >= 4 and the
non-canonical wire size arithmetic that the toy ell=4 suite cannot reach
(the full ELL=124 path runs on TPU via bench.py).
"""

import io

from go_curdleproofs_tpu.models import curdleproof, whisk
from go_curdleproofs_tpu.utils.rand import Rand

ELL = 28  # n = 32 -> log2(n) = 5 folding rounds


def test_midsize_prove_verify_roundtrip():
    rand = Rand(0x31D)
    crs = curdleproof.generate_crs(ELL, rand)
    Rs = rand.get_g1s(ELL)
    Ss = rand.get_g1s(ELL)
    perm = rand.generate_permutation(ELL)
    k = rand.get_fr()
    Ts, Us, M, rs_m = curdleproof.shuffle_permute_commit(
        crs.gs, crs.hs, Rs, Ss, perm, k, rand)
    proof = curdleproof.prove(crs, Rs, Ss, Ts, Us, M, perm, k, rs_m, rand)

    # five rounds of both folding recursions (1 << 5 == 32 == ELL + 4)
    assert len(proof.proof_same_multiscalar.l_a) == 5
    assert len(proof.proof_same_permutation.gpa_proof.ipa_proof.l_cs) == 5

    assert curdleproof.verify(proof, crs, Rs, Ss, Ts, Us, M, Rand(1))

    # wire round-trip + the size arithmetic at a non-canonical ell
    data = whisk.WhiskShuffleProof(M, proof).serialize()
    assert len(data) == whisk.expected_shuffle_proof_size(ELL)
    rt = whisk.WhiskShuffleProof.from_bytes(data)
    buf2 = io.BytesIO()
    rt.proof.serialize(buf2)
    buf1 = io.BytesIO()
    proof.serialize(buf1)
    assert buf1.getvalue() == buf2.getvalue()

    # soundness at depth 5: a tampered fold cross-term must kill the proof
    bad = whisk.WhiskShuffleProof.from_bytes(data)
    bad.proof.proof_same_multiscalar.l_a[3] = \
        bad.proof.proof_same_multiscalar.r_a[3]
    assert not curdleproof.verify(bad.proof, crs, Rs, Ss, Ts, Us, M, Rand(2))
