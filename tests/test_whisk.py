"""Whisk protocol layer tests: tracker proofs, shuffle proofs, and the full
SSLE lifecycle (mirrors /root/reference/whisk/whisk_test.go:58-90's
State/Block processing at a CPU-friendly size).
"""

import pytest

from go_curdleproofs_tpu.models import curdleproof, whisk
from go_curdleproofs_tpu.utils import codec
from go_curdleproofs_tpu.utils import field_host as fh
from go_curdleproofs_tpu.utils.rand import Rand

ELL_TEST = 4  # n = 8; Whisk production uses ELL=124 (n=128) — bench covers it


def make_tracker(rand: Rand, k: int) -> whisk.WhiskTracker:
    r = rand.get_fr()
    r_g = fh.g1_mul(fh.G1_GEN, r)
    k_r_g = fh.g1_mul(r_g, k)
    return whisk.WhiskTracker.from_points(r_g, k_r_g)


def test_constants_match_reference():
    assert whisk.N == 128
    assert whisk.ELL == 124
    assert whisk.TRACKER_PROOF_SIZE == 128
    assert whisk.WHISK_SHUFFLE_PROOF_SIZE == 4576
    assert whisk.expected_shuffle_proof_size(whisk.ELL) == 4576


def test_tracker_proof_roundtrip():
    rand = Rand(0)
    k = rand.get_fr()
    tracker = make_tracker(rand, k)
    k_comm = codec.g1_to_bytes(fh.g1_mul(fh.G1_GEN, k))
    proof = whisk.generate_whisk_tracker_proof(tracker, k, rand)
    assert len(proof) == whisk.TRACKER_PROOF_SIZE
    assert whisk.is_valid_whisk_tracker_proof(tracker, k_comm, proof)


def test_tracker_proof_wrong_k_fails():
    rand = Rand(1)
    k = rand.get_fr()
    tracker = make_tracker(rand, k)
    k_comm = codec.g1_to_bytes(fh.g1_mul(fh.G1_GEN, (k + 1) % fh.R))
    proof = whisk.generate_whisk_tracker_proof(tracker, k, rand)
    assert not whisk.is_valid_whisk_tracker_proof(tracker, k_comm, proof)


@pytest.fixture(scope="module")
def shuffle_instance():
    rand = Rand(2)
    crs = curdleproof.generate_crs(ELL_TEST, rand)
    trackers = [make_tracker(rand, rand.get_fr()) for _ in range(ELL_TEST)]
    post, proof_bytes = whisk.generate_whisk_shuffle_proof(crs, trackers, rand)
    return rand, crs, trackers, post, proof_bytes


def test_shuffle_proof_roundtrip(shuffle_instance):
    rand, crs, trackers, post, proof_bytes = shuffle_instance
    assert len(proof_bytes) == whisk.expected_shuffle_proof_size(ELL_TEST)
    assert whisk.is_valid_whisk_shuffle_proof(crs, trackers, post,
                                              proof_bytes, rand)
    # tampering with the post-state must fail
    bad_post = list(post)
    bad_post[0], bad_post[1] = bad_post[1], bad_post[0]
    assert not whisk.is_valid_whisk_shuffle_proof(crs, trackers, bad_post,
                                                  proof_bytes, rand)


def test_shuffle_proof_malformed_bytes_return_false(shuffle_instance):
    """Attacker-supplied malformed bytes must yield False, never raise
    (the reference returns (false, err), whisk/whisk.go:20-61)."""
    rand, crs, trackers, post, proof_bytes = shuffle_instance
    # truncated proof
    assert not whisk.is_valid_whisk_shuffle_proof(
        crs, trackers, post, proof_bytes[:37], rand)
    # bad compression flag byte in the leading point
    bad = bytes([proof_bytes[0] ^ 0x80]) + proof_bytes[1:]
    assert not whisk.is_valid_whisk_shuffle_proof(
        crs, trackers, post, bad, rand)
    # non-canonical x coordinate (x = p is not canonical)
    p_bytes = fh.P.to_bytes(48, "big")
    bad = bytes([0x80 | p_bytes[0]]) + p_bytes[1:] + proof_bytes[48:]
    assert not whisk.is_valid_whisk_shuffle_proof(
        crs, trackers, post, bad, rand)
    # pre/post length mismatch
    assert not whisk.is_valid_whisk_shuffle_proof(
        crs, trackers, post[:-1], proof_bytes, rand)
    # zero randomizer: post-trackers at infinity
    inf = codec.g1_to_bytes(None)
    zero_post = [whisk.WhiskTracker(inf, inf) for _ in post]
    assert not whisk.is_valid_whisk_shuffle_proof(
        crs, trackers, zero_post, proof_bytes, rand)


def test_tracker_proof_malformed_bytes_return_false():
    rand = Rand(6)
    k = rand.get_fr()
    tracker = make_tracker(rand, k)
    k_comm = codec.g1_to_bytes(fh.g1_mul(fh.G1_GEN, k))
    proof = whisk.generate_whisk_tracker_proof(tracker, k, rand)
    assert not whisk.is_valid_whisk_tracker_proof(tracker, k_comm, proof[:64])
    bad = bytes([proof[0] ^ 0x80]) + proof[1:]
    assert not whisk.is_valid_whisk_tracker_proof(tracker, k_comm, bad)
    # non-canonical scalar s (>= r)
    bad_s = proof[:96] + fh.R.to_bytes(32, "big")
    assert not whisk.is_valid_whisk_tracker_proof(tracker, k_comm, bad_s)


def test_whisk_full_lifecycle():
    """Simulated consensus processing over two proposals
    (whisk/whisk_test.go:58-90, 122-209)."""
    rand = Rand(3)
    crs = curdleproof.generate_crs(ELL_TEST, rand)

    # state: validator registry of trackers + k commitments
    class Validator:
        def __init__(self, k):
            self.k = k
            self.tracker = make_tracker(rand, k)
            self.k_comm = codec.g1_to_bytes(fh.g1_mul(fh.G1_GEN, k))

    validators = [Validator(rand.get_fr()) for _ in range(ELL_TEST)]
    shuffle_set = [v.tracker for v in validators]

    for _proposal in range(2):
        # proposer: registration/opening proof for its own tracker
        proposer = validators[0]
        opening = whisk.generate_whisk_tracker_proof(proposer.tracker,
                                                     proposer.k, rand)
        assert whisk.is_valid_whisk_tracker_proof(proposer.tracker,
                                                  proposer.k_comm, opening)

        # proposer: shuffle the tracker set and prove it
        post, proof_bytes = whisk.generate_whisk_shuffle_proof(
            crs, shuffle_set, rand)

        # processBlock: every node verifies both proofs
        assert whisk.is_valid_whisk_shuffle_proof(crs, shuffle_set, post,
                                                  proof_bytes, rand)
        shuffle_set = post

        # fresh tracker registration with a new r (tracker update)
        new_tracker = make_tracker(rand, proposer.k)
        opening2 = whisk.generate_whisk_tracker_proof(new_tracker,
                                                      proposer.k, rand)
        assert whisk.is_valid_whisk_tracker_proof(new_tracker,
                                                  proposer.k_comm, opening2)
        proposer.tracker = new_tracker
