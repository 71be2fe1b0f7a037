"""Core Curdleproofs integration tests (completeness, soundness, serde).

Mirrors /root/reference/curdleproof_test.go at a CPU-friendly size
(ell=4, n=8; the reference uses n=64 — real sizes run on TPU via bench.py).
"""

import io

import pytest

from go_curdleproofs_tpu.models import curdleproof
from go_curdleproofs_tpu.models.same_permutation import permute
from go_curdleproofs_tpu.utils import field_host as fh
from go_curdleproofs_tpu.utils.rand import Rand

ELL = 4


def build_instance(seed=0):
    rand = Rand(seed)
    crs = curdleproof.generate_crs(ELL, rand)
    Rs = rand.get_g1s(ELL)
    Ss = rand.get_g1s(ELL)
    perm = rand.generate_permutation(ELL)
    k = rand.get_fr()
    Ts, Us, M, rs_m = curdleproof.shuffle_permute_commit(
        crs.gs, crs.hs, Rs, Ss, perm, k, rand)
    return rand, crs, Rs, Ss, Ts, Us, M, perm, k, rs_m


@pytest.fixture(scope="module")
def instance_and_proof():
    rand, crs, Rs, Ss, Ts, Us, M, perm, k, rs_m = build_instance()
    proof = curdleproof.prove(crs, Rs, Ss, Ts, Us, M, perm, k, rs_m, rand)
    return rand, crs, Rs, Ss, Ts, Us, M, perm, k, rs_m, proof


def test_completeness(instance_and_proof):
    rand, crs, Rs, Ss, Ts, Us, M, perm, k, rs_m, proof = instance_and_proof
    assert curdleproof.verify(proof, crs, Rs, Ss, Ts, Us, M, rand)


def test_shuffle_relation_holds(instance_and_proof):
    rand, crs, Rs, Ss, Ts, Us, M, perm, k, rs_m, proof = instance_and_proof
    assert Ts == permute([fh.g1_mul(r, k) for r in Rs], perm)
    assert Us == permute([fh.g1_mul(s, k) for s in Ss], perm)


def test_soundness_swapped_inputs(instance_and_proof):
    rand, crs, Rs, Ss, Ts, Us, M, perm, k, rs_m, proof = instance_and_proof
    assert not curdleproof.verify(proof, crs, Ss, Rs, Ts, Us, M, rand)


def test_soundness_wrong_permutation_applied(instance_and_proof):
    rand, crs, Rs, Ss, Ts, Us, M, perm, k, rs_m, proof = instance_and_proof
    bad_ts = list(Ts)
    bad_ts[0], bad_ts[1] = bad_ts[1], bad_ts[0]
    assert not curdleproof.verify(proof, crs, Rs, Ss, bad_ts, Us, M, rand)


def test_soundness_tampered_m(instance_and_proof):
    rand, crs, Rs, Ss, Ts, Us, M, perm, k, rs_m, proof = instance_and_proof
    assert not curdleproof.verify(proof, crs, Rs, Ss, Ts, Us,
                                  fh.g1_add(M, fh.G1_GEN), rand)


def test_soundness_different_randomizer(instance_and_proof):
    rand, crs, Rs, Ss, Ts, Us, M, perm, k, rs_m, proof = instance_and_proof
    k2 = (k + 1) % fh.R
    bad_ts = permute([fh.g1_mul(r, k2) for r in Rs], perm)
    assert not curdleproof.verify(proof, crs, Rs, Ss, bad_ts, Us, M, rand)


def test_zero_randomizer_rejected(instance_and_proof):
    rand, crs, Rs, Ss, Ts, Us, M, perm, k, rs_m, proof = instance_and_proof
    zero_ts = [None] * len(Ts)
    with pytest.raises(ValueError):
        curdleproof.verify(proof, crs, Rs, Ss, zero_ts, Us, M, rand)


def test_serialization_roundtrip(instance_and_proof):
    rand, crs, Rs, Ss, Ts, Us, M, perm, k, rs_m, proof = instance_and_proof
    buf = io.BytesIO()
    proof.serialize(buf)
    p2 = curdleproof.Proof.from_reader(io.BytesIO(buf.getvalue()))
    buf2 = io.BytesIO()
    p2.serialize(buf2)
    assert buf.getvalue() == buf2.getvalue()
    # decoded proof still verifies
    assert curdleproof.verify(p2, crs, Rs, Ss, Ts, Us, M, rand)
