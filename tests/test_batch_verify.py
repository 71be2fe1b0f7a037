"""Batched shuffle-proof verification (parallel/batch.py): a whole batch
shares ONE deferred accumulator MSM (config 5 of BASELINE.json); optionally
sharded over the virtual device mesh."""

import random

import pytest

from go_curdleproofs_tpu.models import curdleproof, whisk
from go_curdleproofs_tpu.parallel import batch
from go_curdleproofs_tpu.parallel import msm as pmsm
from go_curdleproofs_tpu.utils import field_host as fh
from go_curdleproofs_tpu.utils.rand import Rand

ELL = 12        # n = 16


def _mk_trackers(rand: Rand, ell: int):
    out = []
    for _ in range(ell):
        r = rand.get_fr()
        k = rand.get_fr()
        out.append(whisk.WhiskTracker.from_points(
            fh.g1_mul(fh.G1_GEN, r), fh.g1_mul(fh.G1_GEN, r * k % fh.R)))
    return out


@pytest.fixture(scope="module")
def instances():
    rand = Rand(77)
    crs = curdleproof.generate_crs(ELL, rand)
    insts = []
    for i in range(3):
        pre = _mk_trackers(rand, ELL)
        post, proof = whisk.generate_whisk_shuffle_proof(crs, pre,
                                                         Rand(100 + i))
        insts.append((pre, post, proof))
    return crs, insts


def test_batch_honest_passes(instances):
    crs, insts = instances
    assert batch.verify_shuffle_proofs_batch(crs, insts, Rand(5))


def test_batch_one_tampered_fails(instances):
    crs, insts = instances
    pre, post, proof = insts[1]
    # flip one bit inside the curdleproofs proof body (offset past M, inside
    # a scalar so decoding still succeeds)
    bad = bytearray(proof)
    bad[-1] ^= 1
    tampered = insts[:1] + [(pre, post, bytes(bad))] + insts[2:]
    ok = False
    try:
        ok = batch.verify_shuffle_proofs_batch(crs, tampered, Rand(5))
    except ValueError:
        ok = False                      # decode-level rejection also fails it
    assert not ok


def test_batch_sharded_accumulator(instances):
    import jax

    crs, insts = instances
    mesh = pmsm.make_mesh(len(jax.devices()))
    assert batch.verify_shuffle_proofs_batch(crs, insts, Rand(9), mesh=mesh)


def test_batch_swapped_pre_post_fails(instances):
    crs, insts = instances
    pre0, post0, proof0 = insts[0]
    bad = [(post0, pre0, proof0)]
    assert not batch.verify_shuffle_proofs_batch(crs, bad, Rand(5))
