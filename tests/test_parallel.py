"""Multi-chip sharding tests on the 8-virtual-device CPU mesh."""

import random

import jax
import pytest

from go_curdleproofs_tpu.parallel import msm as pmsm
from go_curdleproofs_tpu.utils import field_host as fh

random.seed(5)


def test_virtual_mesh_available():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("n_dev", [2, 8])
def test_sharded_msm_matches_oracle(n_dev):
    mesh = pmsm.make_mesh(n_dev)
    pts = [fh.g1_mul(fh.G1_GEN, random.randrange(fh.R)) for _ in range(14)] \
        + [None, fh.G1_GEN]
    sc = [random.randrange(fh.R) for _ in range(16)]
    got = pmsm.sharded_msm(pts, sc, mesh)
    assert got == fh.g1_msm(pts, sc)


def test_graft_entry_dryrun():
    import __graft_entry__ as ge
    ge.dryrun_multichip(4)
