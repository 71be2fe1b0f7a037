"""Direct unit coverage for curve.msm_with_static — the verifier's
one-program final MSM (static CRS row off its cached table + per-proof
rows with in-program table build, window sums combined pointwise)."""

import random

import pytest

from go_curdleproofs_tpu.ops import curve
from go_curdleproofs_tpu.utils import field_host as fh

rng = random.Random(0xC0B)


def _pts(n):
    return [fh.g1_mul(fh.G1_GEN, rng.randrange(1, fh.R)) for _ in range(n)]


@pytest.mark.parametrize("n_static,n_dyn", [(12, 5), (12, 40)])
def test_matches_oracle(n_static, n_dyn):
    static_pts = _pts(n_static)
    dyn_pts = _pts(n_dyn)
    sv = curve.StackedVec.from_affine([static_pts], pad_to=n_static)
    st_sc = [rng.randrange(fh.R) for _ in range(n_static)]
    dyn_sc = [rng.randrange(fh.R) for _ in range(n_dyn)]
    got = curve.msm_with_static(sv, st_sc, dyn_pts, dyn_sc)
    expect = fh.g1_add(fh.g1_msm(static_pts, st_sc),
                       fh.g1_msm(dyn_pts, dyn_sc))
    assert got == expect


def test_identity_cancels():
    # the accumulator's actual use: a valid deferred identity sums to
    # infinity across the static/dynamic split
    static_pts = _pts(8)
    sv = curve.StackedVec.from_affine([static_pts], pad_to=8)
    k = rng.randrange(1, fh.R)
    c = fh.g1_msm(static_pts, [k] * 8)          # c = k * sum(static)
    got = curve.msm_with_static(sv, [k] * 8, [c], [fh.R - 1])
    assert got is None


def test_negative_and_unreduced_scalars():
    static_pts = _pts(8)
    dyn_pts = _pts(3)
    sv = curve.StackedVec.from_affine([static_pts], pad_to=8)
    st_sc = [rng.randrange(fh.R) for _ in range(8)]
    dyn_sc = [-5, fh.R * 3 + 7, rng.randrange(fh.R) << 300]
    got = curve.msm_with_static(sv, st_sc, dyn_pts, dyn_sc)
    expect = fh.g1_add(
        fh.g1_msm(static_pts, st_sc),
        fh.g1_msm(dyn_pts, [s % fh.R for s in dyn_sc]))
    assert got == expect
