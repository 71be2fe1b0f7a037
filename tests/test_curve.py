"""Device G1 ops (complete formulas, scalar mult, MSM, folds) vs the oracle."""

import random

import jax
import pytest

from go_curdleproofs_tpu.ops import curve
from go_curdleproofs_tpu.utils import field_host as fh

random.seed(99)


@pytest.fixture(scope="module")
def pts():
    base = [fh.g1_mul(fh.G1_GEN, random.randrange(fh.R)) for _ in range(6)]
    return base + [None, fh.G1_GEN]


@pytest.fixture(scope="module")
def qts():
    return [fh.g1_mul(fh.G1_GEN, random.randrange(fh.R)) for _ in range(6)] + \
        [fh.G1_GEN, None]


class TestGroupLaw:
    def test_add(self, pts, qts):
        got = curve.to_affine_host(
            jax.jit(curve.add)(curve.from_affine_host(pts),
                               curve.from_affine_host(qts)))
        assert got == [fh.g1_add(p, q) for p, q in zip(pts, qts)]

    def test_complete_doubling(self, pts):
        pv = curve.from_affine_host(pts)
        d1 = curve.to_affine_host(jax.jit(curve.add)(pv, pv))
        d2 = curve.to_affine_host(jax.jit(curve.double)(pv))
        exp = [fh.g1_add(p, p) for p in pts]
        assert d1 == exp
        assert d2 == exp

    def test_inverse_gives_infinity(self, pts):
        pv = curve.from_affine_host(pts)
        got = curve.to_affine_host(jax.jit(curve.add)(pv, curve.neg(pv)))
        assert got == [None] * len(pts)


class TestScalarOps:
    def test_batch_scalar_mul(self, pts):
        sc = [random.randrange(fh.R) for _ in pts]
        sc[2] = 0
        got = curve.batch_scalar_mul(pts, sc)
        assert got == [fh.g1_mul(p, s) if p else None
                       for p, s in zip(pts, sc)]

    def test_msm(self, pts, qts):
        allp = pts + qts
        sc = [random.randrange(fh.R) for _ in allp]
        assert curve.msm(allp, sc) == fh.g1_msm(allp, sc)

    def test_msm_empty_and_zero(self, pts):
        assert curve.msm([], []) is None
        assert curve.msm(pts, [0] * len(pts)) is None


class TestDeviceVec:
    def test_msm_offset(self, pts):
        dv = curve.DeviceVec.from_affine(pts)
        sc = [random.randrange(fh.R) for _ in range(3)]
        got = dv.msm(sc, offset=2)
        assert got == fh.g1_msm(pts[2:5], sc)

    def test_fold(self, pts):
        dv = curve.DeviceVec.from_affine(pts)  # len 8
        gamma = random.randrange(fh.R)
        folded = dv.fold(gamma)
        exp = [fh.g1_add(pts[i], fh.g1_mul(pts[i + 4], gamma))
               for i in range(4)]
        assert folded.to_affine() == exp
        # fold again with a different gamma
        gamma2 = random.randrange(fh.R)
        folded2 = folded.fold(gamma2)
        exp2 = [fh.g1_add(exp[i], fh.g1_mul(exp[i + 2], gamma2))
                for i in range(2)]
        assert folded2.to_affine() == exp2
