"""GLV decomposition, signed-digit recode, and the fast subgroup check.

Covers the TPU counterpart of gnark's GLV+wNAF ScalarMultiplication
(SURVEY.md §2.2 G1 row) and of the decoder's subgroup check."""

import random

import numpy as np
import pytest

from go_curdleproofs_tpu.ops import codec_batch, curve, fr, glv, glv_dev
from go_curdleproofs_tpu.utils import field_host as fh


def test_constants():
    assert glv.LAMBDA * glv.LAMBDA + glv.LAMBDA + 1 == fh.R
    assert (glv.BETA * glv.BETA + glv.BETA + 1) % fh.P == 0
    # beta matches THIS lambda (not its conjugate) on G1
    lam_g = fh.g1_mul(fh.G1_GEN, glv.LAMBDA)
    assert lam_g == (glv.BETA * fh.G1_GEN[0] % fh.P, fh.G1_GEN[1])


def test_host_recode_roundtrip():
    random.seed(3)
    scs = ([random.randrange(fh.R) for _ in range(50)]
           + [0, 1, fh.R - 1, glv.LAMBDA, glv.LAMBDA - 1, glv.LAMBDA + 1])
    d = glv.scalars_to_digits_glv(scs)
    assert d.shape == (2 * len(scs), glv.NUM_WINDOWS)
    assert d.min() >= -8 and d.max() <= 8
    for i, s in enumerate(scs):
        s1 = sum(int(v) * 16 ** (glv.NUM_WINDOWS - 1 - w)
                 for w, v in enumerate(d[2 * i]))
        s2 = sum(int(v) * 16 ** (glv.NUM_WINDOWS - 1 - w)
                 for w, v in enumerate(d[2 * i + 1]))
        assert (s1 + glv.LAMBDA * s2) % fh.R == s % fh.R


def test_device_split_matches_host():
    random.seed(7)
    vals = ([random.randrange(fh.R) for _ in range(12)]
            + [0, 1, fh.R - 1, glv.LAMBDA, glv.LAMBDA * 2 % fh.R])
    import jax
    dd = np.asarray(jax.jit(glv_dev.glv_split_digits)(fr.from_ints(vals)))
    assert (dd == glv.scalars_to_digits_glv(vals)).all()


def _lift(xc):
    rhs = (xc * xc % fh.P * xc + 4) % fh.P
    y = pow(rhs, (fh.P + 1) // 4, fh.P)
    return (xc, y) if y * y % fh.P == rhs else None


def test_subgroup_check_agrees_with_full_order_check():
    """The phi(P) == [lambda]P criterion must agree with [r]P == O on both
    subgroup points and random on-curve (cofactor) points."""
    random.seed(11)
    good = [fh.g1_mul(fh.G1_GEN, random.randrange(1, fh.R))
            for _ in range(4)]
    assert codec_batch.batch_subgroup_check(good)
    bad = None
    while bad is None:
        bad = _lift(random.randrange(fh.P))
        if bad is not None and fh.g1_mul(bad, fh.R) is None:
            bad = None      # unlucky: actually in the subgroup
    assert fh.g1_mul(bad, fh.R) is not None
    assert not codec_batch.batch_subgroup_check(good + [bad])
    assert not codec_batch.batch_subgroup_check([bad])


def test_glv_scalar_mul_and_msm_match_oracle():
    random.seed(13)
    pts = [fh.g1_mul(fh.G1_GEN, random.randrange(1, fh.R))
           for _ in range(8)]
    pts[2] = None
    scs = [random.randrange(fh.R) for _ in range(8)]
    scs[3] = 0
    assert curve.msm(pts, scs) == fh.g1_msm(
        [p for p in pts if p], [s for p, s in zip(pts, scs) if p])
    got = curve.batch_scalar_mul(pts, scs)
    assert got == [fh.g1_mul(p, s) if p else None
                   for p, s in zip(pts, scs)]
