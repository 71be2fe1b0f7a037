"""On-chip checks of the fused Pallas kernels (opt-in: the default suite is
CPU-only per tests/conftest.py; run with

    CURDLE_TPU_TESTS=1 python -m pytest tests/test_tpu_kernels.py -m tpu -q

). Same assertions as the interpret-mode tests in test_rns_kernels.py but
against the REAL compiled Mosaic kernels — the configuration bench.py
measures. First run compiles (~minutes/shape through the tunnel; cached)."""

import random

import pytest

from go_curdleproofs_tpu.ops import field_backend
from go_curdleproofs_tpu.utils import field_host as fh
from go_curdleproofs_tpu.utils.field_host import P

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(field_backend.BACKEND != "rns",
                       reason="kernels target the rns backend"),
]


def test_fused_mont_mul_on_chip():
    from go_curdleproofs_tpu.ops import rns, rns_kernels

    random.seed(31)
    n = 300
    xs = [random.randrange(P) for _ in range(n)]
    ys = [random.randrange(P) for _ in range(n)]
    xs[:4] = [0, 1, P - 1, (P + 1) // 2]
    ys[:4] = [0, P - 1, P - 1, 2]
    a = rns.from_ints(xs)
    b = rns.from_ints(ys)
    got = rns.to_ints(rns_kernels.mont_mul(a, b))
    assert got == [x * y % P for x, y in zip(xs, ys)]


def test_point_kernels_on_chip():
    from go_curdleproofs_tpu.ops import curve, rns_kernels

    random.seed(42)
    m = 16
    pts = [fh.g1_mul(fh.G1_GEN, random.randrange(1, fh.R)) for _ in range(m)]
    qts = [fh.g1_mul(fh.G1_GEN, random.randrange(1, fh.R)) for _ in range(m)]
    pts[0] = None
    qts[1] = pts[1]
    pv = curve.from_affine_host(pts)
    qv = curve.from_affine_host(qts)
    got = curve.to_affine_host(rns_kernels.point_add(pv, qv))
    assert got == [fh.g1_add(p, q) for p, q in zip(pts, qts)]


def test_msm_on_chip():
    from go_curdleproofs_tpu.ops import curve

    random.seed(7)
    n = 512
    pts = [fh.g1_mul(fh.G1_GEN, random.randrange(1, fh.R))
           for _ in range(64)] * 8
    sc = [random.randrange(fh.R) for _ in range(n)]
    assert curve.msm(pts, sc) == fh.g1_msm(pts, sc)
