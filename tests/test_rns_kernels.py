"""Fused RNS Pallas kernels (ops/rns_kernels.py): bit-exact vs the host
bignum oracle and the ops/rns.py XLA path (interpret mode on CPU; the same
kernels run compiled on TPU - scripts/test_rns_kernels.py)."""

import random

import pytest

from go_curdleproofs_tpu.ops import field_backend, rns, rns_kernels
from go_curdleproofs_tpu.utils import field_host as fh
from go_curdleproofs_tpu.utils.field_host import P

pytestmark = pytest.mark.skipif(
    field_backend.BACKEND != "rns",
    reason="point-level kernel tests build PointVecs via the rns backend")


def test_fused_mont_mul_exact():
    random.seed(41)
    n = 300  # not a BLOCK multiple: exercises padding
    xs = [random.randrange(P) for _ in range(n)]
    ys = [random.randrange(P) for _ in range(n)]
    xs[:6] = [0, 1, P - 1, P - 2, 2, (P + 1) // 2]
    ys[:6] = [0, P - 1, P - 1, 1, (P - 1) // 2, 2]
    a = rns.from_ints(xs)
    b = rns.from_ints(ys)
    got = rns.to_ints(rns_kernels.mont_mul(a, b, interpret=True))
    assert got == [x * y % P for x, y in zip(xs, ys)]


def test_pow_ladder_kernels_exact():
    """Fixed-exponent pow kernels (RNS + limb-fr), small exponents so the
    interpret-mode fori stays fast; the full Fermat ladders run on TPU
    (scripts/test_rns_kernels.py)."""
    from go_curdleproofs_tpu.ops import fr, limb_kernels

    random.seed(43)
    e = 0xB7E15162_8AED2A6B              # 64-bit, mixed bit pattern
    xs = [random.randrange(1, P) for _ in range(5)] + [1, P - 1]
    a = rns.from_ints(xs)
    got = rns.to_ints(rns_kernels.pow_fixed(a, e, interpret=True))
    assert got == [pow(x, e, P) for x in xs]

    ys = [random.randrange(1, fh.R) for _ in range(4)] + [1, fh.R - 1]
    b = fr.from_ints(ys)
    got = fr.to_ints(limb_kernels.pow_fixed(b, e, fr.field, interpret=True))
    assert got == [pow(y, e, fh.R) for y in ys]


def test_msm_rows_points_matches_oracle():
    """msm_rows_points_from_table (XLA wide phase + device Horner — the
    TPU msm_many fast path's program) vs the host bignum oracle, including
    zero digits (infinity), shared rows and job padding; the Horner tail
    is also run through the windowed_combine Pallas kernel in interpret
    mode on the same window sums."""
    import jax.numpy as jnp
    import numpy as np

    from go_curdleproofs_tpu.ops import curve

    random.seed(44)
    k, n, m = 2, 16, 6
    vecs = [[fh.g1_mul(fh.G1_GEN, random.randrange(1, fh.R))
             for _ in range(n)] for _ in range(k)]
    vecs[0][3] = None                       # infinity base point
    sv = curve.StackedVec.from_affine(vecs, pad_to=n)
    table = sv.table()

    rows = [0, 1, 0, 1, 1, 0]
    scal = [[random.randrange(fh.R) for _ in range(n)] for _ in range(m)]
    scal[2] = [0] * n                       # all-zero job -> infinity
    digits = jnp.asarray(np.stack([curve.scalars_to_digits(s)
                                   for s in scal]))
    rows_a = jnp.asarray(np.asarray(rows, np.int32))
    want = [fh.g1_msm(vecs[r], s) for r, s in zip(rows, scal)]

    out = curve.msm_rows_points_from_table(table, digits, rows_a)
    assert curve.to_affine_host(out) == want

    # the same window sums through the streamed Horner kernel (interpret)
    W = curve.NUM_WINDOWS
    wins = curve.msm_rows_windows_from_table(table, digits, rows_a)
    pad = 8 - m
    sel = [jnp.concatenate(
        [jnp.moveaxis(t, -2, 0), jnp.zeros((W, pad, t.shape[-1]),
                                           t.dtype)], axis=1)
        for t in (wins.x.limbs, wins.y.limbs, wins.z.limbs)]
    kout = rns_kernels.windowed_combine(
        tuple(sel), (wins.x.iv, wins.y.iv, wins.z.iv), W, interpret=True)
    got = curve.to_affine_host(kout)[:m]
    assert got == want


def test_fused_point_ops_match_oracle():
    from go_curdleproofs_tpu.ops import curve

    random.seed(42)
    m = 40
    pts = [fh.g1_mul(fh.G1_GEN, random.randrange(1, fh.R)) for _ in range(m)]
    qts = [fh.g1_mul(fh.G1_GEN, random.randrange(1, fh.R)) for _ in range(m)]
    pts[0] = None
    qts[1] = None
    pts[2] = None
    qts[2] = None
    qts[3] = pts[3]                               # doubling through add
    qts[4] = (pts[4][0], (P - pts[4][1]) % P)     # inverse pair -> infinity
    pv = curve.from_affine_host(pts)
    qv = curve.from_affine_host(qts)

    got = curve.to_affine_host(rns_kernels.point_add(pv, qv, interpret=True))
    assert got == [fh.g1_add(p, q) for p, q in zip(pts, qts)]

    got = curve.to_affine_host(rns_kernels.point_double(pv, interpret=True))
    assert got == [fh.g1_add(p, p) for p in pts]

    # chained bound-6 inputs (REDUCED contract)
    r2 = rns_kernels.point_add(
        rns_kernels.point_add(pv, qv, interpret=True),
        rns_kernels.point_double(qv, interpret=True), interpret=True)
    want = [fh.g1_add(fh.g1_add(p, q), fh.g1_add(q, q))
            for p, q in zip(pts, qts)]
    assert curve.to_affine_host(r2) == want


def test_msm_select_reduce_matches_oracle():
    """The streamed MSM wide-phase kernel (select + in-VMEM reduce tree):
    window sums must equal the host oracle MSM after Horner combine, with
    infinity padding lanes and shared tables across jobs."""
    import jax.numpy as jnp
    import numpy as np

    from go_curdleproofs_tpu.ops import curve
    from go_curdleproofs_tpu.ops.field_backend import Fp

    random.seed(44)
    n, m, k = 16, 2, 2
    vecs = [[fh.g1_mul(fh.G1_GEN, random.randrange(1, fh.R))
             for _ in range(n)] for _ in range(k)]
    vecs[0][3] = None                       # infinity lane
    sv = curve.StackedVec.from_affine(vecs)
    table = sv.table()
    scal = [[random.randrange(fh.R) for _ in range(n)] for _ in range(m)]
    scal[1][0] = 0                          # zero scalar lane
    digits = np.stack([curve.scalars_to_digits(s) for s in scal])
    rows = np.array([0, 1], np.int32)

    tab = curve.pmap_coords(lambda t: jnp.take(t, rows, axis=1), table)
    wx, wy, wz = rns_kernels.msm_select_reduce(
        (tab.x.limbs, tab.y.limbs, tab.z.limbs),
        jnp.asarray(digits), 6, interpret=True)
    wins = curve.PointVec(Fp(wx, 6), Fp(wy, 6), Fp(wz, 6))
    W = curve.NUM_WINDOWS
    pts = curve.to_affine_host(wins)
    got = [fh.g1_combine_windows(pts[i * W:(i + 1) * W], 4)
           for i in range(m)]
    want = [fh.g1_msm([p for p in vecs[r] if p is not None],
                      [s for p, s in zip(vecs[r], scal[i]) if p is not None])
            for i, r in enumerate(rows)]
    assert got == want
