"""Device prover (piece-dispatch, RNS backend): proofs byte-identical to
the host path and the transcript stays in lockstep. CPU runs the same
pieces through XLA (the Pallas fast paths are TPU-gated); on TPU the
device prover is the DEFAULT (CURDLE_DEVICE_PROVER=auto resolves on), so
bench.py exercises the real kernels on the chip."""

import io

import pytest

from go_curdleproofs_tpu.models import inner_product, same_multiscalar
from go_curdleproofs_tpu.ops import curve, field_backend
from go_curdleproofs_tpu.utils import field_host as fh
from go_curdleproofs_tpu.utils.rand import Rand
from go_curdleproofs_tpu.utils.transcript import Transcript

pytestmark = pytest.mark.skipif(
    field_backend.BACKEND != "rns",
    reason="device prover v2 targets the rns backend")

N = 8


def _ser(p):
    b = io.BytesIO()
    p.serialize(b)
    return b.getvalue()


def test_v2_ipa_byte_identical():
    from go_curdleproofs_tpu.models import device_prover2

    rand = Rand(0)
    gs = rand.get_g1s(N)
    us = rand.get_frs(N)
    gsp = [fh.g1_mul(g, u) for g, u in zip(gs, us)]
    h = rand.get_g1()
    cs = rand.get_frs(N)
    ds = rand.get_frs(N)
    z = fh.fr_inner_product(cs, ds)
    C = curve.msm(gs, cs)
    D = curve.msm(gsp, ds)

    t1, r1 = Transcript(b"ipa"), Rand(7)
    p1 = inner_product.prove(inner_product.CRS(gs, gsp, h), C, D, z,
                             list(cs), list(ds), t1, r1)
    t2, r2 = Transcript(b"ipa"), Rand(7)
    p2 = device_prover2.prove_ipa_on_device(gs, gsp, h, C, D, z,
                                            list(cs), list(ds), t2, r2)
    assert _ser(p1) == _ser(p2)
    assert (t1.get_and_append_challenge(b"probe")
            == t2.get_and_append_challenge(b"probe"))


def test_v2_samemsm_byte_identical():
    from go_curdleproofs_tpu.models import device_prover2

    rand = Rand(1)
    gs = rand.get_g1s(N)
    T = rand.get_g1s(N)
    U = rand.get_g1s(N)
    xs = rand.get_frs(N)
    A = curve.msm(gs, xs)
    Zt = curve.msm(T, xs)
    Zu = curve.msm(U, xs)

    t1, r1 = Transcript(b"sm"), Rand(9)
    p1 = same_multiscalar.prove(gs, A, Zt, Zu, T, U, list(xs), t1, r1)
    t2, r2 = Transcript(b"sm"), Rand(9)
    p2 = device_prover2.prove_samemsm_on_device(gs, A, Zt, Zu, T, U,
                                                list(xs), t2, r2)
    assert _ser(p1) == _ser(p2)
    assert (t1.get_and_append_challenge(b"probe")
            == t2.get_and_append_challenge(b"probe"))
