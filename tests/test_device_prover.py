"""Device-resident provers must produce byte-identical proofs to the host
path (same transcript evolution, same randomness draws).

The round-1 device prover is built on the limb Fp backend; run with
CURDLE_FP=limb (the RNS-backed device prover that supersedes it has its own
tests)."""

import io

import pytest

from go_curdleproofs_tpu.ops import field_backend

pytestmark = pytest.mark.skipif(
    field_backend.BACKEND != "limb",
    reason="round-1 device prover is limb-backend-specific (CURDLE_FP=limb)")

from go_curdleproofs_tpu.models import (device_prover, inner_product,
                                        same_multiscalar)
from go_curdleproofs_tpu.models.msm_accumulator import MsmAccumulator
from go_curdleproofs_tpu.ops import curve
from go_curdleproofs_tpu.utils import field_host as fh
from go_curdleproofs_tpu.utils.rand import Rand
from go_curdleproofs_tpu.utils.transcript import Transcript

N = 8


def _ser(p):
    b = io.BytesIO()
    p.serialize(b)
    return b.getvalue()


def test_device_ipa_byte_identical():
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
    p2 = device_prover.prove_ipa_on_device(gs, gsp, h, C, D, z,
                                           list(cs), list(ds), t2, r2)
    assert _ser(p1) == _ser(p2)
    assert bytes(t1.inner.strobe.state) == bytes(t2.inner.strobe.state)

    acc = MsmAccumulator()
    assert inner_product.verify(p2, inner_product.CRS(gs, gsp, h), C, D, z,
                                us, Transcript(b"ipa"), acc, Rand(3))
    assert acc.verify()


def test_device_samemsm_byte_identical():
    rand = Rand(0)
    G = rand.get_g1s(N)
    T = rand.get_g1s(N)
    U = rand.get_g1s(N)
    x = rand.get_frs(N)
    A = fh.g1_msm(G, x)
    Z_t = fh.g1_msm(T, x)
    Z_u = fh.g1_msm(U, x)

    t1, r1 = Transcript(b"sm"), Rand(7)
    p1 = same_multiscalar.prove(G, A, Z_t, Z_u, T, U, list(x), t1, r1)
    t2, r2 = Transcript(b"sm"), Rand(7)
    p2 = device_prover.prove_samemsm_on_device(G, A, Z_t, Z_u, T, U, list(x),
                                               t2, r2)
    assert _ser(p1) == _ser(p2)
    assert bytes(t1.inner.strobe.state) == bytes(t2.inner.strobe.state)

    acc = MsmAccumulator()
    assert same_multiscalar.verify(p2, G, A, Z_t, Z_u, T, U,
                                   Transcript(b"sm"), acc, Rand(3))
    assert acc.verify()
