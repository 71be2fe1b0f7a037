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


@pytest.mark.skipif(
    __import__("os").environ.get("CURDLE_SLOW_TESTS", "0") != "1",
    reason="~20min of CPU XLA compiles; run with CURDLE_SLOW_TESTS=1 "
           "(the TPU golden/drive flows exercise the same path)")
def test_full_prove_byte_identical():
    """The ONE-FETCH full device prove (device_prover_full) must produce
    byte-identical proofs AND an identical transcript to the
    host-orchestrated curdleproof.prove."""
    from go_curdleproofs_tpu.models import curdleproof, device_prover_full

    ell = N - curdleproof.N_BLINDERS
    rand = Rand(21)
    crs = curdleproof.generate_crs(ell, rand)
    Rs = rand.get_g1s(ell)
    Ss = rand.get_g1s(ell)

    r1 = Rand(31)
    perm = r1.generate_permutation(ell)
    k = r1.get_fr()
    Ts, Us, M, rs_m = curdleproof.shuffle_permute_commit(
        crs.gs, crs.hs, Rs, Ss, perm, k, r1)
    p_host = curdleproof.prove(crs, Rs, Ss, Ts, Us, M, perm, k, rs_m, r1)

    r2 = Rand(31)
    perm2 = r2.generate_permutation(ell)
    k2 = r2.get_fr()
    assert perm2 == perm and k2 == k
    Ts2, Us2, M2, rs_m2 = curdleproof.shuffle_permute_commit(
        crs.gs, crs.hs, Rs, Ss, perm2, k2, r2)
    p_dev = device_prover_full.prove_on_device(
        crs, Rs, Ss, Ts2, Us2, M2, perm2, k2, rs_m2, r2)

    assert _ser(p_host) == _ser(p_dev)
    # and it verifies
    assert curdleproof.verify(p_dev, crs, Rs, Ss, Ts, Us, M, Rand(1))
