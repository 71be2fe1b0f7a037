"""Per-argument completeness / soundness / serialization tests.

Mirrors the reference's per-package test strategy (SURVEY.md §4): build an
honest instance, prove, verify, assert the deferred MSM accumulator verifies;
tamper and assert the accumulator rejects. Sizes are reduced (n=8) for the
CPU harness — the real Whisk sizes run on TPU via bench.py.
"""

import io
import random

import pytest

from go_curdleproofs_tpu.models import (grand_product, inner_product,
                                        same_multiscalar, same_permutation,
                                        same_scalar)
from go_curdleproofs_tpu.models.group_commitment import GroupCommitment
from go_curdleproofs_tpu.models.msm_accumulator import MsmAccumulator
from go_curdleproofs_tpu.ops import curve
from go_curdleproofs_tpu.utils import field_host as fh
from go_curdleproofs_tpu.utils.rand import Rand
from go_curdleproofs_tpu.utils.transcript import Transcript

N = 8
N_BLINDERS = 4
ELL = N - N_BLINDERS


def serde_roundtrip(proof, cls):
    buf = io.BytesIO()
    proof.serialize(buf)
    p2 = cls.from_reader(io.BytesIO(buf.getvalue()))
    buf2 = io.BytesIO()
    p2.serialize(buf2)
    assert buf.getvalue() == buf2.getvalue()
    return p2


class TestGroupCommitment:
    def test_homomorphism_and_serde(self):
        rand = Rand(0)
        g, h = rand.get_g1(), rand.get_g1()
        t1, t2 = rand.get_g1(), rand.get_g1()
        r1, r2 = rand.get_fr(), rand.get_fr()
        c1 = GroupCommitment.new(g, h, t1, r1)
        c2 = GroupCommitment.new(g, h, t2, r2)
        assert c1.add(c2).eq(
            GroupCommitment.new(g, h, fh.g1_add(t1, t2), (r1 + r2) % fh.R))
        a = rand.get_fr()
        assert c1.mul(a).eq(
            GroupCommitment.new(g, h, fh.g1_mul(t1, a), r1 * a % fh.R))
        serde_roundtrip(c1, GroupCommitment)


class TestMsmAccumulator:
    @pytest.mark.parametrize("n", [1, 4, 8])
    def test_accumulate_verify(self, n):
        # msmaccumulator_test.go:12-50
        rand = Rand(n)
        pts = rand.get_g1s(n)
        xs = rand.get_frs(n)
        acc = MsmAccumulator()
        acc.accumulate_check(fh.g1_msm(pts, xs), xs, pts, rand)
        ys = rand.get_frs(n)
        acc.accumulate_check(fh.g1_msm(pts, ys), ys, pts, rand)
        assert acc.verify()

    def test_rejects_bad_claim(self):
        rand = Rand(5)
        pts = rand.get_g1s(4)
        xs = rand.get_frs(4)
        acc = MsmAccumulator()
        acc.accumulate_check(fh.g1_add(fh.g1_msm(pts, xs), fh.G1_GEN),
                             xs, pts, rand)
        assert not acc.verify()


class TestSameScalar:
    def setup_instance(self, seed=0):
        rand = Rand(seed)
        crs = same_scalar.CRS(rand.get_g1(), rand.get_g1(), rand.get_g1())
        R, S = rand.get_g1(), rand.get_g1()
        k, r_t, r_u = rand.get_fr(), rand.get_fr(), rand.get_fr()
        T = GroupCommitment.new(crs.gt, crs.h, fh.g1_mul(R, k), r_t)
        U = GroupCommitment.new(crs.gu, crs.h, fh.g1_mul(S, k), r_u)
        return rand, crs, R, S, T, U, k, r_t, r_u

    def test_completeness(self):
        rand, crs, R, S, T, U, k, r_t, r_u = self.setup_instance()
        proof = same_scalar.prove(crs, R, S, T, U, k, r_t, r_u,
                                  Transcript(b"t"), rand)
        assert same_scalar.verify(proof, crs, R, S, T, U, Transcript(b"t"))
        serde_roundtrip(proof, same_scalar.Proof)

    def test_soundness_wrong_scalar(self):
        rand, crs, R, S, T, U, k, r_t, r_u = self.setup_instance()
        proof = same_scalar.prove(crs, R, S, T, U, (k + 1) % fh.R, r_t, r_u,
                                  Transcript(b"t"), rand)
        assert not same_scalar.verify(proof, crs, R, S, T, U, Transcript(b"t"))


class TestInnerProduct:
    def setup_instance(self, seed=0):
        rand = Rand(seed)
        gs = rand.get_g1s(N)
        us = rand.get_frs(N)
        gs_prime = [fh.g1_mul(g, u) for g, u in zip(gs, us)]
        h = rand.get_g1()
        cs = rand.get_frs(N)
        ds = rand.get_frs(N)
        z = fh.fr_inner_product(cs, ds)
        C = curve.msm(gs, cs)
        D = curve.msm(gs_prime, ds)
        crs = inner_product.CRS(gs, gs_prime, h)
        return rand, crs, us, C, D, z, cs, ds

    def test_completeness(self):
        rand, crs, us, C, D, z, cs, ds = self.setup_instance()
        proof = inner_product.prove(crs, C, D, z, list(cs), list(ds),
                                    Transcript(b"ipa"), rand)
        acc = MsmAccumulator()
        assert inner_product.verify(proof, crs, C, D, z, us,
                                    Transcript(b"ipa"), acc, rand)
        assert acc.verify()
        serde_roundtrip(proof, inner_product.Proof)

    def test_soundness_wrong_z(self):
        rand, crs, us, C, D, z, cs, ds = self.setup_instance()
        proof = inner_product.prove(crs, C, D, z, list(cs), list(ds),
                                    Transcript(b"ipa"), rand)
        acc = MsmAccumulator()
        # sub-verify still passes; the ACCUMULATOR must fail (deferred-check
        # soundness semantics, grandproductargument_test.go:107-111 pattern)
        assert inner_product.verify(proof, crs, C, D, (z + 1) % fh.R, us,
                                    Transcript(b"ipa"), acc, rand)
        assert not acc.verify()

    def test_non_power_of_two_rejected(self):
        rand, crs, us, C, D, z, cs, ds = self.setup_instance()
        bad_crs = inner_product.CRS(crs.gs[:6], crs.gs_prime[:6], crs.h)
        with pytest.raises(ValueError):
            inner_product.prove(bad_crs, C, D, z, list(cs[:6]), list(ds[:6]),
                                Transcript(b"ipa"), rand)


class TestGrandProduct:
    def setup_instance(self, seed=0):
        rand = Rand(seed)
        crs = grand_product.CRS(rand.get_g1s(ELL), rand.get_g1s(N_BLINDERS),
                                rand.get_g1())
        gsum = None
        for g in crs.gs:
            gsum = fh.g1_add(gsum, g)
        hsum = None
        for h in crs.hs:
            hsum = fh.g1_add(hsum, h)
        bs = rand.get_frs(ELL)
        r_bs = rand.get_frs(N_BLINDERS)
        result = 1
        for b in bs:
            result = result * b % fh.R
        B = fh.g1_add(curve.msm(crs.gs, bs), curve.msm(crs.hs, r_bs))
        return rand, crs, gsum, hsum, B, result, bs, r_bs

    def test_completeness(self):
        rand, crs, gsum, hsum, B, result, bs, r_bs = self.setup_instance()
        proof = grand_product.prove(crs, B, result, bs, r_bs,
                                    Transcript(b"gpa"), rand)
        acc = MsmAccumulator()
        assert grand_product.verify(proof, crs, gsum, hsum, B, result,
                                    N_BLINDERS, Transcript(b"gpa"), acc, rand)
        assert acc.verify()
        serde_roundtrip(proof, grand_product.Proof)

    def test_soundness_tampered_result(self):
        # grandproductargument_test.go:89-138
        rand, crs, gsum, hsum, B, result, bs, r_bs = self.setup_instance()
        proof = grand_product.prove(crs, B, result, bs, r_bs,
                                    Transcript(b"gpa"), rand)
        acc = MsmAccumulator()
        assert grand_product.verify(proof, crs, gsum, hsum, B,
                                    (result + 1) % fh.R, N_BLINDERS,
                                    Transcript(b"gpa"), acc, rand)
        assert not acc.verify()

    def test_soundness_tampered_commitment(self):
        rand, crs, gsum, hsum, B, result, bs, r_bs = self.setup_instance()
        proof = grand_product.prove(crs, B, result, bs, r_bs,
                                    Transcript(b"gpa"), rand)
        acc = MsmAccumulator()
        bad_b = fh.g1_add(B, fh.G1_GEN)
        assert grand_product.verify(proof, crs, gsum, hsum, bad_b, result,
                                    N_BLINDERS, Transcript(b"gpa"), acc, rand)
        assert not acc.verify()


class TestSamePermutation:
    def setup_instance(self, seed=0):
        rand = Rand(seed)
        crs = same_permutation.CRS(rand.get_g1s(ELL),
                                   rand.get_g1s(N_BLINDERS), rand.get_g1())
        gsum = None
        for g in crs.gs:
            gsum = fh.g1_add(gsum, g)
        hsum = None
        for h in crs.hs:
            hsum = fh.g1_add(hsum, h)
        rng = random.Random(seed)
        perm = list(range(ELL))
        rng.shuffle(perm)
        as_ = rand.get_frs(ELL)
        rs_a = rand.get_frs(N_BLINDERS)
        rs_m = rand.get_frs(N_BLINDERS)
        perm_as = same_permutation.permute(as_, perm)
        A = fh.g1_add(curve.msm(crs.gs, perm_as), curve.msm(crs.hs, rs_a))
        M = fh.g1_add(curve.msm(crs.gs, perm), curve.msm(crs.hs, rs_m))
        return rand, crs, gsum, hsum, perm, as_, rs_a, rs_m, A, M

    def test_completeness(self):
        rand, crs, gsum, hsum, perm, as_, rs_a, rs_m, A, M = \
            self.setup_instance()
        proof = same_permutation.prove(crs, A, M, as_, perm, rs_a, rs_m,
                                       Transcript(b"sp"), rand)
        acc = MsmAccumulator()
        assert same_permutation.verify(proof, crs, gsum, hsum, A, M, as_,
                                       N_BLINDERS, Transcript(b"sp"), acc,
                                       rand)
        assert acc.verify()
        serde_roundtrip(proof, same_permutation.Proof)

    def test_soundness_wrong_permutation(self):
        rand, crs, gsum, hsum, perm, as_, rs_a, rs_m, A, M = \
            self.setup_instance()
        proof = same_permutation.prove(crs, A, M, as_, perm, rs_a, rs_m,
                                       Transcript(b"sp"), rand)
        acc = MsmAccumulator()
        bad_as = list(as_)
        bad_as[0], bad_as[1] = bad_as[1], bad_as[0]
        assert same_permutation.verify(proof, crs, gsum, hsum, A, M, bad_as,
                                       N_BLINDERS, Transcript(b"sp"), acc,
                                       rand)
        assert not acc.verify()


class TestSameMultiscalar:
    def setup_instance(self, seed=0):
        rand = Rand(seed)
        G = rand.get_g1s(N)
        T = rand.get_g1s(N)
        U = rand.get_g1s(N)
        x = rand.get_frs(N)
        A = fh.g1_msm(G, x)
        Z_t = fh.g1_msm(T, x)
        Z_u = fh.g1_msm(U, x)
        return rand, G, T, U, x, A, Z_t, Z_u

    def test_completeness(self):
        rand, G, T, U, x, A, Z_t, Z_u = self.setup_instance()
        proof = same_multiscalar.prove(G, A, Z_t, Z_u, T, U, list(x),
                                       Transcript(b"smsm"), rand)
        acc = MsmAccumulator()
        assert same_multiscalar.verify(proof, G, A, Z_t, Z_u, T, U,
                                       Transcript(b"smsm"), acc, rand)
        assert acc.verify()
        serde_roundtrip(proof, same_multiscalar.Proof)

    def test_soundness_wrong_commitment(self):
        rand, G, T, U, x, A, Z_t, Z_u = self.setup_instance()
        proof = same_multiscalar.prove(G, A, Z_t, Z_u, T, U, list(x),
                                       Transcript(b"smsm"), rand)
        acc = MsmAccumulator()
        assert same_multiscalar.verify(proof, G, fh.g1_add(A, fh.G1_GEN),
                                       Z_t, Z_u, T, U, Transcript(b"smsm"),
                                       acc, rand)
        assert not acc.verify()
