"""Device-resident transcript stack + fused kernels vs host implementations."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from go_curdleproofs_tpu.ops import fp, fr, keccak_dev
from go_curdleproofs_tpu.ops import strobe_dev as sd
from go_curdleproofs_tpu.utils import field_host as fh
from go_curdleproofs_tpu.utils import keccak as kh
from go_curdleproofs_tpu.utils.merlin import MerlinTranscript
from go_curdleproofs_tpu.utils.strobe import Strobe128
from go_curdleproofs_tpu.utils.transcript import Transcript

random.seed(0)


def _bytes_to_dev(b: bytes):
    return jnp.asarray(np.frombuffer(b, np.uint8).astype(np.int32))


class TestDeviceKeccak:
    def test_f1600_matches_host(self):
        st = bytearray(range(200))
        ref = bytearray(st)
        kh.f1600_py(ref)
        dev = np.frombuffer(bytes(st), dtype=np.uint8).astype(np.int32)
        out = np.asarray(jax.jit(keccak_dev.f1600)(dev.reshape(25, 8)))
        assert (out.reshape(-1) == np.frombuffer(bytes(ref), np.uint8)).all()


class TestDeviceStrobe:
    def test_random_op_sequence(self):
        h = Strobe128(b"test proto")
        d = sd.from_host(h)
        f_meta = jax.jit(lambda s, x: sd.meta_ad(s, x, False))
        f_ad = jax.jit(lambda s, x: sd.ad(s, x, False))
        f_prf = jax.jit(lambda s: sd.prf(s, 32))
        for i in range(12):
            data = bytes(random.randrange(256)
                         for _ in range(random.choice([1, 48, 52, 120])))
            kind = random.choice(["meta", "ad", "prf"])
            if kind == "meta":
                h.meta_ad(data, False)
                d = f_meta(d, _bytes_to_dev(data))
            elif kind == "ad":
                h.ad(data, False)
                d = f_ad(d, _bytes_to_dev(data))
            else:
                exp = h.prf(32, False)
                d, out = f_prf(d)
                assert bytes(np.asarray(out).astype(np.uint8)) == exp
        assert bytes(np.asarray(d.st).astype(np.uint8)) == bytes(h.state)
        assert int(d.pos) == h.pos and int(d.pos_begin) == h.pos_begin

    def test_merlin_vector(self):
        mh = MerlinTranscript(b"test protocol")
        md = sd.from_host(mh.strobe)
        msg = _bytes_to_dev(b"some data")
        mh.append_message(b"some label", b"some data")
        md = jax.jit(lambda s, m: sd.append_message(s, b"some label", m))(md, msg)
        exp = mh.challenge_bytes(b"challenge", 32)
        md, out = jax.jit(lambda s: sd.challenge_bytes(s, b"challenge", 32))(md)
        assert bytes(np.asarray(out).astype(np.uint8)) == exp

    def test_challenge_rejection_equivalence(self):
        th = Transcript(b"curdleproofs")
        td = sd.from_host(th.inner.strobe)
        f = jax.jit(lambda s: sd.get_and_append_challenge(s, b"c"))
        for i in range(6):
            exp = th.get_and_append_challenge(b"c")
            td, got_be = f(td)
            got = int.from_bytes(bytes(np.asarray(got_be).astype(np.uint8)),
                                 "big")
            assert got == exp
        assert bytes(np.asarray(td.st).astype(np.uint8)) == \
            bytes(th.inner.strobe.state)


class TestDeviceCanonicalization:
    @pytest.mark.parametrize("F", [fp, fr], ids=["fp", "fr"])
    def test_canonical_digits(self, F):
        P = F.field.modulus
        xs = [random.randrange(P) for _ in range(16)]
        ys = [random.randrange(P) for _ in range(16)]
        z = F.sub(F.mul(F.from_ints(xs), F.from_ints(ys)),
                  F.mul_small(F.from_ints(ys), 200))
        cd = np.asarray(jax.jit(F.canonical_digits)(z)).astype(np.int64)
        got = [sum(int(d) << (8 * k) for k, d in enumerate(row)) for row in cd]
        assert got == [(x * y - 200 * y) % P for x, y in zip(xs, ys)]
        assert cd.min() >= 0 and cd.max() <= 255


class TestDeviceCompression:
    def test_compress_matches_codec(self):
        from go_curdleproofs_tpu.ops import compress_dev, curve
        from go_curdleproofs_tpu.utils import codec
        pts = [fh.g1_mul(fh.G1_GEN, random.randrange(fh.R))
               for _ in range(6)] + [None, fh.G1_GEN]
        pv2 = curve.add(curve.from_affine_host(pts),
                        curve.from_affine_host(pts))
        out = np.asarray(jax.jit(compress_dev.compress)(pv2)).astype(np.uint8)
        exp = [codec.g1_to_bytes(fh.g1_add(p, p)) for p in pts]
        for g, e in zip(out, exp):
            assert bytes(g) == e


class TestDeviceFr:
    def test_inner_product_and_prefix(self):
        R = fh.R
        a = [random.randrange(R) for _ in range(8)]
        b = [random.randrange(R) for _ in range(8)]
        ip = jax.jit(fr.inner_product)(fr.from_ints(a), fr.from_ints(b))
        assert fr.to_ints(fr.fmap(lambda t: t[None], ip)) == \
            [sum(x * y for x, y in zip(a, b)) % R]
        pp = jax.jit(fr.prefix_products)(fr.from_ints(a))
        exp = [1]
        for x in a[:-1]:
            exp.append(exp[-1] * x % R)
        assert fr.to_ints(pp) == exp

    def test_msm_digit_extraction(self):
        from go_curdleproofs_tpu.ops import curve, glv_dev
        a = [random.randrange(fh.R) for _ in range(4)]
        dd = jax.jit(glv_dev.glv_split_digits)(fr.from_ints(a))
        assert (np.asarray(dd) == curve.scalars_to_digits(a)).all()
