"""Keccak / STROBE / Merlin / Rand / codec — host primitive tests.

Mirrors the reference's determinism strategy (seeded SHAKE256 Rand,
byte-exact merlin transcript; SURVEY.md §4).
"""

import hashlib
import struct

import pytest

from go_curdleproofs_tpu.utils import codec, keccak
from go_curdleproofs_tpu.utils import field_host as fh
from go_curdleproofs_tpu.utils.merlin import MerlinTranscript
from go_curdleproofs_tpu.utils.rand import Rand
from go_curdleproofs_tpu.utils.transcript import Transcript


class TestKeccak:
    def test_sha3_vs_hashlib(self):
        for msg in (b"", b"abc", b"x" * 1000):
            assert keccak.sha3_256(msg) == hashlib.sha3_256(msg).digest()

    def test_shake_vs_hashlib(self):
        assert keccak.shake_256(b"seed", 64) == hashlib.shake_256(b"seed").digest(64)

    def test_python_fallback_matches_native(self):
        st1 = bytearray(range(200))
        st2 = bytearray(range(200))
        keccak.f1600(st1)
        keccak.f1600_py(st2)
        assert st1 == st2


class TestMerlin:
    def test_merlin_crate_vector(self):
        # the merlin crate's equivalence test vector ("test protocol")
        t = MerlinTranscript(b"test protocol")
        t.append_message(b"some label", b"some data")
        c = t.challenge_bytes(b"challenge", 32)
        assert c.hex() == \
            "d5a21972d0d5fe320c0d263fac7fffb8145aa640af6e9bca177c03c7efcf0615"

    def test_challenge_appended_back(self):
        # transcript.go:48-58: the accepted challenge is re-absorbed, so two
        # successive challenges must differ deterministically
        t1 = Transcript(b"x")
        c1 = t1.get_and_append_challenge(b"c")
        c2 = t1.get_and_append_challenge(b"c")
        t2 = Transcript(b"x")
        assert t2.get_and_append_challenge(b"c") == c1
        assert t2.get_and_append_challenge(b"c") == c2
        assert c1 != c2
        assert 0 <= c1 < fh.R


class TestRand:
    def test_stream_matches_shake(self):
        r = Rand(7)
        a = r.read(10)
        b = r.read(22)
        full = hashlib.shake_256(struct.pack(">Q", 7)).digest(32)
        assert a + b == full

    def test_get_fr_canonical(self):
        r = Rand(1)
        for _ in range(50):
            assert 0 <= r.get_fr() < fh.R

    def test_permutation(self):
        r = Rand(3)
        p1 = r.generate_permutation(124)
        p2 = r.generate_permutation(124)
        assert sorted(p1) == list(range(124))
        assert sorted(p2) == list(range(124))
        assert p1 != p2  # rand/rand_test.go:9-25

    def test_permutation_draw_semantics(self):
        # 16 bytes drawn per step; first two used as BE u16 mod (i+1)
        r1 = Rand(9)
        perm = r1.generate_permutation(5)
        r2 = Rand(9)
        expect = list(range(5))
        for i in range(5):
            buf = r2.read(16)
            j = struct.unpack(">H", buf[:2])[0] % (i + 1)
            expect[i], expect[j] = expect[j], expect[i]
        assert perm == expect


class TestCodec:
    def test_generator_compressed_known_bytes(self):
        # ZCash/IETF test vector: compressed G1 generator
        b = codec.g1_to_bytes(fh.G1_GEN)
        assert b.hex().startswith("97f1d3a73197d7942695638c4fa9ac0f")
        assert codec.g1_from_bytes(b) == fh.G1_GEN

    def test_infinity(self):
        b = codec.g1_to_bytes(None)
        assert b[0] == 0xC0 and set(b[1:]) == {0}
        assert codec.g1_from_bytes(b) is None

    def test_roundtrip_random(self):
        r = Rand(11)
        for _ in range(4):
            pt = r.get_g1()
            assert codec.g1_from_bytes(codec.g1_to_bytes(pt)) == pt

    def test_uncompressed_roundtrip(self):
        r = Rand(12)
        pt = r.get_g1()
        raw = codec.g1_to_bytes_uncompressed(pt)
        assert len(raw) == 96
        assert codec.g1_from_bytes(raw) == pt

    def test_reject_noncanonical_x(self):
        bad = bytearray(codec.g1_to_bytes(fh.G1_GEN))
        bad[1:48] = fh.P.to_bytes(48, "big")[1:48]
        bad[0] = 0x80 | (fh.P.to_bytes(48, "big")[0])
        with pytest.raises(ValueError):
            codec.g1_from_bytes(bytes(bad))

    def test_reject_non_subgroup_point(self):
        # a point on the curve but outside the r-order subgroup
        x = 1
        while True:
            y = fh.fp_sqrt((x * x * x + 4) % fh.P)
            if y is not None:
                if not fh.g1_in_subgroup((x, y)):
                    break
            x += 1
        raw = codec.g1_to_bytes((x, y))
        with pytest.raises(ValueError):
            codec.g1_from_bytes(raw)
        assert codec.g1_from_bytes(raw, subgroup_check=False) == (x, y)

    def test_fr_roundtrip(self):
        r = Rand(13)
        for _ in range(5):
            v = r.get_fr()
            assert codec.fr_from_bytes(codec.fr_to_bytes(v)) == v
        with pytest.raises(ValueError):
            codec.fr_from_bytes_canonical((fh.R).to_bytes(32, "big"))
