"""Native (C) codec vs the pure-python reference path."""

import random

import pytest

from go_curdleproofs_tpu.utils import codec
from go_curdleproofs_tpu.utils import field_host as fh

random.seed(42)


@pytest.mark.skipif(codec._native is None, reason="native lib not built")
class TestNativeCodec:
    def test_decompress_matches_python(self):
        for _ in range(5):
            pt = fh.g1_mul(fh.G1_GEN, random.randrange(fh.R))
            blob = codec.g1_to_bytes(pt)
            native = codec.g1_from_bytes(blob)
            assert native == pt
            # python fallback path agrees
            import ctypes  # noqa: F401  (ensure native really loaded)
            saved, codec._native = codec._native, None
            try:
                assert codec.g1_from_bytes(blob) == pt
            finally:
                codec._native = saved

    def test_infinity_and_errors(self):
        assert codec.g1_from_bytes(codec.g1_to_bytes(None)) is None
        bad = bytearray(codec.g1_to_bytes(fh.G1_GEN))
        bad[0] = (bad[0] & 0x1F) | 0x00  # invalid flags (uncompressed junk)
        with pytest.raises(ValueError):
            codec.g1_from_bytes(bytes(bad) + bytes(48))

    def test_non_subgroup_rejected(self):
        x = 1
        while True:
            y = fh.fp_sqrt((x * x * x + 4) % fh.P)
            if y is not None and not fh.g1_in_subgroup((x, y)):
                break
            x += 1
        raw = codec.g1_to_bytes((x, y))
        with pytest.raises(ValueError):
            codec.g1_from_bytes(raw)
        assert codec.g1_from_bytes(raw, subgroup_check=False) == (x, y)
