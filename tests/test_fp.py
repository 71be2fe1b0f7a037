"""Device Fp limb arithmetic vs the host bignum oracle."""

import random

import jax
import numpy as np
import pytest

from go_curdleproofs_tpu.ops import fp
from go_curdleproofs_tpu.utils.field_host import P

random.seed(1234)


def rand_elems(n):
    return [random.randrange(P) for _ in range(n)]


class TestFp:
    def test_roundtrip(self):
        xs = rand_elems(4) + [0, 1, P - 1]
        assert fp.to_ints(fp.from_ints(xs)) == xs

    def test_mul(self):
        xs, ys = rand_elems(16), rand_elems(16)
        m = fp.mul(fp.from_ints(xs), fp.from_ints(ys))
        assert fp.to_ints(m) == [x * y % P for x, y in zip(xs, ys)]
        assert m.iv == fp.REDUCED

    def test_addsub_chains(self):
        xs, ys = rand_elems(8), rand_elems(8)
        a, b = fp.from_ints(xs), fp.from_ints(ys)
        m = fp.mul(a, b)
        c = fp.mul(fp.add(m, fp.sub(a, b)), fp.neg(m))
        exp = [((x * y % P + x - y) * (-(x * y))) % P for x, y in zip(xs, ys)]
        assert fp.to_ints(c) == exp

    def test_mul_small(self):
        xs = rand_elems(8)
        s = fp.mul_small(fp.add(fp.from_ints(xs), fp.from_ints(xs)), 12)
        assert fp.to_ints(s) == [24 * x % P for x in xs]

    def test_edge_values(self):
        xs = [0, 1, P - 1, P - 2, (P + 1) // 2]
        ys = [P - 1, P - 1, P - 1, 2, 2]
        m = fp.mul(fp.from_ints(xs), fp.from_ints(ys))
        assert fp.to_ints(m) == [x * y % P for x, y in zip(xs, ys)]

    def test_inv(self):
        xs = rand_elems(8)
        out = jax.jit(fp.inv)(fp.from_ints(xs))
        assert fp.to_ints(out) == [pow(x, -1, P) for x in xs]

    def test_inv_of_zero_is_zero(self):
        out = jax.jit(fp.inv)(fp.from_ints([0, 5]))
        assert fp.to_ints(out)[0] == 0

    def test_sqrt(self):
        xs = rand_elems(8)
        sq = fp.mul(fp.from_ints(xs), fp.from_ints(xs))
        r = jax.jit(fp.sqrt_candidate)(sq)
        for x, got in zip(xs, fp.to_ints(r)):
            assert got in (x, P - x)

    def test_interval_analyzer_rejects_overflow(self):
        a = fp.Fp(fp.from_ints([1]).limbs, (-(1 << 23), 1 << 23, 0, 0))
        with pytest.raises(OverflowError):
            fp.add(a, a)

    def test_carry_preserves_value_at_extremes(self):
        # adversarial lazy limbs at the REDUCED boundary, incl. negatives
        rng = np.random.default_rng(7)
        limbs = rng.integers(-576, 577, size=(16, fp.NLIMBS)).astype(np.int64)
        limbs[:, -1] = rng.integers(-320, 321, size=16)
        vals = fp.to_ints(limbs)
        x = fp.Fp(limbs.astype(np.asarray(fp.RED).dtype), fp.REDUCED)
        y = fp.carry_to(x, fp.REDUCED)
        assert fp.to_ints(y) == vals
        m = fp.mul(x, x)
        assert fp.to_ints(m) == [v * v % P for v in vals]
