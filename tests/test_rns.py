"""RNS-Montgomery field backend (ops/rns.py, ops/fp_rns.py).

Core exactness runs in-process (the rns module is independent of the
field_backend selection); the end-to-end curve/argument path under
CURDLE_FP=rns runs in a subprocess because the backend is resolved once at
import time.
"""
import os
import random
import subprocess
import sys

import numpy as np
import pytest

from go_curdleproofs_tpu.ops import rns
from go_curdleproofs_tpu.utils.field_host import P

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_mont_mul_exact():
    random.seed(101)
    xs = [random.randrange(P) for _ in range(256)]
    ys = [random.randrange(P) for _ in range(256)]
    xs[:6] = [0, 1, P - 1, P - 2, 2, (P + 1) // 2]
    ys[:6] = [0, P - 1, P - 1, 1, (P - 1) // 2, 2]
    a = rns.from_ints(xs)
    b = rns.from_ints(ys)
    got = rns.to_ints(rns.mont_mul(a, b))
    assert got == [x * y % P for x, y in zip(xs, ys)]


def test_add_sub_neg_mul_small_bounds():
    random.seed(102)
    xs = [random.randrange(P) for _ in range(64)]
    ys = [random.randrange(P) for _ in range(64)]
    a = rns.from_ints(xs)
    b = rns.from_ints(ys)
    s = rns.add(a, b)
    assert s.bound == a.bound + b.bound
    d = rns.sub(s, b)
    m = rns.mul_small(a, 12)
    out = rns.mont_mul(rns.add(d, m), rns.sub(a, b))
    assert out.bound == 3
    want = [((x + y - y + 12 * x) % P) * ((x - y) % P) % P
            for x, y in zip(xs, ys)]
    assert rns.to_ints(out) == want


def test_squash_preserves_value():
    random.seed(103)
    xs = [random.randrange(P) for _ in range(32)]
    a = rns.from_ints(xs)
    big = rns.add(rns.add(a, a), rns.add(a, a))
    sq = rns.squash(big)
    assert sq.bound == 3
    assert rns.to_ints(sq) == [4 * x % P for x in xs]


def test_fp_rns_canonical_digits():
    from go_curdleproofs_tpu.ops import fp_rns
    random.seed(104)
    xs = [random.randrange(P) for _ in range(32)] + [0, 1, P - 1]
    a = rns.from_ints(xs)
    d = np.asarray(fp_rns.canonical_digits(a)).astype(np.int64)
    got = [sum(int(v) << (8 * i) for i, v in enumerate(row)) for row in d]
    assert got == [x % P for x in xs]


@pytest.mark.parametrize("seed", [7])
def test_curdleproof_end_to_end_rns_backend(seed):
    """Full prove+verify at ell=12 under CURDLE_FP=rns (subprocess)."""
    code = f"""
import random
from go_curdleproofs_tpu.models import curdleproof
from go_curdleproofs_tpu.utils.rand import Rand

ell = 12
rand = Rand({seed})
crs = curdleproof.generate_crs(ell, rand)
Rs = rand.get_g1s(ell)
Ss = rand.get_g1s(ell)
r = Rand({seed} + 1)
perm = r.generate_permutation(ell)
k = r.get_fr()
Ts, Us, M, rs_m = curdleproof.shuffle_permute_commit(
    crs.gs, crs.hs, Rs, Ss, perm, k, r)
proof = curdleproof.prove(crs, Rs, Ss, Ts, Us, M, perm, k, rs_m, r)
assert curdleproof.verify(proof, crs, Rs, Ss, Ts, Us, M, Rand(99))
print("RNS-E2E-OK")
"""
    env = dict(os.environ, CURDLE_FP="rns", JAX_PLATFORMS="cpu",
               CURDLE_DEVICE_PROVER="0")
    out = subprocess.run([sys.executable, "-c", code], cwd=REPO, env=env,
                         capture_output=True, text=True, timeout=1200)
    assert "RNS-E2E-OK" in out.stdout, out.stderr[-2000:]
