"""Stage-fused Pallas kernels for the G1 point formulas.

Why: a point add/double in the XLA-composed path is 2 Pallas multiplies plus
~50 small XLA glue ops (sums, mul_small, carry passes, pad/reshape). On the
latency-bound serial phases (the 64-window Horner combines and the per-round
base folds — ~320 dependent point-ops each) the glue dominates: a batched
double measures ~0.3 ms regardless of lane count. Fusing each *stage* of the
RCB16 formulas — six independent products plus all surrounding ring ops —
into one Mosaic kernel turns a point-op into 2 kernel launches with no glue.

Exactness: the kernel-side field ops (`_KF`) replicate ops/limb_field.py's
lazy-limb representation and *interval analysis* formula-for-formula (the
shifts use pltpu.roll instead of jnp.pad; values and bounds are identical),
so the static proof that every limb stays inside f32's exact-integer window
carries over. Outputs are bit-identical to the XLA path (tested in
tests/test_device_stack.py).

Replaces (TPU-native): gnark-crypto's G1Jac AddAssign/Double assembly
(/root/reference, used by every MultiExp/ScalarMultiplication call site).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import limb_field as lf
from .pallas_field import FOLD, NL, RED, _RED_ROWS

BLOCK = 128  # six convs' live temps exceed the 16MB scoped-VMEM cap at 256
_CONV = 2 * NL - 1      # 97
_WIDE = _CONV + 2       # 99: + carry-expand headroom


class _KF:
    """In-kernel field element: (limbs [B, W], static interval).

    Mirrors limb_field.Field's ops and interval bookkeeping; `red`/`fold`
    are the reduction constants as traced kernel inputs.
    """

    def __init__(self, red, fold):
        self.red = red
        self.fold = fold

    @staticmethod
    def _shift_up(x, k):
        from jax.experimental.pallas import tpu as pltpu
        if k == 0:
            return x
        lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        return jnp.where(lane < k, jnp.zeros((), x.dtype),
                         pltpu.roll(x, k, 1))

    # -- ring ops (iv formulas copied from limb_field) ------------------------

    def add(self, a, b):
        (al, aiv), (bl, biv) = a, b
        iv = lf._check((aiv[0] + biv[0], aiv[1] + biv[1],
                        aiv[2] + biv[2], aiv[3] + biv[3]))
        return (al + bl, iv)

    def sub(self, a, b):
        (al, aiv), (bl, biv) = a, b
        iv = lf._check((aiv[0] - biv[1], aiv[1] - biv[0],
                        aiv[2] - biv[3], aiv[3] - biv[2]))
        return (al - bl, iv)

    def mul_small(self, a, c):
        (al, aiv) = a
        iv = lf._check((aiv[0] * c, aiv[1] * c, aiv[2] * c, aiv[3] * c))
        return self.carry_to((al * c, iv), lf.REDUCED)

    def _carry_iv(self, iv):
        lo, hi, tlo, thi = iv
        c_lo, c_hi = lo // lf.BASE, hi // lf.BASE
        ct_lo, ct_hi = tlo // lf.BASE, thi // lf.BASE
        return (min(c_lo, 0) + 255 * min(ct_lo, 0),
                255 + max(c_hi, 0) + 255 * max(ct_hi, 0),
                min(c_lo, 0), 255 + max(c_hi, 0))

    def _carry_pass(self, x):
        c, low = lf._floor_shift(x)
        c_top = c[:, NL - 1:NL]
        return low + self._shift_up(c, 1) + c_top * self.fold

    def carry_to(self, a, target):
        limbs, iv = a
        for _ in range(24):
            if lf._within(iv, target):
                return (limbs, target)
            limbs = self._carry_pass(limbs)
            niv = lf._check(self._carry_iv(iv))
            if niv == iv and not lf._within(iv, target):
                raise OverflowError(f"carry_to stuck at {iv}")
            iv = niv
        raise OverflowError(f"carry_to did not converge: {iv}")

    def mul(self, a, b):
        def _max(iv):
            return max(-iv[0], iv[1], -iv[2], iv[3])

        def fits(x, y):
            return NL * _max(x[1]) * _max(y[1]) < lf.EXACT_LIMIT

        if not fits(a, b):
            a = self.carry_to(a, lf.REDUCED)
        if not fits(a, b):
            b = self.carry_to(b, lf.REDUCED)
        al, aiv = a
        bl, biv = b
        bound = NL * _max(aiv) * _max(biv)
        # conv: b zero-extended once; 49 roll+FMA steps
        bp = jnp.concatenate(
            [bl, jnp.zeros((bl.shape[0], _WIDE - NL), bl.dtype)], axis=1)
        acc = al[:, 0:1] * bp
        for i in range(1, NL):
            acc = acc + al[:, i:i + 1] * self._shift_up(bp, i)
        lo, hi = -bound, bound
        # two carry-expand passes inside the 99-lane window
        for _ in range(2):
            c, low = lf._floor_shift(acc)
            acc = low + self._shift_up(c, 1)
            lo, hi = min(lo // lf.BASE, 0), 255 + max(hi // lf.BASE, 0)
        # constant-matrix reduction (rows = 99 - 48 = 51)
        rows = _WIDE - (NL - 1)
        assert rows <= _RED_ROWS
        rbound = 255 * rows * max(-lo, hi)
        if rbound + max(-lo, hi) >= lf.EXACT_LIMIT:
            raise OverflowError("reduce bound exceeds exact limit")
        high = acc[:, NL - 1:]
        folded = jax.lax.dot_general(
            high, self.red[:rows], (((1,), (0,)), ((), ())),
            preferred_element_type=acc.dtype,
            precision=jax.lax.Precision.HIGHEST)
        low49 = acc[:, :NL]
        lane = jax.lax.broadcasted_iota(jnp.int32, low49.shape, 1)
        low49 = jnp.where(lane == NL - 1, jnp.zeros((), low49.dtype), low49)
        out = folded + low49
        olo = 255 * rows * min(lo, 0) + min(lo, 0)
        ohi = 255 * rows * max(hi, 0) + max(hi, 0)
        iv = lf._check((olo, ohi, min(lo, 0), max(hi, 0)))
        return self.carry_to((out, iv), lf.REDUCED)


# -- formula stages (each one kernel) -----------------------------------------

def _add_stage1(F, x1, y1, z1, x2, y2, z2):
    t0 = F.mul(x1, x2)
    t1 = F.mul(y1, y2)
    t2 = F.mul(z1, z2)
    m4 = F.mul(F.add(x1, y1), F.add(x2, y2))
    m5 = F.mul(F.add(y1, z1), F.add(y2, z2))
    m6 = F.mul(F.add(x1, z1), F.add(x2, z2))
    t3 = F.sub(m4, F.add(t0, t1))
    t4 = F.sub(m5, F.add(t1, t2))
    y3 = F.sub(m6, F.add(t0, t2))
    t0_3 = F.add(F.add(t0, t0), t0)
    t2b = F.mul_small(t2, 12)
    z3 = F.add(t1, t2b)
    t1m = F.sub(t1, t2b)
    y3b = F.mul_small(y3, 12)
    r = lambda e: F.carry_to(e, lf.REDUCED)
    return [r(t3), r(t4), r(y3b), r(t1m), r(t0_3), r(z3)]


def _add_stage2(F, t3, t4, y3b, t1m, t0_3, z3):
    x3 = F.sub(F.mul(t3, t1m), F.mul(t4, y3b))
    y3 = F.add(F.mul(t1m, z3), F.mul(y3b, t0_3))
    z3 = F.add(F.mul(z3, t4), F.mul(t0_3, t3))
    r = lambda e: F.carry_to(e, lf.REDUCED)
    return [r(x3), r(y3), r(z3)]


def _dbl_stage1(F, x, y, z):
    t0 = F.mul(y, y)
    t1 = F.mul(y, z)
    t2 = F.mul_small(F.mul(z, z), 12)
    m4 = F.mul(x, y)
    t00 = F.add(t0, t0)
    t04 = F.add(t00, t00)
    z3s = F.add(t04, t04)                       # 8*t0
    y3s = F.add(t0, t2)
    t0m = F.sub(t0, F.add(F.add(t2, t2), t2))   # t0 - 3*t2
    r = lambda e: F.carry_to(e, lf.REDUCED)
    return [r(t2), r(t0m), r(t1), r(z3s), r(y3s), r(m4)]


def _dbl_stage2(F, t2, t0m, t1, z3s, y3s, m4):
    n4 = F.mul(t0m, m4)
    x3 = F.add(n4, n4)
    y3 = F.add(F.mul(t2, z3s), F.mul(t0m, y3s))
    z3 = F.mul(t1, z3s)
    r = lambda e: F.carry_to(e, lf.REDUCED)
    return [r(x3), r(y3), r(z3)]


_STAGES = {
    "add1": (_add_stage1, 6, 6),
    "add2": (_add_stage2, 6, 3),
    "dbl1": (_dbl_stage1, 3, 6),
    "dbl2": (_dbl_stage2, 6, 3),
}

_call_cache = {}


def _stage_call(kind: str, ivs, interpret: bool):
    from jax.experimental import pallas as pl

    key = (kind, ivs, interpret)
    if key in _call_cache:
        return _call_cache[key]

    fn, n_in, n_out = _STAGES[kind]
    red = np.asarray(RED)                    # numpy: safe to close over
    fold = np.asarray(FOLD).reshape(1, NL)   # across traces (no tracer leak)

    def kernel(red_ref, fold_ref, *refs):
        F = _KF(red_ref[:], fold_ref[:])
        ins = [(r[:], iv) for r, iv in zip(refs[:n_in], ivs)]
        outs = fn(F, *ins)
        for r, (limbs, _) in zip(refs[n_in:], outs):
            r[:] = limbs

    def run(flats):
        n = flats[0].shape[0]
        spec = pl.BlockSpec((BLOCK, NL), lambda i: (i, 0))
        return pl.pallas_call(
            kernel,
            out_shape=[jax.ShapeDtypeStruct((n, NL), flats[0].dtype)] * n_out,
            grid=(n // BLOCK,),
            in_specs=[pl.BlockSpec((_RED_ROWS, NL), lambda i: (0, 0)),
                      pl.BlockSpec((1, NL), lambda i: (0, 0))]
                     + [spec] * n_in,
            out_specs=[spec] * n_out,
            interpret=interpret,
        )(red, fold, *flats)

    jfn = jax.jit(run)
    _call_cache[key] = jfn
    return jfn


def _run_stage(kind: str, elems, interpret: bool):
    batch = elems[0].limbs.shape[:-1]
    size = int(np.prod(batch)) if batch else 1
    pad = (-size) % BLOCK
    flats = []
    for e in elems:
        f = e.limbs.reshape(size, NL)
        if pad:
            f = jnp.concatenate([f, jnp.zeros((pad, NL), f.dtype)])
        flats.append(f)
    ivs = tuple(e.iv for e in elems)
    outs = _stage_call(kind, ivs, interpret)(flats)
    res = []
    for o in outs:
        if pad:
            o = o[:size]
        res.append(lf.Element(o.reshape(batch + (NL,)), lf.REDUCED))
    return res


def add(p, q, interpret: bool = False):
    """Fused complete point add: 2 kernel launches, no XLA glue."""
    from .curve import PointVec
    mid = _run_stage("add1", [p.x, p.y, p.z, q.x, q.y, q.z], interpret)
    out = _run_stage("add2", mid, interpret)
    return PointVec(*out)


def double(p, interpret: bool = False):
    """Fused complete point double: 2 kernel launches, no XLA glue."""
    from .curve import PointVec
    mid = _run_stage("dbl1", [p.x, p.y, p.z], interpret)
    out = _run_stage("dbl2", mid, interpret)
    return PointVec(*out)
