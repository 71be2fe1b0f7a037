"""Fused Pallas TPU kernels over the RNS-Montgomery field (ops/rns.py).

Why RNS + Pallas is the TPU-native answer for the point-op hot path
(replaces gnark-crypto's G1 assembly, /root/reference go.mod:6):

  * a 381-bit modular multiply in RNS is ~50 *elementwise* channel ops
    (no carries, no lane-crossing shuffles - the VPU's best case) plus
    8 small constant-matrix products that ride the MXU;
  * the Bajard-Imbert base-extension matmuls here use an 8-bit-split
    bf16 formulation: every matrix/vector piece is < 2^8 (bf16-exact),
    every dot's accumulation stays < 2^22 (f32-exact), so the dots run
    at the MXU's native bf16 rate with *bit-exact integer* results -
    no HIGHEST-precision multi-pass tricks;
  * fusing a whole RCB16 point add/double into one kernel keeps the
    ~20 field-element temporaries in VMEM: zero HBM round-trips and
    zero XLA op-dispatch overhead between the 12 multiplies.

Value semantics mirror ops/rns.py op-for-op. The gamma (base-extension
quotient) estimate uses an exact integer dot against K_j=round(2^29/q_j)
split into 8-bit pieces: |est - true| <= 37*2^11*0.5/2^29 (+ 2 f32
roundings) < 2^-13.5, inside the 2^-12 undershoot slack that the value
bounds absorb (see ops/rns.py docstring) - so outputs land in the same
bound-3 contract (channel values may differ from the XLA path only by
the tolerated extra multiple of p; all residues and all downstream
proof bytes are identical).
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import rns

J = rns.J
CH = 2 * J                      # 74 channels
NCOL = 128                      # dot output width: 74 targets + 3 gamma cols
BLOCK = 256                     # batch rows per grid step

_GAMMA_SLACK = float(rns._gamma_slack)


def _split8(mat: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    return mat >> 8, mat & 255


class _KConsts:
    """Packed kernel constants (built once from rns.consts())."""

    def __init__(self):
        C = rns.consts()
        q = C.q.astype(np.int64)
        r = C.r.astype(np.int64)
        m = np.concatenate([q, r])
        self.m = m.astype(np.float32).reshape(1, CH)
        self.inv_m = (1.0 / m.astype(np.float64)).astype(np.float32).reshape(1, CH)

        f32row = lambda a: np.asarray(a, np.float32).reshape(1, CH)
        z = np.zeros(J, np.float32)
        self.xi_mul = f32row(np.concatenate([np.asarray(C.xi_mul), z]))
        self.zeta_mul = f32row(np.concatenate([z, np.asarray(C.zeta_mul)]))
        self.p_r = f32row(np.concatenate([z, np.asarray(C.p_r)]))
        self.m1inv_r = f32row(np.concatenate([z, np.asarray(C.M1inv_r)]))
        self.neg_m1 = f32row(np.concatenate([z, np.asarray(C.negM1_r)]))
        self.neg_m2 = f32row(np.concatenate([np.asarray(C.negM2_q), z]))

        # extension matrices, 8-bit split, bf16 (cols 0..73 = targets in
        # combined-lane space; cols 74..76 = gamma K pieces)
        c1 = np.array([[(C.M1 // int(qj)) % int(rk) for rk in r] for qj in q],
                      dtype=np.int64)                       # [J(q), J(r)]
        c2 = np.array([[(C.M2 // int(rk)) % int(qj) for qj in q] for rk in r],
                      dtype=np.int64)                       # [J(r), J(q)]
        k1 = np.array([round((1 << 29) / int(qj)) for qj in q], np.int64)
        k2 = np.array([round((1 << 29) / int(rk)) for rk in r], np.int64)
        assert k1.max() < (1 << 19) and k2.max() < (1 << 19)

        def pack(cmat, kvec, src_lo: int, dst_lo: int):
            """rows src_lo..src_lo+J-1 -> target cols dst_lo.., gamma cols
            74..76; returns (hi, lo) bf16 matrices [CH, NCOL]."""
            hi = np.zeros((CH, NCOL), np.int64)
            lo = np.zeros((CH, NCOL), np.int64)
            ch, cl = _split8(cmat)
            hi[src_lo:src_lo + J, dst_lo:dst_lo + J] = ch
            lo[src_lo:src_lo + J, dst_lo:dst_lo + J] = cl
            kp = np.stack([kvec >> 16, (kvec >> 8) & 255, kvec & 255], 1)
            hi[src_lo:src_lo + J, 74:77] = kp
            lo[src_lo:src_lo + J, 74:77] = kp
            assert hi.max() < 256 and lo.max() < 256
            return hi.astype(np.float32), lo.astype(np.float32)

        # stored f32; cast to bf16 inside the kernel (values < 2^8: exact)
        self.mh1, self.ml1 = pack(c1, k1, 0, J)    # B1 -> B2 (targets 37..73)
        self.mh2, self.ml2 = pack(c2, k2, J, 0)    # B2 -> B1 (targets 0..36)
        # column-packed [CH, 2*NCOL] variants: the extension's four dots
        # (h|l rows x hi|lo matrices) collapse into ONE MXU matmul
        self.mhl1 = np.concatenate([self.mh1, self.ml1], axis=1)
        self.mhl2 = np.concatenate([self.mh2, self.ml2], axis=1)

        # negation table rows (bound -> channels of bound*p)
        self.bp = np.asarray(C.bp_table, np.float32)         # [256+1, CH]
        # 1 in Montgomery form (M1 mod p): pow ladder's squash multiplier
        self.one_mont = np.asarray(C.M1_modp, np.float32).reshape(1, CH)


_KC = None


def kconsts() -> _KConsts:
    global _KC
    if _KC is None:
        _KC = _KConsts()
    return _KC


# -----------------------------------------------------------------------------
# in-kernel field ops: elements are (ch [B, CH] f32, bound int)


class KF:
    """Kernel-side RNS field, mirroring ops/rns.py value semantics."""

    def __init__(self, m, inv_m, xi_mul, zeta_mul, p_r, m1inv_r,
                 neg_m1, neg_m2, mhl1, mhl2, bp, one_mont):
        self.m, self.inv_m = m, inv_m
        self.xi_mul, self.zeta_mul = xi_mul, zeta_mul
        self.p_r, self.m1inv_r = p_r, m1inv_r
        self.neg_m1, self.neg_m2 = neg_m1, neg_m2
        self.mhl1, self.mhl2 = mhl1, mhl2
        self.bp = bp
        self.one_mont = one_mont

    # -- channel helpers ------------------------------------------------------

    def _mod(self, v):
        """Exact v mod m for 0 <= v < 2^23 (two corrections)."""
        t = jnp.floor(v * self.inv_m)
        rr = v - t * self.m
        rr = jnp.where(rr < 0, rr + self.m, rr)
        rr = jnp.where(rr >= self.m, rr - self.m, rr)
        return rr

    def _dot(self, v, mat):
        return jax.lax.dot_general(
            v.astype(jnp.bfloat16), mat.astype(jnp.bfloat16),
            (((v.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    # -- ring ops (bound bookkeeping mirrors rns.py) ---------------------------

    def add(self, a, b):
        (av, ab), (bv, bb) = a, b
        s = av + bv
        s = jnp.where(s >= self.m, s - self.m, s)
        return (s, ab + bb)

    def neg(self, a):
        av, ab = a
        assert ab <= rns.BOUND_P_MAX
        row = self.bp[ab:ab + 1]
        s = row - av
        s = jnp.where(s < 0, s + self.m, s)
        return (s, ab)

    def sub(self, a, b):
        return self.add(a, self.neg(b))

    def mul_small(self, a, c: int):
        av, ab = a
        assert ab * c <= rns.BOUND_P_MAX and c <= 255
        return (self._mod(av * float(c)), ab * c)

    def _gamma_frac(self, dh, dl):
        """Exact-integer gamma estimate from the packed K-piece columns."""
        g = (dh[..., 74:75] * (2.0 ** -5) + dh[..., 75:76] * (2.0 ** -13)
             + dh[..., 76:77] * (2.0 ** -21)
             + dl[..., 74:75] * (2.0 ** -13) + dl[..., 75:76] * (2.0 ** -21)
             + dl[..., 76:77] * (2.0 ** -29))
        return g                                            # [..., 1]

    def _extend(self, xi, mhl, neg_m, round_up: bool):
        """Base extension: xi [..., B, CH] (source channels; zeros
        elsewhere) -> w [..., B, CH] on target channels, gamma folded in.
        The four logical dots (h|l rows x hi|lo matrix halves) run as ONE
        [2B, CH] x [CH, 2*NCOL] bf16 MXU matmul."""
        h = jnp.floor(xi * (2.0 ** -8))
        l = xi - h * 256.0
        B = xi.shape[-2]
        hl = jnp.concatenate([h, l], axis=-2)          # [..., 2B, CH]
        d = self._dot(hl, mhl)                         # [..., 2B, 2*NCOL]
        dh_h = d[..., :B, :NCOL]         # hC_hi | hK pieces
        dh_l = d[..., :B, NCOL:]         # hC_lo
        dl_h = d[..., B:, :NCOL]         # lC_hi
        dl_l = d[..., B:, NCOL:]         # lC_lo | lK pieces
        gfrac = self._gamma_frac(dh_h, dl_l)
        if round_up:
            gamma = jnp.floor(gfrac + 0.5)
        else:
            gamma = jnp.floor(gfrac - _GAMMA_SLACK)
        u = self._mod(dh_h[..., :CH] * 256.0 + dh_l[..., :CH]
                      + dl_h[..., :CH])
        w = self._mod(u * 256.0 + dl_l[..., :CH]
                      + jnp.broadcast_to(gamma, u.shape) * neg_m)
        return w

    def mont_mul(self, a, b):
        """(a*b/M1) mod-p-equivalent; output bound 3 (rns.mont_mul)."""
        av, ab = a
        bv, bb = b
        assert ab * bb <= rns.BOUND_PROD_MAX, (ab, bb)
        s = self._mod(av * bv)
        xi = self._mod(s * self.xi_mul)               # B1 lanes only
        w2 = self._extend(xi, self.mhl1, self.neg_m1, False)
        t2 = self._mod(self._mod(s + w2 * self.p_r) * self.m1inv_r)
        # t2 lives on B2 lanes; B1 lanes are zero
        zeta = self._mod(t2 * self.zeta_mul)
        t1 = self._extend(zeta, self.mhl2, self.neg_m2, True)
        # t1 on B1 lanes, t2 on B2 lanes: disjoint -> combine by add
        lane = jax.lax.broadcasted_iota(jnp.int32, t2.shape, t2.ndim - 1)
        return (jnp.where(lane < J, t1, t2), 3)

    def square(self, a):
        return self.mont_mul(a, a)


def make_kf() -> KF:
    kc = kconsts()
    return KF(*[getattr(kc, n) for n in _CONST_NAMES])


# -----------------------------------------------------------------------------
# point formulas over KF (RCB16 complete, a=0, b3=12; mirrors ops/curve.py)


def kf_point_add(F: KF, p, q):
    x1, y1, z1 = p
    x2, y2, z2 = q
    t0 = F.mont_mul(x1, x2)
    t1 = F.mont_mul(y1, y2)
    t2 = F.mont_mul(z1, z2)
    m4 = F.mont_mul(F.add(x1, y1), F.add(x2, y2))
    m5 = F.mont_mul(F.add(y1, z1), F.add(y2, z2))
    m6 = F.mont_mul(F.add(x1, z1), F.add(x2, z2))
    t3 = F.sub(m4, F.add(t0, t1))
    t4 = F.sub(m5, F.add(t1, t2))
    y3 = F.sub(m6, F.add(t0, t2))
    t0_3 = F.add(F.add(t0, t0), t0)
    t2b = F.mul_small(t2, 12)
    z3 = F.add(t1, t2b)
    t1m = F.sub(t1, t2b)
    y3b = F.mul_small(y3, 12)
    x3 = F.sub(F.mont_mul(t3, t1m), F.mont_mul(t4, y3b))
    y3o = F.add(F.mont_mul(t1m, z3), F.mont_mul(y3b, t0_3))
    z3o = F.add(F.mont_mul(z3, t4), F.mont_mul(t0_3, t3))
    return x3, y3o, z3o


def kf_point_double(F: KF, p):
    x, y, z = p
    t0 = F.mont_mul(y, y)
    t1 = F.mont_mul(y, z)
    t2 = F.mul_small(F.mont_mul(z, z), 12)
    m4 = F.mont_mul(x, y)
    t00 = F.add(t0, t0)
    t04 = F.add(t00, t00)
    z3s = F.add(t04, t04)                        # 8*t0
    y3s = F.add(t0, t2)
    t0m = F.sub(t0, F.add(F.add(t2, t2), t2))    # t0 - 3*t2
    n4 = F.mont_mul(t0m, m4)
    x3 = F.add(n4, n4)
    y3 = F.add(F.mont_mul(t2, z3s), F.mont_mul(t0m, y3s))
    z3 = F.mont_mul(t1, z3s)
    return x3, y3, z3


# -----------------------------------------------------------------------------
# pallas wrappers

_CONST_NAMES = ("m", "inv_m", "xi_mul", "zeta_mul", "p_r", "m1inv_r",
                "neg_m1", "neg_m2", "mhl1", "mhl2", "bp", "one_mont")


def _const_arrays():
    kc = kconsts()
    return [getattr(kc, n) for n in _CONST_NAMES]


def _const_specs(grid: bool = True, ndims: int = 1):
    from jax.experimental import pallas as pl
    kc = kconsts()
    if not grid:
        imap = lambda: (0, 0)
    elif ndims == 1:
        imap = lambda i: (0, 0)
    else:
        imap = lambda i, j: (0, 0)
    return [pl.BlockSpec(getattr(kc, n).shape, imap)
            for n in _CONST_NAMES]


_call_cache = {}


def _fused_call(kind: str, bounds: tuple, n_in: int, n_out: int, fn,
                interpret: bool):
    """Build/caches a pallas_call running `fn(F, ins)->outs` per block."""
    from jax.experimental import pallas as pl

    key = (kind, bounds, interpret)
    if key in _call_cache:
        return _call_cache[key]

    def kernel(*refs):
        consts = refs[:len(_CONST_NAMES)]
        F = KF(*[c[:] for c in consts])
        ins = refs[len(_CONST_NAMES):len(_CONST_NAMES) + n_in]
        outs = refs[len(_CONST_NAMES) + n_in:]
        vals = [(r[:], b) for r, b in zip(ins, bounds)]
        res = fn(F, vals)
        for r, (v, _) in zip(outs, res):
            r[:] = v

    def run(flats):
        n = flats[0].shape[0]
        spec = pl.BlockSpec((BLOCK, CH), lambda i: (i, 0))
        return pl.pallas_call(
            kernel,
            out_shape=[jax.ShapeDtypeStruct((n, CH), jnp.float32)] * n_out,
            grid=(n // BLOCK,),
            in_specs=_const_specs() + [spec] * n_in,
            out_specs=[spec] * n_out,
            interpret=interpret,
        )(*_const_arrays(), *flats)

    from . import exe_cache
    jfn = exe_cache.cached_jit(run, name=f"fused_{kind}")
    _call_cache[key] = jfn
    return jfn


def _run_fused(kind, fn, elems, bounds, n_out, interpret):
    """elems: list of channel arrays [..., CH]; returns list of ([..., CH],
    bound 3) outputs."""
    batch = elems[0].shape[:-1]
    size = int(np.prod(batch)) if batch else 1
    pad = (-size) % BLOCK
    flats = []
    for e in elems:
        f = e.reshape(size, CH)
        if pad:
            f = jnp.concatenate([f, jnp.zeros((pad, CH), f.dtype)])
        flats.append(f)
    outs = _fused_call(kind, tuple(bounds), len(elems), n_out, fn, interpret)(
        flats)
    res = []
    for o in outs:
        if pad:
            o = o[:size]
        res.append(o.reshape(batch + (CH,)))
    return res


def point_add(p, q, interpret: bool = False):
    """Fused complete RCB16 add over RElem PointVecs: ONE kernel."""
    from .curve import PointVec
    elems = [p.x.ch, p.y.ch, p.z.ch, q.x.ch, q.y.ch, q.z.ch]
    bounds = [p.x.bound, p.y.bound, p.z.bound,
              q.x.bound, q.y.bound, q.z.bound]

    def fn(F, vals):
        x, y, z = kf_point_add(F, vals[0:3], vals[3:6])
        return [x, y, z]

    outs = _run_fused("add", fn, elems, bounds, 3, interpret)
    return PointVec(rns.RElem(outs[0], 6), rns.RElem(outs[1], 6),
                    rns.RElem(outs[2], 6))


def point_double(p, interpret: bool = False):
    """Fused complete RCB16 double over an RElem PointVec: ONE kernel."""
    from .curve import PointVec
    elems = [p.x.ch, p.y.ch, p.z.ch]
    bounds = [p.x.bound, p.y.bound, p.z.bound]

    def fn(F, vals):
        x, y, z = kf_point_double(F, vals[0:3])
        return [x, y, z]

    outs = _run_fused("dbl", fn, elems, bounds, 3, interpret)
    return PointVec(rns.RElem(outs[0], 6), rns.RElem(outs[1], 6),
                    rns.RElem(outs[2], 6))


def point_x16_add(p, q, interpret: bool = False):
    """acc' = 16*acc + sel in ONE kernel — the Horner window step of the
    windowed scalar multiply (4 complete doublings + 1 complete add; 40
    mont_muls fused). Collapses the chain's per-window launch count 5x."""
    from .curve import PointVec
    elems = [p.x.ch, p.y.ch, p.z.ch, q.x.ch, q.y.ch, q.z.ch]
    bounds = [p.x.bound, p.y.bound, p.z.bound,
              q.x.bound, q.y.bound, q.z.bound]

    def fn(F, vals):
        pt = vals[0:3]
        for _ in range(4):
            pt = kf_point_double(F, pt)
        x, y, z = kf_point_add(F, pt, vals[3:6])
        return [x, y, z]

    outs = _run_fused("x16add", fn, elems, bounds, 3, interpret)
    return PointVec(rns.RElem(outs[0], 6), rns.RElem(outs[1], 6),
                    rns.RElem(outs[2], 6))


_wc_cache = {}


def windowed_combine(sel, bounds: tuple, n_windows: int,
                     interpret: bool = False):
    """Whole windowed scalar-mul/Horner combine as ONE kernel.

    sel: 3 channel arrays [n_windows, rows, CH] (MSB window first: the
    already-selected table entries per window). Computes

        acc = sum_w 16^(n_windows-1-w) * sel[w]   (acc = 16*acc + sel[w])

    with the per-window points streamed block-by-block from HBM by the
    grid pipeline and the accumulator resident in VMEM scratch. Replaces
    the 64-launch per-window chain (one pallas call each) whose ~0.1ms
    fixed launch cost dominated the serial phases.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from .curve import PointVec

    rows = sel[0].shape[1]
    assert rows % 8 == 0
    chunk = min(rows, 256)
    n_chunks = rows // chunk

    key = (n_windows, rows, chunk, tuple(bounds), interpret)
    if key not in _wc_cache:
        def kernel(*refs):
            consts = refs[:len(_CONST_NAMES)]
            F = KF(*[c[:] for c in consts])
            sx, sy, sz = refs[len(_CONST_NAMES):len(_CONST_NAMES) + 3]
            ox, oy, oz = refs[len(_CONST_NAMES) + 3:len(_CONST_NAMES) + 6]
            ax, ay, az = refs[len(_CONST_NAMES) + 6:]
            w = pl.program_id(0)
            c = pl.program_id(1)
            sl = pl.ds(c * chunk, chunk)       # this chunk's accumulator rows

            @pl.when(w == 0)
            def _init():
                ax[sl] = jnp.zeros((chunk, CH), jnp.float32)
                ay[sl] = jnp.broadcast_to(F.one_mont, (chunk, CH))
                az[sl] = jnp.zeros((chunk, CH), jnp.float32)

            p = ((ax[sl], 6), (ay[sl], 6), (az[sl], 6))
            for _ in range(4):
                p = kf_point_double(F, p)
            q = ((sx[:], bounds[0]), (sy[:], bounds[1]), (sz[:], bounds[2]))
            x3, y3, z3 = kf_point_add(F, p, q)
            ax[sl] = x3[0]
            ay[sl] = y3[0]
            az[sl] = z3[0]
            ox[:] = x3[0]
            oy[:] = y3[0]
            oz[:] = z3[0]

        def run(sx, sy, sz):
            flat = lambda t: t.reshape(n_windows * rows, CH)
            sel_spec = pl.BlockSpec(
                (chunk, CH), lambda w, c: (w * n_chunks + c, 0))
            out_spec = pl.BlockSpec((chunk, CH), lambda w, c: (c, 0))
            return pl.pallas_call(
                kernel,
                out_shape=[jax.ShapeDtypeStruct((rows, CH),
                                                jnp.float32)] * 3,
                grid=(n_windows, n_chunks),
                in_specs=_const_specs(ndims=2) + [sel_spec] * 3,
                out_specs=[out_spec] * 3,
                scratch_shapes=[pltpu.VMEM((rows, CH), jnp.float32)] * 3,
                interpret=interpret,
            )(*_const_arrays(), flat(sx), flat(sy), flat(sz))

        from . import exe_cache
        _wc_cache[key] = exe_cache.cached_jit(run, name="wcombine")

    ox, oy, oz = _wc_cache[key](*sel)
    return PointVec(rns.RElem(ox, 6), rns.RElem(oy, 6), rns.RElem(oz, 6))


_sr_cache = {}


def msm_select_reduce(table, digits, bound: int, C: int = 32,
                      interpret: bool = False):
    """The MSM wide phase — per-window table select + points-axis reduction —
    as ONE streamed Pallas kernel (the gnark Pippenger bucket phase
    equivalent, /root/reference/common/util.go:14).

    table:  3 channel arrays [9, m, n2, CH] f32 — each job's multiples
            table rows, pre-gathered (entry d = d*P_i, magnitudes 0..8;
            n2 = 2n GLV-extended interleaved lanes).
    digits: [m, n2, W] int32 SIGNED 4-bit window digits in [-8, 8],
            MSB window first (W = glv.NUM_WINDOWS).
    returns 3 channel arrays [m, W, CH]: window sums S_w = sum_n
            sign*table[|digit|], all bound 6.

    Per grid step (job m, chunk of C lanes): the 9-magnitude select runs as
    a masked multiply-add (VPU) with the digit sign folded into the y
    accumulation (y negation = bound*p - y, one extra bp-row term), the
    C-point reduction as an in-VMEM log2(C) tree of fused complete adds
    (MXU bf16 base-extension dots), and the per-window accumulators [W, CH]
    live in VMEM scratch across chunks. Replaces the XLA graph pipeline
    (one-hot einsum + 9-dispatch shrinking tree) whose per-level dispatches
    and f32-HIGHEST dots dominated MSM device time.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    tx, ty, tz = table
    m, n = tx.shape[1], tx.shape[2]
    C = min(C, n)
    assert n % C == 0 and (C & (C - 1)) == 0
    n_chunks = n // C
    levels = C.bit_length() - 1
    w_in = digits.shape[-1]
    if w_in < NUM_W:      # pad MSB windows to the 8-aligned kernel layout
        digits = jnp.concatenate(
            [jnp.zeros(digits.shape[:-1] + (NUM_W - w_in,), digits.dtype),
             digits], axis=-1)

    key = (m, n, C, bound, interpret)
    if key not in _sr_cache:
        def kernel(*refs):
            consts = refs[:len(_CONST_NAMES)]
            F = KF(*[c[:] for c in consts])
            txr, tyr, tzr, dgr = refs[len(_CONST_NAMES):len(_CONST_NAMES) + 4]
            ox, oy, oz = refs[len(_CONST_NAMES) + 4:len(_CONST_NAMES) + 7]
            ax, ay, az = refs[len(_CONST_NAMES) + 7:]
            ci = pl.program_id(1)

            D = dgr[0]                                     # [C, W] int32

            # 9-magnitude signed select as a STATIC unrolled masked
            # multiply-add (dynamic VMEM indexing in a fori body lowers
            # catastrophically): x/z accumulate |d|-selected entries, y
            # accumulates sign-weighted entries plus one bp-row term per
            # negative lane (-y == bound*p - y channelwise), then flatten
            # to 2D [C*W, CH] c-major so every tree-level add runs its
            # base-extension dots as ONE [rows,74]x[74,256] MXU matmul
            # (3D dot_generals decompose per leading index)
            sx = sy = sz = None
            mneg_any = None
            for d in range(TABLE_ENTRIES):
                if d == 0:
                    msel = (D == 0).astype(jnp.float32)[:, :, None]
                    ysign = msel
                else:
                    mp = (D == d).astype(jnp.float32)[:, :, None]
                    mn = (D == -d).astype(jnp.float32)[:, :, None]
                    msel = mp + mn
                    ysign = mp - mn
                    mneg_any = mn if mneg_any is None else mneg_any + mn
                px = msel * txr[d, 0][:, None]
                py = ysign * tyr[d, 0][:, None]
                pz = msel * tzr[d, 0][:, None]
                sx = px if sx is None else sx + px
                sy = py if sy is None else sy + py
                sz = pz if sz is None else sz + pz
            # fold the negation offset in and correct the channel range
            bp_row = F.bp[bound:bound + 1]
            sy = sy + mneg_any * bp_row
            sy = jnp.where(sy < 0, sy + F.m, sy)
            sy = jnp.where(sy >= F.m, sy - F.m, sy)
            flat = lambda t: t.reshape(C * NUM_W, CH)
            p = ((flat(sx), bound), (flat(sy), bound), (flat(sz), bound))

            # in-VMEM tree over the C points of this chunk: c-major rows, so
            # the first h*64 rows are the low half
            for lvl in range(levels):
                h = (C >> (lvl + 1)) * NUM_W
                a = tuple((v[:h], b) for v, b in p)
                bq = tuple((v[h:2 * h], b) for v, b in p)
                p = kf_point_add(F, a, bq)

            @pl.when(ci == 0)
            def _init():
                ax[:] = jnp.zeros((NUM_W, CH), jnp.float32)
                ay[:] = jnp.broadcast_to(F.one_mont, (NUM_W, CH))
                az[:] = jnp.zeros((NUM_W, CH), jnp.float32)

            acc = ((ax[:], 6), (ay[:], 6), (az[:], 6))
            chunk = tuple((v, 6) for v in (p[0][0], p[1][0], p[2][0]))
            x3, y3, z3 = kf_point_add(F, acc, chunk)
            ax[:] = x3[0]
            ay[:] = y3[0]
            az[:] = z3[0]
            ox[0] = x3[0]
            oy[0] = y3[0]
            oz[0] = z3[0]

        tab_spec = pl.BlockSpec((TABLE_ENTRIES, 1, C, CH),
                                lambda mi, ci: (0, mi, ci, 0))
        dg_spec = pl.BlockSpec((1, C, NUM_W), lambda mi, ci: (mi, ci, 0))
        out_spec = pl.BlockSpec((1, NUM_W, CH), lambda mi, ci: (mi, 0, 0))

        def run(tx, ty, tz, dg):
            return pl.pallas_call(
                kernel,
                out_shape=[jax.ShapeDtypeStruct((m, NUM_W, CH),
                                                jnp.float32)] * 3,
                grid=(m, n_chunks),
                in_specs=_const_specs(ndims=2) + [tab_spec] * 3 + [dg_spec],
                out_specs=[out_spec] * 3,
                scratch_shapes=[pltpu.VMEM((NUM_W, CH), jnp.float32)] * 3,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
                interpret=interpret,
            )(*_const_arrays(), tx, ty, tz, dg)

        from . import exe_cache
        _sr_cache[key] = exe_cache.cached_jit(run, name="selreduce")

    ox, oy, oz = _sr_cache[key](tx, ty, tz, digits)
    if w_in < NUM_W:      # drop the padded (infinity) leading window sums
        ox, oy, oz = (t[:, NUM_W - w_in:] for t in (ox, oy, oz))
    return ox, oy, oz


from . import glv as _glv

NUM_W = _glv.KERNEL_WINDOWS    # 40: 8-sublane-aligned kernel windows
TABLE_ENTRIES = _glv.TABLE_SIZE  # 9 digit magnitudes


def mont_mul(a: rns.RElem, b: rns.RElem,
             interpret: bool = False) -> rns.RElem:
    """Standalone fused mont_mul (tests/benches)."""
    def fn(F, vals):
        return [F.mont_mul(vals[0], vals[1])]

    out = _run_fused("mul", fn, [a.ch, b.ch], [a.bound, b.bound], 1,
                     interpret)
    return rns.RElem(out[0], 3)


# -----------------------------------------------------------------------------
# fixed-exponent power ladder (ONE kernel for the whole ~2*381-mul chain)
#
# Replaces the XLA lax.scan Fermat chains (fp.inv / sqrt): a scan of ~762
# tiny mont_muls costs ~50+ dispatched ops per iteration; in-kernel the
# whole ladder is a fori_loop over an SMEM bit vector (square + multiply +
# select per bit), so an inversion is one kernel launch.

_pow_cache = {}


def pow_fixed(e: rns.RElem, exponent: int,
              interpret: bool = False) -> rns.RElem:
    """e^exponent (Montgomery domain), exponent static; output bound 3."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bits = [int(b) for b in bin(exponent)[2:]]
    nbits = len(bits)
    batch = e.ch.shape[:-1]
    size = int(np.prod(batch)) if batch else 1
    pad = (-size) % 8
    x = e.ch.reshape(size, CH)
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, CH), x.dtype)])
    rows = size + pad

    key = (exponent, rows, e.bound, interpret)
    if key not in _pow_cache:
        bound = e.bound

        def kernel(*refs):
            consts = refs[:len(_CONST_NAMES)]
            F = KF(*[c[:] for c in consts])
            bits_ref = refs[len(_CONST_NAMES)]
            x_ref = refs[len(_CONST_NAMES) + 1]
            o_ref = refs[-1]
            xv = (x_ref[:], bound)

            def body(i, a):
                sq = F.mont_mul((a, 3), (a, 3))[0]
                withm = F.mont_mul((sq, 3), xv)[0]
                bit = bits_ref[0, i]
                return jnp.where(bit > 0, withm, sq)

            # MSB bit is 1: acc = x, squashed to the loop's bound-3 contract
            # (mont_mul by ONE preserves the Montgomery-domain value)
            acc0 = F.mont_mul(
                xv, (jnp.broadcast_to(F.one_mont, xv[0].shape), 1))[0]
            out = jax.lax.fori_loop(1, nbits, body, acc0)
            o_ref[:] = out

        bits_arr = np.asarray(bits, np.int32).reshape(1, nbits)

        def run(xf):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((rows, CH), jnp.float32),
                in_specs=_const_specs(grid=False)
                + [pl.BlockSpec(memory_space=pltpu.SMEM),
                   pl.BlockSpec((rows, CH), lambda: (0, 0))],
                out_specs=pl.BlockSpec((rows, CH), lambda: (0, 0)),
                interpret=interpret,
            )(*_const_arrays(), bits_arr, xf)

        from . import exe_cache
        _pow_cache[key] = exe_cache.cached_jit(run, name="powladder")

    out = _pow_cache[key](x)
    if pad:
        out = out[:size]
    return rns.RElem(out.reshape(batch + (CH,)), 3)


def inv(e: rns.RElem, interpret: bool = False) -> rns.RElem:
    """Fermat inverse e^(p-2) as one kernel; 0 -> 0."""
    from ..utils.field_host import P
    return pow_fixed(e, P - 2, interpret=interpret)


def sqrt_candidate(e: rns.RElem, interpret: bool = False) -> rns.RElem:
    from ..utils.field_host import P
    return pow_fixed(e, (P + 1) // 4, interpret=interpret)
