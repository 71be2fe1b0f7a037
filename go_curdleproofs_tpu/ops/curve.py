"""BLS12-381 G1 group operations as batched TPU array programs.

TPU-native replacement for gnark-crypto's G1Affine/G1Jac (+ wNAF/GLV
ScalarMultiplication and Pippenger MultiExp; SURVEY.md §2.2).

Points are homogeneous projective (X : Y : Z), x = X/Z, y = Y/Z, computed with
the *complete* formulas of Renes–Costello–Batina 2016 ("Complete addition
formulas for prime order elliptic curves"; Algorithms 7 & 9 for a = 0,
b3 = 3b = 12). Complete formulas are branchless — doubling, inverses and the
point at infinity (0:1:0) all take the same 12-mul schedule — which is exactly
what a batched SIMD device program needs: no per-lane control flow.

The MSM is a TPU-shaped windowed method (the reference's Pippenger equivalent,
/root/reference/common/util.go:14 MultiExp call sites):
  1. per-point 4-bit multiples tables (15 batched complete adds);
  2. one-hot contraction selects every window's multiple for every point;
  3. all 64 windows tree-reduce over the points axis *in parallel* —
     the lane-saturating phase;
  4. Horner combine over windows (64 x (4 doublings + 1 add)).
"""

from __future__ import annotations

import os
from typing import List, NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from . import field_backend as fp
from . import glv
from .field_backend import Fp, REDUCED
from ..utils import field_host as fh
from ..utils import profiling
from ..utils.field_host import Affine

B3 = 12  # 3*b for y^2 = x^3 + 4


class PointVec(NamedTuple):
    """A batch of projective G1 points (pytree of three Fp)."""
    x: Fp
    y: Fp
    z: Fp

    @property
    def batch_shape(self):
        return self.x.batch_shape


def infinity(shape=()) -> PointVec:
    return PointVec(fp.zeros(shape), fp.constant(1, shape), fp.zeros(shape))


def _settle(p: PointVec) -> PointVec:
    """Carry every coordinate to the REDUCED contract (stable pytree aux for
    lax loops; also keeps follow-on convolutions exact)."""
    return PointVec(fp.carry_to(p.x, REDUCED),
                    fp.carry_to(p.y, REDUCED),
                    fp.carry_to(p.z, REDUCED))


def _mul6(avec, bvec):
    """Multiply k independent Fp pairs as ONE stacked field mul.

    The RCB formulas' 12 muls fall into two dependency stages of 6
    independent products each; stacking them gives the conv kernel 6x the
    lanes and shrinks the traced graph ~6x.
    """
    a = fp.stack(avec)
    b = fp.stack(bvec)
    m = fp.mul(a, b)
    k = len(avec)
    return [fp.fmap(lambda t, i=i: t[i], m) for i in range(k)]


_RNS_KERNEL_MODE = os.environ.get("CURDLE_RNS_KERNEL", "auto")
_rns_kernel_on = None
_kernel_disable = 0
_kernel_force = 0


class _xla_point_ops:
    """Trace-time scope that forces pointwise add/double back to plain XLA
    ops. The MSM wide phase (select + log-n tree reduce) is BETTER as XLA
    graphs — the tree's shrinking small batches are latency-bound as
    per-level Pallas launches, and every inlined Pallas instance re-lowers
    the whole Mosaic kernel (the round-2 device-prover's minutes-long MLIR
    blowup). The fused kernels stay on for the serial phases (Horner
    windowed_combine, pow ladders) where they collapse dispatch chains."""

    def __enter__(self):
        global _kernel_disable
        _kernel_disable += 1

    def __exit__(self, *exc):
        global _kernel_disable
        _kernel_disable -= 1


class kernel_scope:
    """Trace-time scope forcing the fused Pallas point kernels ON for the
    programs traced inside it, regardless of CURDLE_RNS_KERNEL.

    The per-call-site granularity is what makes kernel mode SHIPPABLE on
    this backend: a Mosaic shape costs a 20-30 min deferred compile
    through the tunnel, and the one-fetch prover instantiates ~15 shapes —
    but the verifier's final accumulator MSM needs only ~2 per size. The
    verifier (models/msm_accumulator.py) wraps just its MSM dispatches, so
    those shapes can be prewarmed (scripts/prewarm.py --vkernel) without
    paying for the prover's. Program names differ per mode
    ("msm_rows_pts_*" vs "msm_rows_*"), so mixed modes never collide in
    the executable cache. _xla_point_ops (the tree-reduce interior) still
    wins over the scope."""

    def __init__(self, on: bool = True):
        self.on = on

    def __enter__(self):
        global _kernel_force
        if self.on:
            _kernel_force += 1

    def __exit__(self, *exc):
        global _kernel_force
        if self.on:
            _kernel_force -= 1


def _rns_kernel() -> bool:
    """Fused RNS Pallas point kernels: OPT-IN via CURDLE_RNS_KERNEL=1, or
    per-call-site via kernel_scope (rns backend only).

    Default OFF even on TPU: the Mosaic kernels execute the wide phase
    ~3.3x faster than the XLA graphs, but on this backend every distinct
    (m, n) kernel shape costs a 20-30 MINUTE deferred server-side compile
    through the tunnel (vs ~1-3 min for the plain-XLA programs), and the
    one-fetch prover instantiates ~15 such shapes. With the
    executable cache (ops/exe_cache.py) a fully prewarmed kernel-mode
    cache is strictly faster — scripts/prewarm.py prepays the compiles
    and bench.py flips the prewarmed phases on via the manifest."""
    global _rns_kernel_on
    if _kernel_disable:
        return False
    if _kernel_force:
        return True
    if _rns_kernel_on is None:
        if _RNS_KERNEL_MODE in ("0", "1"):
            _rns_kernel_on = _RNS_KERNEL_MODE == "1"
        else:
            _rns_kernel_on = False
    return _rns_kernel_on


def add(p: PointVec, q: PointVec) -> PointVec:
    """Complete projective addition (RCB16 Algorithm 7, a=0), two-stage."""
    if _rns_kernel():
        from . import rns_kernels
        return rns_kernels.point_add(p, q)
    x1, y1, z1 = p
    x2, y2, z2 = q
    # stage 1: six independent products
    t0, t1, t2, m4, m5, m6 = _mul6(
        [x1, y1, z1, fp.add(x1, y1), fp.add(y1, z1), fp.add(x1, z1)],
        [x2, y2, z2, fp.add(x2, y2), fp.add(y2, z2), fp.add(x2, z2)])
    t3 = fp.sub(m4, fp.add(t0, t1))
    t4 = fp.sub(m5, fp.add(t1, t2))
    y3 = fp.sub(m6, fp.add(t0, t2))
    t0_3 = fp.add(fp.add(t0, t0), t0)
    t2b = fp.mul_small(t2, B3)
    z3 = fp.add(t1, t2b)
    t1m = fp.sub(t1, t2b)
    y3b = fp.mul_small(y3, B3)
    # stage 2: six independent products
    n1, n2, n3, n4, n5, n6 = _mul6(
        [t4, t3, y3b, t1m, t0_3, z3],
        [y3b, t1m, t0_3, z3, t3, t4])
    x3 = fp.sub(n2, n1)
    y3 = fp.add(n4, n3)
    z3 = fp.add(n6, n5)
    return _settle(PointVec(x3, y3, z3))


def double(p: PointVec) -> PointVec:
    """Complete projective doubling (RCB16 Algorithm 9, a=0), two-stage."""
    if _rns_kernel():
        from . import rns_kernels
        return rns_kernels.point_double(p)
    x, y, z = p
    t0, t1, t2r, m4 = _mul6([y, y, z, x], [y, z, z, y])
    t2 = fp.mul_small(t2r, B3)
    z3s = fp.add(fp.add(fp.add(t0, t0), fp.add(t0, t0)),
                 fp.add(fp.add(t0, t0), fp.add(t0, t0)))  # 8*t0
    y3s = fp.add(t0, t2)
    t0m = fp.sub(t0, fp.add(fp.add(t2, t2), t2))  # t0 - 3*t2
    n1, n2, n3, n4 = _mul6([t2, t0m, t1, t0m], [z3s, y3s, z3s, m4])
    x3 = fp.add(n4, n4)
    y3 = fp.add(n1, n2)
    z3 = n3
    return _settle(PointVec(x3, y3, z3))


def neg(p: PointVec) -> PointVec:
    return PointVec(p.x, fp.neg(p.y), p.z)


def select(mask: jnp.ndarray, p: PointVec, q: PointVec) -> PointVec:
    return PointVec(fp.where(mask, p.x, q.x),
                    fp.where(mask, p.y, q.y),
                    fp.where(mask, p.z, q.z))


def pmap_coords(fn, p: PointVec) -> PointVec:
    return PointVec(fp.fmap(fn, p.x), fp.fmap(fn, p.y), fp.fmap(fn, p.z))


# -- host <-> device ---------------------------------------------------------

def from_affine_host(pts: Sequence[Affine]) -> PointVec:
    """Host affine points -> device PointVec (infinity -> (0:1:0))."""
    return PointVec(
        fp.from_ints([(pt[0] if pt else 0) for pt in pts]),
        fp.from_ints([(pt[1] if pt else 1) for pt in pts]),
        fp.from_ints([(1 if pt else 0) for pt in pts]))


def to_affine_host(p: PointVec) -> List[Affine]:
    """Exact host-side projective->affine (bignum canonicalize + invert).

    Fetches all three coordinate planes as ONE stacked transfer — each D2H
    through the TPU tunnel costs ~25ms of latency regardless of size. The
    backend canonicalizes on device (fp.prepare_fetch) so the host only
    recomposes bytes."""
    with profiling.span("to_affine_host.fetch"):
        # ONE jitted program (eager prepare_fetch was ~200ms of per-op
        # tunnel dispatches), ONE D2H transfer
        prep = _compiled("prep_fetch", lambda px, py, pz: jnp.stack(
            [fp.prepare_fetch(px), fp.prepare_fetch(py),
             fp.prepare_fetch(pz)]))
        stacked = np.asarray(prep(p.x, p.y, p.z))
    xs = fp.ints_from_fetched(stacked[0])
    ys = fp.ints_from_fetched(stacked[1])
    zs = fp.ints_from_fetched(stacked[2])
    zinvs = fh.fp_batch_inv(zs)              # ONE fp_inv for the whole batch
    out: List[Affine] = []
    for x, y, zi in zip(xs, ys, zinvs):
        if zi == 0:
            out.append(None)
        else:
            out.append((x * zi % fh.P, y * zi % fh.P))
    return out


def to_affine_host_single(p: PointVec) -> Affine:
    return to_affine_host(pmap_coords(lambda a: a.reshape(1, -1), p))[0]


def to_affine_host_xy(p: PointVec) -> List[Affine]:
    """Affine download via device-side normalization + x||y byte rows
    (compress_dev.compress_xy): 96 B/point instead of 3 raw coordinate
    planes (888 B/point) and no host batch inversion — the shuffle's
    1024-point fetch dropped ~150 ms with this path."""
    from . import compress_dev
    with profiling.span("to_affine_host_xy"):
        rows = np.asarray(
            _compiled("compress_xy_fetch", compress_dev.compress_xy)(p))
        return [compress_dev.decode_xy_host(r) for r in rows]


# -- scalar multiplication / MSM ---------------------------------------------
#
# Every scalar-mul/MSM runs GLV-decomposed with signed 4-bit digits
# (ops/glv.py; gnark ScalarMultiplication's GLV+wNAF, SURVEY.md §2.2):
# point lanes extend 2x (lane 2i = P_i, lane 2i+1 = phi(P_i) — one cheap
# Fp mul, not a point op), scalars split into two <2^128 halves, so the
# window chain halves (64 -> 33, padded 40) and the multiples tables store
# 9 magnitudes instead of 16 entries (negation is free: -(X:Y:Z)=(X:-Y:Z)).

WINDOW_BITS = glv.WINDOW_BITS
NUM_WINDOWS = glv.NUM_WINDOWS      # 33 signed GLV windows (no padding on
                                   # the XLA paths; kernels pad internally)
TABLE_SIZE = glv.TABLE_SIZE        # digit magnitudes 0..8


def scalars_to_digits(scalars: Sequence[int]) -> np.ndarray:
    """[n] ints -> [2n, NUM_WINDOWS] int32 signed GLV digits, MSB window
    first, lanes interleaved (row 2i = s1_i for P_i, 2i+1 = s2_i for
    phi(P_i))."""
    return glv.scalars_to_digits_glv([int(s) % fh.R for s in scalars])


_beta_cache = {}


def _beta_elem() -> Fp:
    """The GLV cube root of unity as a broadcastable device constant.
    Only the HOST numpy limb array is cached (fp.from_int is host-pure;
    a traced jnp constant must not escape one jit trace into another);
    the Element wrapper is rebuilt per use so each trace embeds its own
    literal."""
    if fp.BACKEND not in _beta_cache:
        _beta_cache[fp.BACKEND] = np.asarray(fp.from_int(glv.BETA))
    return Fp(jnp.asarray(_beta_cache[fp.BACKEND]), fp.CANONICAL)


def _interleave2(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """[..., n, L] x2 -> [..., 2n, L] with rows interleaved a0,b0,a1,b1..."""
    st = jnp.stack([a, b], axis=-2)                  # [..., n, 2, L]
    return st.reshape(st.shape[:-3] + (st.shape[-3] * 2, st.shape[-1]))


def extend_table_glv(table: PointVec) -> PointVec:
    """[T, ..., n] multiples table -> [T, ..., 2n] with phi lanes
    interleaved. phi(d*P) = d*phi(P) since phi is an endomorphism, so the
    whole extension is ONE field mul of the x plane by beta."""
    bx = fp.carry_to(fp.mul(table.x, _beta_elem()), REDUCED)
    xs = _interleave2(table.x.limbs, bx.limbs)
    ys = _interleave2(table.y.limbs, table.y.limbs)
    zs = _interleave2(table.z.limbs, table.z.limbs)
    return PointVec(Fp(xs, _iv_join(table.x.iv, bx.iv)),
                    Fp(ys, table.y.iv), Fp(zs, table.z.iv))


def _iv_join(a, b):
    """Join two interval/bound tags (int bounds for rns, 4-tuples for limb)."""
    if isinstance(a, int):
        return max(a, b)
    return (min(a[0], b[0]), max(a[1], b[1]),
            min(a[2], b[2]), max(a[3], b[3]))


def _iv_geq(a, b):
    if isinstance(a, int):
        return a >= b
    return all(x >= y for x, y in zip((-a[0], a[1], -a[2], a[3]),
                                      (-b[0], b[1], -b[2], b[3])))


def _stack_points(ps: Sequence[PointVec]) -> PointVec:
    return PointVec(fp.stack([q.x for q in ps]),
                    fp.stack([q.y for q in ps]),
                    fp.stack([q.z for q in ps]))


def _unstack_points(pv: PointVec, k: int) -> List[PointVec]:
    return [pmap_coords(lambda t, i=i: t[i], pv) for i in range(k)]


def _build_table(p: PointVec) -> PointVec:
    """Stacked multiples table: entry d = d*P_i, d = 0..8; [9, ..., n]
    points — signed digits only need MAGNITUDES (the select negates y).

    Built in THREE batched adds of widths 1/2/4 (serial depth 3) instead of
    8 dependent adds: level L computes 2^(L-1)+1 .. 2^L as d_hi + d_lo with
    the already-known halves stacked on a new leading axis. The serial chain
    is the latency floor of every MSM program, so depth matters more than
    lane count here (the widths are far under one VPU's lanes anyway).

    Always plain XLA ops: inlined Pallas adds here would re-lower the whole
    Mosaic kernel per call site inside every jitted MSM program (the round-2
    device-prover's minutes-long MLIR blowup)."""
    with _xla_point_ops():
        return _build_table_xla(p)


def _build_table_xla(p: PointVec) -> PointVec:
    p = _settle(p)
    d = [None, p, add(p, p)]                                  # d1, d2
    d += _unstack_points(add(_stack_points([d[2], d[2]]),
                             _stack_points([p, d[2]])), 2)    # d3, d4
    d += _unstack_points(add(_stack_points([d[4]] * 4),
                             _stack_points(d[1:5])), 4)       # d5..d8
    inf = _settle(infinity(p.batch_shape))
    tab = _stack_points([inf] + [_settle(q) for q in d[1:]])  # [9, ..., n]
    return PointVec(Fp(tab.x.limbs, REDUCED), Fp(tab.y.limbs, REDUCED),
                    Fp(tab.z.limbs, REDUCED))


def _onehot(digits: jnp.ndarray) -> jnp.ndarray:
    """[...] int32 magnitudes -> [TABLE_SIZE, ...] one-hot in the fp dtype."""
    rng = jnp.arange(TABLE_SIZE, dtype=jnp.int32)
    rng = rng.reshape((TABLE_SIZE,) + (1,) * digits.ndim)
    return (digits[None] == rng).astype(fp.DTYPE)


def _neg_y(y: Fp, neg_mask: jnp.ndarray) -> Fp:
    """Conditionally negate the y plane where the signed digit was negative
    (free point negation: -(X:Y:Z) = (X:-Y:Z))."""
    return fp.where(neg_mask, fp.neg(y), y)


def _table_select(table: PointVec, digits: jnp.ndarray) -> PointVec:
    """table [9, ..., n], signed digits [..., n] -> [..., n] points."""
    oh = _onehot(jnp.abs(digits))  # [9, ..., n]
    pick = lambda t: jnp.einsum("d...n,d...nl->...nl", oh, t,
                                precision=jax.lax.Precision.HIGHEST)
    f = lambda c: Fp(pick(c.limbs), c.iv)
    return PointVec(f(table.x),
                    _neg_y(f(table.y), digits < 0), f(table.z))


def _table_select_windows(table: PointVec, digits: jnp.ndarray) -> PointVec:
    """table [9, ..., n], signed digits [..., n, W] -> [..., W, n] points."""
    oh = _onehot(jnp.abs(digits))  # [9, ..., n, W]
    pick = lambda t: jnp.einsum("d...nw,d...nl->...wnl", oh, t,
                                precision=jax.lax.Precision.HIGHEST)
    f = lambda c: Fp(pick(c.limbs), c.iv)
    neg = jnp.moveaxis(digits < 0, -1, -2)             # [..., W, n]
    return PointVec(f(table.x), _neg_y(f(table.y), neg), f(table.z))


def _x16_add(acc: PointVec, w: PointVec) -> PointVec:
    """acc = 16*acc + w: one fused kernel on the TPU rns path (the Horner
    serial step), 4 doubles + 1 add elsewhere."""
    if _rns_kernel():
        from . import rns_kernels
        return rns_kernels.point_x16_add(acc, w)
    for _ in range(WINDOW_BITS):
        acc = double(acc)
    return add(acc, w)


def _windowed_combine_kernel(sel: PointVec, win_axis: int) -> PointVec:
    """TPU rns fast path: acc = 16*acc + sel_w over the window axis as ONE
    streamed Pallas kernel (rns_kernels.windowed_combine)."""
    from . import rns_kernels

    batch = None
    n_win = sel.x.limbs.shape[win_axis]

    def prep(t):
        nonlocal batch
        m = jnp.moveaxis(t, win_axis, 0)        # win axis of the limb array
        batch = m.shape[1:-1]
        return m.reshape(n_win, -1, t.shape[-1])

    sx, sy, sz = prep(sel.x.limbs), prep(sel.y.limbs), prep(sel.z.limbs)
    rows = sx.shape[1]
    pad = (-rows) % 8
    if pad:
        z = jnp.zeros((n_win, pad, sx.shape[-1]), sx.dtype)
        sx, sy, sz = (jnp.concatenate([a, z], axis=1) for a in (sx, sy, sz))
    out = rns_kernels.windowed_combine(
        (sx, sy, sz), (sel.x.iv, sel.y.iv, sel.z.iv), n_win)
    f = lambda t: t[:rows].reshape(batch + (t.shape[-1],))
    return pmap_coords(f, out)


def _horner(windows: PointVec) -> PointVec:
    """Combine [..., W] window sums MSB-first: acc = 16*acc + S_w."""
    if _rns_kernel():
        return _windowed_combine_kernel(windows, win_axis=-2)

    n_win = windows.x.limbs.shape[-2]

    def body(i, acc):
        w = pmap_coords(lambda a, i=i: a[..., i, :], windows)
        w = PointVec(Fp(w.x.limbs, REDUCED), Fp(w.y.limbs, REDUCED),
                     Fp(w.z.limbs, REDUCED))
        return _x16_add(acc, w)

    acc0 = _settle(infinity(windows.x.limbs.shape[:-2]))
    return jax.lax.fori_loop(0, n_win, body, acc0)


_CHUNK_LANES = 1 << 15  # max point-lanes per fused add (bounds conv temps)


def _add_chunked(a: PointVec, b: PointVec) -> PointVec:
    """Pointwise add, sliced along the points axis so each fused add's
    convolution temporaries stay bounded (a [.., 64, 512]-shaped add would
    otherwise hold multi-GB 97-limb intermediates live and OOM HBM)."""
    h = a.x.limbs.shape[-2]
    rows = int(np.prod(a.x.limbs.shape[:-2])) if a.x.limbs.ndim > 2 else 1
    if rows * h <= _CHUNK_LANES:
        return add(a, b)
    csize = max(1, _CHUNK_LANES // rows)
    outs = []
    for s in range(0, h, csize):
        e = min(h, s + csize)
        aa = pmap_coords(lambda t: t[..., s:e, :], a)
        bb = pmap_coords(lambda t: t[..., s:e, :], b)
        outs.append(add(aa, bb))
    return PointVec(
        fp.concat([o.x for o in outs], axis=-2),
        fp.concat([o.y for o in outs], axis=-2),
        fp.concat([o.z for o in outs], axis=-2))


def _reduce_points_axis(cur: PointVec, axis_len: int,
                        unroll_to: int = 8) -> PointVec:
    """Sum [..., m] points over the (second-to-last limb-array) m axis.

    Big levels are unrolled (halving shapes keep the work minimal); once the
    width drops to `unroll_to`, the tail runs as a lax.fori_loop log-step
    roll-reduction (lane i += lane i+2^k; lane 0 ends holding the total) so
    the remaining log2 levels share ONE traced add body.

    Always plain XLA ops (see _build_table): the tree's shrinking batches
    are latency-bound as per-level Pallas launches and each level would
    inline another Mosaic kernel instance.
    """
    with _xla_point_ops():
        return _reduce_points_axis_xla(cur, axis_len, unroll_to)


def _reduce_points_axis_xla(cur: PointVec, axis_len: int,
                            unroll_to: int = 8) -> PointVec:
    m = axis_len
    while m > unroll_to or (m > 1 and m & (m - 1)):
        half = (m + 1) // 2
        a = pmap_coords(lambda t: t[..., :half, :], cur)
        b = pmap_coords(lambda t: t[..., half:m, :], cur)
        if m & 1:  # odd level (non-pow2 widths): pad b with one infinity
            pad = _settle(infinity(b.batch_shape[:-1] + (1,)))
            b = PointVec(fp.concat([b.x, pad.x], axis=-2),
                         fp.concat([b.y, pad.y], axis=-2),
                         fp.concat([b.z, pad.z], axis=-2))
        cur = _add_chunked(a, b)
        m = half
    if m > 1:
        steps = m.bit_length() - 1

        def body(i, c):
            h = jnp.right_shift(jnp.int32(m), i + 1)
            rolled = pmap_coords(
                lambda t: jnp.roll(t, -h, axis=-2), c)
            return add(c, rolled)

        cur = jax.lax.fori_loop(0, steps, body, cur)
    return pmap_coords(lambda t: t[..., 0, :], cur)


def _settle_tags(p: PointVec) -> PointVec:
    return PointVec(Fp(p.x.limbs, REDUCED), Fp(p.y.limbs, REDUCED),
                    Fp(p.z.limbs, REDUCED))


def msm_windows_device(points: PointVec, digits: jnp.ndarray) -> PointVec:
    """Wide phase of the MSM: points [..., n], GLV digits [..., 2n, W] ->
    [..., W] window sums. Leading dims batch independent MSMs (over shared
    OR distinct bases) through one table/select/reduce pipeline. The narrow
    window combine happens on the host (fh.g1_combine_windows) — the device
    keeps only the phases with lane-level parallelism."""
    table = extend_table_glv(_build_table(points))  # [9, ..., 2n]
    n2 = table.x.limbs.shape[-2]
    cur = _table_select_windows(table, digits)      # [..., W, 2n] points
    return _reduce_points_axis(_settle_tags(cur), n2)   # [..., W] points


def msm_device(points: PointVec, digits: jnp.ndarray) -> PointVec:
    """Fully-device MSM (windows + on-device Horner): the single-dispatch
    variant used by the device-resident prover, where the result feeds
    on-device transcript absorption instead of a host fetch."""
    return _horner(msm_windows_device(points, digits))


def _halves_add(ext: PointVec) -> PointVec:
    """Fold the interleaved GLV lanes back: out[i] = ext[2i] + ext[2i+1]."""
    a = pmap_coords(lambda t: t[..., 0::2, :], ext)
    b = pmap_coords(lambda t: t[..., 1::2, :], ext)
    with _xla_point_ops():
        return add(a, b)


def scalar_mul_device(points: PointVec, digits: jnp.ndarray) -> PointVec:
    """Batched per-point scalar mult: out[i] = s_i * P_i over [..., n]
    (GLV digits [..., 2n, W]): s1_i*P_i and s2_i*phi(P_i) run as adjacent
    lanes through the halved window chain, then fold with one add."""
    table = extend_table_glv(_build_table(points))      # [9, ..., 2n]
    if _rns_kernel():
        sel = _table_select_windows(table, digits)      # [..., W, 2n]
        ext = _windowed_combine_kernel(sel, win_axis=-3)
        return _halves_add(ext)

    def body(w, acc):
        sel = _table_select(table, digits[..., w])
        return _x16_add(acc, _settle_tags(sel))

    n2 = table.x.limbs.shape[-2]
    acc0 = _settle(infinity(points.batch_shape[:-1] + (n2,)))
    ext = jax.lax.fori_loop(0, digits.shape[-1], body, acc0)
    return _halves_add(ext)


def fold_device(pv: PointVec, digits: jnp.ndarray, h: jnp.ndarray) -> PointVec:
    """One folding-round base update (IPA / same-multiscalar inner loop,
    /root/reference/innerproductargument/innerproductargument.go:155-166):

        out[i] = pv[i] + gamma * pv[i + h]   for i < h;  infinity otherwise.

    h is a *traced* scalar so every round of the log-n recursion reuses the
    same compiled fixed-width program (the reference instead loops with
    shrinking slices; fixed shapes are what XLA wants).
    """
    n = pv.x.limbs.shape[-2]
    rolled = pmap_coords(lambda t: jnp.roll(t, -h, axis=-2), pv)
    scaled = scalar_mul_device(rolled, digits)
    folded = add(pv, scaled)
    lane = jnp.arange(n, dtype=jnp.int32)
    return select(lane < h, folded, _settle(infinity(folded.batch_shape)))


# -- host-facing cached-jit APIs --------------------------------------------

def _pad_pow2(n: int, minimum: int = 8) -> int:
    m = minimum
    while m < n:
        m *= 2
    return m


def _pad_fine(n: int) -> int:
    """Pad width for one-shot MSMs (the verifier's accumulator): 1.5x-pow2
    buckets above 1024 so a ~2.1k-base verify MSM runs 2560 lanes wide
    instead of 4096. Bucket count is kept tiny — every distinct width is a
    separate compiled executable on this backend."""
    if n <= 1024:
        return _pad_pow2(n)
    for w in (1536, 2048, 2560, 3072, 4096, 6144, 8192):
        if n <= w:
            return w
    return _pad_pow2(n)


_jit_cache = {}


def _compiled(name, fn):
    if name not in _jit_cache:
        from . import exe_cache
        _jit_cache[name] = exe_cache.cached_jit(fn, name=name)
    return _jit_cache[name]


def msm(points: Sequence[Affine], scalars: Sequence[int],
        pad_to: int = 0) -> Affine:
    """Host API: <scalars, points>, gnark MultiExp equivalent.

    pad_to: optional fixed padding size — the folding arguments pass their
    initial n so every round reuses ONE compiled shape instead of compiling
    log(n) shrinking shapes. Routed through StackedVec.msm_many: ONE
    device program (fused wide + Horner kernels on TPU) + one small fetch.
    """
    if len(points) != len(scalars):
        raise ValueError("msm: len(points) != len(scalars)")
    if not points:
        return None
    scalars = [int(s) % fh.R for s in scalars]
    # very wide MSMs (batched verification at batch=32 reaches ~17k bases):
    # stack 4096-lane segments as ROWS of one StackedVec — ONE device
    # program computes every segment's windows off one shared table build,
    # one fetch, host-added partials. Per-row select temporaries stay
    # bounded; points/s scales with n instead of paying a program+fetch
    # per segment (gnark MultiExp analog, /root/reference/common/util.go:14)
    SEG = 8192
    if len(points) > SEG:
        row_w = 4096
        rows = [list(points[s0:s0 + row_w])
                for s0 in range(0, len(points), row_w)]
        sv = StackedVec.from_affine(rows, pad_to=row_w)
        job = [[(i, scalars[i * row_w:(i + 1) * row_w], 0)
                for i in range(len(rows))]]
        return sv.msm_many(job)[0]
    if pad_to == 0:
        pad_to = _pad_fine(len(points))
    sv = StackedVec.from_affine([list(points)], pad_to=pad_to)
    return sv.msm_many([[(0, scalars, 0)]])[0]


def _table_select_jobs(table: PointVec, digits: jnp.ndarray) -> PointVec:
    """table [9, k, n2], signed digits [m, k, n2, w] -> [m, k, w, n2] points.

    Explicit batched dot_general over (k, n2) so XLA contracts the one-hot
    without materializing a [9, m, k, n2, w, l] broadcast (which OOMs at
    n=1024)."""
    m, k, n, w = digits.shape
    oh = (jnp.abs(digits)[..., None] ==
          jnp.arange(TABLE_SIZE, dtype=jnp.int32)).astype(fp.DTYPE)
    # [m,k,n,w,9] -> [k,n,9,m*w]
    oh = oh.transpose(1, 2, 4, 0, 3).reshape(k, n, TABLE_SIZE, m * w)

    def pick(t):   # t: [9, k, n, l]
        tt = t.transpose(1, 2, 0, 3)               # [k, n, 9, l]
        out = jax.lax.dot_general(
            oh, tt,
            dimension_numbers=(((2,), (2,)), ((0, 1), (0, 1))),
            preferred_element_type=fp.DTYPE,
            precision=jax.lax.Precision.HIGHEST)    # [k, n, m*w, l]
        out = out.reshape(k, n, m, w, -1)
        return out.transpose(2, 0, 3, 1, 4)         # [m, k, w, n, l]

    f = lambda c: Fp(pick(c.limbs), c.iv)
    neg = (digits < 0).transpose(0, 1, 3, 2)        # [m, k, w, n]
    return PointVec(f(table.x), _neg_y(f(table.y), neg), f(table.z))


def msm_stacked_device(points: PointVec, digits: jnp.ndarray) -> PointVec:
    """MSMs over stacked bases with per-job digit sets.

    points: [k, n]; GLV digits: [m, k, 2n, W] -> [m, k] points. The k base
    vectors' multiples tables are built ONCE and shared by all m jobs."""
    table = extend_table_glv(_build_table(points))  # [9, k, 2n]
    n2 = table.x.limbs.shape[-2]
    cur = _table_select_jobs(table, digits)         # [m, k, W, 2n]
    windows = _reduce_points_axis(_settle_tags(cur), n2)   # [m, k, W]
    return _horner(windows)


def msm_rows_windows_device(points: PointVec, digits: jnp.ndarray,
                            rows: tuple) -> PointVec:
    """MSM jobs that each target ONE base row (the folding arguments' case).

    points: [k, n]; GLV digits: [m, 2n, W]; rows: static per-job base
    indices -> [m, W] window sums (host-combined). Computes m selected-row
    pipelines instead of the full m x k product of msm_stacked_device
    (3x less work for the same-multiscalar rounds, 2x for the IPA rounds)."""
    table = extend_table_glv(_build_table(points))          # [9, k, 2n]
    return msm_rows_windows_from_table(table, digits, rows)


def msm_rows_windows_from_table(table: PointVec, digits: jnp.ndarray,
                                rows) -> PointVec:
    """Same as msm_rows_windows_device but over a precomputed (extended)
    multiples table [9, k, 2n] — the bases of a folding argument never
    change under the lazy-fold scheme, so the table is built once per
    argument.

    `rows` may be a static tuple OR a traced [m] int32 vector: the traced
    form keeps the jit cache keyed only on (k, n, m) instead of compiling
    one executable per row layout (round-1 cold-verify cost)."""
    n2 = table.x.limbs.shape[-2]
    if isinstance(rows, tuple):
        rows = np.asarray(rows, dtype=np.int32)
    tab = pmap_coords(lambda t: jnp.take(t, rows, axis=1), table)  # [9,m,2n]

    if _rns_kernel() and n2 >= 512:
        # whole wide phase as ONE streamed Pallas kernel (~3.3x the XLA
        # graph's exec rate). Gated to large lane counts: each (m, n) shape
        # costs a one-time Mosaic compile through the TPU tunnel, which
        # only pays for itself where the reduce is long.
        from . import rns_kernels
        bound = max(fp.REDUCED, tab.x.iv, tab.y.iv, tab.z.iv) \
            if isinstance(tab.x.iv, int) else fp.REDUCED
        wx, wy, wz = rns_kernels.msm_select_reduce(
            (tab.x.limbs, tab.y.limbs, tab.z.limbs), digits, bound)
        return PointVec(Fp(wx, 6), Fp(wy, 6), Fp(wz, 6))

    m, nn, w = digits.shape
    oh = (jnp.abs(digits)[..., None] ==
          jnp.arange(TABLE_SIZE, dtype=jnp.int32)).astype(fp.DTYPE)
    oh = oh.transpose(0, 1, 3, 2)                           # [m, 2n, 9, w]

    def pick(t):   # t: [9, m, 2n, l]
        tt = t.transpose(1, 2, 0, 3)                        # [m, 2n, 9, l]
        out = jax.lax.dot_general(
            oh, tt, dimension_numbers=(((2,), (2,)), ((0, 1), (0, 1))),
            preferred_element_type=fp.DTYPE,
            precision=jax.lax.Precision.HIGHEST)            # [m, 2n, w, l]
        return out.transpose(0, 2, 1, 3)                    # [m, w, 2n, l]

    neg = (digits < 0).transpose(0, 2, 1)                   # [m, w, 2n]
    cur = PointVec(Fp(pick(tab.x.limbs), tab.x.iv),
                   _neg_y(Fp(pick(tab.y.limbs), tab.y.iv), neg),
                   Fp(pick(tab.z.limbs), tab.z.iv))
    return _reduce_points_axis(_settle_tags(cur), n2)       # [m, W]


def build_table_device(points: PointVec) -> PointVec:
    """Jit entry for the [9, k, 2n] GLV-extended multiples table (cached
    per StackedVec)."""
    return _compiled("build_table",
                     lambda p: extend_table_glv(_build_table(p)))(points)


def _retag(p: PointVec) -> PointVec:
    return PointVec(Fp(p.x.limbs, REDUCED), Fp(p.y.limbs, REDUCED),
                    Fp(p.z.limbs, REDUCED))


def _msm_combined(st_table, st_dig, dyn_pv, dyn_dig):
    """The verifier's whole final MSM as ONE device program: the static
    (CRS) row's windows off its CACHED multiples table + the per-proof
    rows' windows off an in-program table build, window sums combined
    POINTWISE, one Horner, one output point.

    Replaces the two-program static+dynamic split (whose second serial
    33-step Horner and extra fetch cost more than the saved table build)
    and the reference's full per-verify table rebuild
    (msmaccumulator.go:49-64 -> gnark MultiExp)."""
    rows0 = jnp.zeros(1, jnp.int32)
    k = dyn_pv.x.limbs.shape[0]
    ws = msm_rows_windows_from_table(st_table, st_dig, rows0)      # [1, W]
    dt = extend_table_glv(_build_table(dyn_pv))                    # [9,k,2n]
    wd = msm_rows_windows_from_table(
        dt, dyn_dig, jnp.arange(k, dtype=jnp.int32))               # [k, W]
    with _xla_point_ops():
        acc = _retag(ws)
        for i in range(k):
            acc = add(acc, _retag(pmap_coords(lambda t, i=i: t[i:i + 1],
                                              wd)))
    return _horner(acc)                                            # [1]


def msm_with_static(static_sv: "StackedVec", static_scalars: Sequence[int],
                    points: Sequence[Affine],
                    scalars: Sequence[int]) -> Affine:
    """<static_scalars, static_sv row 0> + <scalars, points> in ONE device
    program + ONE fetch (see _msm_combined). Wide dynamic sets run as
    4096-lane rows of the same program."""
    n_d = len(points)
    row_w = _pad_fine(n_d) if n_d <= 4096 else 4096
    k = -(-n_d // row_w)
    pts = list(points) + [None] * (k * row_w - n_d)
    sc = [int(s) % fh.R for s in scalars] + [0] * (k * row_w - n_d)
    dyn_pv = pmap_coords(lambda t: t.reshape(k, row_w, -1),
                         from_affine_host(pts))
    dyn_dig = np.stack([scalars_to_digits(sc[i * row_w:(i + 1) * row_w])
                        for i in range(k)])                  # [k, 2w, W]
    st_dig = scalars_to_digits(
        [int(s) % fh.R for s in static_scalars]
        + [0] * (static_sv.width - len(static_scalars)))[None]
    mode = "k" if _rns_kernel() else "x"
    out = _compiled(f"msm_comb_{mode}{static_sv.width}x{k}x{row_w}",
                    _msm_combined)(
        static_sv.table(), jnp.asarray(st_dig), dyn_pv,
        jnp.asarray(dyn_dig))
    return to_affine_host(out)[0]


def msm_rows_device(points: PointVec, digits: jnp.ndarray,
                    rows: tuple) -> PointVec:
    """Fully-device per-row MSM (device Horner): used by the device-resident
    prover where results stay on-device for transcript absorption."""
    return _horner(msm_rows_windows_device(points, digits, rows))


def msm_rows_points_from_table(table: PointVec, digits: jnp.ndarray,
                               rows) -> PointVec:
    """Per-row MSM jobs straight to FINAL points, all on device.

    table [16, k, n]; digits [m, n, 64]; rows [m] int32 (or static tuple).
    On TPU the whole job is TWO Pallas kernels: the streamed select+reduce
    wide phase (rns_kernels.msm_select_reduce) and the streamed Horner tail
    (rns_kernels.windowed_combine). Replaces the round-2 scheme that fetched
    m*64 window points for a ~2.5ms/point host Horner: the fetch shrinks to
    m points and each phase is one kernel launch."""
    wins = msm_rows_windows_from_table(table, digits, rows)
    return _horner(wins)


class StackedVec:
    """k device-resident base vectors [k, n] folded/queried together.

    The folding arguments (IPA: [Gs, Gs']; same-multiscalar: [G, T, U]) keep
    all their bases stacked so each round is ONE device call computing every
    cross-term MSM (one shared table/select/reduce/Horner pipeline) and ONE
    batched fold — and the round's output points come back in a single ~25ms
    D2H fetch instead of 6-9."""

    def __init__(self, pv: PointVec, n_valid: int):
        self.pv = pv                       # [k, n]
        self.k = pv.x.limbs.shape[0]
        self.width = pv.x.limbs.shape[1]
        self.n_valid = n_valid
        self._table = None                 # cached [16, k, n] multiples table

    def table(self) -> PointVec:
        if self._table is None:
            self._table = build_table_device(self.pv)
        return self._table

    @classmethod
    def from_affine(cls, vecs: Sequence[Sequence[Affine]],
                    pad_to: int = 0) -> "StackedVec":
        """pad_to: exact device width when >= the widest vector (callers
        pick a compile-friendly bucket, e.g. _pad_fine); otherwise the
        width is the next power of two."""
        k = len(vecs)
        n_valid = max(len(v) for v in vecs)
        n = pad_to if pad_to >= n_valid else _pad_pow2(n_valid)
        flat = []
        for v in vecs:
            flat.extend(list(v) + [None] * (n - len(v)))
        pv = from_affine_host(flat)
        pv = pmap_coords(lambda t: t.reshape(k, n, -1), pv)
        return cls(pv, n_valid)

    def msm_many(self, jobs: Sequence[Sequence[tuple]]) -> List[Affine]:
        """jobs[j] = list of (base_index, scalars, offset) triples summed into
        output j: out[j] = sum_i <scalars_i, bases[b_i][off_i:off_i+len]>.
        ONE device call + ONE fetch for all outputs."""
        with profiling.span(f"msm_many[{len(jobs)}x{self.k}x{self.width}]"):
            return self._msm_many(jobs)

    def _msm_many(self, jobs):
        # expand to one MSM per (job, base) term; each term targets a single
        # base row, so msm_rows_device skips the zero-digit (job x base)
        # combinations msm_stacked_device would compute
        terms_flat = []
        owners = []
        for j, terms in enumerate(jobs):
            for (bi, scalars, offset) in terms:
                sc = [0] * self.width
                for i, s in enumerate(scalars):
                    sc[offset + i] = int(s) % fh.R
                terms_flat.append((bi, scalars_to_digits(sc)))
                owners.append(j)
        # pad the term count to a bucket so the jit cache is keyed on
        # (k, n, bucket) only — row indices are a traced gather vector
        # (padding rows carry zero digits -> infinity outputs, dropped)
        t_real = len(terms_flat)
        t_pad = next(b for b in (2, 3, 4, 6, 8, 12, 16, 24, 32, 48, 64)
                     if b >= t_real) if t_real <= 64 else _pad_pow2(t_real)
        digit_rows = np.zeros((t_pad,) + terms_flat[0][1].shape, np.int32)
        rows_idx = np.zeros(t_pad, np.int32)
        for t, (bi, d) in enumerate(terms_flat):
            digit_rows[t] = d
            rows_idx[t] = bi
        res = [None] * len(jobs)
        if _rns_kernel():
            # device Horner: fetch m final points instead of m*64 windows
            out = _compiled(
                f"msm_rows_pts_t{t_pad}x{self.k}x{self.width}",
                msm_rows_points_from_table,
            )(self.table(), jnp.asarray(digit_rows), jnp.asarray(rows_idx))
            flat = to_affine_host(out)               # one tiny fetch
            for t, j in enumerate(owners):
                res[j] = fh.g1_add(res[j], flat[t])
            return res
        out = _compiled(
            f"msm_rows_t{t_pad}x{self.k}x{self.width}",
            msm_rows_windows_from_table,
        )(self.table(), jnp.asarray(digit_rows), jnp.asarray(rows_idx))
        flat = to_affine_host(out)                   # one stacked fetch
        for t, j in enumerate(owners):
            term = fh.g1_combine_windows(
                flat[t * NUM_WINDOWS:(t + 1) * NUM_WINDOWS], WINDOW_BITS)
            res[j] = fh.g1_add(res[j], term)
        return res

    def fold(self, gammas) -> "StackedVec":
        """Fold all k base rows; `gammas` is one scalar or one per row."""
        with profiling.span(f"fold[{self.k}x{self.width}]"):
            return self._fold(gammas)

    def _fold(self, gammas) -> "StackedVec":
        h = self.n_valid // 2
        if isinstance(gammas, int):
            gammas = [gammas] * self.k
        digits = np.stack([
            np.tile(scalars_to_digits([g % fh.R]), (self.width, 1))
            for g in gammas])                    # [k, 2*width, W] interleaved
        pv = _compiled("fold", fold_device)(self.pv, jnp.asarray(digits),
                                            jnp.int32(h))
        return StackedVec(pv, h)



class FoldedBases:
    """Lazy folding view over a StackedVec: folds and per-lane rescales are
    scalar-side transforms, not device base updates.

    The folding arguments update bases G' = G_lo + gamma*G_hi every round
    (/root/reference/innerproductargument/innerproductargument.go:155-166,
    samemultiscalarargument.go:85-140). Since <v, G'> = <v ++ gamma*v, G>,
    the prover can instead keep the ORIGINAL bases on device — the multiples
    table is built once per argument — and push every fold into the scalars
    (O(n) host Fr muls per round). This removes the per-round device fold
    (a full 256-bit scalar-mul chain, the prover's single largest cost) and
    the per-round table rebuild, while producing byte-identical proofs.

    A logical row maps to a base row plus an optional per-lane diagonal
    multiplier d (row = d[i]*base[i]): <v, d.base> = <v*d, base>. The
    grand-product argument uses this for its rescaled bases Gs' = Gs*beta^-i
    (grandproductargument.go:94-103) — no device rescale at all.
    """

    def __init__(self, sv: StackedVec, rows: Sequence[int] = None,
                 diags: dict = None, gammas: List[List[int]] = None,
                 n_valid: int = None):
        self.sv = sv
        self.rows = list(rows) if rows is not None else list(range(sv.k))
        self.k = len(self.rows)
        self.width = sv.width
        self.diags = diags or {}          # logical row -> per-lane multiplier
        self.gammas = gammas or []        # one list of per-logical-row g/round
        self.n_valid = sv.n_valid if n_valid is None else n_valid

    @classmethod
    def from_affine(cls, vecs: Sequence[Sequence[Affine]],
                    pad_to: int = 0) -> "FoldedBases":
        return cls(StackedVec.from_affine(vecs, pad_to=pad_to))

    def fold(self, gammas) -> "FoldedBases":
        """Record a fold out[i] = in[i] + gamma_row * in[i + n/2]; no device
        work. `gammas` is one scalar or one per logical row."""
        if not isinstance(gammas, (list, tuple)):
            gammas = [gammas] * self.k
        return FoldedBases(self.sv, self.rows, self.diags,
                           self.gammas + [list(gammas)], self.n_valid // 2)

    def _expand(self, row: int, scalars: Sequence[int], offset: int):
        """Lift (scalars at offset, current fold level) to level-0 scalars."""
        u = [0] * self.n_valid
        for i, s in enumerate(scalars):
            u[offset + i] = int(s) % fh.R
        for per_row in reversed(self.gammas):
            g = per_row[row]
            u = u + [s * g % fh.R for s in u]
        d = self.diags.get(row)
        if d is not None:
            u = [s * di % fh.R if di is not None else s
                 for s, di in zip(u, list(d) + [1] * (len(u) - len(d)))]
        return u

    def msm_many(self, jobs: Sequence[Sequence[tuple]]) -> List[Affine]:
        out_jobs = [[(self.rows[r], self._expand(r, sc, off), 0)
                     for (r, sc, off) in terms] for terms in jobs]
        return self.sv.msm_many(out_jobs)


class DeviceVec:
    """A device-resident, fixed-width vector of G1 points.

    The folding arguments keep their bases on-device across all log(n)
    rounds: only the per-round L/R cross terms (single points) cross the
    host boundary for the Fiat-Shamir transcript. Width N is fixed (padded
    with infinity) so every round hits the same compiled executables.
    """

    def __init__(self, pv: PointVec, n_valid: int):
        self.pv = pv
        self.n_valid = n_valid
        self.width = pv.x.limbs.shape[0]

    @classmethod
    def from_affine(cls, pts: Sequence[Affine], pad_to: int = 0) -> "DeviceVec":
        n = _pad_pow2(max(len(pts), pad_to))
        pv = from_affine_host(list(pts) + [None] * (n - len(pts)))
        return cls(pv, len(pts))

    def msm(self, scalars: Sequence[int], offset: int = 0) -> Affine:
        """<scalars, self[offset : offset+len(scalars)]>."""
        sc = [0] * self.width
        for i, s in enumerate(scalars):
            sc[offset + i] = int(s) % fh.R
        digits = jnp.asarray(scalars_to_digits(sc))
        out = _compiled("msmw", msm_windows_device)(self.pv, digits)
        return fh.g1_combine_windows(to_affine_host(out), WINDOW_BITS)

    def fold(self, gamma: int) -> "DeviceVec":
        """self'[i] = self[i] + gamma*self[i + n/2], halving n_valid."""
        h = self.n_valid // 2
        digits = jnp.asarray(
            np.tile(scalars_to_digits([gamma % fh.R]), (self.width, 1)))
        pv = _compiled("fold", fold_device)(self.pv, digits,
                                            jnp.int32(h))
        return DeviceVec(pv, h)

    def to_affine(self) -> List[Affine]:
        return to_affine_host(self.pv)[: self.n_valid]


def msm_batch(jobs: Sequence[tuple]) -> List[Affine]:
    """Independent small MSMs in one device call + one fetch:
    jobs[j] = (points_j, scalars_j). Pads every job to a common width."""
    jobs = [(list(p), [int(s) % fh.R for s in sc]) for p, sc in jobs]
    width = _pad_pow2(max((len(p) for p, _ in jobs), default=1))
    sv = StackedVec.from_affine([p for p, _ in jobs], pad_to=width)
    return sv.msm_many([[(j, sc, 0)] for j, (_, sc) in enumerate(jobs)])


def batch_scalar_mul(points: Sequence[Affine], scalars: Sequence[int]) -> List[Affine]:
    """Host API: [s_i * P_i] (the shuffle's k*Rs / k*Ss hot path,
    /root/reference/common/util.go:55-63)."""
    if len(points) != len(scalars):
        raise ValueError("batch_scalar_mul: length mismatch")
    if not points:
        return []
    n = _pad_pow2(len(points))
    pts = list(points) + [None] * (n - len(points))
    sc = [int(s) % fh.R for s in scalars] + [0] * (n - len(scalars))
    with profiling.span(f"batch_scalar_mul[{n}]"):
        pv = from_affine_host(pts)
        digits = scalars_to_digits(sc)
        out = _compiled("smul", scalar_mul_device)(pv, digits)
        return to_affine_host_xy(out)[: len(points)]
