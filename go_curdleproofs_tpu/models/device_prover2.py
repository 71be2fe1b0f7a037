"""Device-resident folding provers: host-dispatched pre-compiled pieces with
LAZY base folding.

Mirrors /root/reference/innerproductargument/innerproductargument.go:42-188
and samemultiscalarargument/samemultiscalarargument.go:37-157 byte-for-byte
(transcript, draw orders, proof bytes), restructured the TPU-native way:

  * the bases and their 16-entry multiples table live on device and are
    built ONCE per argument. The reference (and the round-2 prover) fold
    the bases physically every round (G' = G_lo + gamma*G_hi, a full
    scalar-mul chain per round — the prover's single largest cost). Since
    <v, G_r> = <lift(v), G_0>, every fold instead becomes O(n) device Fr
    lane algebra: a per-lane gamma-weight vector W (W[i0] multiplies in
    gamma_j for every fold bit set in i0) and the folded scalar vectors
    kept in REPLICATED form (CS[i0] = cs_r[i0 mod n_r]). Zero per-round
    point work besides the cross-term MSMs themselves.
  * each round is 4 small device programs (cross-MSMs, absorb+challenge,
    gamma^-1 ladder, Fr state update), each compiled once (half/bit-index
    are traced scalars, so ONE executable serves all log(n) rounds) and
    reused by every argument in the process;
  * all carries — STROBE transcript state, weight/scalar vectors — stay
    device-resident; the host loop only enqueues async dispatches, so
    rounds stream through the device queue with ZERO host round-trips;
  * the cross-term MSMs run as the two streamed Pallas kernels
    (rns_kernels.msm_select_reduce wide phase + windowed_combine Horner).

One fetch at the very end materializes the proof bytes + synced host
transcript.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import compress_dev, curve, fr, limb_kernels, strobe_dev
from ..ops.exe_cache import cached_jit
from ..ops.curve import PointVec
from ..ops.limb_field import REDUCED          # fr carry contract
from ..utils import field_host as fh
from ..utils import profiling
from ..utils.field_host import Affine
from ..utils.transcript import Transcript
from .device_common import (LABEL_ALPHA, LABEL_BETA, LABEL_GAMMA, LABEL_LOOP,
                            LABEL_STEP1, SM_LABEL_ALPHA, SM_LABEL_GAMMA,
                            SM_LABEL_LOOP, SM_LABEL_STEP1, _masked_inner,
                            _roll_fr, _stack_points, append_points_dev,
                            append_scalars_dev, broadcast_scalar,
                            challenge_fr, challenge_to_fr, fr_const,
                            fr_digits, fr_scalar, transcript_to_device)


def _sync_host_transcript(transcript: Transcript, st_bytes,
                          pos: int, pos_begin: int) -> None:
    """Adopt the fetched device transcript state; pos/pos_begin are STATIC
    (strobe_dev.post_challenge_pos of the last device challenge label)."""
    from ..utils import strobe as strobe_host
    h = strobe_host.Strobe128.__new__(strobe_host.Strobe128)
    h.state = bytearray(np.asarray(st_bytes).astype(np.uint8).tobytes())
    h.pos = int(pos)
    h.pos_begin = int(pos_begin)
    h.cur_flags = 0
    transcript.inner.strobe = h


def _fr_mul_r(a: fr.Element, b: fr.Element) -> fr.Element:
    return fr.carry_to(fr.mul(a, b), REDUCED)


def _fold_bit(n: int, blog) -> jnp.ndarray:
    """bit blog of each level-0 lane index — the fold's block selector."""
    lane = jnp.arange(n, dtype=jnp.int32)
    return jnp.right_shift(lane, blog) & 1


def _lo_rep(v: fr.Element, bit, half) -> fr.Element:
    """Replicated-low view: out[i0] = v_r[i0 mod half] (v replicated at
    period 2*half -> out replicated at period half)."""
    rolled = _roll_fr(v, half)
    return fr.Element(jnp.where((bit == 1)[:, None], rolled.limbs, v.limbs),
                      v.iv)


def _hi_rep(v: fr.Element, bit, half) -> fr.Element:
    """Replicated-high view: out[i0] = v_r[(i0 mod half) + half]."""
    rolled = _roll_fr(v, -half)
    return fr.Element(jnp.where((bit == 0)[:, None], rolled.limbs, v.limbs),
                      v.iv)


def _mask_fr(v: fr.Element, keep) -> fr.Element:
    return fr.Element(jnp.where(keep[:, None], v.limbs, 0), v.iv)


_fr_inv_scan = cached_jit(lambda g: fr.pow_fixed(g, fh.R - 2),
                          name="fr_inv_scan")


def _gamma_inv(gamma: fr.Element) -> fr.Element:
    """gamma^-1 as ONE device program on TPU: the Pallas Fermat ladder
    when the fused kernels are enabled, otherwise an in-program lax.scan
    ladder (same dispatch count, minutes-cheaper compile). Off-TPU (CPU
    tests) a fetch is free, so invert on the host — gamma is CANONICAL
    (fresh challenge), its limbs are exact digits."""
    if jax.default_backend() == "tpu":
        # retag to the REDUCED contract (no device ops: every caller's
        # bound already fits) so all call sites share ONE executable
        gamma = fr.Element(gamma.limbs, REDUCED)
        if curve._rns_kernel():
            return limb_kernels.pow_fixed(gamma, fh.R - 2, fr.field)
        return _fr_inv_scan(gamma)
    g = fr.to_ints(np.asarray(gamma.limbs))[0]
    return fr_scalar(pow(g, -1, fh.R) if g else 0)


_compress = cached_jit(compress_dev.compress_xy, name="compress_xy")


# ---------------------------------------------------------------------------
# IPA pieces


@partial(cached_jit, static_argnames=("tpos", "tpb"))
def _ipa_setup(table, rows, Wg0, Wgp0, rs_c, rs_d, state, CD, z, cs, ds,
               hpt, *, tpos, tpb):
    """Blinder commitments + step-1 absorb + alpha/beta + scalar blend +
    H' = beta*H — one dispatch (innerproductargument.go:60-91)."""
    n = cs.limbs.shape[0]
    dig = jnp.stack([fr_digits(_fr_mul_r(Wg0, rs_c)),
                     fr_digits(_fr_mul_r(Wgp0, rs_d))])
    bcd = curve.msm_rows_points_from_table(table, dig, rows[:2])
    ts = strobe_dev.TState(state, tpos, tpb)
    append_points_dev(ts, LABEL_STEP1, CD)
    append_scalars_dev(ts, LABEL_STEP1, z)
    append_points_dev(ts, LABEL_STEP1, bcd)
    alpha = challenge_fr(ts, LABEL_ALPHA)
    beta = challenge_fr(ts, LABEL_BETA)
    al = broadcast_scalar(alpha, n)
    cs = fr.carry_to(fr.add(rs_c, fr.mul(al, cs)), REDUCED)
    ds = fr.carry_to(fr.add(rs_d, fr.mul(al, ds)), REDUCED)
    hcur = curve.scalar_mul_device(hpt, fr_digits(beta))
    return ts.st, bcd, hcur, cs, ds


@cached_jit
def _ipa_round_cross(table, rows, hcur, Wg, Wgp, CS, DS, half, blog):
    """The round's 4 cross-terms L_C, L_D, R_C, R_D as lifted level-0 MSMs
    against the FIXED table + the <c_L,d_R>/<c_R,d_L> H-terms
    (innerproductargument.go:100-147)."""
    n = CS.limbs.shape[0]
    bit = _fold_bit(n, blog)
    cl = _lo_rep(CS, bit, half)
    cr = _hi_rep(CS, bit, half)
    dl = _lo_rep(DS, bit, half)
    dr = _hi_rep(DS, bit, half)
    hi = bit == 1
    lo = bit == 0
    dig = jnp.stack([
        fr_digits(_mask_fr(_fr_mul_r(Wg, cl), hi)),     # L_C: <c_L, G_R>
        fr_digits(_mask_fr(_fr_mul_r(Wgp, dr), lo)),    # L_D: <d_R, G'_L>
        fr_digits(_mask_fr(_fr_mul_r(Wg, cr), lo)),     # R_C: <c_R, G_L>
        fr_digits(_mask_fr(_fr_mul_r(Wgp, dl), hi)),    # R_D: <d_L, G'_R>
    ])
    outs = curve.msm_rows_points_from_table(table, dig, rows)       # [4]

    ipa_cl_dr = _masked_inner(cl, dr, half)
    ipa_cr_dl = _masked_inner(cr, dl, half)
    h2 = _stack_points([hcur, hcur])
    h_terms = curve.scalar_mul_device(
        h2, jnp.concatenate([fr_digits(ipa_cl_dr), fr_digits(ipa_cr_dl)]))

    l_c = curve.add(curve.pmap_coords(lambda t: t[0:1], outs),
                    curve.pmap_coords(lambda t: t[0:1], h_terms))
    r_c = curve.add(curve.pmap_coords(lambda t: t[2:3], outs),
                    curve.pmap_coords(lambda t: t[1:2], h_terms))
    lr = _stack_points([
        curve.pmap_coords(lambda t: t[0], l_c),
        curve.pmap_coords(lambda t: t[1], outs),
        curve.pmap_coords(lambda t: t[0], r_c),
        curve.pmap_coords(lambda t: t[3], outs)])
    return lr                                                       # [4]


@partial(cached_jit, static_argnames=("label", "chal_label", "tpos", "tpb"))
def _round_absorb(state, lr_pts, label=LABEL_LOOP, chal_label=LABEL_GAMMA,
                  *, tpos, tpb):
    """Compress + absorb the round's cross terms, squeeze gamma.

    Returns 96-byte compress_xy rows (compressed form + affine y) so the
    host assembles proof points WITHOUT per-point sqrts; only the first
    48 bytes enter the transcript."""
    blobs = compress_dev.compress_xy(lr_pts)    # [k, 96]
    ts = strobe_dev.TState(state, tpos, tpb)
    ts.append_rows(label, blobs[:, :48])
    gamma_be = ts.get_and_append_challenge(chal_label)
    return ts.st, blobs, challenge_to_fr(gamma_be)


@cached_jit
def _ipa_round_update(Wg, Wgp, CS, DS, gamma, ginv, half, blog):
    """Lazy fold: weight vectors absorb gamma on the high-bit lanes; the
    replicated scalar vectors fold in place. Pure Fr lane algebra — the
    round-2 prover's per-round device point-fold (a full 256-bit
    scalar-mul chain over every base lane) is gone entirely."""
    n = CS.limbs.shape[0]
    bit = _fold_bit(n, blog)
    g_n = broadcast_scalar(gamma, n)
    gi_n = broadcast_scalar(ginv, n)
    one = fr.Element(jnp.zeros((n, fr.NLIMBS), fr.DTYPE)
                     .at[:, 0].set(1), fr.CANONICAL)
    sel = (bit == 1)[:, None]
    g_or_1 = fr.Element(jnp.where(sel, g_n.limbs, one.limbs), REDUCED)
    gi_or_1 = fr.Element(jnp.where(sel, gi_n.limbs, one.limbs), REDUCED)
    Wg = _fr_mul_r(Wg, g_or_1)
    Wgp = _fr_mul_r(Wgp, gi_or_1)
    cl = _lo_rep(CS, bit, half)
    cr = _hi_rep(CS, bit, half)
    dl = _lo_rep(DS, bit, half)
    dr = _hi_rep(DS, bit, half)
    CS = fr.carry_to(fr.add(cl, fr.mul(gi_n, cr)), REDUCED)
    DS = fr.carry_to(fr.add(dl, fr.mul(g_n, dr)), REDUCED)
    return Wg, Wgp, CS, DS


@cached_jit
def _final_scalars(cs, ds):
    return (fr.canonical_digits(fr.fmap(lambda t: t[:1], cs)),
            fr.canonical_digits(fr.fmap(lambda t: t[:1], ds)))


def run_ipa_rounds(state, tpos, tpb, table, rows, hcur, Wg, Wgp, csd, dsd,
                   n: int):
    """The IPA's log(n) folding rounds as chained async device programs
    (3 dispatches/round: cross+absorb, gamma^-1 ladder, Fr state update).
    tpos/tpb: the STATIC transcript position at entry (post_challenge_pos
    of the preceding challenge). Returns (state, lr_blobs [rounds][4,48],
    gammas [rounds] fr, csd, dsd). Shared by the per-argument device
    prover and the full device prove."""
    rounds = n.bit_length() - 1
    lr_blobs = []
    gammas = []
    for r in range(rounds):
        half = np.int32(n >> (r + 1))
        blog = np.int32(n.bit_length() - 2 - r)
        lr_pts = _ipa_round_cross(table, rows, hcur, Wg, Wgp, csd, dsd,
                                  half, blog)
        state, blobs, gamma = _round_absorb(state, lr_pts,
                                            tpos=tpos, tpb=tpb)
        tpos, tpb = strobe_dev.post_challenge_pos(LABEL_GAMMA)
        lr_blobs.append(blobs)
        gammas.append(gamma)
        ginv = _gamma_inv(gamma)
        Wg, Wgp, csd, dsd = _ipa_round_update(Wg, Wgp, csd, dsd,
                                              gamma, ginv, half, blog)
    return state, lr_blobs, gammas, csd, dsd


def run_sm_rounds(state, tpos, tpb, table, xd, n: int):
    """Same-multiscalar folding rounds; see run_ipa_rounds."""
    rounds = n.bit_length() - 1
    lr_blobs = []
    gammas = []
    W = fr_const([1] * n)
    for rd_i in range(rounds):
        half = np.int32(n >> (rd_i + 1))
        blog = np.int32(n.bit_length() - 2 - rd_i)
        lr_pts = _sm_round_cross(table, W, xd, half, blog)
        state, blobs, gamma = _round_absorb(
            state, lr_pts, label=SM_LABEL_LOOP, chal_label=SM_LABEL_GAMMA,
            tpos=tpos, tpb=tpb)
        tpos, tpb = strobe_dev.post_challenge_pos(SM_LABEL_GAMMA)
        lr_blobs.append(blobs)
        gammas.append(gamma)
        ginv = _gamma_inv(gamma)
        W, xd = _sm_round_update(W, xd, gamma, ginv, half, blog)
    return state, lr_blobs, gammas, xd


def prove_ipa_on_device(crs_gs: List[Affine], crs_gs_prime: List[Affine],
                        crs_h: Affine, C: Affine, D: Affine, z: int,
                        cs: List[int], ds: List[int],
                        transcript: Transcript, rand,
                        stacked=None, diag: Optional[List[int]] = None
                        ) -> "inner_product.Proof":
    """Drop-in replacement for inner_product.prove: byte-identical proof,
    whole recursion on device, ONE final fetch.

    stacked: device StackedVec holding the bases. With `diag` (the
    grand-product rescale, grandproductargument.go:94-103) it is the ONE
    row [Gs|Hs] and Gs' is lazy: row G' = diag * row G, folded into the
    scalar weights. Without diag it holds physical rows [Gs, Gs']."""
    from . import inner_product
    from ..utils import codec

    n = len(cs)
    rounds = n.bit_length() - 1
    rs_c, rs_d = inner_product.generate_ipa_blinders(rand, cs, ds)

    with profiling.span("dp2.ipa.setup"):
        if stacked is None:
            stacked = curve.StackedVec.from_affine([crs_gs, crs_gs_prime],
                                                   pad_to=n)
        table = stacked.table()
        if diag is not None:
            rows = jnp.zeros(4, jnp.int32)              # all on row 0
            Wg0 = fr_const([1] * n)
            Wgp0 = fr_const([int(d) % fh.R for d in diag[:n]]
                            + [0] * (n - min(n, len(diag))))
        else:
            rows = jnp.asarray(np.array([0, 1, 0, 1], np.int32))
            Wg0 = fr_const([1] * n)
            Wgp0 = fr_const([1] * n)
        state = transcript_to_device(transcript)

        csd = fr_const(cs)
        dsd = fr_const(ds)
        rcd = fr_const(rs_c)
        rdd = fr_const(rs_d)
        CD = curve._settle(curve.from_affine_host([C, D]))
        hpt = curve._settle(curve.from_affine_host([crs_h]))
        state, tpos, tpb = state
        state, bcd, hcur, csd, dsd = _ipa_setup(
            table, rows, Wg0, Wgp0, rcd, rdd, state, CD, fr_scalar(z),
            csd, dsd, hpt, tpos=tpos, tpb=tpb)
        tpos, tpb = strobe_dev.post_challenge_pos(LABEL_BETA)

    with profiling.span("dp2.ipa.rounds"):
        state, lr_blobs, _gammas, csd, dsd = run_ipa_rounds(
            state, tpos, tpb, table, rows, hcur, Wg0, Wgp0, csd, dsd, n)

    with profiling.span("dp2.ipa.fetch"):
        b_cd = _compress(bcd)
        c0d, d0d = _final_scalars(csd, dsd)
        fetch = jax.device_get((b_cd, lr_blobs, c0d, d0d, state))
        b_cd_h, lr_h, c0d, d0d, sstate = fetch

    def pt(row):
        return compress_dev.decode_xy_host(row)

    proof = inner_product.Proof(
        b_c=pt(b_cd_h[0]), b_d=pt(b_cd_h[1]),
        l_cs=[pt(lr_h[r][0]) for r in range(rounds)],
        r_cs=[pt(lr_h[r][2]) for r in range(rounds)],
        l_ds=[pt(lr_h[r][1]) for r in range(rounds)],
        r_ds=[pt(lr_h[r][3]) for r in range(rounds)],
        c0=sum(int(v) << (8 * i) for i, v in enumerate(np.asarray(c0d)[0])),
        d0=sum(int(v) << (8 * i) for i, v in enumerate(np.asarray(d0d)[0])),
    )
    _sync_host_transcript(transcript, sstate,
                          *strobe_dev.post_challenge_pos(LABEL_GAMMA))
    return proof


# ---------------------------------------------------------------------------
# same-multiscalar pieces


@partial(cached_jit, static_argnames=("tpos", "tpb"))
def _sm_setup(table, r, state, azz, tu_bytes, x, *, tpos, tpb):
    """Blinder commitments + step-1 absorb + alpha + scalar blend — one
    dispatch (samemultiscalarargument.go:63-83). The 2n tracker-point
    rows absorb as ONE scan over rate blocks (the prover's single largest
    transcript chain)."""
    n = x.limbs.shape[0]
    rdig = fr_digits(r)
    dig = jnp.stack([rdig, rdig, rdig])
    b_atu = curve.msm_rows_points_from_table(
        table, dig, jnp.asarray(np.arange(3, dtype=np.int32)))
    ts = strobe_dev.TState(state, tpos, tpb)
    append_points_dev(ts, SM_LABEL_STEP1, azz)
    ts.append_rows(SM_LABEL_STEP1, tu_bytes)
    append_points_dev(ts, SM_LABEL_STEP1, b_atu)
    alpha = challenge_fr(ts, SM_LABEL_ALPHA)
    x = fr.carry_to(fr.add(r, fr.mul(broadcast_scalar(alpha, n), x)),
                    REDUCED)
    return ts.st, b_atu, x


@cached_jit
def _sm_round_cross(table, W, X, half, blog):
    n = X.limbs.shape[0]
    bit = _fold_bit(n, blog)
    xl = _lo_rep(X, bit, half)
    xr = _hi_rep(X, bit, half)
    dl = fr_digits(_mask_fr(_fr_mul_r(W, xl), bit == 1))   # x_L on hi lanes
    dr = fr_digits(_mask_fr(_fr_mul_r(W, xr), bit == 0))   # x_R on lo lanes
    dig = jnp.stack([dl, dl, dl, dr, dr, dr])
    rows = jnp.asarray(np.array([0, 1, 2, 0, 1, 2], np.int32))
    return curve.msm_rows_points_from_table(table, dig, rows)      # [6]


@cached_jit
def _sm_round_update(W, X, gamma, ginv, half, blog):
    n = X.limbs.shape[0]
    bit = _fold_bit(n, blog)
    one = fr.Element(jnp.zeros((n, fr.NLIMBS), fr.DTYPE)
                     .at[:, 0].set(1), fr.CANONICAL)
    sel = (bit == 1)[:, None]
    g_or_1 = fr.Element(
        jnp.where(sel, broadcast_scalar(gamma, n).limbs, one.limbs), REDUCED)
    W = _fr_mul_r(W, g_or_1)
    xl = _lo_rep(X, bit, half)
    xr = _hi_rep(X, bit, half)
    X = fr.carry_to(fr.add(xl, fr.mul(broadcast_scalar(ginv, n), xr)),
                    REDUCED)
    return W, X


@cached_jit
def _final_scalar(x):
    return fr.canonical_digits(fr.fmap(lambda t: t[:1], x))


def prove_samemsm_on_device(G: List[Affine], A: Affine, Z_t: Affine,
                            Z_u: Affine, T: List[Affine], U: List[Affine],
                            x: List[int], transcript: Transcript,
                            rand) -> "same_multiscalar.Proof":
    """Drop-in replacement for same_multiscalar.prove (same proof bytes)."""
    from . import same_multiscalar
    from ..utils import codec

    n = len(x)
    rounds = n.bit_length() - 1
    r = rand.get_frs(n)
    with profiling.span("dp2.sm.setup"):
        sv = curve.StackedVec.from_affine([G, T, U], pad_to=n)
        table = sv.table()
        azz = curve._settle(curve.from_affine_host([A, Z_t, Z_u]))
        tu_bytes = np.stack(
            [np.frombuffer(codec.g1_to_bytes(p), np.uint8).astype(np.int32)
             for p in (list(T) + list(U))])
        state = transcript_to_device(transcript)

        xd = fr_const(x)
        rd = fr_const(r)
        state, tpos, tpb = state
        state, b_atu, xd = _sm_setup(table, rd, state, azz,
                                     jnp.asarray(tu_bytes), xd,
                                     tpos=tpos, tpb=tpb)
        tpos, tpb = strobe_dev.post_challenge_pos(SM_LABEL_ALPHA)

    with profiling.span("dp2.sm.rounds"):
        state, lr_blobs, _gammas, xd = run_sm_rounds(state, tpos, tpb,
                                                     table, xd, n)

    with profiling.span("dp2.sm.fetch"):
        b_blobs = _compress(b_atu)
        x0d = _final_scalar(xd)
        fetch = jax.device_get((b_blobs, lr_blobs, x0d, state))
        b_h, lr_h, x0d, sstate = fetch

    def pt(row):
        return compress_dev.decode_xy_host(row)

    proof = same_multiscalar.Proof(
        b_a=pt(b_h[0]), b_t=pt(b_h[1]), b_u=pt(b_h[2]),
        l_a=[pt(lr_h[rd][0]) for rd in range(rounds)],
        l_t=[pt(lr_h[rd][1]) for rd in range(rounds)],
        l_u=[pt(lr_h[rd][2]) for rd in range(rounds)],
        r_a=[pt(lr_h[rd][3]) for rd in range(rounds)],
        r_t=[pt(lr_h[rd][4]) for rd in range(rounds)],
        r_u=[pt(lr_h[rd][5]) for rd in range(rounds)],
        x=sum(int(v) << (8 * i) for i, v in enumerate(np.asarray(x0d)[0])),
    )
    _sync_host_transcript(transcript, sstate,
                          *strobe_dev.post_challenge_pos(SM_LABEL_GAMMA))
    return proof
