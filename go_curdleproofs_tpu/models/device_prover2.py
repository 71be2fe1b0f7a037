"""Device-resident folding provers v2: host-dispatched pre-compiled pieces.

v1 (models/device_prover.py) merged each whole argument into ONE fori_loop
program. That shape is wrong for XLA: compile time explodes superlinearly
with graph size (a single merged round body exceeded 30 minutes on the
v5e), and the merged executable ran ~10x slower than its parts. v2 keeps
the same math and byte-exact transcript but restructures the orchestration
the TPU-native way:

  * each round is 4 SMALL device programs (cross-MSMs, absorb+challenge,
    gamma^-1 ladder, folds), each compiled once (shape-keyed by jax.jit)
    and reused by every round of every argument in the process;
  * all carries — STROBE transcript state, folded scalars, folded bases —
    stay device-resident; the host loop only enqueues async dispatches, so
    rounds stream through the device queue with ZERO host round-trips;
  * the serial sub-chains inside pieces are fused Pallas kernels: point
    ops (ops/rns_kernels), the x16+add Horner step, and the Fermat
    inversion ladders (rns_kernels.pow_fixed for point compression,
    limb_kernels.pow_fixed for the Fr challenge inverse).

One fetch at the very end materializes the proof bytes + synced host
transcript (mirrors /root/reference/innerproductargument/
innerproductargument.go:42-188 and samemultiscalarargument.go:37-157).
"""

from __future__ import annotations

from functools import partial
from typing import List, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import compress_dev, curve, fr, limb_kernels, strobe_dev
from ..ops.curve import PointVec
from ..ops.limb_field import REDUCED          # fr carry contract
from ..utils import field_host as fh
from ..utils import profiling
from ..utils.field_host import Affine
from ..utils.transcript import Transcript
from .device_prover import (LABEL_ALPHA, LABEL_BETA, LABEL_GAMMA, LABEL_LOOP,
                            LABEL_STEP1, SM_LABEL_ALPHA, SM_LABEL_GAMMA,
                            SM_LABEL_LOOP, SM_LABEL_STEP1, _masked_inner,
                            _roll_fr, _stack_points, append_points_dev,
                            append_scalars_dev, broadcast_scalar,
                            challenge_fr, challenge_to_fr, fr_const,
                            fr_digits, fr_scalar, transcript_to_device)


def _sync_host_transcript(transcript: Transcript, sstate) -> None:
    transcript.inner.strobe = strobe_dev.to_host(
        strobe_dev.SState(jnp.asarray(sstate[0]), jnp.asarray(sstate[1]),
                          jnp.asarray(sstate[2])), None, 0)


def _mask_digits(vec: fr.Element, mask) -> jnp.ndarray:
    limbs = jnp.where(mask[:, None], vec.limbs, 0)
    return fr_digits(fr.Element(limbs, vec.iv))


# ---------------------------------------------------------------------------
# IPA pieces


@jax.jit
def _ipa_commit_blinders(bases, rs_c, rs_d):
    """B_c = <rs_c, Gs>, B_d = <rs_d, Gs'> (innerproductargument.go:65-70)."""
    dig = jnp.stack([fr_digits(rs_c), fr_digits(rs_d)])
    return curve.msm_rows_device(bases, dig, (0, 1))


@jax.jit
def _ipa_absorb_step1(state, CD, z, bcd):
    state = append_points_dev(state, LABEL_STEP1, CD)
    state = append_scalars_dev(state, LABEL_STEP1, z)
    state = append_points_dev(state, LABEL_STEP1, bcd)
    state, alpha = challenge_fr(state, LABEL_ALPHA)
    state, beta = challenge_fr(state, LABEL_BETA)
    return state, alpha, beta


@jax.jit
def _ipa_blend(cs, ds, rs_c, rs_d, alpha):
    n = cs.limbs.shape[0]
    cs = fr.carry_to(fr.add(rs_c, fr.mul(broadcast_scalar(alpha, n), cs)),
                     REDUCED)
    ds = fr.carry_to(fr.add(rs_d, fr.mul(broadcast_scalar(alpha, n), ds)),
                     REDUCED)
    return cs, ds


@jax.jit
def _smul_point(pt, scalar):
    """[k]-batch point x one fr scalar (H' = beta*H)."""
    k = pt.x.limbs.shape[0]
    dig = jnp.broadcast_to(fr_digits(scalar), (k, 64))
    return curve.scalar_mul_device(pt, dig)


@jax.jit
def _ipa_round_cross(bases, hcur, cs, ds, half):
    """The round's 4 cross-terms L_C, L_D, R_C, R_D (masked fixed-width
    MSMs + the <c_L,d_R>/<c_R,d_L> H-terms), innerproductargument.go:100-147.
    """
    n = cs.limbs.shape[0]
    lane = jnp.arange(n, dtype=jnp.int32)
    in_lo = lane < half
    in_hi = (lane >= half) & (lane < 2 * half)
    cs_up = _roll_fr(cs, half)
    ds_up = _roll_fr(ds, half)
    cs_dn = _roll_fr(cs, -half)
    ds_dn = _roll_fr(ds, -half)
    dig = jnp.stack([
        _mask_digits(cs_up, in_hi),     # L_C: <c_L, G_R>
        _mask_digits(ds_dn, in_lo),     # L_D: <d_R, G'_L>
        _mask_digits(cs_dn, in_lo),     # R_C: <c_R, G_L>
        _mask_digits(ds_up, in_hi),     # R_D: <d_L, G'_R>
    ])
    outs = curve.msm_rows_device(bases, dig, (0, 1, 0, 1))     # [4]

    ipa_cl_dr = _masked_inner(cs, ds_dn, half)
    ipa_cr_dl = _masked_inner(ds, cs_dn, half)
    h2 = _stack_points([hcur, hcur])
    h_terms = curve.scalar_mul_device(
        h2, jnp.stack([fr_digits(ipa_cl_dr)[0], fr_digits(ipa_cr_dl)[0]]))

    l_c = curve.add(curve.pmap_coords(lambda t: t[0:1], outs),
                    curve.pmap_coords(lambda t: t[0:1], h_terms))
    r_c = curve.add(curve.pmap_coords(lambda t: t[2:3], outs),
                    curve.pmap_coords(lambda t: t[1:2], h_terms))
    lr = _stack_points([
        curve.pmap_coords(lambda t: t[0], l_c),
        curve.pmap_coords(lambda t: t[1], outs),
        curve.pmap_coords(lambda t: t[0], r_c),
        curve.pmap_coords(lambda t: t[3], outs)])
    return lr                                                   # [4] points


@partial(jax.jit, static_argnames=("label", "chal_label"))
def _round_absorb(state, lr_pts, label=LABEL_LOOP, chal_label=LABEL_GAMMA):
    """Compress + absorb the round's cross terms, squeeze gamma."""
    blobs = compress_dev.compress(lr_pts)       # [k, 48]
    k = blobs.shape[0]

    def body(i, s):
        return strobe_dev.append_message(s, label, blobs[i])

    state = jax.lax.fori_loop(0, k, body, state)
    state, gamma_be = strobe_dev.get_and_append_challenge(state, chal_label)
    return state, blobs, challenge_to_fr(gamma_be)


def _gamma_inv(gamma: fr.Element) -> fr.Element:
    """gamma^-1 via the one-kernel Fermat ladder on TPU. Off-TPU (CPU
    tests) a fetch is free, so invert on the host — gamma is CANONICAL
    (fresh challenge), its limbs are exact digits."""
    if jax.default_backend() == "tpu":
        return limb_kernels.pow_fixed(gamma, fh.R - 2, fr.field)
    g = fr.to_ints(np.asarray(gamma.limbs))[0]
    return fr_scalar(pow(g, -1, fh.R) if g else 0)


@jax.jit
def _ipa_round_fold(bases, cs, ds, gamma, gamma_inv, half):
    n = cs.limbs.shape[0]
    lane = jnp.arange(n, dtype=jnp.int32)
    cs_dn = _roll_fr(cs, -half)
    ds_dn = _roll_fr(ds, -half)
    cs_new = fr.carry_to(
        fr.add(cs, fr.mul(broadcast_scalar(gamma_inv, n), cs_dn)), REDUCED)
    ds_new = fr.carry_to(
        fr.add(ds, fr.mul(broadcast_scalar(gamma, n), ds_dn)), REDUCED)
    zm = (lane < half)[:, None]
    cs_new = fr.Element(jnp.where(zm, cs_new.limbs, 0), REDUCED)
    ds_new = fr.Element(jnp.where(zm, ds_new.limbs, 0), REDUCED)
    fold_digits = jnp.stack([
        jnp.broadcast_to(fr_digits(gamma), (n, 64)),
        jnp.broadcast_to(fr_digits(gamma_inv), (n, 64))])
    bases_new = curve.fold_device(bases, fold_digits, half)
    return bases_new, cs_new, ds_new


@jax.jit
def _final_scalars(cs, ds):
    return (fr.canonical_digits(fr.fmap(lambda t: t[:1], cs)),
            fr.canonical_digits(fr.fmap(lambda t: t[:1], ds)))


_compress = jax.jit(compress_dev.compress)


def prove_ipa_on_device(crs_gs: List[Affine], crs_gs_prime: List[Affine],
                        crs_h: Affine, C: Affine, D: Affine, z: int,
                        cs: List[int], ds: List[int],
                        transcript: Transcript, rand,
                        stacked=None) -> "inner_product.Proof":
    """Drop-in replacement for inner_product.prove: byte-identical proof,
    whole recursion on device, ONE final fetch."""
    from . import inner_product
    from ..utils import codec

    n = len(cs)
    rounds = n.bit_length() - 1
    rs_c, rs_d = inner_product.generate_ipa_blinders(rand, cs, ds)

    with profiling.span("dp2.ipa.setup"):
        if stacked is not None:
            bases = stacked.pv
        else:
            bases = curve.StackedVec.from_affine([crs_gs, crs_gs_prime],
                                                 pad_to=n).pv
        bases = curve._settle(bases)
        state = transcript_to_device(transcript)

        csd = fr_const(cs)
        dsd = fr_const(ds)
        rcd = fr_const(rs_c)
        rdd = fr_const(rs_d)

        bcd = _ipa_commit_blinders(bases, rcd, rdd)
        CD = curve._settle(curve.from_affine_host([C, D]))
        state, alpha, beta = _ipa_absorb_step1(state, CD, fr_scalar(z), bcd)
        csd, dsd = _ipa_blend(csd, dsd, rcd, rdd, alpha)
        hcur = _smul_point(curve._settle(curve.from_affine_host([crs_h])),
                           beta)

    with profiling.span("dp2.ipa.rounds"):
        lr_blobs = []
        for r in range(rounds):
            half = jnp.int32(n >> (r + 1))
            lr_pts = _ipa_round_cross(bases, hcur, csd, dsd, half)
            state, blobs, gamma = _round_absorb(state, lr_pts)
            lr_blobs.append(blobs)
            ginv = _gamma_inv(gamma)
            bases, csd, dsd = _ipa_round_fold(bases, csd, dsd, gamma, ginv,
                                              half)

    with profiling.span("dp2.ipa.fetch"):
        b_cd = _compress(bcd)
        c0d, d0d = _final_scalars(csd, dsd)
        fetch = jax.device_get((b_cd, lr_blobs, c0d, d0d, state))
        b_cd_h, lr_h, c0d, d0d, sstate = fetch

    def pt(row):
        return codec.g1_from_bytes(bytes(np.asarray(row).astype(np.uint8)),
                                   subgroup_check=False)

    proof = inner_product.Proof(
        b_c=pt(b_cd_h[0]), b_d=pt(b_cd_h[1]),
        l_cs=[pt(lr_h[r][0]) for r in range(rounds)],
        r_cs=[pt(lr_h[r][2]) for r in range(rounds)],
        l_ds=[pt(lr_h[r][1]) for r in range(rounds)],
        r_ds=[pt(lr_h[r][3]) for r in range(rounds)],
        c0=sum(int(v) << (8 * i) for i, v in enumerate(np.asarray(c0d)[0])),
        d0=sum(int(v) << (8 * i) for i, v in enumerate(np.asarray(d0d)[0])),
    )
    _sync_host_transcript(transcript, sstate)
    return proof


# ---------------------------------------------------------------------------
# same-multiscalar pieces


@jax.jit
def _sm_commit_blinders(bases, r):
    rdig = fr_digits(r)
    dig = jnp.stack([rdig, rdig, rdig])
    return curve.msm_rows_device(bases, dig, (0, 1, 2))


@jax.jit
def _sm_absorb_step1(state, azz, tu_bytes, b_atu):
    state = append_points_dev(state, SM_LABEL_STEP1, azz)

    def absorb_tu(i, s):
        return strobe_dev.append_message(s, SM_LABEL_STEP1, tu_bytes[i])

    state = jax.lax.fori_loop(0, tu_bytes.shape[0], absorb_tu, state)
    state = append_points_dev(state, SM_LABEL_STEP1, b_atu)
    state, alpha = challenge_fr(state, SM_LABEL_ALPHA)
    return state, alpha


@jax.jit
def _sm_blend(x, r, alpha):
    n = x.limbs.shape[0]
    return fr.carry_to(fr.add(r, fr.mul(broadcast_scalar(alpha, n), x)),
                       REDUCED)


@jax.jit
def _sm_round_cross(bases, x, half):
    n = x.limbs.shape[0]
    lane = jnp.arange(n, dtype=jnp.int32)
    in_lo = lane < half
    in_hi = (lane >= half) & (lane < 2 * half)
    dl = _mask_digits(_roll_fr(x, half), in_hi)     # x_L on high lanes
    dr = _mask_digits(_roll_fr(x, -half), in_lo)    # x_R on low lanes
    dig = jnp.stack([dl, dl, dl, dr, dr, dr])
    return curve.msm_rows_device(bases, dig, (0, 1, 2, 0, 1, 2))   # [6]


@jax.jit
def _sm_round_fold(bases, x, gamma, gamma_inv, half):
    n = x.limbs.shape[0]
    lane = jnp.arange(n, dtype=jnp.int32)
    x_dn = _roll_fr(x, -half)
    x_new = fr.carry_to(
        fr.add(x, fr.mul(broadcast_scalar(gamma_inv, n), x_dn)), REDUCED)
    x_new = fr.Element(jnp.where((lane < half)[:, None], x_new.limbs, 0),
                       REDUCED)
    fold_digits = jnp.broadcast_to(fr_digits(gamma), (3, n, 64))
    bases_new = curve.fold_device(bases, fold_digits, half)
    return bases_new, x_new


@jax.jit
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
        bases = curve._settle(curve.StackedVec.from_affine([G, T, U],
                                                           pad_to=n).pv)
        azz = curve._settle(curve.from_affine_host([A, Z_t, Z_u]))
        tu_bytes = np.stack(
            [np.frombuffer(codec.g1_to_bytes(p), np.uint8).astype(np.int32)
             for p in (list(T) + list(U))])
        state = transcript_to_device(transcript)

        xd = fr_const(x)
        rd = fr_const(r)
        b_atu = _sm_commit_blinders(bases, rd)
        state, alpha = _sm_absorb_step1(state, azz, jnp.asarray(tu_bytes),
                                        b_atu)
        xd = _sm_blend(xd, rd, alpha)

    with profiling.span("dp2.sm.rounds"):
        lr_blobs = []
        for rd_i in range(rounds):
            half = jnp.int32(n >> (rd_i + 1))
            lr_pts = _sm_round_cross(bases, xd, half)
            state, blobs, gamma = _round_absorb(
                state, lr_pts, label=SM_LABEL_LOOP,
                chal_label=SM_LABEL_GAMMA)
            lr_blobs.append(blobs)
            ginv = _gamma_inv(gamma)
            bases, xd = _sm_round_fold(bases, xd, gamma, ginv, half)

    with profiling.span("dp2.sm.fetch"):
        b_blobs = _compress(b_atu)
        x0d = _final_scalar(xd)
        fetch = jax.device_get((b_blobs, lr_blobs, x0d, state))
        b_h, lr_h, x0d, sstate = fetch

    def pt(row):
        return codec.g1_from_bytes(bytes(np.asarray(row).astype(np.uint8)),
                                   subgroup_check=False)

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
    _sync_host_transcript(transcript, sstate)
    return proof
