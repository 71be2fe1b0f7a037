"""ONE-FETCH device-resident curdleproofs prove.

Round 3 left prove steps 1-3 host-orchestrated: ~6 device fetches (~40ms
each through the TPU tunnel) plus host bignum group commitments
(models/curdleproof.py:104-135). This module runs the WHOLE of
/root/reference/curdleproof.go:38-197 — same-permutation + grand-product
setup, the sigma protocol, both folding arguments — as one chain of async
device programs over a device STROBE transcript:

  * step 1 (absorb the instance, squeeze `as`) stays host-side: it
    depends only on host data, so it costs no device round-trip;
  * every randomness draw happens host-side UP FRONT in the reference's
    exact order (draws don't depend on the transcript), then enters the
    device programs as constants;
  * all commitments (A, B, C, sigma-protocol nonces, folding cross-terms)
    are computed AND absorbed on device; challenges are squeezed on
    device with rejection sampling;
  * D uses the Gsum/Hsum identity D = B - beta^-1*Gsum + alpha*Hsum —
    the same group element the reference prover assembles with an n-MSM
    (grandproductargument.go:111-138), so proof bytes are unchanged;
  * the reference prover's self-checks (grandproductargument.go:156-177)
    and degenerate-challenge rejections run on device and are verified
    from the final fetch (same failures, deferred to the end);
  * ONE jax.device_get at the end materializes every proof point (as
    sqrt-free x||y byte rows), every proof scalar, the sanity flags and
    the final transcript state.

Byte-identical to the host prover (tests/test_device_prover2.py compares
full serialized proofs across modes).
"""

from __future__ import annotations

from functools import partial
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import compress_dev, curve, fr, strobe_dev
from ..ops.exe_cache import cached_jit
from ..ops.limb_field import REDUCED
from ..utils import codec
from ..utils import field_host as fh
from ..utils import profiling
from ..utils.field_host import Affine
from ..utils.rand import Rand
from ..utils.transcript import Transcript
from . import device_prover2 as dp2
from .device_common import (_stack_points, append_points_dev,
                            append_scalars_dev, broadcast_scalar,
                            challenge_fr, fr_const, fr_digits, fr_scalar,
                            transcript_to_device)

N_BLINDERS = 4

_rs_cache = {}     # (tuple(Rs), tuple(Ss)) -> device StackedVec [Rs, Ss]
                   # content-keyed: id()-keyed entries could silently serve
                   # a STALE device vector after CPython address reuse

# transcript labels (byte-exact with the host modules / the reference)
SP_STEP1 = b"same_perm_step1"
SP_ALPHA = b"same_perm_alpha"
SP_BETA = b"same_perm_beta"
GP_STEP1 = b"gprod_step1"
GP_STEP2 = b"gprod_step2"
GP_ALPHA = b"gprod_alpha"
GP_BETA = b"gprod_beta"
SS_POINTS = b"sameexp_points"
SS_ALPHA = b"sameexp_alpha"


def _scalar_rows(vals: Sequence[int]) -> np.ndarray:
    return np.stack([np.frombuffer(int(v % fh.R).to_bytes(32, "big"),
                                   np.uint8).astype(np.int32)
                     for v in vals])


def _point_rows(pts: Sequence[Affine]) -> np.ndarray:
    return np.stack([np.frombuffer(codec.g1_to_bytes(p),
                                   np.uint8).astype(np.int32) for p in pts])


def _tree_prod(v: fr.Element) -> fr.Element:
    """Product of all lanes (log-depth tree; [1]-lane result).
    Lane count must be padded to a power of two with ones by the caller."""
    m = v.limbs.shape[0]
    cur = v
    while m > 1:
        half = m // 2
        lo = fr.fmap(lambda t: t[:half], cur)
        hi = fr.fmap(lambda t: t[half:m], cur)
        cur = fr.carry_to(fr.mul(lo, hi), REDUCED)
        m = half
    return cur


def _inner(a: fr.Element, b: fr.Element) -> fr.Element:
    return fr.fmap(lambda t: t[None], fr.inner_product(a, b))


def _is_zero(x: fr.Element) -> jnp.ndarray:
    return jnp.all(fr.canonical_digits(x) == 0, axis=-1)


def _pt_eq(p, q) -> jnp.ndarray:
    """Projective equality as a [1] bool (cross-multiplication)."""
    from ..ops import field_backend as fp
    d1 = fp.sub(fp.mul(p.x, q.z), fp.mul(q.x, p.z))
    d2 = fp.sub(fp.mul(p.y, q.z), fp.mul(q.y, p.z))
    return (jnp.all(fp.canonical_digits(d1) == 0, axis=-1)
            & jnp.all(fp.canonical_digits(d2) == 0, axis=-1))


def _one_lanes(n: int) -> fr.Element:
    return fr.Element(jnp.zeros((n, fr.NLIMBS), fr.DTYPE).at[:, 0].set(1),
                      fr.CANONICAL)


# ---------------------------------------------------------------------------
# device pieces (ell static: it drives lane slicing)


@partial(cached_jit, static_argnames=("ell", "tpos", "tpb"))
def _piece_sameperm(state, table, digA, m_bytes, as_rows, perm_v,
                    perm_as_v, rs_m_v, rs_ap_v, M_gsum, *, ell, tpos, tpb):
    """Commit A; same-permutation step 1 + challenges; bs, p, B, rs_b
    (samepermutationargument.go:32-78). The ell challenge-scalar rows
    absorb as ONE scan over rate blocks."""
    n = perm_v.limbs.shape[0]
    A = curve.msm_rows_points_from_table(table, digA[None],
                                         jnp.zeros(1, jnp.int32))  # [1]

    ts = strobe_dev.TState(state, tpos, tpb)
    append_points_dev(ts, SP_STEP1, A)
    ts.append_rows(SP_STEP1, m_bytes)
    ts.append_rows(SP_STEP1, as_rows)
    alpha = challenge_fr(ts, SP_ALPHA)
    beta = challenge_fr(ts, SP_BETA)

    # bs[i] = alpha*perm[i] + as[perm[i]] + beta on the first ell lanes;
    # dead lanes hold 1 (so the product tree ignores them)
    al = broadcast_scalar(alpha, n)
    be = broadcast_scalar(beta, n)
    live = (jnp.arange(n) < ell)[:, None]
    bs = fr.carry_to(fr.add(fr.add(fr.mul(al, perm_v), perm_as_v), be),
                     REDUCED)
    bs = fr.Element(jnp.where(live, bs.limbs, _one_lanes(n).limbs), bs.iv)
    p = _tree_prod(bs)

    # B = A + alpha*M + beta*gsum (samepermutationargument.go:74-78)
    al1 = fr.fmap(lambda t: t[:1], al)
    be1 = fr.fmap(lambda t: t[:1], be)
    terms = curve.scalar_mul_device(
        M_gsum, jnp.concatenate([fr_digits(al1), fr_digits(be1)]))
    B = curve.add(A, curve.add(curve.pmap_coords(lambda t: t[0:1], terms),
                               curve.pmap_coords(lambda t: t[1:2], terms)))

    rs_b = fr.carry_to(fr.add(fr.mul(fr.fmap(lambda t: t[:4], al), rs_m_v),
                              rs_ap_v), REDUCED)
    return ts.st, A, B, bs, p, rs_b


@partial(cached_jit, static_argnames=("ell", "tpos", "tpb"))
def _piece_gpa1(state, table, B, bs, p, rs_b, r_cs_pad, *, ell, tpos, tpb):
    """Grand-product steps 1-2: absorb B,p; alpha; partial products cs;
    C = <cs ++ r_cs, [Gs|Hs]>; r_p; absorb C, r_p; beta
    (grandproductargument.go:42-93)."""
    n = bs.limbs.shape[0]
    ts = strobe_dev.TState(state, tpos, tpb)
    append_points_dev(ts, GP_STEP1, B)
    append_scalars_dev(ts, GP_STEP1, p)
    alpha = challenge_fr(ts, GP_ALPHA)

    # cs[0]=1, cs[i] = prod bs[:i] over live lanes (dead bs lanes are 1)
    cs = fr.prefix_products(bs)
    live = (jnp.arange(n) < ell)[:, None]
    cs_full = fr.Element(jnp.where(live, cs.limbs, r_cs_pad.limbs), REDUCED)

    C = curve.msm_rows_points_from_table(table, fr_digits(cs_full)[None],
                                         jnp.zeros(1, jnp.int32))   # [1]

    r_b_plus_alpha = fr.carry_to(
        fr.add(rs_b, broadcast_scalar(alpha, 4)), REDUCED)
    r_cs4 = fr.fmap(lambda t: t[ell:ell + 4], cs_full)
    r_p = _inner(r_b_plus_alpha, r_cs4)

    append_points_dev(ts, GP_STEP2, C)
    append_scalars_dev(ts, GP_STEP2, r_p)
    beta = challenge_fr(ts, GP_BETA)
    return ts.st, C, cs_full, r_b_plus_alpha, r_p, alpha, beta


@partial(cached_jit, static_argnames=("ell",))
def _piece_gpa2(table, B, C, Gsum_Hsum, bs, cs_full, r_b_plus_alpha, r_p,
                p, alpha, beta, binv, *, ell):
    """Grand-product step 3: diag, ds_full, z; D via the Gsum/Hsum
    identity; prover self-checks (grandproductargument.go:94-177,
    value-identical)."""
    n = cs_full.limbs.shape[0]
    live = (jnp.arange(n) < ell)[:, None]

    pw = fr.prefix_products(broadcast_scalar(beta, n + 2))     # beta^i
    bpw = fr.prefix_products(broadcast_scalar(binv, n + 2))    # beta^-i
    b_l = fr.fmap(lambda t: t[ell:ell + 1], pw)                # beta^l
    b_l1 = fr.fmap(lambda t: t[ell + 1:ell + 2], pw)           # beta^(l+1)
    diag = fr.Element(
        jnp.where(live, bpw.limbs[1:n + 1],
                  jnp.broadcast_to(bpw.limbs[ell + 1], (n, fr.NLIMBS))),
        REDUCED)

    # ds[i] = bs[i]*beta^(i+1) - beta^i (i < ell); blinder lanes:
    # beta^(l+1) * (r_b + alpha)
    ds = fr.carry_to(
        fr.sub(fr.mul(bs, fr.Element(pw.limbs[1:n + 1], REDUCED)),
               fr.Element(pw.limbs[:n], REDUCED)), REDUCED)
    r_ds = fr.carry_to(fr.mul(broadcast_scalar(b_l1, 4), r_b_plus_alpha),
                       REDUCED)
    ds_full = fr.Element(
        jnp.where(live, ds.limbs,
                  jnp.zeros_like(ds.limbs).at[ell:ell + 4]
                  .set(r_ds.limbs)), REDUCED)

    # z = r_p*beta^(l+1) + p*beta^l - 1  (grandproductargument.go:147-155)
    z = fr.carry_to(
        fr.sub(fr.add(fr.mul(r_p, b_l1), fr.mul(p, b_l)), fr_const([1])),
        REDUCED)

    # D = B - binv*Gsum + alpha*Hsum (grandproductargument.go:111-138 via
    # the verifier's Gsum/Hsum identity — same group element)
    terms = curve.scalar_mul_device(
        Gsum_Hsum, jnp.concatenate([fr_digits(binv), fr_digits(alpha)]))
    D = curve.add(B, curve.add(
        curve.neg(curve.pmap_coords(lambda t: t[0:1], terms)),
        curve.pmap_coords(lambda t: t[1:2], terms)))

    # deferred prover self-checks (grandproductargument.go:156-177)
    chk1 = _is_zero(fr.carry_to(fr.sub(_inner(cs_full, ds_full), z),
                                REDUCED))
    dsd = fr.carry_to(fr.mul(ds_full, diag), REDUCED)
    sc2 = curve.msm_rows_points_from_table(table, fr_digits(dsd)[None],
                                           jnp.zeros(1, jnp.int32))
    sane = chk1 & _pt_eq(sc2, D)
    CD = _stack_points([C, D])
    return CD, z, ds_full, diag, sane


@cached_jit
def _piece_blind1(rs_v, zs_pad, cs_full, ds_full):
    """Blinder solve, part 1: omega + the cs[n-2] slice feeding the first
    inversion (innerproductargument.go:299-355)."""
    n = cs_full.limbs.shape[0]
    omega = fr.carry_to(fr.add(_inner(rs_v, ds_full),
                               _inner(zs_pad, cs_full)), REDUCED)
    c_pen = fr.fmap(lambda t: t[n - 2:n - 1], cs_full)
    return omega, c_pen


@cached_jit
def _piece_blind2(rs_v, cs_full, omega, inv_c, delta):
    """term1/term2 of the 2x2 solve (innerproductargument.go:356-371)."""
    n = cs_full.limbs.shape[0]
    r_pen = fr.fmap(lambda t: t[n - 2:n - 1], rs_v)
    r_last = fr.fmap(lambda t: t[n - 1:n], rs_v)
    c_last = fr.fmap(lambda t: t[n - 1:n], cs_full)
    ric = fr.carry_to(fr.mul(r_pen, inv_c), REDUCED)
    term1 = fr.carry_to(fr.sub(fr.mul(ric, omega), delta), REDUCED)
    term2 = fr.carry_to(fr.sub(r_last, fr.mul(ric, c_last)), REDUCED)
    return term1, term2, ~_is_zero(term2), c_last


@cached_jit
def _piece_blind3(zs_pad, term1, term2_inv, inv_c, c_last, omega,
                  rs_v, ds_full, cs_full):
    """Finish the solve: last_z, penultimate_z, full rs_d; verify both
    blinder constraints (deferred; innerproductargument.go:372-391)."""
    n = zs_pad.limbs.shape[0]
    last_z = fr.carry_to(fr.mul(term1, term2_inv), REDUCED)
    pen_z = fr.carry_to(
        fr.mul(fr.neg(inv_c), fr.add(fr.mul(last_z, c_last), omega)),
        REDUCED)
    rs_d = fr.Element(zs_pad.limbs.at[n - 2].set(pen_z.limbs[0])
                      .at[n - 1].set(last_z.limbs[0]), REDUCED)
    c1 = _is_zero(fr.carry_to(fr.add(_inner(rs_v, ds_full),
                                     _inner(rs_d, cs_full)), REDUCED))
    c2 = _is_zero(fr.carry_to(_inner(rs_v, rs_d), REDUCED))
    return rs_d, c1 & c2


@cached_jit
def _piece_step3(table_rs, dig_rs):
    """R = <as, Rs>, S = <as, Ss> (curdleproof.go:100-115)."""
    return curve.msm_rows_points_from_table(
        table_rs, dig_rs, jnp.asarray(np.array([0, 1], np.int32)))


@partial(cached_jit, static_argnames=("tpos", "tpb"))
def _piece_sigma(state, RS, A, base_pts, dig12, k_v, r_t_v, r_u_v,
                 r_a_v, r_b_v, r_k_v, *, tpos, tpb):
    """Group commitments T,U + the whole sigma protocol + a_prime
    (curdleproof.go:116-143, samescalarargument.go:34-81). One 12-lane
    windowed scalar-mul covers every commitment leg."""
    gt = curve.pmap_coords(lambda t: t[0:1], base_pts)
    gu = curve.pmap_coords(lambda t: t[1:2], base_pts)
    h = curve.pmap_coords(lambda t: t[2:3], base_pts)
    R = curve.pmap_coords(lambda t: t[0:1], RS)
    S = curve.pmap_coords(lambda t: t[1:2], RS)
    lanes = _stack_points([gt, gu, R, S, h, h, gt, gu, R, S, h, h])
    out = curve.scalar_mul_device(lanes, dig12)
    L = lambda i: curve.pmap_coords(lambda t: t[i:i + 1], out)
    t1_t, t1_u = L(0), L(1)
    t2_t = curve.add(L(2), L(4))           # k*R + r_t*h
    t2_u = curve.add(L(3), L(5))
    a1, b1 = L(6), L(7)
    a2 = curve.add(L(8), L(10))            # r_k*R + r_a*h
    b2 = curve.add(L(9), L(11))

    ten = _stack_points([R, S, t1_t, t2_t, t1_u, t2_u, a1, a2, b1, b2])
    ts = strobe_dev.TState(state, tpos, tpb)
    append_points_dev(ts, SS_POINTS, ten)
    alpha = challenge_fr(ts, SS_ALPHA)

    z_k = fr.carry_to(fr.add(r_k_v, fr.mul(k_v, alpha)), REDUCED)
    z_t = fr.carry_to(fr.add(r_a_v, fr.mul(r_t_v, alpha)), REDUCED)
    z_u = fr.carry_to(fr.add(r_b_v, fr.mul(r_u_v, alpha)), REDUCED)

    a_prime = curve.add(A, curve.add(t1_t, t1_u))
    cm_pts = _stack_points([t1_t, t2_t, t1_u, t2_u, a1, a2, b1, b2])
    azz = _stack_points([a_prime, t2_t, t2_u])
    return ts.st, cm_pts, azz, z_k, z_t, z_u


@cached_jit
def _piece_finalize(state, pt_parts, scalars, gammas, sanity):
    """Compress every proof point (sqrt-free x||y rows), canonicalize the
    proof scalars, evaluate the deferred sanity flags — sets up the ONE
    fetch. All stacking/canonicalization happens IN-PROGRAM: every eager
    op between pieces costs a ~ms tunnel dispatch."""
    rows = compress_dev.compress_xy(_stack_points(list(pt_parts)))
    sc_d = fr.canonical_digits(fr.concat(list(scalars)))
    gam = jnp.stack([fr.canonical_digits(g)[0] for g in gammas])
    gamma_ok = ~jnp.any(jnp.all(gam == 0, axis=-1))
    sane = jnp.all(jnp.concatenate(list(sanity))) & gamma_ok
    return rows, sc_d, sane, state


# ---------------------------------------------------------------------------


def prove_on_device(crs, Rs: List[Affine], Ss: List[Affine],
                    Ts: List[Affine], Us: List[Affine], M: Affine,
                    perm: Sequence[int], k: int, rs_m: List[int],
                    rand: Rand):
    """Drop-in replacement for curdleproof.prove — byte-identical proof,
    ONE device fetch (curdleproof.go:38-197)."""
    from . import curdleproof, grand_product, group_commitment
    from . import inner_product, same_multiscalar, same_permutation
    from . import same_scalar

    ell = len(Rs)
    n = ell + N_BLINDERS
    rounds = n.bit_length() - 1
    if n & (n - 1):
        raise ValueError("ell + 4 must be a power of two")

    # ---- host: step-1 transcript + ALL randomness draws (reference order:
    # curdleproof.go:60, grandproductargument.go:66,
    # innerproductargument.go:304-305, curdleproof.go:104-106,
    # samescalarargument.go:39-41, samemultiscalarargument.go:55)
    with profiling.span("dpf.host.step1"):
        transcript = Transcript(curdleproof.LABEL_TRANSCRIPT)
        transcript.append_points(curdleproof.LABEL_STEP1, *Rs)
        transcript.append_points(curdleproof.LABEL_STEP1, *Ss)
        transcript.append_points(curdleproof.LABEL_STEP1, *Ts)
        transcript.append_points(curdleproof.LABEL_STEP1, *Us)
        transcript.append_points(curdleproof.LABEL_STEP1, M)
        as_ = transcript.get_and_append_challenges(
            curdleproof.LABEL_VEC_A, ell)

    with profiling.span("dpf.host.draws"):
        rs_a = rand.get_frs(N_BLINDERS - 2)
        rs_a_prime = rs_a + [0, 0]
        r_cs = rand.get_frs(N_BLINDERS)
        rs_blind = rand.get_frs(n)
        zs_blind = rand.get_frs(n - 2)
        r_t = rand.get_fr()
        r_u = rand.get_fr()
        r_a = rand.get_fr()
        r_b = rand.get_fr()
        r_k = rand.get_fr()
        r_sm = rand.get_frs(n)
        perm_as = same_permutation.permute(as_, perm)

    with profiling.span("dpf.upload"):
        # shared with shuffle_permute_commit: ONE device [Gs|Hs] row +
        # extended table per CRS per process
        gh = curdleproof._gh_stacked(crs.gs, crs.hs)
        table = gh.table()
        base_pts = getattr(crs, "_dev_gtguh", None)
        if base_pts is None:
            base_pts = curve._settle(
                curve.from_affine_host([crs.gt, crs.gu, crs.h]))
            crs._dev_gtguh = base_pts
        Gsum_Hsum = getattr(crs, "_dev_sums", None)
        if Gsum_Hsum is None:
            Gsum_Hsum = curve._settle(
                curve.from_affine_host([crs.gsum, crs.hsum]))
            crs._dev_sums = Gsum_Hsum
        M_gsum = curve._settle(curve.from_affine_host([M, crs.gsum]))
        rs_key = (tuple(Rs), tuple(Ss))
        rs_sv = _rs_cache.get(rs_key)
        if rs_sv is None:
            rs_sv = curve.StackedVec.from_affine([Rs, Ss], pad_to=n)
            _rs_cache.clear()          # bound the cache to the live pair
            _rs_cache[rs_key] = rs_sv
        state, tpos, tpb = transcript_to_device(transcript)

    with profiling.span("dpf.sameperm_gpa"):
        digA = curve.scalars_to_digits(perm_as + rs_a_prime)
        state, A, B, bs, p, rs_b = _piece_sameperm(
            state, table, digA,
            jnp.asarray(_point_rows([M])),
            jnp.asarray(_scalar_rows(as_)),
            fr_const(list(perm) + [0] * (n - ell)),
            fr_const(perm_as + [0] * (n - ell)),
            fr_const(rs_m), fr_const(rs_a_prime), M_gsum,
            ell=ell, tpos=tpos, tpb=tpb)
        tpos, tpb = strobe_dev.post_challenge_pos(SP_BETA)

        state, C, cs_full, r_b_plus_alpha, r_p, gp_alpha, gp_beta = \
            _piece_gpa1(state, table, B, bs, p, rs_b,
                        fr_const([0] * ell + r_cs),
                        ell=ell, tpos=tpos, tpb=tpb)
        tpos, tpb = strobe_dev.post_challenge_pos(GP_BETA)
        binv = dp2._gamma_inv(gp_beta)
        CD, z, ds_full, diag, sane_gpa = _piece_gpa2(
            table, B, C, Gsum_Hsum, bs, cs_full, r_b_plus_alpha, r_p, p,
            gp_alpha, gp_beta, binv, ell=ell)

    with profiling.span("dpf.blinders"):
        rs_v = fr_const(rs_blind)
        zs_pad = fr_const(zs_blind + [0, 0])
        delta = fr_scalar(fh.fr_inner_product(rs_blind[:n - 2], zs_blind))
        omega, c_pen = _piece_blind1(rs_v, zs_pad, cs_full, ds_full)
        inv_c = dp2._gamma_inv(c_pen)
        term1, term2, blind_nz, c_last = _piece_blind2(
            rs_v, cs_full, omega, inv_c, delta)
        term2_inv = dp2._gamma_inv(term2)
        rs_d, sane_blind = _piece_blind3(
            zs_pad, term1, term2_inv, inv_c, c_last, omega,
            rs_v, ds_full, cs_full)

    with profiling.span("dpf.ipa"):
        rows0 = np.zeros(4, np.int32)
        ones_n = fr_const([1] * n)
        hpt = getattr(crs, "_dev_h", None)
        if hpt is None:
            hpt = curve._settle(curve.from_affine_host([crs.h]))
            crs._dev_h = hpt
        state, bcd, hcur, csd, dsd = dp2._ipa_setup(
            table, rows0, ones_n, diag, rs_v, rs_d, state, CD, z,
            cs_full, ds_full, hpt, tpos=tpos, tpb=tpb)
        tpos, tpb = strobe_dev.post_challenge_pos(dp2.LABEL_BETA)
        state, ipa_blobs, ipa_gammas, csd, dsd = dp2.run_ipa_rounds(
            state, tpos, tpb, table, rows0, hcur, ones_n, diag, csd, dsd, n)
        tpos, tpb = strobe_dev.post_challenge_pos(dp2.LABEL_GAMMA)
        c0d, d0d = dp2._final_scalars(csd, dsd)

    with profiling.span("dpf.step3_sigma"):
        dig_rs = np.stack(
            [curve.scalars_to_digits(as_ + [0] * (n - ell))] * 2)
        RS = _piece_step3(rs_sv.table(), dig_rs)
        dig12 = curve.scalars_to_digits(
            [r_t, r_u, k, k, r_t, r_u, r_a, r_b, r_k, r_k, r_a, r_b])
        state, cm_pts, azz, z_k, z_t, z_u = _piece_sigma(
            state, RS, A, base_pts, dig12, fr_scalar(k), fr_scalar(r_t),
            fr_scalar(r_u), fr_scalar(r_a), fr_scalar(r_b), fr_scalar(r_k),
            tpos=tpos, tpb=tpb)
        tpos, tpb = strobe_dev.post_challenge_pos(SS_ALPHA)

    with profiling.span("dpf.samemsm"):
        G = list(crs.gs) + list(crs.hs[: N_BLINDERS - 2]) + [crs.gt, crs.gu]
        T_prime = list(Ts) + [None, None, crs.h, None]
        U_prime = list(Us) + [None, None, None, crs.h]
        x = perm_as + rs_a + [r_t, r_u]
        sm_sv = curve.StackedVec.from_affine([G, T_prime, U_prime], pad_to=n)
        sm_table = sm_sv.table()
        tu_bytes = _point_rows(T_prime + U_prime)
        state, b_atu, xd = dp2._sm_setup(
            sm_table, fr_const(r_sm), state, azz, jnp.asarray(tu_bytes),
            fr_const(x), tpos=tpos, tpb=tpb)
        tpos, tpb = strobe_dev.post_challenge_pos(dp2.SM_LABEL_ALPHA)
        state, sm_blobs, sm_gammas, xd = dp2.run_sm_rounds(
            state, tpos, tpb, sm_table, xd, n)
        tpos, tpb = strobe_dev.post_challenge_pos(dp2.SM_LABEL_GAMMA)
        x0d = dp2._final_scalar(xd)

    with profiling.span("dpf.finalize"):
        rows, sc_d, sane, state = _piece_finalize(
            state, (A, B, C, RS, cm_pts, bcd, b_atu),
            (r_p, z_k, z_t, z_u),
            tuple(ipa_gammas + sm_gammas + [gp_beta]),
            (sane_gpa, sane_blind, blind_nz))

        with profiling.span("dpf.finalize.enqueue_wait"):
            fetch = jax.device_get((rows, sc_d, sane, ipa_blobs, c0d, d0d,
                                    sm_blobs, x0d, state))
        (rows_h, sc_h, sane_h, ipa_h, c0h, d0h, sm_h, x0h, sstate) = fetch

    if not bool(np.asarray(sane_h)):
        raise ValueError(
            "device prover sanity check failed (degenerate challenge or "
            "prover self-check mismatch)")

    pt = compress_dev.decode_xy_host

    def scalar_of(row):
        return sum(int(v) << (8 * i) for i, v in enumerate(row[:32]))

    rows_h = np.asarray(rows_h)
    A_h, B_h, C_h, R_h, S_h = (pt(rows_h[i]) for i in range(5))
    cm = rows_h[5:13]
    bc_h, bd_h = pt(rows_h[13]), pt(rows_h[14])
    ba_h, bt_h, bu_h = (pt(rows_h[i]) for i in (15, 16, 17))
    sc_h = np.asarray(sc_h)
    r_p_h, z_k_h, z_t_h, z_u_h = (scalar_of(sc_h[i]) for i in range(4))

    ipa_proof = inner_product.Proof(
        b_c=bc_h, b_d=bd_h,
        l_cs=[pt(ipa_h[r][0]) for r in range(rounds)],
        r_cs=[pt(ipa_h[r][2]) for r in range(rounds)],
        l_ds=[pt(ipa_h[r][1]) for r in range(rounds)],
        r_ds=[pt(ipa_h[r][3]) for r in range(rounds)],
        c0=scalar_of(np.asarray(c0h)[0]), d0=scalar_of(np.asarray(d0h)[0]))
    gpa_proof = grand_product.Proof(C_h, r_p_h, ipa_proof)
    sp_proof = same_permutation.Proof(B_h, gpa_proof)

    cm_t = group_commitment.GroupCommitment(pt(cm[0]), pt(cm[1]))
    cm_u = group_commitment.GroupCommitment(pt(cm[2]), pt(cm[3]))
    ss_proof = same_scalar.Proof(
        group_commitment.GroupCommitment(pt(cm[4]), pt(cm[5])),
        group_commitment.GroupCommitment(pt(cm[6]), pt(cm[7])),
        z_k_h, z_t_h, z_u_h)

    sm_proof = same_multiscalar.Proof(
        b_a=ba_h, b_t=bt_h, b_u=bu_h,
        l_a=[pt(sm_h[r][0]) for r in range(rounds)],
        l_t=[pt(sm_h[r][1]) for r in range(rounds)],
        l_u=[pt(sm_h[r][2]) for r in range(rounds)],
        r_a=[pt(sm_h[r][3]) for r in range(rounds)],
        r_t=[pt(sm_h[r][4]) for r in range(rounds)],
        r_u=[pt(sm_h[r][5]) for r in range(rounds)],
        x=scalar_of(np.asarray(x0h)[0]))

    dp2._sync_host_transcript(transcript, sstate, tpos, tpb)
    return curdleproof.Proof(A_h, cm_t, cm_u, R_h, S_h, sp_proof,
                             ss_proof, sm_proof)
