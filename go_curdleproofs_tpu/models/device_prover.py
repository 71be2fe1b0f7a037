"""Device-resident Curdleproofs prover pipeline.

The host-orchestrated prover (models/curdleproof.py) crosses the device
boundary once per Fiat-Shamir interaction (~20 fetches x ~25ms through the
TPU tunnel). This module keeps EVERYTHING on device — transcript (STROBE /
Merlin, ops/strobe_dev.py), Fr scalar algebra (ops/fr.py), point compression
(ops/compress_dev.py), MSMs and folds — so a full shuffle proof is a chain of
async device programs with ONE final fetch of the serialized proof material.

Byte-exactness: the transcript, challenge rejection sampling, and all
randomness draw orders mirror the host path exactly, so device and host
provers produce IDENTICAL proofs (tested).

Status: the inner-product and same-multiscalar recursions run fully
on-device; the remaining layers compose incrementally on top.

Divergence note: the reference aborts on a zero gamma challenge
(innerproductargument.go:149-151) — probability 2^-255. A device program
cannot abort mid-graph; a zero gamma here would yield an invalid proof
rather than an error (the verifier still rejects it). Same class of
negligible-probability behavior difference as hash collisions.
"""

from __future__ import annotations

from typing import List, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import compress_dev, curve, fr, strobe_dev
from ..ops import field_backend as fp
from ..ops.curve import PointVec
from ..ops.limb_field import REDUCED       # fr (scalar field) carry contract
from ..utils import field_host as fh
from ..utils.field_host import Affine
from ..utils.transcript import Transcript

# ---------------------------------------------------------------------------
# small helpers


def fr_const(vals: Sequence[int]) -> fr.Element:
    return fr.from_ints([int(v) % fh.R for v in vals])


def fr_scalar(v: int) -> fr.Element:
    return fr.from_ints([int(v) % fh.R])


def challenge_to_fr(chal_be: jnp.ndarray) -> fr.Element:
    """32 big-endian challenge bytes -> canonical Fr element (33 limbs LE)."""
    le = chal_be[::-1]
    limbs = jnp.concatenate([le, jnp.zeros(1, jnp.int32)]).astype(fr.DTYPE)
    return fr.Element(limbs.reshape(1, fr.NLIMBS), fr.CANONICAL)


def fr_digits(x: fr.Element) -> jnp.ndarray:
    """fr Element [..n] -> [..n, 64] MSM window digits (device)."""
    return fr.digits_from_canonical(fr.canonical_digits(x))


def fr_bytes_be(x: fr.Element) -> jnp.ndarray:
    """fr Element [n] -> [n, 32] big-endian bytes (device)."""
    d = fr.canonical_digits(x)
    return d[..., :32][..., ::-1].astype(jnp.int32)


def broadcast_scalar(a: fr.Element, n: int) -> fr.Element:
    return fr.Element(jnp.broadcast_to(a.limbs, (n, fr.NLIMBS)), a.iv)


def append_scalars_dev(state, label: bytes, x: fr.Element):
    """Absorb each row of x as a 32-byte BE scalar (transcript.append_scalars)."""
    rows = fr_bytes_be(x)
    if rows.ndim == 1:
        rows = rows[None]
    k = rows.shape[0]
    if k == 1:
        return strobe_dev.append_message(state, label, rows[0])

    def body(i, s):
        return strobe_dev.append_message(s, label, rows[i])

    return jax.lax.fori_loop(0, k, body, state)


def append_points_dev(state, label: bytes, pv: PointVec):
    """Compress points on device and absorb (transcript.append_points)."""
    blobs = compress_dev.compress(pv)    # [k, 48]
    if blobs.ndim == 1:
        blobs = blobs[None]
    k = blobs.shape[0]
    if k == 1:
        return strobe_dev.append_message(state, label, blobs[0])

    def body(i, s):
        return strobe_dev.append_message(s, label, blobs[i])

    return jax.lax.fori_loop(0, k, body, state)


def challenge_fr(state, label: bytes) -> Tuple[object, fr.Element]:
    state, chal = strobe_dev.get_and_append_challenge(state, label)
    return state, challenge_to_fr(chal)


def transcript_to_device(t: Transcript):
    return strobe_dev.from_host(t.inner.strobe)


def transcript_to_host(state, template: Transcript) -> Transcript:
    """Materialize the device transcript back into a host Transcript."""
    h = Transcript.__new__(Transcript)
    from ..utils.merlin import MerlinTranscript
    m = MerlinTranscript.__new__(MerlinTranscript)
    m.strobe = strobe_dev.to_host(state, None, 0)
    h.inner = m
    return h


# ---------------------------------------------------------------------------
# device IPA prover
#
# Mirrors models/inner_product.py prove() /
# /root/reference/innerproductargument/innerproductargument.go:42-188 with the
# log-round recursion as ONE lax.fori_loop over fixed-width masked state.

LABEL_STEP1 = b"ipa_step1"
LABEL_ALPHA = b"ipa_alpha"
LABEL_BETA = b"ipa_beta"
LABEL_LOOP = b"ipa_loop"
LABEL_GAMMA = b"ipa_gamma"


class IpaDeviceProof(NamedTuple):
    b_c: PointVec
    b_d: PointVec
    lr_bytes: jnp.ndarray     # [rounds, 4, 48]: L_C, L_D, R_C, R_D compressed
    c0: fr.Element
    d0: fr.Element
    state: object             # final transcript SState


def _masked_digits(vec: fr.Element, lo, hi) -> jnp.ndarray:
    """Digits of vec with lanes outside [lo, hi) zeroed (traced bounds)."""
    n = vec.limbs.shape[0]
    lane = jnp.arange(n, dtype=jnp.int32)
    mask = (lane >= lo) & (lane < hi)
    limbs = jnp.where(mask[:, None], vec.limbs, 0)
    return fr_digits(fr.Element(limbs, vec.iv))


def _roll_fr(vec: fr.Element, shift) -> fr.Element:
    return fr.Element(jnp.roll(vec.limbs, shift, axis=0), vec.iv)


def _masked_inner(a: fr.Element, b: fr.Element, h) -> fr.Element:
    """<a[0:h], b[0:h]> with traced h; returns a [1]-batch element."""
    n = a.limbs.shape[0]
    lane = jnp.arange(n, dtype=jnp.int32)
    am = fr.Element(jnp.where((lane < h)[:, None], a.limbs, 0), a.iv)
    ip = fr.inner_product(am, b)
    return fr.fmap(lambda t: t[None], ip)


def ipa_prove_device(bases: PointVec, h_point: PointVec,
                     C: PointVec, D: PointVec,
                     z: fr.Element, cs: fr.Element, ds: fr.Element,
                     rs_c: fr.Element, rs_d: fr.Element,
                     state) -> IpaDeviceProof:
    """Full device IPA prove.

    bases: [2, n] stacked (Gs|Hs, Gs'|Hs'); h_point: [1] crs.H;
    cs/ds/rs_c/rs_d: fr [n]; z: fr [1]; state: device transcript.
    """
    n = cs.limbs.shape[0]
    rounds = n.bit_length() - 1

    # Step 1: B_c = <rs_c, Gs>, B_d = <rs_d, Gs'>
    dig = jnp.stack([fr_digits(rs_c), fr_digits(rs_d)])   # [2, n, 64]
    bcd = curve.msm_rows_device(bases, dig, (0, 1))       # [2]
    b_c = curve.pmap_coords(lambda t: t[0], bcd)
    b_d = curve.pmap_coords(lambda t: t[1], bcd)

    state = append_points_dev(state, LABEL_STEP1,
                              _stack_points([C, D]))
    state = append_scalars_dev(state, LABEL_STEP1, z)
    state = append_points_dev(state, LABEL_STEP1,
                              _stack_points([b_c, b_d]))
    state, alpha = challenge_fr(state, LABEL_ALPHA)
    state, beta = challenge_fr(state, LABEL_BETA)

    cs = fr.carry_to(fr.add(rs_c, fr.mul(broadcast_scalar(alpha, n), cs)),
                     REDUCED)
    ds = fr.carry_to(fr.add(rs_d, fr.mul(broadcast_scalar(alpha, n), ds)),
                     REDUCED)
    # H' = beta * H
    hp = curve.scalar_mul_device(h_point, fr_digits(beta))

    # stable pytree aux for the fori carry
    bases = curve._settle(bases)

    lr0 = jnp.zeros((rounds, 4, 48), jnp.int32)

    def body(r, carry):
        state, cs, ds, bases, hcur, lr = carry
        half = jnp.right_shift(jnp.int32(n), r + 1)

        # masked scalar vectors for the 4 cross MSMs (job layout:
        # 0: L_C over Gs-row; 1: L_D over Gs'-row; 2: R_C; 3: R_D)
        lane = jnp.arange(n, dtype=jnp.int32)
        in_lo = (lane < half)
        in_hi = (lane >= half) & (lane < 2 * half)
        cs_up = _roll_fr(cs, half)     # lane j holds cs[j-half]
        ds_up = _roll_fr(ds, half)
        cs_dn = _roll_fr(cs, -half)    # lane j holds cs[j+half]
        ds_dn = _roll_fr(ds, -half)

        def mk(vec, mask):
            limbs = jnp.where(mask[:, None], vec.limbs, 0)
            return fr_digits(fr.Element(limbs, vec.iv))

        dig = jnp.stack([
            mk(cs_up, in_hi),     # L_C: <c_L, G_R>   (Gs row)
            mk(ds_dn, in_lo),     # L_D: <d_R, G'_L>  (Gs' row)
            mk(cs_dn, in_lo),     # R_C: <c_R, G_L>   (Gs row)
            mk(ds_up, in_hi),     # R_D: <d_L, G'_R>  (Gs' row)
        ])                                          # [4, n, 64]
        outs = curve.msm_rows_device(bases, dig, (0, 1, 0, 1))   # [4]
        l_c0 = curve.pmap_coords(lambda t: t[0], outs)
        l_d = curve.pmap_coords(lambda t: t[1], outs)
        r_c0 = curve.pmap_coords(lambda t: t[2], outs)
        r_d = curve.pmap_coords(lambda t: t[3], outs)

        ipa_cl_dr = _masked_inner(cs, ds_dn, half)       # <c_L, d_R>
        ipa_cr_dl = _masked_inner(ds, cs_dn, half)       # <c_R, d_L>
        h_terms = curve.scalar_mul_device(
            _stack_points([hcur, hcur]),
            jnp.stack([fr_digits(ipa_cl_dr)[0], fr_digits(ipa_cr_dl)[0]]))
        l_c = curve.add(l_c0, curve.pmap_coords(lambda t: t[0], h_terms))
        r_c = curve.add(r_c0, curve.pmap_coords(lambda t: t[1], h_terms))

        lr_pts = _stack_points([l_c, l_d, r_c, r_d])
        blobs = compress_dev.compress(lr_pts)            # [4, 48]
        lr = lr.at[r].set(blobs)

        def absorb_body(i, s):
            return strobe_dev.append_message(s, LABEL_LOOP, blobs[i])
        state = jax.lax.fori_loop(0, 4, absorb_body, state)
        state, gamma_be = strobe_dev.get_and_append_challenge(
            state, LABEL_GAMMA)
        gamma = challenge_to_fr(gamma_be)
        gamma_inv = fr.inv(gamma)

        # fold scalars: cs' = c_L + gamma^-1 c_R ; ds' = d_L + gamma d_R
        gi_n = broadcast_scalar(gamma_inv, n)
        g_n = broadcast_scalar(gamma, n)
        cs_new = fr.carry_to(fr.add(cs, fr.mul(gi_n, cs_dn)), REDUCED)
        ds_new = fr.carry_to(fr.add(ds, fr.mul(g_n, ds_dn)), REDUCED)
        zero_mask = (lane < half)[:, None]
        cs_new = fr.Element(jnp.where(zero_mask, cs_new.limbs, 0), REDUCED)
        ds_new = fr.Element(jnp.where(zero_mask, ds_new.limbs, 0), REDUCED)

        # fold bases: row 0 by gamma, row 1 by gamma^-1
        fold_digits = jnp.stack([
            jnp.broadcast_to(fr_digits(gamma), (n, 64)),
            jnp.broadcast_to(fr_digits(gamma_inv), (n, 64))])
        bases_new = curve.fold_device(bases, fold_digits, half)

        return (state, cs_new, ds_new, bases_new, hcur, lr)

    state, cs, ds, bases, hp, lr = jax.lax.fori_loop(
        0, rounds, body, (state, cs, ds, bases, hp, lr0))

    c0 = fr.fmap(lambda t: t[:1], cs)
    d0 = fr.fmap(lambda t: t[:1], ds)
    return IpaDeviceProof(b_c, b_d, lr, c0, d0, state)


def _stack_points(pvs: List[PointVec]) -> PointVec:
    def cat(get):
        rows = [fp.fmap(lambda t: t if t.ndim > 1 else t[None], get(p))
                for p in pvs]
        return fp.concat(rows, axis=0)

    return PointVec(cat(lambda p: p.x), cat(lambda p: p.y),
                    cat(lambda p: p.z))


# ---------------------------------------------------------------------------
# host-callable wrapper producing a standard inner_product.Proof

def prove_ipa_on_device(crs_gs: List[Affine], crs_gs_prime: List[Affine],
                        crs_h: Affine, C: Affine, D: Affine, z: int,
                        cs: List[int], ds: List[int],
                        transcript: Transcript, rand,
                        stacked=None) -> "inner_product.Proof":
    """Drop-in replacement for inner_product.prove: same proof bytes, but the
    whole recursion runs on device with one final fetch. `stacked` optionally
    supplies device-resident [Gs, Gs'] bases (from the grand-product prover)
    so they never cross the host."""
    from . import inner_product

    n = len(cs)
    rs_c, rs_d = inner_product.generate_ipa_blinders(rand, cs, ds)

    if stacked is not None:
        bases = stacked.pv
    else:
        bases = curve.StackedVec.from_affine([crs_gs, crs_gs_prime],
                                             pad_to=n).pv
    state = transcript_to_device(transcript)
    out = _ipa_jit(bases,
                   curve.from_affine_host([crs_h]),
                   curve.from_affine_host([C]),
                   curve.from_affine_host([D]),
                   fr_scalar(z), fr_const(cs), fr_const(ds),
                   fr_const(rs_c), fr_const(rs_d), state)

    # ONE stacked fetch: transcript state + proof material
    b_cd = compress_dev.compress(_stack_points([out.b_c, out.b_d]))
    fetch = jax.device_get((b_cd, out.lr_bytes,
                            fr.canonical_digits(out.c0),
                            fr.canonical_digits(out.d0),
                            out.state))
    b_cd_h, lr_h, c0d, d0d, sstate = fetch

    from ..utils import codec
    def pt(row):
        return codec.g1_from_bytes(bytes(np.asarray(row).astype(np.uint8)),
                                   subgroup_check=False)

    rounds = lr_h.shape[0]
    proof = inner_product.Proof(
        b_c=pt(b_cd_h[0]), b_d=pt(b_cd_h[1]),
        l_cs=[pt(lr_h[r][0]) for r in range(rounds)],
        r_cs=[pt(lr_h[r][2]) for r in range(rounds)],
        l_ds=[pt(lr_h[r][1]) for r in range(rounds)],
        r_ds=[pt(lr_h[r][3]) for r in range(rounds)],
        c0=sum(int(v) << (8 * i) for i, v in enumerate(np.asarray(c0d)[0])),
        d0=sum(int(v) << (8 * i) for i, v in enumerate(np.asarray(d0d)[0])),
    )
    # sync the host transcript to the device state
    new_strobe = strobe_dev.to_host(
        strobe_dev.SState(jnp.asarray(sstate[0]), jnp.asarray(sstate[1]),
                          jnp.asarray(sstate[2])), None, 0)
    transcript.inner.strobe = new_strobe
    return proof


_ipa_jit_cache = {}


def _ipa_jit(*args):
    key = args[0].x.limbs.shape
    if key not in _ipa_jit_cache:
        _ipa_jit_cache[key] = jax.jit(ipa_prove_device)
    return _ipa_jit_cache[key](*args)


# ---------------------------------------------------------------------------
# device same-multiscalar prover
#
# Mirrors models/same_multiscalar.py prove() /
# /root/reference/samemultiscalarargument/samemultiscalarargument.go:37-157.

SM_LABEL_STEP1 = b"same_msm_step1"
SM_LABEL_ALPHA = b"same_msm_alpha"
SM_LABEL_LOOP = b"same_msm_loop"
SM_LABEL_GAMMA = b"same_msm_gamma"


class SameMsmDeviceProof(NamedTuple):
    b_atu: PointVec           # [3]
    lr_bytes: jnp.ndarray     # [rounds, 6, 48]: L_A,L_T,L_U,R_A,R_T,R_U
    x0: fr.Element
    state: object


def samemsm_prove_device(bases: PointVec,        # [3, n]: G, T', U'
                         azz: PointVec,          # [3]: A', Z_t, Z_u
                         tu_bytes: jnp.ndarray,  # [2*n_real, 48] T'|U' bytes
                         x: fr.Element,          # [n]
                         r: fr.Element,          # [n] blinders
                         state) -> SameMsmDeviceProof:
    n = x.limbs.shape[0]
    rounds = n.bit_length() - 1

    rdig = fr_digits(r)
    dig = jnp.stack([rdig, rdig, rdig])           # [3, n, 64]
    b_atu = curve.msm_rows_device(bases, dig, (0, 1, 2))   # [3]

    state = append_points_dev(state, SM_LABEL_STEP1, azz)

    def absorb_tu(i, s):
        return strobe_dev.append_message(s, SM_LABEL_STEP1, tu_bytes[i])
    state = jax.lax.fori_loop(0, tu_bytes.shape[0], absorb_tu, state)

    state = append_points_dev(state, SM_LABEL_STEP1, b_atu)
    state, alpha = challenge_fr(state, SM_LABEL_ALPHA)

    x = fr.carry_to(fr.add(r, fr.mul(broadcast_scalar(alpha, n), x)), REDUCED)

    bases = curve._settle(bases)
    lr0 = jnp.zeros((rounds, 6, 48), jnp.int32)

    def body(rd, carry):
        state, x, bases, lr = carry
        half = jnp.right_shift(jnp.int32(n), rd + 1)
        lane = jnp.arange(n, dtype=jnp.int32)
        in_lo = (lane < half)
        in_hi = (lane >= half) & (lane < 2 * half)
        x_up = _roll_fr(x, half)
        x_dn = _roll_fr(x, -half)

        def mk(vec, mask):
            limbs = jnp.where(mask[:, None], vec.limbs, 0)
            return fr_digits(fr.Element(limbs, vec.iv))

        dl = mk(x_up, in_hi)    # x_L placed on high lanes (bases _R)
        dr = mk(x_dn, in_lo)    # x_R placed on low lanes (bases _L)
        dig = jnp.stack([dl, dl, dl, dr, dr, dr])  # [6, n, 64]
        lr_pts = curve.msm_rows_device(bases, dig, (0, 1, 2, 0, 1, 2))
        blobs = compress_dev.compress(lr_pts)      # [6, 48]
        lr = lr.at[rd].set(blobs)

        def absorb_body(i, s):
            return strobe_dev.append_message(s, SM_LABEL_LOOP, blobs[i])
        state = jax.lax.fori_loop(0, 6, absorb_body, state)
        state, gamma_be = strobe_dev.get_and_append_challenge(
            state, SM_LABEL_GAMMA)
        gamma = challenge_to_fr(gamma_be)
        gamma_inv = fr.inv(gamma)

        x_new = fr.carry_to(
            fr.add(x, fr.mul(broadcast_scalar(gamma_inv, n), x_dn)), REDUCED)
        x_new = fr.Element(jnp.where(in_lo[:, None], x_new.limbs, 0), REDUCED)

        fold_digits = jnp.broadcast_to(fr_digits(gamma), (3, n, 64))
        bases_new = curve.fold_device(bases, fold_digits, half)
        return (state, x_new, bases_new, lr)

    state, x, bases, lr = jax.lax.fori_loop(
        0, rounds, body, (state, x, bases, lr0))
    x0 = fr.fmap(lambda t: t[:1], x)
    return SameMsmDeviceProof(b_atu, lr, x0, state)


def prove_samemsm_on_device(G: List[Affine], A: Affine, Z_t: Affine,
                            Z_u: Affine, T: List[Affine], U: List[Affine],
                            x: List[int], transcript: Transcript,
                            rand) -> "same_multiscalar.Proof":
    """Drop-in replacement for same_multiscalar.prove (same proof bytes)."""
    from . import same_multiscalar
    from ..utils import codec

    n = len(x)
    r = rand.get_frs(n)
    bases = curve.StackedVec.from_affine([G, T, U], pad_to=n).pv
    azz = curve.from_affine_host([A, Z_t, Z_u])
    tu_bytes = np.stack(
        [np.frombuffer(codec.g1_to_bytes(p), np.uint8).astype(np.int32)
         for p in (list(T) + list(U))])
    state = transcript_to_device(transcript)
    out = _samemsm_jit(bases, azz, jnp.asarray(tu_bytes),
                       fr_const(x), fr_const(r), state)

    b_blobs = compress_dev.compress(out.b_atu)
    fetch = jax.device_get((b_blobs, out.lr_bytes,
                            fr.canonical_digits(out.x0), out.state))
    b_h, lr_h, x0d, sstate = fetch

    def pt(row):
        return codec.g1_from_bytes(bytes(np.asarray(row).astype(np.uint8)),
                                   subgroup_check=False)

    rounds = lr_h.shape[0]
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
    transcript.inner.strobe = strobe_dev.to_host(
        strobe_dev.SState(jnp.asarray(sstate[0]), jnp.asarray(sstate[1]),
                          jnp.asarray(sstate[2])), None, 0)
    return proof


_samemsm_jit_cache = {}


def _samemsm_jit(*args):
    key = args[0].x.limbs.shape
    if key not in _samemsm_jit_cache:
        _samemsm_jit_cache[key] = jax.jit(samemsm_prove_device)
    return _samemsm_jit_cache[key](*args)
