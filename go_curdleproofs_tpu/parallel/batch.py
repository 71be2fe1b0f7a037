"""Batched verification — amortizing many shuffle/tracker verifications.

The reference verifies one proof at a time; for production SSLE validation a
node verifies many proofs per epoch. Two TPU-native levers:

  * a SHARED MsmAccumulator across proofs: every deferred check from every
    proof folds (with its own fresh random alpha — soundness is per-check
    Schwartz-Zippel, unchanged) into ONE final device MSM for the whole
    batch;
  * the final MSM can itself be sharded over a mesh (parallel.msm).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from jax.sharding import Mesh

from ..models import curdleproof, whisk
from ..models.msm_accumulator import MsmAccumulator
from ..ops import curve
from ..utils import field_host as fh
from ..utils.rand import Rand
from . import msm as pmsm


class ShardedMsmAccumulator(MsmAccumulator):
    """MsmAccumulator whose final MSM runs sharded over a mesh."""

    def __init__(self, mesh: Optional[Mesh] = None):
        super().__init__()
        self.mesh = mesh

    def verify(self) -> bool:
        bases = list(self._base_scalar.keys())
        scalars = [self._base_scalar[b] for b in bases]
        if self.mesh is None:
            return curve.msm(bases, scalars) == self._acc
        return pmsm.sharded_msm(bases, scalars, self.mesh) == self._acc


def verify_shuffle_proofs_batch(
        crs: whisk.CRS,
        instances: Sequence[tuple],
        rand: Rand,
        mesh: Optional[Mesh] = None) -> bool:
    """Verify many (pre_trackers, post_trackers, proof_bytes) instances with
    one deferred MSM for the entire batch.

    Eager per-proof work (transcript replay, same-scalar sigma checks) still
    runs per proof; all MSM identities land in one shared accumulator.
    """
    acc = ShardedMsmAccumulator(mesh)
    for pre_st, post_st, proof_bytes in instances:
        if len(pre_st) != len(post_st):
            return False
        wp = whisk.WhiskShuffleProof.from_bytes(proof_bytes)
        Rs, Ss, Ts, Us = [], [], [], []
        for pre, post in zip(pre_st, post_st):
            r, s = pre.get_points()
            t, u = post.get_points()
            Rs.append(r)
            Ss.append(s)
            Ts.append(t)
            Us.append(u)
        if not _verify_into_accumulator(wp.proof, crs, Rs, Ss, Ts, Us, wp.m,
                                        acc, rand):
            return False
    return acc.verify()


def _verify_into_accumulator(proof, crs, Rs, Ss, Ts, Us, M, acc, rand) -> bool:
    """curdleproof.verify with an externally-owned accumulator."""
    from ..models import same_multiscalar, same_permutation, same_scalar
    from ..utils.transcript import Transcript

    transcript = Transcript(curdleproof.LABEL_TRANSCRIPT)
    if Ts[0] is None:
        return False
    transcript.append_points(curdleproof.LABEL_STEP1, *Rs)
    transcript.append_points(curdleproof.LABEL_STEP1, *Ss)
    transcript.append_points(curdleproof.LABEL_STEP1, *Ts)
    transcript.append_points(curdleproof.LABEL_STEP1, *Us)
    transcript.append_points(curdleproof.LABEL_STEP1, M)
    as_ = transcript.get_and_append_challenges(curdleproof.LABEL_VEC_A,
                                               len(Rs))

    if not same_permutation.verify(
            proof.proof_same_permutation,
            same_permutation.CRS(crs.gs, crs.hs, crs.h),
            crs.gsum, crs.hsum, proof.a, M, as_, curdleproof.N_BLINDERS,
            transcript, acc, rand):
        return False
    if not same_scalar.verify(
            proof.proof_same_scalar, same_scalar.CRS(crs.gt, crs.gu, crs.h),
            proof.r, proof.s, proof.cm_t, proof.cm_u, transcript):
        return False
    a_prime = fh.g1_add(proof.a, fh.g1_add(proof.cm_t.t1, proof.cm_u.t1))
    G = list(crs.gs) + list(crs.hs[: curdleproof.N_BLINDERS - 2]) + \
        [crs.gt, crs.gu]
    Ts_prime = list(Ts) + [None, None, crs.h, None]
    Us_prime = list(Us) + [None, None, None, crs.h]
    if not same_multiscalar.verify(
            proof.proof_same_multiscalar, G, a_prime, proof.cm_t.t2,
            proof.cm_u.t2, Ts_prime, Us_prime, transcript, acc, rand):
        return False
    acc.accumulate_check(proof.r, as_, Rs, rand)
    acc.accumulate_check(proof.s, as_, Ss, rand)
    return True
