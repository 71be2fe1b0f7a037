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
from ..utils.rand import Rand
from . import msm as pmsm


class ShardedMsmAccumulator(MsmAccumulator):
    """MsmAccumulator whose final MSM runs sharded over a mesh."""

    def __init__(self, mesh: Optional[Mesh] = None, static_bases=None):
        super().__init__(static_bases=static_bases)
        self.mesh = mesh

    def verify(self) -> bool:
        if self.mesh is None:
            return super().verify()
        from ..utils.codec import resolve_point
        bases = [resolve_point(b) for b in self._base_scalar.keys()]
        scalars = list(self._base_scalar.values())
        if not bases:
            return True
        return pmsm.sharded_msm(bases, scalars, self.mesh) is None


def verify_shuffle_proofs_batch(
        crs: whisk.CRS,
        instances: Sequence[tuple],
        rand: Rand,
        mesh: Optional[Mesh] = None) -> bool:
    """Verify many (pre_trackers, post_trackers, proof_bytes) instances with
    ONE batched device decompression and ONE deferred MSM for the entire
    batch (the generalization of msmaccumulator.go:49-64 across proofs).

    Every proof's points and tracker sets enter a shared DecodePool as
    lazy blobs; per-proof work is pure host transcript replay + scalar
    algebra. The pool's sqrt/subgroup program and the accumulator's final
    MSM each run once for the whole batch."""
    from ..utils import codec

    acc = ShardedMsmAccumulator(
        mesh, static_bases=curdleproof._gh_static(crs))
    pool = codec.DecodePool()
    parsed = []
    try:
        for pre_st, post_st, proof_bytes in instances:
            if len(pre_st) != len(post_st):
                return False
            wp = whisk.WhiskShuffleProof.from_bytes(proof_bytes, pool=pool)
            tracker_sets = whisk._pool_tracker_sets(pre_st, post_st, pool)
            parsed.append((wp, tracker_sets))
        for wp, (Rs, Ss, Ts, Us) in parsed:
            if Ts[0].is_infinity:
                return False
            # shared accumulator: all of this proof's deferred checks fold
            # in; ONE MSM at the end of the batch
            if not curdleproof.verify(wp.proof, crs, Rs, Ss, Ts, Us, wp.m,
                                      rand, accumulator=acc):
                return False
        return acc.verify()
    except (ValueError, EOFError):
        return False
