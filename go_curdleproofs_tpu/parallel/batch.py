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

    def __init__(self, mesh: Optional[Mesh] = None):
        super().__init__()
        self.mesh = mesh

    def verify(self) -> bool:
        bases = list(self._base_scalar.keys())
        scalars = [self._base_scalar[b] for b in bases]
        if not bases:
            return True
        if self.mesh is None:
            return curve.msm(bases, scalars) is None
        return pmsm.sharded_msm(bases, scalars, self.mesh) is None


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
        Rs, Ss, Ts, Us = whisk._decompress_tracker_sets(pre_st, post_st)
        if Ts[0] is None:
            return False
        # curdleproof.verify with the shared accumulator: all of this
        # proof's deferred checks fold in; ONE MSM at the end of the batch.
        if not curdleproof.verify(wp.proof, crs, Rs, Ss, Ts, Us, wp.m,
                                  rand, accumulator=acc):
            return False
    return acc.verify()
