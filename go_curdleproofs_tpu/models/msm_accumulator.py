"""The verifier's MSM batching engine.

Mirrors /root/reference/msmaccumulator/msmaccumulator.go: every claimed
identity C = <x, v> is folded with a fresh random alpha into one running
check; Verify() performs ONE deduplicated MSM (on device) and compares to the
accumulated commitment. Sound by Schwartz-Zippel. This collapses the ~7 MSM
identities of a shuffle verification into a single device MSM call — the key
verifier optimization, and on TPU also the key way to amortize host<->device
crossings.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

from ..ops import curve
from ..utils import field_host as fh
from ..utils.field_host import Affine
from ..utils.rand import Rand


class MsmAccumulator:
    def __init__(self):
        self._acc: Affine = None                       # A_c
        self._base_scalar: Dict[Affine, int] = {}

    def accumulate_check(self, c: Affine, x: Sequence[int],
                         v: Sequence[Affine], rand: Rand) -> None:
        """Defer the check  c == <x, v>  (msmaccumulator.go:23-47)."""
        if len(v) != len(x):
            raise ValueError("x and v must have the same length")
        alpha = rand.get_fr()
        for xi, vi in zip(x, v):
            self._base_scalar[vi] = (
                self._base_scalar.get(vi, 0) + alpha * xi) % fh.R
        self._acc = fh.g1_add(self._acc, fh.g1_mul(c, alpha))

    def verify(self) -> bool:
        """One deduplicated device MSM vs the accumulator (msmaccumulator.go:49-64)."""
        bases: List[Affine] = list(self._base_scalar.keys())
        scalars = [self._base_scalar[b] for b in bases]
        msm_res = curve.msm(bases, scalars)
        return msm_res == self._acc
