"""The verifier's MSM batching engine.

Mirrors /root/reference/msmaccumulator/msmaccumulator.go: every claimed
identity C = <x, v> is folded with a fresh random alpha into one running
check. Sound by Schwartz-Zippel.

TPU-first difference from the reference: the reference accumulates the
commitment side eagerly (A_c += alpha*C, one ScalarMultiplication per check,
msmaccumulator.go:36) and compares it against one final MultiExp. On TPU an
eager 381-bit scalar-mult is either a ~3 ms host bignum ladder or a ~40 ms
device round-trip — both dwarf the field ops. So this accumulator is FULLY
LINEAR: the commitment C itself joins the base map with scalar -alpha
(C may even be given as a linear combination sum coeff_j * Q_j of proof
points, each Q_j joining with -alpha*coeff_j), and Verify() checks that ONE
deduplicated device MSM over everything is the identity. No host group ops,
no extra device calls, identical soundness.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple, Union

from ..ops import curve
from ..utils import field_host as fh
from ..utils.field_host import Affine
from ..utils.rand import Rand

# a commitment: a single point or a linear combination [(point, coeff), ...]
LinComb = Sequence[Tuple[Affine, int]]
Commitment = Union[Affine, LinComb]


def as_terms(c: Commitment, coeff: int = 1) -> List[Tuple[Affine, int]]:
    """Normalize a point-or-lincomb to a coeff-scaled term list."""
    from ..utils.codec import LazyPoint
    if c is None:
        return []
    if isinstance(c, (tuple, LazyPoint)):  # a single point
        return [(c, coeff)]
    return [(q, coeff * k % fh.R) for (q, k) in c]


class MsmAccumulator:
    def __init__(self):
        self._base_scalar: Dict[Affine, int] = {}

    def _bump(self, base: Affine, scalar: int) -> None:
        from ..utils.codec import point_is_infinity
        if point_is_infinity(base):  # infinity contributes nothing
            return
        s = (self._base_scalar.get(base, 0) + scalar) % fh.R
        self._base_scalar[base] = s

    def accumulate_check(self, c: Commitment, x: Sequence[int],
                         v: Sequence[Affine], rand: Rand) -> None:
        """Defer the check  c == <x, v>  (msmaccumulator.go:23-47).

        c is a point OR a list of (point, coeff) terms; either way it enters
        the final MSM with weight -alpha instead of an eager scalar-mult."""
        if len(v) != len(x):
            raise ValueError("x and v must have the same length")
        alpha = rand.get_fr()
        for xi, vi in zip(x, v):
            self._bump(vi, alpha * xi)
        from ..utils.codec import LazyPoint
        if c is None or isinstance(c, (tuple, LazyPoint)):
            self._bump(c, -alpha)
        else:
            for (q, coeff) in c:
                self._bump(q, -alpha * coeff)

    def verify(self) -> bool:
        """One deduplicated device MSM == identity (msmaccumulator.go:49-64).

        LazyPoint bases resolve here — ONE batched device decompression
        for every deferred point of the verification (or batch)."""
        from ..utils.codec import resolve_point
        bases: List[Affine] = [resolve_point(b)
                               for b in self._base_scalar.keys()]
        scalars = list(self._base_scalar.values())
        if not bases:
            return True
        return curve.msm(bases, scalars) is None
