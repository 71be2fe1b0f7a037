"""The verifier's MSM batching engine.

Mirrors /root/reference/msmaccumulator/msmaccumulator.go: every claimed
identity C = <x, v> is folded with a fresh random alpha into one running
check. Sound by Schwartz-Zippel.

TPU-first differences from the reference:

  * the reference accumulates the commitment side eagerly (A_c += alpha*C,
    one ScalarMultiplication per check, msmaccumulator.go:36) and compares
    it against one final MultiExp. On TPU an eager 381-bit scalar-mult is
    either a ~3 ms host bignum ladder or a ~40 ms device round-trip — both
    dwarf the field ops. So this accumulator is FULLY LINEAR: the
    commitment C itself joins the base map with scalar -alpha (C may even
    be given as a linear combination sum coeff_j * Q_j of proof points,
    each Q_j joining with -alpha*coeff_j), and Verify() checks that ONE
    deduplicated device MSM over everything is the identity. No host group
    ops, no extra device calls, identical soundness.

  * bases that belong to a long-lived STATIC set (the CRS [Gs|Hs] row,
    whose device multiples table is built once per CRS per process,
    models/curdleproof.py _gh_stacked) are routed to that cached table;
    only the per-proof bases (trackers, proof points) pay a fresh table
    build. The reference's MultiExp rebuilds its full window tables every
    verification (msmaccumulator.go:49-64 -> gnark MultiExp).

Base keys: points are dict keys directly — host Affine tuples hash by
value, LazyPoints by their compressed blob. The two representations never
compare equal (utils/codec.py LazyPoint.__eq__), so a group element
appearing both ways occupies two entries; the final MSM sums both, which
is the same group-law total. Scalars merge per-key mod r.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple, Union

from ..ops import curve
from ..utils import field_host as fh
from ..utils.codec import LazyPoint, point_is_infinity, resolve_point
from ..utils.field_host import Affine
from ..utils.rand import Rand

# a commitment: a single point or a linear combination [(point, coeff), ...]
LinComb = Sequence[Tuple[Affine, int]]
Commitment = Union[Affine, LinComb]

_VERIFY_KERNEL = os.environ.get("CURDLE_VERIFY_KERNEL", "0")


def _verify_kernel() -> bool:
    return _VERIFY_KERNEL == "1"


def as_terms(c: Commitment, coeff: int = 1) -> List[Tuple[Affine, int]]:
    """Normalize a point-or-lincomb to a coeff-scaled term list."""
    if c is None:
        return []
    if isinstance(c, (tuple, LazyPoint)):  # a single point
        return [(c, coeff)]
    return [(q, coeff * k % fh.R) for (q, k) in c]


class StaticBases:
    """A device-resident base row with a prebuilt multiples table plus a
    value-index of its points (lane lookup by Affine tuple)."""

    def __init__(self, sv: "curve.StackedVec", points: Sequence[Affine]):
        self.sv = sv
        self.index: Dict[Affine, int] = {}
        for i, p in enumerate(points):
            if p is not None and p not in self.index:
                self.index[p] = i


class MsmAccumulator:
    def __init__(self, static_bases: Optional[StaticBases] = None):
        self._base_scalar: Dict[Affine, int] = {}
        self._static = static_bases

    def _bump(self, base: Affine, scalar: int) -> None:
        if point_is_infinity(base):  # infinity contributes nothing
            return
        # scalars accumulate UNREDUCED (products are ~510 bits; sums stay
        # well under Python bignum limb growth) — one % r at verify()
        # instead of a division per element (the verifier bumps ~5k
        # elements per proof; this loop is the host-replay hot path)
        self._base_scalar[base] = self._base_scalar.get(base, 0) + scalar

    def accumulate_check(self, c: Commitment, x: Sequence[int],
                         v: Sequence[Affine], rand: Rand) -> None:
        """Defer the check  c == <x, v>  (msmaccumulator.go:23-47).

        c is a point OR a list of (point, coeff) terms; either way it enters
        the final MSM with weight -alpha instead of an eager scalar-mult."""
        if len(v) != len(x):
            raise ValueError("x and v must have the same length")
        alpha = rand.get_fr()
        bs = self._base_scalar
        get = bs.get
        for xi, vi in zip(x, v):
            if type(vi) is tuple or (vi is not None
                                     and not vi.is_infinity):
                bs[vi] = get(vi, 0) + alpha * xi
        if c is None or isinstance(c, (tuple, LazyPoint)):
            self._bump(c, -alpha)
        else:
            for (q, coeff) in c:
                self._bump(q, -alpha * coeff)

    def _split_static(self):
        """Partition accumulated bases into (static-row scalar vector,
        dynamic bases, dynamic scalars). Only host Affine tuples can route
        to the static row (LazyPoints decode fresh per proof)."""
        st = self._static
        static_sc = [0] * (st.sv.width if st else 0)
        dyn_b: List[Affine] = []
        dyn_s: List[int] = []
        any_static = False
        for b, s in self._base_scalar.items():
            lane = st.index.get(b) if (st and isinstance(b, tuple)) else None
            if lane is not None:
                static_sc[lane] = (static_sc[lane] + s) % fh.R
                any_static = True
            else:
                dyn_b.append(resolve_point(b))
                dyn_s.append(s)
        return (static_sc if any_static else None), dyn_b, dyn_s

    def verify(self) -> bool:
        """One deduplicated device MSM == identity (msmaccumulator.go:49-64).

        LazyPoint bases resolve here — ONE batched device decompression
        for every deferred point of the verification (or batch). CRS bases
        ride the cached static table; everything else is one fresh MSM.

        CURDLE_VERIFY_KERNEL=1 runs the final-MSM programs with the fused
        Pallas kernels (curve.kernel_scope) while the rest of the process
        (notably the prover) stays on plain XLA — only the verifier's ~2
        Mosaic shapes per size need prewarming (scripts/prewarm.py)."""
        if not self._base_scalar:
            return True
        static_sc, dyn_b, dyn_s = self._split_static()
        with curve.kernel_scope(_verify_kernel()):
            if static_sc is not None and dyn_b:
                # the common case: ONE program computes the static row off
                # its cached table + the per-proof rows off an in-program
                # table, combines window sums, runs one Horner, one fetch
                total = curve.msm_with_static(
                    self._static.sv, static_sc, dyn_b, dyn_s)
            elif dyn_b:
                total = curve.msm(dyn_b, dyn_s)
            elif static_sc is not None:
                (total,) = self._static.sv.msm_many([[(0, static_sc, 0)]])
            else:
                return True
        return total is None
