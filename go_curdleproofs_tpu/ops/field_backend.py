"""Field-backend selector for the curve/MSM layer.

Two interchangeable Fp implementations:
  * ops/fp.py      — 49x8-bit lazy limbs, convolution multiply (+ fused
                     Pallas kernel); exact on CPU and TPU; the reference
                     wire-format-native representation.
  * ops/fp_rns.py  — 74-channel RNS Montgomery; multiplies are channelwise
                     VPU ops + constant MXU matmuls (~66x faster per lane on
                     a v5e); exact on CPU and TPU.

Selection: CURDLE_FP=limb|rns forces; "auto" (default) picks RNS
everywhere. Measured end-to-end on a v5e (2026-08-19): the composed
protocol is ~2x faster under RNS once conversions stay on the host
(prove n=508 3.0s vs 5.9s; round-1's "RNS loses 9x" was entirely the
old device-side canonical_digits fetch path — ~900 eagerly dispatched
ops per fetch at ~2.4s each through the TPU tunnel; raw-channel
fetches + one numpy CRT matmul removed it). The limb backend remains
the oracle/compat path (CURDLE_FP=limb). Resolved once at import (the
choice changes traced programs, so it must be stable for the
process)."""

from __future__ import annotations

import os

_MODE = os.environ.get("CURDLE_FP", "auto")


def _pick() -> str:
    if _MODE in ("limb", "rns"):
        return _MODE
    return "rns"


BACKEND = _pick()

if BACKEND == "rns":
    from . import fp_rns as impl
else:
    from . import fp as impl

_API = [
    "DTYPE", "NLIMBS", "CANONICAL", "REDUCED", "Element", "Fp",
    "add", "sub", "neg", "mul", "square", "mul_small", "carry_to",
    "pow_fixed", "inv", "sqrt_candidate", "canonical_digits",
    "from_ints", "from_int", "constant", "zeros", "to_ints", "to_int",
    "where", "fmap", "stack", "concat", "prepare_fetch", "ints_from_fetched",
]

for _name in _API:
    globals()[_name] = getattr(impl, _name)
