"""Field-backend selector for the curve/MSM layer.

Two interchangeable Fp implementations:
  * ops/fp.py      — 49x8-bit lazy limbs, convolution multiply (+ fused
                     Pallas kernel); exact on CPU and TPU; the reference
                     wire-format-native representation.
  * ops/fp_rns.py  — 74-channel RNS Montgomery; multiplies are channelwise
                     VPU ops + constant MXU matmuls (~66x faster per lane on
                     a v5e); exact on CPU and TPU.

Selection: CURDLE_FP=limb|rns forces; "auto" (default) picks limbs
everywhere. Measured end-to-end on a v5e (2026-08-18): RNS wins the
wide-batch mul microbench 66x but LOSES the composed protocol 9x
(prove n=508: 63.7s RNS vs 7.4s limb; verify 7.3s vs 1.06s) — the
per-mul 37x37 HIGHEST-precision base-extension matmuls pad to 128x128
MXU tiles and fragment XLA fusions at protocol batch shapes. RNS stays
opt-in (CURDLE_FP=rns) pending a Pallas kernel that keeps whole point
ops in VMEM. Resolved once at import (the choice changes traced
programs, so it must be stable for the process)."""

from __future__ import annotations

import os

_MODE = os.environ.get("CURDLE_FP", "auto")


def _pick() -> str:
    if _MODE in ("limb", "rns"):
        return _MODE
    return "limb"


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
