"""Field-backend selector for the curve/MSM layer.

Two interchangeable Fp implementations:
  * ops/fp.py      — 49x8-bit lazy limbs, convolution multiply (+ fused
                     Pallas kernel); exact on CPU and TPU; the reference
                     wire-format-native representation.
  * ops/fp_rns.py  — 74-channel RNS Montgomery; multiplies are channelwise
                     VPU ops + constant MXU matmuls (~66x faster per lane on
                     a v5e); exact on CPU and TPU.

Selection: CURDLE_FP=limb|rns forces; "auto" (default) picks RNS on TPU and
limbs on CPU. Resolved once at import (the choice changes traced programs,
so it must be stable for the process)."""

from __future__ import annotations

import os

_MODE = os.environ.get("CURDLE_FP", "auto")


def _pick() -> str:
    if _MODE in ("limb", "rns"):
        return _MODE
    try:
        import jax
        return "rns" if jax.default_backend() != "cpu" else "limb"
    except Exception:  # pragma: no cover
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
