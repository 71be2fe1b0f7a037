"""Device-resident prover selection.

CURDLE_DEVICE_PROVER: "0" = host-orchestrated only; "1" = force on;
"auto" (default) = on when the RNS backend runs on a real TPU (the v2
piece-dispatch prover needs the fused Pallas kernels).

v2 (models/device_prover2.py) is the RNS piece-dispatch prover; v1
(models/device_prover.py) is the round-1 limb fori-merged prover, kept
only for the limb backend (CURDLE_FP=limb CURDLE_DEVICE_PROVER=1).
"""

from __future__ import annotations

import os

_MODE = os.environ.get("CURDLE_DEVICE_PROVER", "auto")
_cached = "unset"


def device_prover_version():
    """None | 'v1' | 'v2' (resolved once per process)."""
    global _cached
    if _cached != "unset":
        return _cached
    from ..ops import field_backend
    if _MODE == "0":
        _cached = None
    elif field_backend.BACKEND == "rns":
        import jax
        on = _MODE == "1" or (_MODE == "auto"
                              and jax.default_backend() == "tpu")
        _cached = "v2" if on else None
    elif field_backend.BACKEND == "limb" and _MODE == "1":
        _cached = "v1"
    else:
        _cached = None
    return _cached
