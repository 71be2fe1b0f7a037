"""Device-resident prover selection.

CURDLE_DEVICE_PROVER: "0"/"auto" (default) = host-orchestrated;
"1" = force the device-resident prover on.

v2 (models/device_prover2.py) is the RNS piece-dispatch prover; v1
(models/device_prover.py) is the round-1 limb fori-merged prover, kept
only for the limb backend (CURDLE_FP=limb CURDLE_DEVICE_PROVER=1).

Default OFF even on TPU: v2's per-round piece programs currently spend
minutes in MLIR lowering on the real chip (the msm_rows_device graph
inlines the Pallas kernel + its constant tables once per window), which
blows the first-prove latency budget; the host-orchestrated StackedVec
path reuses a handful of compiled programs and wins end-to-end until
v2's pieces are restructured around the streamed windowed_combine
kernel.
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
    if _MODE != "1":
        _cached = None
    elif field_backend.BACKEND == "rns":
        _cached = "v2"
    elif field_backend.BACKEND == "limb":
        _cached = "v1"
    else:
        _cached = None
    return _cached
