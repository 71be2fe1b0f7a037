"""Device-resident prover selection.

CURDLE_DEVICE_PROVER:
  "auto" (default) = device-resident prover on TPU with the rns backend;
                     host-orchestrated everywhere else;
  "1"              = force the device-resident prover on (rns backend only);
  "0"              = force host-orchestrated.
Any other value warns and is treated as "auto".

The device-resident prover (models/device_prover2.py) dispatches each
folding round as a handful of small pre-compiled device programs; all
carries (transcript state, folded scalars, folded bases) stay
device-resident, and the MSM wide phases inside the pieces are plain XLA
graphs (see ops/curve.py _build_table) so the pieces trace/lower in
seconds. The limb backend (CURDLE_FP=limb) is the wire-format-native
oracle used for CPU cross-checks and always runs host-orchestrated.
"""

from __future__ import annotations

import os
import warnings

_MODE = os.environ.get("CURDLE_DEVICE_PROVER", "auto")
_cached = "unset"


def device_prover_version():
    """None | 'v2' (resolved once per process)."""
    global _cached
    if _cached != "unset":
        return _cached
    import jax

    from ..ops import field_backend

    mode = _MODE
    if mode not in ("0", "1", "auto"):
        warnings.warn(
            f"CURDLE_DEVICE_PROVER={mode!r} is not one of 0/1/auto; "
            "treating as auto")
        mode = "auto"
    if mode == "0" or field_backend.BACKEND != "rns":
        _cached = None
    elif mode == "1":
        _cached = "v2"
    else:  # auto: on for the shipped TPU configuration
        _cached = "v2" if jax.default_backend() == "tpu" else None
    return _cached
