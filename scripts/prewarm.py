"""Prewarm the persistent executable cache for the shipped configuration.

On this backend the real TPU/Mosaic compilation is deferred to first
execution (minutes per executable through the tunnel — see
ops/exe_cache.py); cached executables reload in <1 s. This script prepays
those compiles by running each bench phase once, which exercises exactly
the executables `python bench.py` will dispatch:

    python scripts/prewarm.py                 # all phases, plain-XLA mode
    python scripts/prewarm.py --kernel        # fused Mosaic-kernel mode
    python scripts/prewarm.py --kernel size508 size124   # chosen phases

Kernel-mode compiles cost 20-30 MINUTES per Mosaic shape; phases
completed with --kernel are recorded in .exe_cache/prewarm_manifest.json
("kernel_phases"), and bench.py runs a phase with CURDLE_RNS_KERNEL=1
iff its key is listed there — so the bench never stalls on a cold
Mosaic compile, and ships the fastest fully-warmed configuration.
"""

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.environ.get("CURDLE_EXE_CACHE", os.path.join(ROOT, ".exe_cache"))
MANIFEST = os.path.join(CACHE, "prewarm_manifest.json")

PHASES = {
    "size508": ["--size", "508"],
    "size124": ["--size", "124"],
    "size252": ["--size", "252"],
    "size60": ["--size", "60"],
    "msm": ["--msm"],
    "batch8": ["--batch", "8"],
    "batch32": ["--batch", "32"],
}


def _load_manifest() -> dict:
    try:
        with open(MANIFEST) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def _record(phase: str, mode: str, ok: bool) -> None:
    m = _load_manifest()
    key = {"kernel": "kernel_phases", "vkernel": "vkernel_phases",
           "xla": "xla_phases"}[mode]
    cur = set(m.get(key, []))
    (cur.add if ok else cur.discard)(phase)
    m[key] = sorted(cur)
    os.makedirs(CACHE, mode=0o700, exist_ok=True)
    tmp = f"{MANIFEST}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(m, f, indent=1)
    os.replace(tmp, MANIFEST)


def warm(phase: str, mode: str, timeout: int) -> bool:
    env = dict(os.environ)
    env["CURDLE_RNS_KERNEL"] = "1" if mode == "kernel" else "0"
    env["CURDLE_VERIFY_KERNEL"] = "1" if mode == "vkernel" else "0"
    t0 = time.time()
    try:
        rc = subprocess.run(
            [sys.executable, os.path.join(ROOT, "bench.py")] + PHASES[phase],
            env=env, cwd=ROOT, timeout=timeout).returncode
    except subprocess.TimeoutExpired:
        rc = -1
    ok = rc == 0
    print(f"# prewarm {phase} mode={mode}: "
          f"{'ok' if ok else f'FAILED rc={rc}'} in {time.time()-t0:.0f}s",
          file=sys.stderr)
    _record(phase, mode, ok)
    return ok


if __name__ == "__main__":
    args = sys.argv[1:]
    # --kernel: fused Pallas kernels everywhere (prover too; ~15 Mosaic
    #           shapes per size — hours of first-compile through the tunnel)
    # --vkernel: fused kernels for the VERIFIER's final-MSM programs only
    #           (~2 Mosaic shapes per size; models/msm_accumulator.py)
    mode = ("kernel" if "--kernel" in args
            else "vkernel" if "--vkernel" in args else "xla")
    names = [a for a in args if not a.startswith("--")] or list(PHASES)
    timeout = int(os.environ.get("PREWARM_TIMEOUT", "10800"))
    for name in names:
        if name not in PHASES:
            sys.exit(f"unknown phase {name!r}; choices: {list(PHASES)}")
        warm(name, mode, timeout)
