"""Lightweight tracing/metrics — the observability layer the reference lacks
(SURVEY.md §5: "Tracing / profiling: none in-repo").

Two mechanisms:
  * span(name): wall-clock span accounting, aggregated per-name; enabled with
    CURDLE_PROFILE=1 (report() prints a table; bench.py hooks it);
  * jax_trace(dir): context manager around jax.profiler for full XLA/TPU
    traces when CURDLE_JAX_TRACE=<dir> is set.
"""

from __future__ import annotations

import contextlib
import os
import time
from collections import defaultdict

ENABLED = os.environ.get("CURDLE_PROFILE", "0") == "1"

_spans = defaultdict(lambda: [0.0, 0])


@contextlib.contextmanager
def span(name: str):
    if not ENABLED:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        s = _spans[name]
        s[0] += dt
        s[1] += 1


def report() -> str:
    lines = [f"{'span':<40} {'calls':>6} {'total_ms':>10} {'avg_ms':>9}"]
    for name, (total, calls) in sorted(_spans.items(),
                                       key=lambda kv: -kv[1][0]):
        lines.append(f"{name:<40} {calls:>6} {total*1e3:>10.1f} "
                     f"{total/calls*1e3:>9.2f}")
    return "\n".join(lines)


def reset() -> None:
    _spans.clear()


@contextlib.contextmanager
def jax_trace():
    trace_dir = os.environ.get("CURDLE_JAX_TRACE")
    if not trace_dir:
        yield
        return
    import jax
    with jax.profiler.trace(trace_dir):
        yield
