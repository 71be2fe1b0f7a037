"""Test harness config: force a CPU-only JAX with 8 virtual devices.

Mirrors the reference's CI strategy (go test -race on CPU; SURVEY.md §4) —
correctness and sharding tests run on a virtual multi-device CPU mesh; the
real TPU chip is exercised by bench.py.

Must run before anything imports jax: neutralize the axon TPU plugin and pin
the CPU platform with 8 virtual devices for multi-chip sharding tests.
"""

import os
import sys

assert "jax" not in sys.modules, "conftest must be imported before jax"
os.environ["PALLAS_AXON_POOL_IPS"] = ""   # disable the axon PJRT plugin
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
