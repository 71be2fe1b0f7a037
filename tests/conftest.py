"""Test harness config: force a CPU-only JAX with 8 virtual devices.

Mirrors the reference's CI strategy (go test -race on CPU; SURVEY.md §4) —
correctness and sharding tests run on a virtual multi-device CPU mesh; the
real TPU chip is exercised by bench.py.

The interpreter's sitecustomize imports jax and registers the axon TPU
plugin, but backends initialize lazily — setting the env + config here (before
any test touches a device) still pins everything to CPU.
"""

import os
import sys

import pytest

TPU_MODE = os.environ.get("CURDLE_TPU_TESTS", "0") == "1"

if not TPU_MODE:
    os.environ["PALLAS_AXON_POOL_IPS"] = ""   # keep the axon plugin away
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
if not TPU_MODE:
    jax.config.update("jax_platforms", "cpu")
    assert jax.default_backend() == "cpu", jax.default_backend()
    assert len(jax.devices()) == 8, jax.devices()


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "tpu: needs the real TPU chip (run with CURDLE_TPU_TESTS=1 -m tpu)")


def pytest_collection_modifyitems(config, items):
    if TPU_MODE:
        return
    skip = pytest.mark.skip(reason="TPU-only (set CURDLE_TPU_TESTS=1)")
    for item in items:
        if "tpu" in item.keywords:
            item.add_marker(skip)
