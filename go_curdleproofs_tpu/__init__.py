"""go_curdleproofs_tpu — a TPU-native Curdleproofs (zero-knowledge shuffle
argument / Whisk SSLE) framework.

Built from scratch against the behavior of jsign/go-curdleproofs
(/root/reference), re-architected for TPU: BLS12-381 field/curve/MSM compute
runs as batched JAX/XLA/Pallas device programs (ops/), the protocol layers
(models/) orchestrate device programs from a host-side Fiat-Shamir transcript
(utils/), and scale-out runs over jax.sharding meshes (parallel/).
"""

__version__ = "0.1.0"


def _enable_persistent_compile_cache() -> None:
    """Honor JAX_COMPILATION_CACHE_DIR.

    The jax version in this environment does not read the env var into
    `jax_compilation_cache_dir` (config default None), so every process paid
    full XLA:TPU recompiles (~minutes through the remote-TPU tunnel) even
    with a populated cache directory. Wire it explicitly; harmless where
    jax already picked the value up."""
    import os

    path = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if not path:
        return
    try:
        import jax

        if jax.config.jax_compilation_cache_dir is None:
            jax.config.update("jax_compilation_cache_dir", path)
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              float(os.environ.get(
                                  "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS",
                                  "1")))
    except Exception:  # pragma: no cover - never break import over caching
        pass


_enable_persistent_compile_cache()
