"""go_curdleproofs_tpu — a TPU-native Curdleproofs (zero-knowledge shuffle
argument / Whisk SSLE) framework.

Built from scratch against the behavior of jsign/go-curdleproofs
(/root/reference), re-architected for TPU: BLS12-381 field/curve/MSM compute
runs as batched JAX/XLA/Pallas device programs (ops/), the protocol layers
(models/) orchestrate device programs from a host-side Fiat-Shamir transcript
(utils/), and scale-out runs over jax.sharding meshes (parallel/).
"""

__version__ = "0.1.0"
