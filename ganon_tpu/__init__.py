"""ganon_tpu — a TPU-native metagenomic read classifier and taxonomic profiler.

A from-scratch JAX/XLA/Pallas framework with the capabilities of ganon2
(reference: pirovc/ganon). The compute core — winnowed-minimizer extraction,
interleaved-Bloom-filter (IBF) construction and bulk membership counting —
runs as JAX kernels on TPU, holding the IBF as a dense HBM-resident
bit-matrix. Multi-chip scaling shards the Bloom-bin axis and read batches
over a `jax.sharding.Mesh`.

The package uses native uint64 JAX arrays for 2k-bit k-mer hashes and the
64-bit Bloom hash family, so 64-bit mode is enabled at import.
"""

import jax as _jax

_jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"
