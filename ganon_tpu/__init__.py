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

import os as _os

import jax as _jax

_jax.config.update("jax_enable_x64", True)

# An environment sitecustomize may force-select a platform via jax.config
# (which silently beats the JAX_PLATFORMS env var). If the user set
# JAX_PLATFORMS explicitly, honor it.
_env_platforms = _os.environ.get("JAX_PLATFORMS")
if _env_platforms and (_jax.config.jax_platforms or "") != _env_platforms:
    try:
        _jax.config.update("jax_platforms", _env_platforms)
    except Exception:
        pass

# Persistent compilation cache: the CLI is a short-lived process, so
# without this every `ganon-tpu build`/`classify` invocation recompiles
# every kernel (tens of seconds per shape). Opt out with
# GANON_TPU_JAX_CACHE=0 or point it elsewhere with a path.
_cache = _os.environ.get("GANON_TPU_JAX_CACHE", "")
if _cache != "0":
    if not _cache:
        _cache = _os.path.join(
            _os.path.expanduser("~"), ".cache", "ganon_tpu", "jax"
        )
    try:
        _os.makedirs(_cache, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

__version__ = "0.1.0"
