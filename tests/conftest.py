"""Test configuration: run JAX on CPU with 8 virtual devices.

Sharding tests exercise a multi-chip mesh without TPU hardware
(``--xla_force_host_platform_device_count=8``); kernels are identical
on TPU (the bench runs there).
"""

import os

# force CPU: the session env presets JAX_PLATFORMS=axon (remote TPU tunnel),
# which must not be used for unit tests
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# pytest plugins (jaxtyping) import jax before this conftest runs, which
# freezes jax_platforms from the env — override the live config too.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
