"""Test environment: force the CPU backend with 8 virtual devices so that
multi-chip sharding logic is exercised without TPU hardware, and enable f64
so oracle-equivalence tests can run at tight tolerances."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override any preset platform (e.g. a TPU tunnel)
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's sitecustomize pins JAX_PLATFORMS to the TPU tunnel before
# conftest runs; the config-level update below wins over it.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
