"""Test environment: force the CPU backend with 8 virtual devices so that
multi-chip sharding logic is exercised without TPU hardware, and enable f64
so oracle-equivalence tests can run at tight tolerances."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
