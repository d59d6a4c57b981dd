"""Test configuration.

Tests run on CPU with a virtual 8-device mesh so multi-chip sharding is
exercised without TPU hardware, and with float64 enabled so the device
tracer can be validated against the float64 oracle at tight tolerances.
"""
import os

# Must be set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon sitecustomize overrides JAX_PLATFORMS via jax.config, so the
# platform must be forced through the config too.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
