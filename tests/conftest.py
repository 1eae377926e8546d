"""Test configuration.

Tests run on CPU with float64 enabled (reproducing the reference's
ComplexF64 tolerance anchors) and with 8 virtual devices so the multi-chip
sharding path can be exercised without TPU hardware.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon TPU plugin ignores the JAX_PLATFORMS env var; force CPU explicitly
# so tests never compile through the TPU tunnel.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
