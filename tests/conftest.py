"""Test configuration: CPU backend, 8 virtual devices, float64 enabled.

Sharding tests use a virtual 8-device CPU mesh (no multi-chip TPU hardware in
CI); numerical tests need f64.  Must run before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_enable_x64", True)
