"""Test configuration: CPU backend, 8 virtual devices, float64 enabled.

Sharding tests use a virtual 8-device CPU mesh (no multi-chip TPU hardware in
CI); numerical tests need f64.  Must run before jax initialises its backend.

Note: the environment may pin JAX_PLATFORMS to an experimental TPU plugin
(axon); `jax.config.update("jax_platforms", "cpu")` reliably overrides it,
the env var alone does not.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
