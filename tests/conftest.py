"""Test configuration: force the CPU backend with 8 virtual devices so
multi-chip sharding paths are exercised without TPU hardware.

Note: this environment's jaxlib hardcodes jax_platforms to "axon,cpu"
(remote-TPU tunnel), ignoring the JAX_PLATFORMS env var, so we must override
via jax.config before any backend is initialized. Tunneled-TPU round trips
are ~1s each; tests would be unusably slow on it.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
