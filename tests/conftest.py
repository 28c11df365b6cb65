"""Test configuration: run on CPU with 8 virtual devices so sharding tests
exercise a multi-chip mesh without TPU hardware (the standard JAX substitute
for multi-host testing).

The session shell exports ``JAX_PLATFORMS=axon`` (tunneled TPU); eager
dispatch over the tunnel is far too slow for unit tests, so we force the
host CPU backend here via jax.config (env vars alone are not reliably
honored once the axon plugin is registered).
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
