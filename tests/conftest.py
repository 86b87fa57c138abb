"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must set the env vars before jax initializes its backends. Real-TPU runs
(bench.py, the driver's compile checks) do not go through this conftest.
"""
import os

# The JAX_PLATFORMS env var is overridden by the axon TPU plugin in this
# environment; jax.config.update('jax_platforms', ...) wins, so use that.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
