"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must set the env vars before jax initializes its backends. Real-TPU runs
(bench.py, the driver's compile checks) do not go through the CPU forcing.

Two tiers:
- default: CPU backend, 8 virtual devices, float64; tpu-marked tests are
  skipped (compiled Pallas/Mosaic behaviour cannot run there).
- hardware: ``PYCAMSET_TPU_TESTS=1 python -m pytest tests -m tpu -q`` keeps
  the real TPU backend and runs ONLY the tpu-marked tests — the tier that
  catches compiled-Mosaic and TPU-numerics bugs (e.g. the rank-2 SVD defect)
  that interpret mode cannot.
"""
import os

import pytest

TPU_TIER = os.environ.get("PYCAMSET_TPU_TESTS") == "1"

if not TPU_TIER:
    # The JAX_PLATFORMS env var is overridden by the axon TPU plugin in this
    # environment; jax.config.update('jax_platforms', ...) wins, so use that.
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

    import jax  # noqa: E402

    jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "tpu: needs the real TPU chip "
        "(run: PYCAMSET_TPU_TESTS=1 pytest -m tpu)")
    config.addinivalue_line(
        "markers", "slow: spawns subprocesses / takes minutes")


def pytest_collection_modifyitems(config, items):
    if TPU_TIER:
        skip = pytest.mark.skip(reason="TPU tier runs only tpu-marked tests")
        for item in items:
            if "tpu" not in item.keywords:
                item.add_marker(skip)
    else:
        skip = pytest.mark.skip(
            reason="needs real TPU (PYCAMSET_TPU_TESTS=1 pytest -m tpu)")
        for item in items:
            if "tpu" in item.keywords:
                item.add_marker(skip)
