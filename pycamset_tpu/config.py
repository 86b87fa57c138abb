"""Global numeric configuration for pycamset_tpu.

The reference library (pyCamSet) computes everything in float64 on CPU. On TPU,
float64 is either unsupported or emulated, so the policy here is:

- x64 is enabled globally so that host-side / CPU-backend computation (tests,
  parity checks, the final solve of small reduced systems) runs in float64,
  matching the reference numerics.
- Device-resident hot paths take an explicit ``dtype`` and default to the
  backend's preferred precision: float64 on CPU, float32 on TPU. The LM solver
  is precision-parameterised end to end.

This module must be imported before any other pycamset_tpu module touches jax.
"""
from __future__ import annotations

import jax

jax.config.update("jax_enable_x64", True)

# TPU MXU matmuls default to bfloat16 input precision, which poisons the
# Jacobian/gram products of the bundle adjustment (LM degrades from ~6 to
# ~95 iterations). Geometry demands full f32 multiply-accumulate; the 2x MXU
# cost is irrelevant next to the 19x iteration saving.
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: the LM while_loop takes 20-90 s to compile;
# repeated runs (pipelines, benchmarks) hit the cache instead. Opt out with
# PYCAMSET_NO_COMPILE_CACHE=1.
import os  # noqa: E402

if not os.environ.get("PYCAMSET_NO_COMPILE_CACHE"):
    _cache_dir = os.environ.get(
        "PYCAMSET_COMPILE_CACHE", os.path.expanduser("~/.cache/pycamset_jax"))
    try:
        os.makedirs(_cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        # persist EVERYTHING: on a remote-compiler backend (axon tunnel)
        # even a convert_element_type costs ~0.5 s to compile, and a
        # problem build dispatches ~15 such eager ops — 8 s of re-compiles
        # per process under the default 1 s threshold (r5 cold-start
        # profile); the tiny cache entries are cheap
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:  # cache is an optimisation, never a requirement
        pass

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def default_device_dtype() -> jnp.dtype:
    """Preferred dtype for device compute: f64 on CPU, f32 on accelerators."""
    backend = jax.default_backend()
    if backend == "cpu":
        return jnp.float64
    return jnp.float32


def solve_dtype() -> np.dtype:
    """Dtype for the (small) linear solves of the reduced camera system."""
    return np.float64
