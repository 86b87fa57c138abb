"""Device-mesh helpers for sharding the detection axis.

The scaling axis of bundle adjustment is the detection table (n_cams x n_ims
x n_features rows); residual evaluation is embarrassingly parallel across it.
The reference shards it over CPU threads (prange,
abstract_function_blocks.py:281-288); here it shards over a 1-D jax device
mesh, with the only cross-device communication being the JtJ / Jtr psum over
ICI — the BA analogue of a ring-reduce. Tensor/pipeline/expert parallelism do
not apply (parameters are tiny relative to residuals; see SURVEY.md §2.9).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

DETECTION_AXIS = "d"


def detection_mesh(n_devices: int | None = None) -> Mesh:
    """A 1-D mesh over the detection axis."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (DETECTION_AXIS,))


def sharded_spec() -> PartitionSpec:
    return PartitionSpec(DETECTION_AXIS)


def replicated_spec() -> PartitionSpec:
    return PartitionSpec()


def shard_detection_arrays(mesh: Mesh, arrays):
    """Place (cols, tpl, uv, mask) with the leading axis sharded over the mesh."""
    cols, tpl, uv, mask = arrays
    sh = NamedSharding(mesh, sharded_spec())
    return (jax.device_put(cols, sh), jax.device_put(tpl, sh),
            jax.device_put(uv, sh), jax.device_put(mask, sh))
