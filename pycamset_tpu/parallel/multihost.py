"""Multi-process (multi-host / DCN) execution of the sharded BA backend.

SURVEY.md §2.9 names "optional multi-chip sharding over DCN for huge rigs"
as the TPU-native equivalent of the reference's (absent) multi-process
story. The design note in docs/parity.md claims the sharded backend needs
no code change beyond initialisation; this module proves it executable:

- :func:`init_distributed` brings up the JAX multi-controller runtime
  (`jax.distributed.initialize`), with a CPU fallback that carves
  `local_device_count` virtual devices per process so a multi-host topology
  can be validated on one machine (2 processes x 4 devices = an 8-device
  global mesh over "DCN").
- :func:`global_detection_mesh` spans every process's devices with the same
  1-D detection axis the single-host mesh uses.
- :func:`global_block_arrays` materialises the camera-major detection
  tensors as *global* jax.Arrays: each process fills only the shards it
  addresses, so the full table never has to exist on any one device.

Everything downstream — `make_sharded_structured_solver`, psum over the
detection axis, the replicated Schur solve — is untouched: under the
multi-controller runtime the same pjit program runs SPMD on all processes,
and the JtJ/Jtr psum rides DCN instead of ICI. Exercised end-to-end by
`python __graft_entry__.py multihost` (two spawned processes, cost parity
against the single-process solve) and tests/test_multihost.py.
"""
from __future__ import annotations

import os

import numpy as np


def init_distributed(coordinator_address: str,
                     num_processes: int,
                     process_id: int,
                     local_device_count: int | None = None,
                     platform: str | None = None) -> None:
    """Join this process to a multi-controller JAX runtime.

    Call once per process before any other JAX use. On real TPU pods the
    runtime discovers the topology itself and only `coordinator_address`
    is strictly needed; on CPU (validation mode) pass `local_device_count`
    to carve virtual devices and set platform="cpu".
    """
    if local_device_count is not None:
        flag = f"--xla_force_host_platform_device_count={local_device_count}"
        if flag not in os.environ.get("XLA_FLAGS", ""):
            os.environ["XLA_FLAGS"] = (
                os.environ.get("XLA_FLAGS", "") + " " + flag).strip()

    import jax
    if platform is not None:
        # the axon plugin in this environment ignores the JAX_PLATFORMS env
        # var; the config update must land before the backend initialises
        jax.config.update("jax_platforms", platform)
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)


def global_detection_mesh():
    """A 1-D detection-axis mesh over EVERY process's devices."""
    import jax
    from pycamset_tpu.parallel.mesh import DETECTION_AXIS, Mesh
    return Mesh(np.asarray(jax.devices()), (DETECTION_AXIS,))


def _global_put(mesh, spec, host_value: np.ndarray):
    """Build a global jax.Array on a (possibly multi-process) mesh from a
    host copy, filling only this process's addressable shards."""
    import jax
    from jax.sharding import NamedSharding
    sharding = NamedSharding(mesh, spec)
    host_value = np.asarray(host_value)
    return jax.make_array_from_callback(
        host_value.shape, sharding, lambda idx: host_value[idx])


def global_block_arrays(mesh, uv, mask, n_cams: int, shard_axis: str = "cam"):
    """Multi-process counterpart of
    :func:`pycamset_tpu.parallel.sharded_structured.shard_block_arrays`:
    the same camera-major reshape, placed as global arrays so it works when
    this process addresses only part of the mesh."""
    from jax.sharding import PartitionSpec as P
    from pycamset_tpu.parallel.mesh import DETECTION_AXIS

    uv = np.asarray(uv)
    mask = np.asarray(mask)
    blocks, k = mask.shape
    n_ims = blocks // n_cams
    uv_c = uv.reshape(n_cams, n_ims, k, 2)
    mask_c = mask.reshape(n_cams, n_ims, k)
    spec = (P(DETECTION_AXIS) if shard_axis == "cam"
            else P(None, DETECTION_AXIS))
    return _global_put(mesh, spec, uv_c), _global_put(mesh, spec, mask_c)


def replicate_global(mesh, value):
    """Place a host value replicated across every device of a global mesh."""
    from jax.sharding import PartitionSpec as P
    return _global_put(mesh, P(), np.asarray(value))
