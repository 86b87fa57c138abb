"""Multi-device sharding of the bundle adjustment (detection-axis DP)."""
from pycamset_tpu.parallel.mesh import (
    DETECTION_AXIS, detection_mesh, replicated_spec, shard_detection_arrays,
    sharded_spec)
from pycamset_tpu.parallel.sharded import (
    make_sharded_neq_fn, make_sharded_residual_fn, make_sharded_solver)

__all__ = [
    "DETECTION_AXIS", "detection_mesh", "replicated_spec", "sharded_spec",
    "shard_detection_arrays", "make_sharded_neq_fn",
    "make_sharded_residual_fn", "make_sharded_solver",
]
