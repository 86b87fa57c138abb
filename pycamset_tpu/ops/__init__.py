"""Core TPU-native math kernels (pure JAX, jit/vmap/pjit friendly)."""
from pycamset_tpu import config  # noqa: F401  (enables x64 before any tracing)

from pycamset_tpu.ops.rotations import (
    rodrigues_to_matrix, matrix_to_rodrigues,
    rodrigues_to_matrix_batch, matrix_to_rodrigues_batch, skew,
)
from pycamset_tpu.ops.transforms import (
    pose_to_se3, se3_to_pose, pose_to_h4, se3_apply, pose_apply, se3_inv,
    pose_inv, se3_compose, h_tform, project_h, rigid_fit, geometric_median,
    pairwise_dist, make_cartesian, make_polar,
)
from pycamset_tpu.ops.distortion import (
    distort_normalized, distort_pixels, undistort_normalized, undistort_pixels,
)
from pycamset_tpu.ops.projection import (
    intr9_from_k_dist, k_dist_from_intr9, project_cam_points,
    project_world_points, project_target_points,
)
from pycamset_tpu.ops.triangulation import (
    triangulate_nviews, triangulate_nviews_batch, triangulate_observations,
)
