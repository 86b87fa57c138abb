"""SE(3) transform kernels and point-set fitting as pure JAX.

Capability parity targets (reference, behaviour only):
- ``n_e4x4`` / ``n_e4x4_flat_INPLACE`` (compiled_helpers.py:180-301): 6-dof pose
  (Rodrigues rot + translation) -> homogeneous / flat (R|t) transform.
- ``n_htform_prealloc`` / ``n_htform_broadcast_prealloc`` (:332-370).
- ``n_inv_pose`` (:666-687).
- ``n_estimate_rigid_transform`` (:727-762): Kabsch/Umeyama with det correction.
- ``geometric_median`` (:9-74): Weiszfeld iteration, fixed iteration count.
- ``n_dist`` (:690-724): pairwise distances.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from pycamset_tpu.ops.rotations import matrix_to_rodrigues, rodrigues_to_matrix


def pose_to_se3(pose6: jnp.ndarray) -> jnp.ndarray:
    """6-dof pose [rvec(3), t(3)] -> (3,4) rigid transform."""
    rmat = rodrigues_to_matrix(pose6[:3])
    return jnp.concatenate([rmat, pose6[3:, None]], axis=1)


def se3_to_pose(se3: jnp.ndarray) -> jnp.ndarray:
    """(3,4) or (4,4) rigid transform -> 6-dof pose [rvec, t]."""
    rvec = matrix_to_rodrigues(se3[:3, :3])
    return jnp.concatenate([rvec, se3[:3, 3]])


def pose_to_h4(pose6: jnp.ndarray) -> jnp.ndarray:
    """6-dof pose -> (4,4) homogeneous transform."""
    bottom = jnp.array([[0.0, 0.0, 0.0, 1.0]], dtype=pose6.dtype)
    return jnp.concatenate([pose_to_se3(pose6), bottom], axis=0)


def se3_apply(se3: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply a (3,4) rigid transform to points (...,3)."""
    return pts @ se3[:, :3].T + se3[:, 3]


def pose_apply(pose6: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply a 6-dof pose to points (...,3)."""
    return se3_apply(pose_to_se3(pose6), pts)


def se3_inv(se3: jnp.ndarray) -> jnp.ndarray:
    """Invert a (3,4) rigid transform."""
    rt = se3[:, :3].T
    return jnp.concatenate([rt, (-rt @ se3[:, 3])[:, None]], axis=1)


def pose_inv(pose6: jnp.ndarray) -> jnp.ndarray:
    """Invert a 6-dof pose."""
    return se3_to_pose(se3_inv(pose_to_se3(pose6)))


def se3_compose(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Compose (3,4) transforms: result applies b first, then a."""
    return jnp.concatenate([a[:, :3] @ b[:, :3], (a[:, :3] @ b[:, 3] + a[:, 3])[:, None]], axis=1)


def h_tform(pts: jnp.ndarray, h4: jnp.ndarray, fill: float = 1.0) -> jnp.ndarray:
    """Homogeneous transform of points (...,3) by a (4,4) (or (3,4)) matrix.

    fill=1 transforms points (with perspective divide for a full projective
    matrix); fill=0 transforms direction vectors.
    """
    res = pts @ h4[:3, :3].T + fill * h4[:3, 3]
    if h4.shape[0] == 4:
        w = pts @ h4[3, :3].T + fill * h4[3, 3]
        if fill == 1.0:
            res = res / w[..., None]
    return res


def project_h(pts: jnp.ndarray, p34: jnp.ndarray) -> jnp.ndarray:
    """Project points (...,3) with a (3,4) projective matrix, with divide."""
    xyw = pts @ p34[:, :3].T + p34[:, 3]
    return xyw[..., :2] / xyw[..., 2:3]


def rigid_fit(src: jnp.ndarray, dst: jnp.ndarray,
              weights: jnp.ndarray | None = None) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Least-squares rigid transform (R, t) with R @ src + t ~= dst.

    Kabsch/Umeyama with determinant correction (proper rotation only).
    src/dst: (N,3); weights: optional (N,) non-negative.
    """
    if weights is None:
        w = jnp.ones(src.shape[0], dtype=src.dtype)
    else:
        w = weights
    wsum = jnp.sum(w)
    mu_s = jnp.sum(src * w[:, None], axis=0) / wsum
    mu_d = jnp.sum(dst * w[:, None], axis=0) / wsum
    s0 = src - mu_s
    d0 = dst - mu_d
    cov = (d0 * w[:, None]).T @ s0
    if jax.default_backend() == "tpu":
        # float32 SVD crashes the TPU compiler outright under the x64
        # config (only jnp.linalg.svd — eigh/qr/cholesky lower fine; caught
        # by the hardware test tier, tests/test_tpu_hardware.py). Build the
        # singular basis from eigh of the 3x3 gram instead: V from
        # cov^T cov, U = cov V / s column-wise. The null columns (rank-2
        # planar targets!) are rebuilt by the cross products below, so the
        # s ~ 0 columns never need a valid quotient.
        s2, v = jnp.linalg.eigh(cov.T @ cov)           # ascending
        v = v[:, ::-1]
        s = jnp.sqrt(jnp.clip(s2[::-1], 0.0, None))
        eps = jnp.asarray(1e-30, cov.dtype)
        u = (cov @ v) / jnp.maximum(s, eps)[None, :]
        # re-orthonormalise the two leading columns (f32 safety)
        u0 = u[:, 0] / jnp.maximum(jnp.linalg.norm(u[:, 0]), eps)
        u1 = u[:, 1] - jnp.dot(u0, u[:, 1]) * u0
        u1 = u1 / jnp.maximum(jnp.linalg.norm(u1), eps)
        u = jnp.stack([u0, u1, u[:, 2]], axis=1)
        vt = v.T
    else:
        u, _, vt = jnp.linalg.svd(cov)
    # planar point sets make cov rank-2; some SVD backends (TPU) return a
    # DEFECTIVE basis for the null direction. Rebuild the third column/row
    # as the cross product of the first two — identical (up to sign, which
    # the determinant correction absorbs) for full-rank inputs, and a valid
    # orthogonal completion for the rank-2 case.
    u2 = jnp.cross(u[:, 0], u[:, 1])
    u = jnp.stack([u[:, 0], u[:, 1], u2], axis=1)
    v2 = jnp.cross(vt[0], vt[1])
    vt = jnp.stack([vt[0], vt[1], v2], axis=0)
    det = jnp.sign(jnp.linalg.det(u @ vt))
    d = jnp.array([1.0, 1.0, 0.0], dtype=src.dtype)
    d = jnp.concatenate([d[:2], det[None]])
    rmat = (u * d) @ vt
    t = mu_d - rmat @ mu_s
    return rmat, t


def geometric_median(pts: jnp.ndarray, iters: int = 50, eps: float = 1e-12) -> jnp.ndarray:
    """Weiszfeld geometric median of (N,3) points, fixed iteration count."""
    def body(_, med):
        d = jnp.linalg.norm(pts - med, axis=1)
        w = 1.0 / jnp.maximum(d, eps)
        return jnp.sum(pts * w[:, None], axis=0) / jnp.sum(w)

    init = jnp.mean(pts, axis=0)
    return jax.lax.fori_loop(0, iters, body, init)


def make_cartesian(polar: jnp.ndarray) -> jnp.ndarray:
    """Spherical (lat, lng) (...,2) -> cartesian unit vectors (...,3).

    Latitude convention matches the reference (compiled_helpers.py:552-566):
    lat=0 is the equator (z=0), lat=+pi/2 the -z pole.
    """
    lat = polar[..., 0] + jnp.pi / 2
    lng = polar[..., 1]
    st = jnp.sin(lat)
    return jnp.stack([st * jnp.cos(lng), st * jnp.sin(lng),
                      jnp.cos(lat)], axis=-1)


def make_polar(xyz: jnp.ndarray) -> jnp.ndarray:
    """Cartesian unit vectors (...,3) -> spherical (lat, lng) (...,2);
    inverse of make_cartesian (reference compiled_helpers.py:568-580)."""
    n = xyz / jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    lat = jnp.arccos(jnp.clip(n[..., 2], -1.0, 1.0)) - jnp.pi / 2
    lng = jnp.arctan2(n[..., 1], n[..., 0])
    return jnp.stack([lat, lng], axis=-1)


def pairwise_dist(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise Euclidean distance matrix between (N,3) and (M,3)."""
    d2 = jnp.sum((a[:, None, :] - b[None, :, :]) ** 2, axis=-1)
    return jnp.sqrt(jnp.maximum(d2, 0.0))
