"""Brown–Conrady lens distortion as pure JAX.

Capability parity targets (reference, behaviour only):
- ``nb_distort_prealloc`` / ``nb_distort`` (compiled_helpers.py:437-490) and the
  duplicate in cameras/camera.py:31-59: forward distortion with coefficients
  (k1, k2, p1, p2, k3) applied in normalized image coordinates.
- ``nb_undistort*`` (compiled_helpers.py:373-434): fixed-point iterative
  undistortion; the reference uses 5 iterations, here it is a ``lax.fori_loop``
  with a configurable count (default 8 for tighter convergence).

Distortion coefficient order everywhere: [k1, k2, p1, p2, k3] (OpenCV order).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _radial_factor(r2: jnp.ndarray, dist: jnp.ndarray) -> jnp.ndarray:
    """Radial distortion factor: polynomial (5-coef) or rational (8-coef).

    dist layouts (OpenCV order): [k1,k2,p1,p2,k3] or
    [k1,k2,p1,p2,k3,k4,k5,k6] with
    radial = (1 + k1 r2 + k2 r4 + k3 r6) / (1 + k4 r2 + k5 r4 + k6 r6).
    """
    k1, k2, k3 = dist[0], dist[1], dist[4]
    num = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    if dist.shape[0] >= 8:
        k4, k5, k6 = dist[5], dist[6], dist[7]
        den = 1.0 + r2 * (k4 + r2 * (k5 + r2 * k6))
        return num / den
    return num


def _tilt_matrix(taux: jnp.ndarray, tauy: jnp.ndarray) -> jnp.ndarray:
    """OpenCV sensor-tilt (Scheimpflug) projection matrix.

    matTilt = projZ(R) @ R with R = Ry(tauy) @ Rx(taux), exactly
    cv2's computeTiltProjectionMatrix.
    """
    cx, sx = jnp.cos(taux), jnp.sin(taux)
    cy, sy = jnp.cos(tauy), jnp.sin(tauy)
    rx = jnp.array([[1.0, 0.0, 0.0], [0.0, cx, sx], [0.0, -sx, cx]])
    ry = jnp.array([[cy, 0.0, -sy], [0.0, 1.0, 0.0], [sy, 0.0, cy]])
    r = ry @ rx
    projz = jnp.array([[r[2, 2], 0.0, -r[0, 2]],
                       [0.0, r[2, 2], -r[1, 2]],
                       [0.0, 0.0, 1.0]])
    return projz @ r


def _apply_tilt(xy: jnp.ndarray, mat: jnp.ndarray) -> jnp.ndarray:
    """Apply a 3x3 tilt (homography) to normalized coords (...,2)."""
    w = mat[2, 0] * xy[..., 0] + mat[2, 1] * xy[..., 1] + mat[2, 2]
    u = mat[0, 0] * xy[..., 0] + mat[0, 1] * xy[..., 1] + mat[0, 2]
    v = mat[1, 0] * xy[..., 0] + mat[1, 1] * xy[..., 1] + mat[1, 2]
    return jnp.stack([u / w, v / w], axis=-1)


def fisheye_theta_d(theta: jnp.ndarray, dist4: jnp.ndarray) -> jnp.ndarray:
    """Kannala-Brandt distorted angle: theta (1 + k1 th^2 + ... + k4 th^8)."""
    t2 = theta * theta
    poly = 1.0 + t2 * (dist4[0] + t2 * (dist4[1]
                                        + t2 * (dist4[2] + t2 * dist4[3])))
    return theta * poly


def fisheye_distort_normalized(xy: jnp.ndarray,
                               dist4: jnp.ndarray) -> jnp.ndarray:
    """Fisheye (cv2.fisheye / Kannala-Brandt) mapping of normalized coords:
    r = |xy|, theta = atan(r), xy_d = xy * theta_d(theta) / r.

    The radius is smoothed (sqrt(r^2 + eps)) instead of branched so jacfwd
    through the on-axis point stays finite (where() would propagate NaN).
    """
    r2 = xy[..., 0] ** 2 + xy[..., 1] ** 2
    r = jnp.sqrt(r2 + 1e-18)
    theta = jnp.arctan(r)
    return xy * (fisheye_theta_d(theta, dist4) / r)[..., None]


def fisheye_undistort_normalized(xy_d: jnp.ndarray, dist4: jnp.ndarray,
                                 iters: int = 8) -> jnp.ndarray:
    """Invert the fisheye mapping: solve theta_d(theta) = rd by fixed
    point (theta <- rd / poly(theta)), then xy = xy_d * tan(theta) / rd."""
    rd2 = xy_d[..., 0] ** 2 + xy_d[..., 1] ** 2
    rd = jnp.sqrt(rd2 + 1e-18)

    def body(_, theta):
        t2 = theta * theta
        poly = 1.0 + t2 * (dist4[0] + t2 * (dist4[1]
                                            + t2 * (dist4[2]
                                                    + t2 * dist4[3])))
        return rd / poly

    theta = jax.lax.fori_loop(0, iters, body, rd)
    return xy_d * (jnp.tan(theta) / rd)[..., None]


def distort_normalized(xy: jnp.ndarray, dist: jnp.ndarray) -> jnp.ndarray:
    """Forward-distort normalized coords (...,2).

    dist is [k1,k2,p1,p2,k3] (standard), [k1,k2,p1,p2,k3,k4,k5,k6]
    (rational model), [...,s1,s2,s3,s4] (12-coef thin-prism model),
    [...,taux,tauy] (14-coef tilted/Scheimpflug model) — or the 4-wide
    fisheye [k1,k2,k3,k4] (Kannala-Brandt angles, cv2.fisheye).
    """
    if dist.shape[0] == 4:
        return fisheye_distort_normalized(xy, dist)
    x = xy[..., 0]
    y = xy[..., 1]
    p1, p2 = dist[2], dist[3]
    r2 = x * x + y * y
    radial = _radial_factor(r2, dist)
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    if dist.shape[0] >= 12:
        xd = xd + r2 * (dist[8] + r2 * dist[9])
        yd = yd + r2 * (dist[10] + r2 * dist[11])
    out = jnp.stack([xd, yd], axis=-1)
    if dist.shape[0] >= 14:
        out = _apply_tilt(out, _tilt_matrix(dist[12], dist[13]))
    return out


def distort_pixels(uv: jnp.ndarray, kmat: jnp.ndarray, dist: jnp.ndarray) -> jnp.ndarray:
    """Forward-distort pixel coords (...,2) given a (3,3) intrinsic matrix."""
    f = jnp.stack([kmat[0, 0], kmat[1, 1]])
    c = jnp.stack([kmat[0, 2], kmat[1, 2]])
    xy = (uv - c) / f
    return distort_normalized(xy, dist) * f + c


def undistort_normalized(xy_d: jnp.ndarray, dist: jnp.ndarray, iters: int = 8) -> jnp.ndarray:
    """Invert the distortion on normalized coords via fixed-point iteration.

    Works for both the standard 5-coefficient and rational 8-coefficient
    models (the radial factor generalises to a ratio), the 12-coef
    thin-prism model (prism terms join the iterated additive part), and
    the 4-wide fisheye model (theta fixed point).
    """
    if dist.shape[0] == 4:
        return fisheye_undistort_normalized(xy_d, dist, iters=iters)
    p1, p2 = dist[2], dist[3]
    if dist.shape[0] >= 14:  # undo the sensor tilt before the fixed point
        inv_tilt = jnp.linalg.inv(_tilt_matrix(dist[12], dist[13]))
        xy_d = _apply_tilt(xy_d, inv_tilt)
    xd = xy_d[..., 0]
    yd = xy_d[..., 1]

    def body(_, xy):
        x, y = xy[..., 0], xy[..., 1]
        r2 = x * x + y * y
        radial = _radial_factor(r2, dist)
        dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        if dist.shape[0] >= 12:  # thin-prism terms
            dx = dx + r2 * (dist[8] + r2 * dist[9])
            dy = dy + r2 * (dist[10] + r2 * dist[11])
        return jnp.stack([(xd - dx) / radial, (yd - dy) / radial], axis=-1)

    return jax.lax.fori_loop(0, iters, body, xy_d)


def distort_normalized_het(xy: jnp.ndarray,
                           hdist: jnp.ndarray) -> jnp.ndarray:
    """Forward-distort through a HET row ``[sel | brown coefs...]``.

    sel = 1 selects Kannala-Brandt (k1..k4 in the first four slots);
    sel = 0 the Brown family of the slot width. Both branches stay finite
    on the other family's coefficients, so jacfwd through the where() is
    NaN-safe (heterogeneous rigs, see ops/projection.py
    project_cam_points_het)."""
    brown = distort_normalized(xy, hdist[1:])
    fish = fisheye_distort_normalized(xy, hdist[1:5])
    return jnp.where(hdist[0] > 0.5, fish, brown)


def undistort_normalized_het(xy_d: jnp.ndarray, hdist: jnp.ndarray,
                             iters: int = 8) -> jnp.ndarray:
    """Invert the het-row distortion (see distort_normalized_het)."""
    brown = undistort_normalized(xy_d, hdist[1:], iters=iters)
    fish = fisheye_undistort_normalized(xy_d, hdist[1:5], iters=iters)
    return jnp.where(hdist[0] > 0.5, fish, brown)


def undistort_pixels(uv: jnp.ndarray, kmat: jnp.ndarray, dist: jnp.ndarray,
                     iters: int = 8) -> jnp.ndarray:
    """Invert distortion for pixel coords (...,2); returns ideal pixel coords."""
    f = jnp.stack([kmat[0, 0], kmat[1, 1]])
    c = jnp.stack([kmat[0, 2], kmat[1, 2]])
    xy_d = (uv - c) / f
    return undistort_normalized(xy_d, dist, iters=iters) * f + c


def undistort_pixels_het(uv: jnp.ndarray, kmat: jnp.ndarray,
                         hdist: jnp.ndarray, iters: int = 8) -> jnp.ndarray:
    """undistort_pixels through a het ``[sel | coefs]`` distortion row."""
    f = jnp.stack([kmat[0, 0], kmat[1, 1]])
    c = jnp.stack([kmat[0, 2], kmat[1, 2]])
    xy_d = (uv - c) / f
    return undistort_normalized_het(xy_d, hdist, iters=iters) * f + c
