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


def distort_normalized(xy: jnp.ndarray, dist: jnp.ndarray) -> jnp.ndarray:
    """Forward-distort normalized coords (...,2) with [k1,k2,p1,p2,k3]."""
    x = xy[..., 0]
    y = xy[..., 1]
    k1, k2, p1, p2, k3 = dist[0], dist[1], dist[2], dist[3], dist[4]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def distort_pixels(uv: jnp.ndarray, kmat: jnp.ndarray, dist: jnp.ndarray) -> jnp.ndarray:
    """Forward-distort pixel coords (...,2) given a (3,3) intrinsic matrix."""
    f = jnp.stack([kmat[0, 0], kmat[1, 1]])
    c = jnp.stack([kmat[0, 2], kmat[1, 2]])
    xy = (uv - c) / f
    return distort_normalized(xy, dist) * f + c


def undistort_normalized(xy_d: jnp.ndarray, dist: jnp.ndarray, iters: int = 8) -> jnp.ndarray:
    """Invert Brown–Conrady on normalized coords via fixed-point iteration."""
    k1, k2, p1, p2, k3 = dist[0], dist[1], dist[2], dist[3], dist[4]
    xd = xy_d[..., 0]
    yd = xy_d[..., 1]

    def body(_, xy):
        x, y = xy[..., 0], xy[..., 1]
        r2 = x * x + y * y
        radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        return jnp.stack([(xd - dx) / radial, (yd - dy) / radial], axis=-1)

    return jax.lax.fori_loop(0, iters, body, xy_d)


def undistort_pixels(uv: jnp.ndarray, kmat: jnp.ndarray, dist: jnp.ndarray,
                     iters: int = 8) -> jnp.ndarray:
    """Invert distortion for pixel coords (...,2); returns ideal pixel coords."""
    f = jnp.stack([kmat[0, 0], kmat[1, 1]])
    c = jnp.stack([kmat[0, 2], kmat[1, 2]])
    xy_d = (uv - c) / f
    return undistort_normalized(xy_d, dist, iters=iters) * f + c
