"""Rotation kernels (axis-angle / Rodrigues) as pure, autodiff-safe JAX.

Capability parity targets (reference, for behaviour only — not design):
- ``numba_flat_rodrigues_INPLACE`` (pyCamSet/optimisation/compiled_helpers.py:197-235)
  including the small-angle branch required for derivative stability.
- ``numba_rodrigues_jac`` (compiled_helpers.py:237-286) — here the Jacobian comes
  from ``jax.jacfwd`` of :func:`rodrigues_to_matrix`; unit tests check it against
  finite differences and OpenCV.

All functions are single-sample and shaped for ``jax.vmap``; they contain no
data-dependent Python control flow, so they trace cleanly under ``jax.jit``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_SMALL_ANGLE_SQ = 1e-16


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """(3,) -> (3,3) cross-product matrix."""
    z = jnp.zeros((), dtype=v.dtype)
    return jnp.array([
        [z, -v[2], v[1]],
        [v[2], z, -v[0]],
        [-v[1], v[0], z],
    ])


def rodrigues_to_matrix(rvec: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle (3,) -> rotation matrix (3,3).

    Autodiff-safe at theta -> 0: both the value and the derivative fall back to
    the first-order expansion ``I + skew(r)`` via the where-guarded-sqrt trick,
    mirroring the reference's explicit small-angle branch.
    """
    theta2 = jnp.sum(rvec * rvec)
    big = theta2 > _SMALL_ANGLE_SQ
    # guarded sqrt: gradient of sqrt at 0 is inf, so substitute 1.0 inside.
    theta = jnp.sqrt(jnp.where(big, theta2, 1.0))
    k = jnp.where(big, rvec / theta, jnp.zeros_like(rvec))
    c = jnp.cos(theta)
    s = jnp.sin(theta)
    eye = jnp.eye(3, dtype=rvec.dtype)
    kk = jnp.outer(k, k)
    r_full = c * eye + s * skew(k) + (1.0 - c) * kk
    r_small = eye + skew(rvec)
    return jnp.where(big, r_full, r_small)


def matrix_to_rodrigues(rmat: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (3,3) -> axis-angle (3,). Inverse of Rodrigues.

    Handles the theta ~ 0 and theta ~ pi branches without data-dependent
    control flow (select-based), so it is jit/vmap compatible.
    """
    trace = jnp.trace(rmat)
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_t)

    # generic branch: axis from the antisymmetric part
    w = jnp.array([
        rmat[2, 1] - rmat[1, 2],
        rmat[0, 2] - rmat[2, 0],
        rmat[1, 0] - rmat[0, 1],
    ])
    sin_t = jnp.sin(theta)
    generic_ok = jnp.abs(sin_t) > 1e-6
    safe_sin = jnp.where(generic_ok, sin_t, 1.0)
    r_generic = w * (theta / (2.0 * safe_sin))

    # small-angle: r ~ w / 2
    r_small = 0.5 * w

    # theta ~ pi branch: axis from diagonal of (R + I)/2 = kk^T
    kk = (jnp.diag(rmat) + 1.0) * 0.5
    k = jnp.sqrt(jnp.clip(kk, 0.0, None))
    # fix signs using off-diagonals; pick the largest component as anchor
    imax = jnp.argmax(k)
    signs_by_anchor = jnp.stack([
        jnp.array([1.0, jnp.sign(rmat[0, 1]), jnp.sign(rmat[0, 2])]),
        jnp.array([jnp.sign(rmat[0, 1]), 1.0, jnp.sign(rmat[1, 2])]),
        jnp.array([jnp.sign(rmat[0, 2]), jnp.sign(rmat[1, 2]), 1.0]),
    ])
    sign = signs_by_anchor[imax]
    sign = jnp.where(sign == 0.0, 1.0, sign)
    r_pi = k * sign * theta

    near_pi = cos_t < -0.999999
    return jnp.where(near_pi, r_pi, jnp.where(generic_ok, r_generic, r_small))


rodrigues_to_matrix_batch = jax.vmap(rodrigues_to_matrix)
matrix_to_rodrigues_batch = jax.vmap(matrix_to_rodrigues)
