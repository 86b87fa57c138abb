"""The camera projection chain as pure JAX.

This is the hot kernel of the whole framework: every bundle-adjustment residual
is one evaluation of this chain. It reproduces (behaviourally) the reference's
``projection`` function block (pyCamSet/optimisation/
function_block_implementations.py:21-47): pinhole + full Brown–Conrady with the
per-camera 9-vector parameterisation ordered

    intr9 = [fx, px, fy, py, k1, k2, p1, p2, k3]

(the reference names the distortion entries k0,k1,p0,p1,k2; in OpenCV terms
they are k1,k2,p1,p2,k3). Derivatives come from jax.jacfwd of this chain
instead of the reference's sympy-generated closed forms
(function_block_implementations.py:50-140); parity is unit-tested.
"""
from __future__ import annotations

import jax.numpy as jnp

from pycamset_tpu.ops.distortion import distort_normalized
from pycamset_tpu.ops.transforms import pose_apply


def intr9_from_k_dist(kmat, dist, n_dist: int = 5) -> jnp.ndarray:
    """(3,3) intrinsic + distortion -> packed [fx,px,fy,py,dist...] vector.

    n_dist=5 gives the standard intr9; n_dist=8 the rational-model intr12.
    """
    kmat = jnp.asarray(kmat)
    dist = jnp.reshape(jnp.asarray(dist), (-1,))
    dist = jnp.concatenate(
        [dist, jnp.zeros(max(0, n_dist - dist.shape[0]), dist.dtype)])[:n_dist]
    return jnp.concatenate([
        jnp.stack([kmat[0, 0], kmat[0, 2], kmat[1, 1], kmat[1, 2]]), dist])


def k_dist_from_intr9(intr9) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Packed intrinsic vector -> ((3,3) intrinsic, distortion)."""
    fx, px, fy, py = intr9[0], intr9[1], intr9[2], intr9[3]
    one = jnp.ones((), dtype=intr9.dtype)
    zero = jnp.zeros((), dtype=intr9.dtype)
    kmat = jnp.array([[fx, zero, px], [zero, fy, py], [zero, zero, one]])
    return kmat, intr9[4:]


def project_cam_points(intr9: jnp.ndarray, xc: jnp.ndarray) -> jnp.ndarray:
    """Project camera-frame points (...,3) to distorted pixels (...,2).

    intr9 is the packed [fx,px,fy,py, dist...] vector — 9 entries for the
    standard model, 12 for the rational model.
    """
    fx, px, fy, py = intr9[0], intr9[1], intr9[2], intr9[3]
    inv_z = 1.0 / xc[..., 2]
    xy = xc[..., :2] * inv_z[..., None]
    xy_d = distort_normalized(xy, intr9[4:])
    u = xy_d[..., 0] * fx + px
    v = xy_d[..., 1] * fy + py
    return jnp.stack([u, v], axis=-1)


def project_cam_points_het(intr_het: jnp.ndarray, xc: jnp.ndarray,
                           brown_n_dist: int = 5) -> jnp.ndarray:
    """Heterogeneous-family projection: per-camera Brown OR fisheye.

    ``intr_het`` packs ``[sel, fx, px, fy, py, dist...]`` where ``sel`` is
    the family selector (0.0 = Brown-family with ``brown_n_dist``
    coefficients, 1.0 = Kannala-Brandt fisheye whose k1..k4 sit in the
    first four distortion slots). The selector is a PERMANENTLY FIXED
    parameter — riding the intrinsic vector lets every layer (colmasks,
    persistence, uncertainty) treat mixed rigs exactly like uniform ones.
    Both branches are evaluated and selected per point: each is finite on
    the other family's coefficients (polynomials / atan), so jacfwd
    through the where() stays NaN-free. This lifts the reference's
    single-family restriction (pyCamSet/optimisation/
    function_block_implementations.py:21-140 hard-codes one projection).
    """
    from pycamset_tpu.ops.distortion import fisheye_distort_normalized

    sel = intr_het[0]
    fx, px, fy, py = intr_het[1], intr_het[2], intr_het[3], intr_het[4]
    dist = intr_het[5:]
    inv_z = 1.0 / xc[..., 2]
    xy = xc[..., :2] * inv_z[..., None]
    xy_brown = distort_normalized(xy, dist[:brown_n_dist])
    xy_fish = fisheye_distort_normalized(xy, dist[:4])
    xy_d = jnp.where(sel > 0.5, xy_fish, xy_brown)
    u = xy_d[..., 0] * fx + px
    v = xy_d[..., 1] * fy + py
    return jnp.stack([u, v], axis=-1)


def project_world_points(intr9: jnp.ndarray, extr6: jnp.ndarray,
                         pts_w: jnp.ndarray) -> jnp.ndarray:
    """World points (...,3) -> pixels: extrinsic then projection."""
    return project_cam_points(intr9, pose_apply(extr6, pts_w))


def project_target_points(intr9: jnp.ndarray, extr6: jnp.ndarray,
                          pose6: jnp.ndarray, pts_t: jnp.ndarray) -> jnp.ndarray:
    """Target-frame points -> pixels: the full template-BA chain.

    Matches the reference block chain projection + extrinsic3D + template_points
    (template_handler.py:152), evaluated right-to-left.
    """
    return project_cam_points(intr9, pose_apply(extr6, pose_apply(pose6, pts_t)))
