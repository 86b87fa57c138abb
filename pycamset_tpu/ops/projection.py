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


def pack_rig_intrinsics(kmats, dist_list):
    """Packed per-camera intrinsic rows + the matching projection fn.

    The shared contract of every serving-side solver (tracker, marker
    cloud, hand-eye refinement, temporal sync): one (C, w) host-numpy
    intrinsic table indexed per detection, projected by one static
    function. Homogeneous rigs keep the [fx,px,fy,py,dist...] layout and
    ``project_cam_points``; HETEROGENEOUS rigs (4-wide fisheye mixed
    with Brown) pack the selector layout ``[sel | fx px fy py | dist]``
    and project through ``project_cam_points_het`` — mixed rigs serve
    exactly like uniform ones.

    :param kmats: per-camera (3,3) intrinsic matrices.
    :param dist_list: per-camera distortion vectors (native widths).
    :return: (intr_rows (C, w) float64 numpy, project_fn(intr_row, xc)).
    """
    import numpy as np

    dl = [np.reshape(np.asarray(d, dtype=float), -1) for d in dist_list]
    sizes = {d.size for d in dl}
    het = 4 in sizes and sizes != {4}
    if not het:
        n_dist = 4 if sizes == {4} else max(5, max(sizes, default=5))
        rows = np.stack([
            np.asarray(intr9_from_k_dist(k, d, n_dist=n_dist))
            for k, d in zip(kmats, dl)])
        return rows, project_cam_points
    n_brown = max(5, max(s for s in sizes if s != 4))
    w = 5 + max(n_brown, 4)
    rows = np.zeros((len(dl), w))
    for i, (k, d) in enumerate(zip(kmats, dl)):
        k = np.asarray(k, dtype=float)
        rows[i, 0] = 1.0 if d.size == 4 else 0.0
        rows[i, 1:5] = [k[0, 0], k[0, 2], k[1, 1], k[1, 2]]
        n = 4 if d.size == 4 else w - 5
        rows[i, 5:5 + min(d.size, n)] = d[:n]

    def project_het(intr_row, xc):
        return project_cam_points_het(intr_row, xc, brown_n_dist=n_brown)

    return rows, project_het


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
