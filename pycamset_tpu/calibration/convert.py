"""Camera model conversion: refit one distortion family onto another.

Interop utility (beyond the reference, which ships a single 5-coefficient
model): many downstream tools speak only one distortion family — a
pipeline might need Brown coefficients from a Kannala-Brandt fisheye
calibration, or a plain 5-coefficient model from a rational/thin-prism
rig. ``convert_camera_model`` refits the target family to reproduce the
SOURCE camera's full projection over a dense pixel grid:

1. sample a grid of source pixels, lift them to camera-frame rays by
   inverting the source model (the fixed-point iterative undistortion of
   ``ops/distortion.py``, fisheye-aware), keeping only rays the source
   model faithfully round-trips (corner pixels of a strong model can sit
   outside the invertible region);
2. fit the target family's packed intrinsic vector so projecting those
   rays lands back on the original pixels — a device Levenberg-Marquardt
   (optim/lm.py) on the pixel residuals, jacfwd Jacobian.

The returned report carries the conversion rms/max in px: families are
not nested, so the residual IS the honest answer to "can model B express
lens A" (a wide fisheye refuses to become Brown — the same measurement
that backs ``camera_model="auto"``'s model-selection findings in
docs/performance.md).
"""
from __future__ import annotations

import logging

import numpy as np

logger = logging.getLogger(__name__)

_WIDTHS = {"standard": 9, "rational": 12, "thin_prism": 16, "tilted": 18,
           "fisheye": 8}


def _model_of_cam(cam) -> str:
    n = int(np.reshape(np.asarray(cam.distortion_coefs), -1).size)
    if n == 4:
        return "fisheye"
    return {5: "standard", 8: "rational", 12: "thin_prism",
            14: "tilted"}.get(n, "standard")


def convert_camera_model(cam, to: str = "standard", grid: int = 40,
                         margin: float = 0.02, max_nfev: int = 200,
                         lift_tol_px: float = 0.05):
    """Refit ``cam``'s projection with the ``to`` distortion family.

    :param cam: source Camera (any supported model).
    :param to: target family — "standard" | "rational" | "thin_prism" |
        "tilted" | "fisheye".
    :param grid: sample grid resolution per image axis.
    :param margin: border fraction excluded from sampling (the extreme
        corners of strong models can be outside the invertible region).
    :param lift_tol_px: rays whose source-model round trip misses the
        original pixel by more than this are dropped from the fit.
    :return: (new Camera with the fitted model — same extrinsic, name and
        resolution; report dict with rms_px/max_px/n_points and the
        packed fitted intrinsics).
    """
    import jax
    import jax.numpy as jnp

    from pycamset_tpu.config import default_device_dtype
    from pycamset_tpu.models.camera import Camera
    from pycamset_tpu.ops.projection import intr9_from_k_dist, \
        project_cam_points
    from pycamset_tpu.optim.lm import lm_solve

    if to not in _WIDTHS:
        raise ValueError(f"unknown target model {to!r}; expected one of "
                         f"{sorted(_WIDTHS)}")
    dtype = default_device_dtype()
    res = np.asarray(cam.res, dtype=float)

    # -- 1. sample source pixels, lift to rays through the source model
    mx, my = margin * res[0], margin * res[1]
    u = np.linspace(mx, res[0] - mx, grid)
    v = np.linspace(my, res[1] - my, grid)
    uv = np.stack(np.meshgrid(u, v), axis=-1).reshape(-1, 2)
    ideal = cam.undistort_points(uv, iters=25)       # pinhole pixels
    kinv = np.linalg.inv(np.asarray(cam.intrinsic, dtype=float))
    rays = np.concatenate([ideal, np.ones((len(ideal), 1))], axis=1) \
        @ kinv.T                                     # z = 1 camera frame

    src_dist = np.reshape(np.asarray(cam.distortion_coefs, float), -1)
    src_intr = np.asarray(intr9_from_k_dist(
        cam.intrinsic, src_dist, n_dist=max(4, src_dist.size)))
    back = np.asarray(project_cam_points(jnp.asarray(src_intr),
                                         jnp.asarray(rays)))
    ok = np.linalg.norm(back - uv, axis=1) < lift_tol_px
    if ok.sum() < 16:
        raise ValueError(
            f"only {int(ok.sum())} of {len(uv)} sampled pixels lift "
            "through the source model — increase margin or grid")
    rays_h = rays[ok].astype(dtype)
    uv_h = uv[ok].astype(dtype)

    # -- 2. fit the target family's packed intrinsics on the device
    k = np.asarray(cam.intrinsic, dtype=float)
    x0 = np.zeros(_WIDTHS[to], dtype=dtype)
    x0[:4] = [k[0, 0], k[0, 2], k[1, 1], k[1, 2]]

    def residuals(intr_t, rays_a, uv_a):
        return project_cam_points(intr_t, rays_a) - uv_a

    def neq(intr_t, rays_a, uv_a):
        r = residuals(intr_t, rays_a, uv_a)
        j = jax.jacfwd(residuals)(intr_t, rays_a, uv_a)
        jtj = jnp.einsum("nti,ntj->ij", j, j)
        grad = jnp.einsum("nti,nt->i", j, r)
        return jtj, grad, jnp.sum(r * r)

    def solve(x0_a, rays_a, uv_a):
        out = lm_solve(lambda p: neq(p, rays_a, uv_a), x0_a,
                       max_nfev=max_nfev)
        return jnp.concatenate([
            out.x, out.cost[None], out.nit.astype(out.x.dtype)[None],
            out.status.astype(out.x.dtype)[None]])

    packed = np.asarray(jax.device_get(jax.jit(solve)(
        jnp.asarray(x0), jnp.asarray(rays_h), jnp.asarray(uv_h))))
    fit = packed[:_WIDTHS[to]].astype(float)
    err = np.asarray(residuals(jnp.asarray(fit.astype(dtype)),
                               jnp.asarray(rays_h), jnp.asarray(uv_h)))
    eucl = np.linalg.norm(err, axis=1)

    k_new = np.array([[fit[0], 0.0, fit[1]],
                      [0.0, fit[2], fit[3]],
                      [0.0, 0.0, 1.0]])
    new_cam = Camera(extrinsic=np.asarray(cam.extrinsic).copy(),
                     intrinsic=k_new, res=np.asarray(cam.res).copy(),
                     distortion_coefs=fit[4:], name=cam.name)
    report = {
        "from": _model_of_cam(cam), "to": to,
        "rms_px": float(np.sqrt(np.mean(eucl ** 2))),
        "max_px": float(eucl.max()),
        "n_points": int(ok.sum()), "n_dropped": int((~ok).sum()),
        "intr": fit, "nit": int(packed[-2]), "status": int(packed[-1]),
    }
    if report["rms_px"] > 0.5:
        logger.warning(
            "model conversion %s -> %s leaves %.2f px rms (max %.2f): the "
            "target family cannot fully express this lens",
            report["from"], to, report["rms_px"], report["max_px"])
    return new_cam, report


def convert_camera_set(cams, to: str = "standard", **kwargs):
    """Convert every camera of a rig (extrinsics/names/order preserved).

    :return: (new CameraSet, {camera name: conversion report}).
    """
    from pycamset_tpu.models.camera_set import CameraSet

    new = {}
    reports = {}
    for name in cams.get_names():
        new[name], reports[name] = convert_camera_model(cams[name], to=to,
                                                        **kwargs)
    out = CameraSet(camera_dict=new)
    return out, reports
