"""Multi-view depth-map fusion: geometric-consistency filtering in JAX.

Beyond-reference capability: the reference STOPS at exporting MVSNet/ACMMP
inputs for an external fusion stage (``pyCamSet/reconstruction/
acmmp_utils.py:24-83`` — pair selection + pair.txt). This module closes
the loop in-framework: per-view plane-sweep depth maps fuse on-device
into one consistent world-frame point cloud, COLMAP/Gipuma-style —
forward-project each reference pixel into every source view, demand its
depth agrees both in reprojection (px) and relative depth, average the
mutually consistent 3D estimates, and consume source pixels so each
surface patch is emitted exactly once.

TPU-first notes: one jitted program handles every reference view (the
(S, H, W) source stack has a fixed shape, so the loop over reference
views reuses a single compile); samples are nearest-neighbour gathers
(bilinear would smear NaN invalids across edges); the per-view
consumption mask is the only host-side state (a boolean scatter between
dispatches — inherently sequential, a few KB per view).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from pycamset_tpu.models.camera import Camera


def _pinhole_stack(cams: list[Camera]):
    """(N,3,4) projections, (N,3,3) inverse intrinsics, (N,4,4) cam->world.

    Pinhole-only (undistorted pixel domain) — matches the plane-sweep
    contract that images/depths live in the undistorted camera.
    """
    proj = np.stack([c.intrinsic @ c.extrinsic[:3, :4] for c in cams])
    kinv = np.stack([np.linalg.inv(c.intrinsic) for c in cams])
    c2w = np.stack([c.cam_to_world for c in cams])
    return proj, kinv, c2w


@functools.partial(jax.jit, static_argnames=())
def _fuse_one(d_ref, kinv_ref, c2w_ref, proj_ref, d_srcs, kinv_srcs,
              c2w_srcs, proj_srcs, used_srcs, max_px, max_rel):
    """Consistency test of one reference depth map against S source maps.

    :return: (fused (H,W,3) world points averaged over consistent views,
        count (H,W) of consistent sources, ok (S,H,W) per-source
        consistency, src_v/src_u (S,H,W) sampled source pixel indices).
    """
    h, w = d_ref.shape
    u, v = jnp.meshgrid(jnp.arange(w, dtype=d_ref.dtype),
                        jnp.arange(h, dtype=d_ref.dtype))
    valid_ref = jnp.isfinite(d_ref)
    d0 = jnp.where(valid_ref, d_ref, 1.0)       # NaN-safe placeholder

    # reference pixel -> world point
    ray = jnp.einsum("ab,bhw->ahw", kinv_ref,
                     jnp.stack([u, v, jnp.ones_like(u)]))
    xw = (jnp.einsum("ab,bhw->ahw", c2w_ref[:3, :3], ray * d0)
          + c2w_ref[:3, 3][:, None, None])      # (3, H, W)

    def one_source(d_s, kinv_s, c2w_s, proj_s, used_s):
        # project the ref point into the source view
        x = (jnp.einsum("ab,bhw->ahw", proj_s[:, :3], xw)
             + proj_s[:, 3][:, None, None])
        z_est = x[2]
        safe_z = jnp.where(jnp.abs(z_est) < 1e-12, 1e-12, z_est)
        us = x[0] / safe_z
        vs = x[1] / safe_z
        ui = jnp.round(us).astype(jnp.int32)
        vi = jnp.round(vs).astype(jnp.int32)
        inb = (ui >= 0) & (ui < w) & (vi >= 0) & (vi < h) & (z_est > 0)
        uic = jnp.clip(ui, 0, w - 1)
        vic = jnp.clip(vi, 0, h - 1)
        ds = d_s[vic, uic]
        fresh = ~used_s[vic, uic]

        # back-project the SOURCE pixel at its own depth and reproject
        # into the reference: a mutual (two-sided) agreement test
        ray_s = kinv_s @ jnp.stack([uic.astype(d_ref.dtype),
                                    vic.astype(d_ref.dtype),
                                    jnp.ones_like(us)]).reshape(3, -1)
        ds_flat = jnp.where(jnp.isfinite(ds), ds, 1.0).reshape(-1)
        xw_s = (c2w_s[:3, :3] @ (ray_s * ds_flat[None, :])
                + c2w_s[:3, 3][:, None])        # (3, H*W)
        xr = proj_ref[:, :3] @ xw_s + proj_ref[:, 3][:, None]
        zr = jnp.where(jnp.abs(xr[2]) < 1e-12, 1e-12, xr[2])
        ur = (xr[0] / zr).reshape(h, w)
        vr = (xr[1] / zr).reshape(h, w)
        err_px = jnp.hypot(ur - u, vr - v)

        ok = (valid_ref & inb & jnp.isfinite(ds) & fresh
              & (err_px <= max_px)
              & (jnp.abs(z_est - ds) <= max_rel * jnp.maximum(ds, 1e-12)))
        xw_s = xw_s.reshape(3, h, w)
        return ok, jnp.where(ok[None], xw_s, 0.0), vic, uic

    ok, xw_src, src_v, src_u = jax.vmap(one_source)(
        d_srcs, kinv_srcs, c2w_srcs, proj_srcs, used_srcs)
    count = jnp.sum(ok, axis=0)
    fused = ((xw + jnp.sum(xw_src, axis=0))
             / jnp.maximum(count + 1, 1)).transpose(1, 2, 0)
    return fused, count, ok, src_v, src_u


def fuse_depth_maps(cams: list[Camera], depths, min_consistent: int = 2,
                    max_px: float = 1.0, max_rel: float = 0.01,
                    colors=None):
    """Fuse per-view depth maps into one consistent world point cloud.

    :param cams: one Camera per depth map (undistorted pinhole domain).
    :param depths: list/stack of (H, W) float depth maps, NaN = invalid
        (e.g. from ``plane_sweep_depth`` with each camera as reference).
    :param min_consistent: sources that must agree for a point to
        survive (the reference view itself is not counted).
    :param max_px: mutual reprojection tolerance in source->ref pixels.
    :param max_rel: relative depth agreement tolerance.
    :param colors: optional per-view (H, W) or (H, W, C) arrays sampled
        at each emitted pixel.
    :return: dict with ``points`` (M, 3), ``n_consistent`` (M,),
        ``view`` (M,) emitting camera index, and ``colors`` (M, ...)
        when colors were given.

    Each surface patch is emitted once: pixels of later views that
    corroborated an earlier view's point are consumed and cannot
    re-emit. Views are processed in the given order.
    """
    # keep the caller's float width (f32 feeds the TPU natively; the CPU
    # tier passes f64), promoting any integer input
    depths = [np.asarray(d) for d in depths]
    depths = [d.astype(np.float64) if d.dtype.kind != "f" else d
              for d in depths]
    if len(depths) != len(cams):
        raise ValueError("need exactly one depth map per camera")
    if len(cams) < 2:
        raise ValueError("fusion needs at least two views")
    shape = depths[0].shape
    if any(d.shape != shape for d in depths):
        raise ValueError("all depth maps must share one resolution")
    if colors is not None and len(colors) != len(cams):
        raise ValueError("need one colors array per camera")

    proj, kinv, c2w = _pinhole_stack(cams)
    n = len(cams)
    dt = np.result_type(*[d.dtype for d in depths])
    used = np.zeros((n,) + shape, dtype=bool)
    pts, counts, views, cols = [], [], [], []
    for i in range(n):
        others = [j for j in range(n) if j != i]
        d_ref = np.where(used[i], np.nan, depths[i])
        fused, count, ok, src_v, src_u = jax.device_get(_fuse_one(
            jnp.asarray(d_ref, dt), jnp.asarray(kinv[i], dt),
            jnp.asarray(c2w[i], dt), jnp.asarray(proj[i], dt),
            jnp.asarray(np.stack([depths[j] for j in others]), dt),
            jnp.asarray(kinv[others], dt), jnp.asarray(c2w[others], dt),
            jnp.asarray(proj[others], dt),
            jnp.asarray(used[others]), dt.type(max_px), dt.type(max_rel)))
        accept = count >= min_consistent
        pts.append(fused[accept])
        counts.append(count[accept])
        views.append(np.full(int(accept.sum()), i))
        if colors is not None:
            cols.append(np.asarray(colors[i])[accept])
        # consume the corroborating source pixels (and our own)
        used[i] |= accept
        for s, j in enumerate(others):
            hit = ok[s] & accept
            used[j][src_v[s][hit], src_u[s][hit]] = True

    out = {"points": np.concatenate(pts, axis=0),
           "n_consistent": np.concatenate(counts, axis=0),
           "view": np.concatenate(views, axis=0)}
    if colors is not None:
        out["colors"] = np.concatenate(cols, axis=0)
    return out


def _select_sources(cams: list[Camera], min_angle: float, max_angle: float,
                    max_sources: int) -> list[list[int]]:
    """Per-view source selection by inter-view angle with a baseline
    tiebreak.

    Mirrors the ACMMP pair policy (``acmmp_utils.calc_pairs``) but keeps
    parallel-gaze rigs usable: the angle window is INCLUSIVE at
    ``min_angle`` (a translation-only stereo array subtends 0 deg
    everywhere — ``calc_pairs``'s strict ``> minangle`` would reject the
    entire rig), and equal-angle candidates order by camera-centre
    distance (nearest first, the least-occluded neighbours).
    """
    gaze = np.stack([c.extrinsic[:3, 2] for c in cams])
    gaze = gaze / np.linalg.norm(gaze, axis=1, keepdims=True)
    sep = np.degrees(np.arccos(np.clip(gaze @ gaze.T, -1, 1)))
    centres = np.stack([c.cam_to_world[:3, 3] for c in cams])
    base = np.linalg.norm(centres[:, None] - centres[None], axis=-1)
    np.fill_diagonal(sep, np.inf)
    out = []
    for i in range(len(cams)):
        cand = np.flatnonzero((sep[i] >= min_angle) & (sep[i] <= max_angle))
        order = np.lexsort((base[i, cand], sep[i, cand]))
        out.append([int(j) for j in cand[order][:max_sources]])
    return out


def dense_reconstruct(cams: list[Camera], images, near: float, far: float,
                      n_planes: int = 64, window: int = 7,
                      min_angle: float = 0.0, max_angle: float = 60.0,
                      max_sources: int = 4, min_consistent: int = 2,
                      max_px: float = 1.0, max_rel: float = 0.01,
                      top_k: int | None = None, regularize: bool = False,
                      verbose: bool = False):
    """Full in-framework MVS: plane-sweep every view, fuse the depths.

    :param cams: the rig (Camera objects; undistort images beforehand —
        ``Camera.undistort`` — as for ``plane_sweep_depth``).
    :param images: one single-channel undistorted image per camera.
    :param near/far: sweep range shared by all views (ref-frame z).
    :param min_angle/max_angle/max_sources: source-view selection per
        reference by inter-view angle (see ``_select_sources`` — the
        ACMMP pair policy made parallel-rig-safe); cameras with no
        source in range are skipped with a warning.
    :return: ``fuse_depth_maps`` dict + ``"depths"`` (list of per-view
        (H, W) maps, None for skipped views).
    """
    import logging

    from pycamset_tpu.reconstruction.plane_sweep import plane_sweep_depth

    if len(images) != len(cams):
        raise ValueError("need exactly one image per camera")
    pairs = _select_sources(cams, min_angle, max_angle, max_sources)

    depths = []
    kept = []
    for i, cam in enumerate(cams):
        srcs = pairs[i]
        if not srcs:
            logging.getLogger(__name__).warning(
                "dense_reconstruct: no source view within "
                f"[{min_angle}, {max_angle}] deg of camera {i}; skipped")
            depths.append(None)
            continue
        depth, _ = plane_sweep_depth(
            cam, [cams[j] for j in srcs], images[i],
            [images[j] for j in srcs], near=near, far=far,
            n_planes=n_planes, window=window, top_k=top_k,
            regularize=regularize)
        depths.append(depth.astype(np.float64))
        kept.append(i)
        if verbose:
            print(f"view {i}: sweep vs {srcs} -> "
                  f"{int(np.isfinite(depth).sum())} px valid")
    if len(kept) < 2:
        raise ValueError("fewer than two views produced a depth map")

    out = fuse_depth_maps(
        [cams[i] for i in kept], [depths[i] for i in kept],
        min_consistent=min_consistent, max_px=max_px, max_rel=max_rel,
        colors=[np.asarray(images[i], dtype=float) for i in kept])
    out["view"] = np.asarray([kept[v] for v in out["view"]])
    out["depths"] = depths
    return out
