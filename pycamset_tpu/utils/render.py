"""Synthetic image rendering of calibration captures.

Renders a calibration target as seen by a `CameraSet` through its FULL
camera models (any distortion family, including fisheye): for every output
pixel the lens model is inverted on device (`ops/distortion.py::
undistort_pixels`, one batched dispatch per camera over the whole pixel
grid), the ideal ray is intersected with the target plane and the board
texture is sampled with `cv2.remap`. The per-camera ray field is computed
once and shared by every pose.

This is the "inverse" of the calibration pipeline and the gold-standard
validation harness for it: because the generating cameras are known
exactly, every detected corner can be compared against its analytic
ground-truth pixel position (`ground_truth_detections`), and a full
pipeline run can be scored against the true intrinsics/extrinsics (see
tests/test_synthetic_image_e2e.py). The reference ships no renderer; it
validates against real datasets with px thresholds only
(/root/reference/tests/test_full_calibrations.py).
"""
from __future__ import annotations

from pathlib import Path

import cv2
import numpy as np

from pycamset_tpu.models.detections import ImageDetection, TargetDetection

__all__ = ["target_texture", "render_target_views",
           "ground_truth_detections"]


def target_texture(target, square_px: int = 60):
    """Rasterise a planar target at a known physical scale.

    :return: (image, px_per_m): board texture whose pixel (0, 0) is the
        target-frame origin, and the metres-to-pixels scale.
    """
    board = getattr(target, "board", None)
    if board is None or not hasattr(board, "generateImage"):
        raise NotImplementedError(
            f"target {type(target).__name__} has no rasterisable board; "
            "rendering supports planar ChArUco targets")
    try:
        nx, ny = board.getChessboardSize()
    except AttributeError as err:
        raise NotImplementedError(
            "rendering supports planar ChArUco targets (ArucoGrid boards "
            "need a detection margin that would shift the target origin)"
        ) from err
    # request the board's own aspect ratio: generateImage letterboxes a
    # mismatched canvas, which would silently break the px/m scale
    image = board.generateImage((nx * square_px, ny * square_px))
    sq_m = target.square_size / 1000.0
    px_per_m = square_px / sq_m
    return image, px_per_m


def _camera_plane_rays(cam):
    """Ideal (undistorted) unit-depth rays for every pixel, camera frame."""
    import jax.numpy as jnp

    from pycamset_tpu.ops.distortion import undistort_pixels

    w, h = cam.res
    uu, vv = np.meshgrid(np.arange(w, dtype=float),
                         np.arange(h, dtype=float))
    pix = np.stack([uu.ravel(), vv.ravel()], axis=1)
    ideal = np.array(undistort_pixels(
        jnp.asarray(pix), jnp.asarray(cam.intrinsic),
        jnp.asarray(np.ravel(cam.distortion_coefs)), iters=25))
    fx, fy = cam.intrinsic[0, 0], cam.intrinsic[1, 1]
    cx, cy = cam.intrinsic[0, 2], cam.intrinsic[1, 2]
    return np.concatenate(
        [(ideal - [cx, cy]) / [fx, fy], np.ones((ideal.shape[0], 1))],
        axis=1)


def _planar_maps(origin, dirs, px_per_m):
    """Texture sample coordinates for a one-sided board in the z=0 plane."""
    # rays parallel to or leaving the plane sample out of the texture
    dz = np.where(np.abs(dirs[:, 2]) < 1e-12, 1e-12, dirs[:, 2])
    tt = -origin[2] / dz
    plane = origin[None, :2] + tt[:, None] * dirs[:, :2]
    plane[tt <= 0] = -1e6  # behind the camera: background
    if origin[2] > 0:
        # the camera is on the board's +z side: a one-sided print shows
        # only its blank back from there
        plane[:] = -1e6
    # physical 0 is the texture's pixel-grid EDGE; remap's pixel centres
    # sit at integers, hence the half-pixel shift
    return plane[:, 0] * px_per_m - 0.5, plane[:, 1] * px_per_m - 0.5


def _solid_geometry(target):
    """(R (F,3,3), t_m (F,3), edge_m) of a FaceToShape solid: face-local
    metres -> target frame is q = R p + t_m (the scale trick resolved)."""
    fd = target.faceData
    tf = np.asarray(fd.face_transforms, dtype=float).reshape(-1, 4, 4)
    return tf[:, :3, :3], tf[:, :3, 3] * float(fd.sf), float(fd.sf)


def _solid_maps(origin, dirs, rmats, t_m, edge, tex_h):
    """Atlas sample coordinates for a convex FaceToShape solid.

    Each face is a one-sided print on the z=0 plane of its local frame
    with the OUTWARD side at local -z (verified for the cube transforms:
    +z-local points into the solid for every face). The nearest
    printed-side in-bounds hit across faces wins; face f's texture
    occupies atlas rows [f*tex_h, (f+1)*tex_h).
    """
    n = len(dirs)
    px_per_m = tex_h / edge
    best_t = np.full(n, np.inf)
    best_x = np.full(n, -1e6, dtype=float)
    best_y = np.full(n, -1e6, dtype=float)
    for f, (rmat, tv) in enumerate(zip(rmats, t_m)):
        o_f = rmat.T @ (origin - tv)
        d_f = dirs @ rmat
        if o_f[2] >= 0:
            continue  # camera is behind this face's printed side
        dz = np.where(np.abs(d_f[:, 2]) < 1e-12, 1e-12, d_f[:, 2])
        tt = -o_f[2] / dz
        hx = o_f[0] + tt * d_f[:, 0]
        hy = o_f[1] + tt * d_f[:, 1]
        ok = (tt > 1e-12) & (tt < best_t) \
            & (hx >= 0) & (hx <= edge) & (hy >= 0) & (hy <= edge)
        best_t[ok] = tt[ok]
        # clamp half a pixel inside the face row band so INTER_LINEAR
        # never blends across the atlas seam between faces
        best_x[ok] = np.clip(hx[ok] * px_per_m - 0.5, 0.0, tex_h - 1.0)
        best_y[ok] = np.clip(hy[ok] * px_per_m - 0.5, 0.0,
                             tex_h - 1.0) + f * tex_h
    return best_x, best_y


def render_target_views(cams, target, poses, out_dir=None, *,
                        square_px: int = 60, background: float = 128.0,
                        blur_sigma: float = 0.0, noise: float = 0.0,
                        seed: int = 0):
    """Render the target through every camera for every pose.

    :param cams: a `CameraSet` (the generating ground truth).
    :param target: a planar target with a rasterisable board (ChArUco), or
        a textured `FaceToShape` solid (Ccube).
    :param poses: iterable of 6-vectors [rvec | tvec], the target-to-world
        transforms (same convention as the calibration's estimated poses).
    :param out_dir: when given, writes `<out_dir>/<cam>/im{i:03d}.png` in
        the folder layout `calibrate_cameras` consumes.
    :param blur_sigma: optional Gaussian defocus blur (px).
    :param noise: optional additive Gaussian sensor noise (grey levels).
    :return: {camera name: [image, ...]} of uint8 renders.
    """
    from pycamset_tpu.utils.general_utils import make_4x4h_tform

    solid = getattr(target, "faceData", None) is not None \
        and getattr(target, "textures", None) is not None
    if solid:
        rmats, t_m, edge = _solid_geometry(target)
        texture = np.concatenate(
            [np.asarray(t, dtype=np.uint8) for t in target.textures], axis=0)
        tex_h = texture.shape[0] // len(rmats)
    else:
        texture, px_per_m = target_texture(target, square_px)
    rng = np.random.default_rng(seed)
    poses = [np.asarray(p, dtype=float).ravel() for p in poses]
    t_poses = [make_4x4h_tform(p[:3], p[3:]) for p in poses]

    out = {}
    for name in cams.get_names():
        cam = cams[name]
        w, h = cam.res
        rays_cam = _camera_plane_rays(cam)
        cdir = None
        if out_dir is not None:
            cdir = Path(out_dir) / name
            cdir.mkdir(parents=True, exist_ok=True)
        ims = []
        for i, t_pose in enumerate(t_poses):
            cam_to_target = np.linalg.inv(t_pose) @ cam.cam_to_world
            origin = cam_to_target[:3, 3]
            dirs = rays_cam @ cam_to_target[:3, :3].T
            if solid:
                mx, my = _solid_maps(origin, dirs, rmats, t_m, edge, tex_h)
            else:
                mx, my = _planar_maps(origin, dirs, px_per_m)
            map_x = mx.reshape(h, w).astype(np.float32)
            map_y = my.reshape(h, w).astype(np.float32)
            im = cv2.remap(texture, map_x, map_y, cv2.INTER_LINEAR,
                           borderMode=cv2.BORDER_CONSTANT,
                           borderValue=background)
            if blur_sigma > 0:
                im = cv2.GaussianBlur(im.astype(np.float32), (0, 0),
                                      blur_sigma)
            if noise > 0:
                im = im.astype(np.float32) + rng.normal(0, noise, im.shape)
            im = np.clip(im, 0, 255).astype(np.uint8)
            ims.append(im)
            if cdir is not None:
                cv2.imwrite(str(cdir / f"im{i:03d}.png"), im)
        out[name] = ims
    return out


def ground_truth_detections(cams, target, poses,
                            margin: float = 0.0) -> TargetDetection:
    """The analytically-exact detection table for a rendered capture.

    Projects every target feature through the generating cameras for every
    pose; features behind a camera or outside its image (by `margin` px)
    are dropped, exactly as a detector would miss them. The result is a
    `TargetDetection` keyed identically to the live detector's output, so
    detected corners can be scored against truth row-by-row.
    """
    from pycamset_tpu.utils.general_utils import h_tform, make_4x4h_tform

    pts = np.asarray(target.point_data, dtype=float)
    faces = pts.reshape(-1, pts.shape[-2], 3)
    n_faces, n_per = faces.shape[:2]
    flat = faces.reshape(-1, 3)
    # a single planar face is one-sided print: cameras on its +z side see
    # only the blank back (matching render_target_views)
    planar = n_faces == 1 and np.allclose(flat[:, 2], flat[0, 2])
    normals = None
    if n_faces > 1 and getattr(target, "faceData", None) is not None:
        # solid faces print outward (local -z): cull corners whose face
        # looks away from the camera (matching render_target_views)
        rmats, _, _ = _solid_geometry(target)
        normals = -rmats[:, :, 2]          # (F, 3), target frame
    if n_faces > 1:
        keys = np.stack(np.divmod(np.arange(n_faces * n_per), n_per), axis=1)
    else:
        keys = np.arange(n_per)[:, None]

    table = TargetDetection(cam_names=list(cams.get_names()))
    for p_idx, pose in enumerate(poses):
        pose = np.asarray(pose, dtype=float).ravel()
        t_pose = make_4x4h_tform(pose[:3], pose[3:])
        world = h_tform(flat, t_pose)
        for name in cams.get_names():
            cam = cams[name]
            if planar:
                cam_in_target = np.linalg.inv(t_pose) @ cam.cam_to_world
                if cam_in_target[2, 3] > flat[0, 2]:
                    continue
            facing = True
            if normals is not None:
                cam_pos_t = (np.linalg.inv(t_pose) @ cam.cam_to_world)[:3, 3]
                to_cam = cam_pos_t[None, :] - flat     # target frame
                facing = np.einsum(
                    "kd,kd->k", to_cam,
                    np.repeat(normals, n_per, axis=0)) > 1e-9
            in_front = h_tform(world, cam.extrinsic)[:, 2] > 0
            uv = cam.project_points(world)
            w, h = cam.res
            ok = (facing & in_front & np.isfinite(uv).all(axis=1)
                  & (uv[:, 0] >= margin) & (uv[:, 0] <= w - 1 - margin)
                  & (uv[:, 1] >= margin) & (uv[:, 1] <= h - 1 - margin))
            found = ImageDetection(keys[ok] if n_faces > 1
                                   else keys[ok, 0], uv[ok])
            table.add_detection(name, p_idx, found)
    return table
