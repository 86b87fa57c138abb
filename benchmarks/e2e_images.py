#!/usr/bin/env python
"""End-to-end pipeline benchmark from RENDERED IMAGES at rig scale.

Renders a ChArUco board seen by a 16-camera ring through 100 poses
(ray-traced through the true camera models, including distortion), then
times the full `calibrate_cameras` pipeline — detection, validation,
intrinsic seeding, PnP pose seeding, device bundle adjustment — exactly as
a user would run it. Stage timings land in docs/performance.md.

Run: python benchmarks/e2e_images.py [--cams 16] [--poses 100] [--out DIR]
(CPU-heavy: rendering + OpenCV detection dominate; the device solve is
milliseconds.)
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

import cv2
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

RES = (800, 600)


def make_ring_cameras(n_cams: int):
    import jax
    jax.config.update("jax_platforms", "cpu")
    from pycamset_tpu.models.camera import Camera
    from pycamset_tpu.models.camera_set import CameraSet
    from pycamset_tpu.utils.synthetic import look_at_extrinsic

    rng = np.random.default_rng(0)
    cams = {}
    for i in range(n_cams):
        ang = 2 * np.pi * i / n_cams
        # negative z: the ray-traced texture reads non-mirrored from this
        # side (matches tests/test_synthetic_image_e2e.py's geometry)
        pos = np.array([0.22 * np.sin(ang), 0.14 * np.cos(ang),
                        -(0.52 + 0.05 * np.sin(2 * ang))])
        k = np.array([[900.0 + 10 * (i % 5), 0, RES[0] / 2 + rng.normal() * 2],
                      [0, 898.0 + 10 * (i % 5), RES[1] / 2 + rng.normal() * 2],
                      [0, 0, 1.0]])
        dist = np.array([-0.12 + 0.02 * (i % 3), 0.02, 4e-4, -4e-4, 0.0])
        ext = look_at_extrinsic(pos, np.array([0.0, 0.0, 0.0]))
        cams[f"cam{i:02d}"] = Camera(extrinsic=ext, intrinsic=k,
                                     res=list(RES), distortion_coefs=dist,
                                     name=f"cam{i:02d}")
    return CameraSet(camera_dict=cams)


def render_views(target, cams, poses, out_dir: Path):
    """Ray-trace the board plane through every true camera (see
    tests/test_synthetic_image_e2e.py for the validated pattern)."""
    import jax.numpy as jnp
    from pycamset_tpu.ops.distortion import undistort_pixels
    from pycamset_tpu.utils.general_utils import make_4x4h_tform

    square_px = 40
    n_sq = target.board.getChessboardSize()[0]
    board_px = n_sq * square_px
    board_im = target.board.generateImage((board_px, board_px))
    sq_m = target.square_size / 1000
    px_per_m = board_px / (n_sq * sq_m)

    w, h = RES
    uu, vv = np.meshgrid(np.arange(w, dtype=float), np.arange(h, dtype=float))
    pix = np.stack([uu.ravel(), vv.ravel()], axis=1)

    for name in cams.get_names():
        cam = cams[name]
        cdir = out_dir / name
        cdir.mkdir(parents=True, exist_ok=True)
        ideal = np.array(undistort_pixels(
            jnp.asarray(pix), jnp.asarray(cam.intrinsic),
            jnp.asarray(cam.distortion_coefs), iters=25))
        rays_cam = np.concatenate(
            [(ideal - [cam.intrinsic[0, 2], cam.intrinsic[1, 2]])
             / [cam.intrinsic[0, 0], cam.intrinsic[1, 1]],
             np.ones((ideal.shape[0], 1))], axis=1)
        for i, pose6 in enumerate(poses):
            t_pose = make_4x4h_tform(pose6[:3], pose6[3:])
            cam_to_target = np.linalg.inv(t_pose) @ cam.cam_to_world
            origin = cam_to_target[:3, 3]
            dirs = rays_cam @ cam_to_target[:3, :3].T
            tt = -origin[2] / dirs[:, 2]
            plane = origin[None, :2] + tt[:, None] * dirs[:, :2]
            map_x = (plane[:, 0] * px_per_m).reshape(h, w).astype(np.float32)
            map_y = (plane[:, 1] * px_per_m).reshape(h, w).astype(np.float32)
            im = cv2.remap(board_im, map_x, map_y, cv2.INTER_LINEAR,
                           borderMode=cv2.BORDER_CONSTANT, borderValue=128)
            cv2.imwrite(str(cdir / f"im{i:03d}.png"), im)


def main():
    import argparse

    import jax
    jax.config.update("jax_platforms", "cpu")
    from pycamset_tpu import calibrate_cameras
    from pycamset_tpu.models.charuco import ChArUco

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--cams", type=int, default=16)
    ap.add_argument("--poses", type=int, default=100)
    ap.add_argument("--out", type=Path, default=Path("/tmp/e2e_images"))
    cli = ap.parse_args()
    n_cams, n_poses, out = cli.cams, cli.poses, cli.out

    target = ChArUco(14, 14, 25)  # 0.35 m board
    cams = make_ring_cameras(n_cams)
    rng = np.random.default_rng(4)
    poses = []
    for _ in range(n_poses):
        rvec = rng.normal(size=3) * 0.3
        tvec = (np.array([-0.175, -0.175, 0.0])
                + rng.normal(size=3) * [0.05, 0.05, 0.06])
        poses.append(np.concatenate([rvec, tvec]))

    t0 = time.time()
    render_views(target, cams, poses, out)
    t_render = time.time() - t0
    print(f"render {n_cams}x{n_poses}: {t_render:.1f}s", flush=True)

    t0 = time.time()
    final = calibrate_cameras(
        f_loc=out, calibration_target=ChArUco(14, 14, 25), save=False,
        problem_options={"outliers": "n"})
    t_e2e = time.time() - t0
    err = np.mean(np.linalg.norm(
        final.calibration_result.reshape(-1, 2), axis=1))
    n_det = final.calibration_result.reshape(-1, 2).shape[0]
    print(f"E2E images->calibrated ({n_cams} cams x {n_poses} poses, "
          f"{n_det} detections): {t_e2e:.1f}s, mean reproj {err:.3f} px",
          flush=True)


if __name__ == "__main__":
    main()
