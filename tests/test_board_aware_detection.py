"""Board-aware detection: find_in_image uses the camera model when given.

The reference accepts `camera` in every find_in_image but never uses it
(target_charuco.py:54, target_Ccube.py:189). Here the high-distortion
second pass gets real teeth: detection runs on the undistorted view (marker
squares stay square under heavy distortion) and the corners are analytically
mapped back to the original image frame.
"""
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

RES = (800, 600)


def _render_distorted_view(target, cam, pose6):
    """One view of the board through a (heavily distorting) camera —
    inverse-map remap sampling, same construction as the E2E render."""
    import jax.numpy as jnp
    from pycamset_tpu.ops.distortion import undistort_pixels
    from pycamset_tpu.utils.general_utils import make_4x4h_tform

    square_px = 60
    n_sq = target.board.getChessboardSize()[0]
    board_im = target.board.generateImage((n_sq * square_px, n_sq * square_px))
    px_per_m = (n_sq * square_px) / (n_sq * target.square_size / 1000)

    w, h = RES
    uu, vv = np.meshgrid(np.arange(w, dtype=float), np.arange(h, dtype=float))
    pix = np.stack([uu.ravel(), vv.ravel()], axis=1)
    ideal = np.array(undistort_pixels(
        jnp.asarray(pix), jnp.asarray(cam.intrinsic),
        jnp.asarray(cam.distortion_coefs), iters=25))
    rays = np.concatenate(
        [(ideal - [cam.intrinsic[0, 2], cam.intrinsic[1, 2]])
         / [cam.intrinsic[0, 0], cam.intrinsic[1, 1]],
         np.ones((ideal.shape[0], 1))], axis=1)
    t_pose = make_4x4h_tform(pose6[:3], pose6[3:])
    cam_to_target = np.linalg.inv(t_pose) @ cam.cam_to_world
    origin = cam_to_target[:3, 3]
    dirs = rays @ cam_to_target[:3, :3].T
    tt = -origin[2] / dirs[:, 2]
    plane = origin[None, :2] + tt[:, None] * dirs[:, :2]
    # -0.5: cv2.remap samples at pixel CENTERS; a physical point p metres in
    # lands at texel p*px_per_m whose center is at p*px_per_m - 0.5
    map_x = (plane[:, 0] * px_per_m - 0.5).reshape(h, w).astype(np.float32)
    map_y = (plane[:, 1] * px_per_m - 0.5).reshape(h, w).astype(np.float32)
    return cv2.remap(board_im, map_x, map_y, cv2.INTER_LINEAR,
                     borderMode=cv2.BORDER_CONSTANT, borderValue=128)


@pytest.fixture(scope="module")
def heavy_setup():
    from pycamset_tpu.models.camera import Camera
    from pycamset_tpu.models.charuco import ChArUco
    from pycamset_tpu.utils.general_utils import make_4x4h_tform

    target = ChArUco(10, 10, 25)
    k = np.array([[820.0, 0, RES[0] / 2], [0, 815.0, RES[1] / 2], [0, 0, 1]])
    dist = np.array([-0.42, 0.18, 1e-3, -1e-3, -0.03])  # heavy barrel
    ext = make_4x4h_tform(np.zeros(3), np.array([0.0, 0.0, 0.42]))
    cam = Camera(extrinsic=ext, intrinsic=k, res=list(RES),
                 distortion_coefs=dist, name="c0")
    pose6 = np.array([0.05, -0.08, 0.03, -0.125, -0.11, 0.0])
    image = _render_distorted_view(target, cam, pose6)
    return target, cam, pose6, image


def _gt_pixels(target, cam, pose6, keys):
    """Ground-truth pixel positions of the detected corner ids."""
    import jax.numpy as jnp
    from pycamset_tpu.ops.projection import (
        intr9_from_k_dist, project_cam_points)
    from pycamset_tpu.ops.transforms import pose_apply
    from pycamset_tpu.utils.general_utils import make_4x4h_tform

    pts_t = target.point_data.reshape(-1, 3)[keys]
    t_pose = make_4x4h_tform(pose6[:3], pose6[3:])
    world = pts_t @ t_pose[:3, :3].T + t_pose[:3, 3]
    xc = world @ cam.extrinsic[:3, :3].T + cam.extrinsic[:3, 3]
    intr9 = intr9_from_k_dist(cam.intrinsic, cam.distortion_coefs)
    del pose_apply
    return np.array(project_cam_points(jnp.asarray(intr9), jnp.asarray(xc)))


def test_camera_aware_detection_beats_blind(heavy_setup):
    target, cam, pose6, image = heavy_setup

    blind = target.find_in_image(image)
    aware = target.find_in_image(image, camera=cam)
    n_blind = blind.data_len if blind.has_data else 0
    n_aware = aware.data_len if aware.has_data else 0

    # the undistorted view must not LOSE corners under heavy distortion
    assert n_aware >= max(n_blind, 30), (n_blind, n_aware)

    # returned coordinates are in the ORIGINAL (distorted) image frame:
    # they must match the ground-truth projection through the full model
    keys = np.asarray(aware.keys).reshape(-1).astype(int)
    uv = np.asarray(aware.image_points)
    gt = _gt_pixels(target, cam, pose6, keys)
    err = np.linalg.norm(uv - gt, axis=1)
    assert np.median(err) < 0.5, np.median(err)
    assert np.max(err) < 2.0, np.max(err)


def test_zero_distortion_camera_is_noop(heavy_setup):
    from pycamset_tpu.models.abstract_target import undistort_for_detection
    from pycamset_tpu.models.camera import Camera
    target, cam, pose6, image = heavy_setup
    flat = Camera(intrinsic=cam.intrinsic, res=list(RES), name="flat")
    out, redistort = undistort_for_detection(image, flat)
    assert redistort is None and out is image
    out, redistort = undistort_for_detection(image, None)
    assert redistort is None and out is image


if __name__ == "__main__":
    pytest.main([__file__, "-v"])


def test_decimated_fast_path_matches_full_res_on_large_image():
    """Images over FAST_DETECTION_EDGE_PX detect on a decimated view with
    full-res cornerSubPix re-localisation; corners must agree with the
    non-fast detector to subpixel level."""
    import cv2
    import numpy as np

    from pycamset_tpu.models.abstract_target import detection_scale
    from pycamset_tpu.models.charuco import ChArUco

    target = ChArUco(8, 8, 40)
    board_px = 2800
    canvas = np.full((3000, 3200), 255, np.uint8)
    art = target.board.generateImage((board_px, board_px))
    canvas[100:100 + board_px, 200:200 + board_px] = art
    assert detection_scale(canvas.shape) > 1  # the decimated path engages

    det_fast = target.find_in_image(canvas)
    target.fast_detection = False
    det_full = target.find_in_image(canvas)
    assert det_fast.has_data and det_full.has_data

    kf = np.asarray(det_fast.keys)
    kl = np.asarray(det_full.keys)
    shared, fi, li = np.intersect1d(kf, kl, return_indices=True)
    assert len(shared) >= 0.99 * len(kl)  # count parity
    dist = np.linalg.norm(np.asarray(det_fast.image_points)[fi]
                          - np.asarray(det_full.image_points)[li], axis=1)
    assert np.median(dist) < 0.1, np.median(dist)
    assert dist.max() < 1.0, dist.max()


def test_ccube_roi_pass_matches_full_frame():
    """The ROI fast pass (union-dict marker sweep -> per-face windows) must
    find the same corners as the full-frame loop on real cube images, skip
    invisible faces, and survive a frame with no markers at all."""
    import glob

    import cv2
    import numpy as np
    from cv2 import aruco

    from pycamset_tpu.models.ccube import Ccube

    paths = sorted(glob.glob(
        "/root/reference/tests/test_data/calibration_ccube/*/*"))[:6]
    if not paths:
        import pytest
        pytest.skip("reference ccube dataset not mounted")
    images = [cv2.imread(p, cv2.IMREAD_GRAYSCALE) for p in paths]

    cube = Ccube(n_points=10, length=40, aruco_dict=aruco.DICT_6X6_1000,
                 border_fraction=0.2)
    cube.find_in_image(images[0])  # build detectors

    total_full = total_roi = 0
    for im in images:
        cube.roi_detection = False
        det_full = cube.find_in_image(im)
        cube.roi_detection = True
        det_roi = cube.find_in_image(im)
        total_full += len(det_full.keys)
        total_roi += len(det_roi.keys)
        # the sweep localises a cube: at most 3 faces visible
        rois = cube._locate_face_rois(im)
        assert rois is not None and 1 <= len(rois) <= 4, rois
    assert total_roi >= 0.97 * total_full, (total_roi, total_full)

    # a markerless frame: sweep returns None and detection degrades
    # gracefully to the (empty) full-frame result
    blank = np.full_like(images[0], 255)
    assert cube._locate_face_rois(blank) is None
    det = cube.find_in_image(blank)
    assert not det.has_data
