"""ArucoGrid target: pure-marker planar boards through the full pipeline."""
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

RES = (800, 600)


def _target(nx=5, ny=4, marker=30.0, sep=6.0, first_id=0):
    from pycamset_tpu.models.grid import ArucoGrid
    return ArucoGrid(nx, ny, marker, sep, first_id=first_id)


def test_geometry_and_keys():
    t = _target()
    assert t.point_data.shape == (1, 5 * 4 * 4, 3)
    pts = t.point_data.reshape(-1, 4, 3)
    # marker side and grid pitch in metres
    assert np.linalg.norm(pts[0, 1] - pts[0, 0]) == pytest.approx(0.030)
    assert pts[1, 0, 0] - pts[0, 0, 0] == pytest.approx(0.036)
    assert np.all(pts[:, :, 2] == 0)


def test_detects_own_render_exactly():
    t = _target()
    ppm, margin = 3000.0, 24
    im = t.render(margin_px=margin, px_per_m=ppm)
    det = t.find_in_image(im)
    keys = det.keys
    assert len(keys) == 5 * 4 * 4            # every corner of every marker
    assert sorted(keys.tolist()) == list(range(80))
    # detected pixels sit on the documented object->pixel map to within
    # the rasterization convention: generateImage draws the marker edge
    # between pixels, so the subpixel refiner lands up to ~half a pixel
    # inside on far edges (a constant-scale effect the calibration
    # absorbs, not a localization error)
    obj = t.point_data.reshape(-1, 3)[keys.astype(int)]
    expected = obj[:, :2] * ppm + margin
    err = np.abs(det.image_points - expected)
    assert err.max() < 0.75
    assert np.median(err) < 0.5


def test_disjoint_id_ranges_coexist():
    a = _target(first_id=0)
    b = _target(first_id=100)
    im_b = b.render(px_per_m=3000.0)
    # a's detector must reject b's markers wholesale
    det = a.find_in_image(im_b)
    assert not det.has_data
    det_b = b.find_in_image(im_b)
    assert len(det_b.keys) == 80


def test_reflective_persistence_round_trip():
    t = _target(nx=3, ny=3, marker=20.0, sep=4.0, first_id=7)
    clone = type(t)(**t.input_args)
    assert np.allclose(clone.point_data, t.point_data)
    assert clone._id_to_index == t._id_to_index


def test_save_to_pdf(tmp_path):
    t = _target(nx=3, ny=2)
    out = t.save_to_pdf(tmp_path / "grid.pdf")
    assert (tmp_path / "grid.pdf").exists()
    assert (tmp_path / "grid.pdf").stat().st_size > 1000
    assert str(out).endswith("grid.pdf")


def _render_views(target, cams, poses, out_dir):
    """Plane-intersection rendering of the grid board (the gold-standard
    E2E pattern of test_synthetic_image_e2e.py)."""
    import jax.numpy as jnp

    from pycamset_tpu.ops.distortion import undistort_pixels
    from pycamset_tpu.utils.general_utils import make_4x4h_tform

    ppm, margin = 2000.0, 16
    board_im = target.render(margin_px=margin, px_per_m=ppm)
    w, h = RES
    uu, vv = np.meshgrid(np.arange(w, dtype=float),
                         np.arange(h, dtype=float))
    pix = np.stack([uu.ravel(), vv.ravel()], axis=1)

    for name in cams.get_names():
        cam = cams[name]
        cdir = out_dir / name
        cdir.mkdir(exist_ok=True)
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
            map_x = (plane[:, 0] * ppm + margin).reshape(h, w) \
                .astype(np.float32)
            map_y = (plane[:, 1] * ppm + margin).reshape(h, w) \
                .astype(np.float32)
            im = cv2.remap(board_im, map_x, map_y, cv2.INTER_LINEAR,
                           borderMode=cv2.BORDER_CONSTANT, borderValue=128)
            cv2.imwrite(str(cdir / f"im{i:03d}.png"), im)


def test_grid_pipeline_recovers_ground_truth(tmp_path):
    """Rendered grid-board images -> detection -> seeding -> device BA."""
    from pycamset_tpu import calibrate_cameras
    from pycamset_tpu.models.camera import Camera
    from pycamset_tpu.models.camera_set import CameraSet
    from pycamset_tpu.utils.general_utils import make_4x4h_tform

    rng = np.random.default_rng(2)
    cams = {}
    for i, ang in enumerate([-0.25, 0.0, 0.25]):
        k = np.array([[900.0 + 40 * i, 0, RES[0] / 2 + rng.normal() * 3],
                      [0, 895.0 + 40 * i, RES[1] / 2 + rng.normal() * 3],
                      [0, 0, 1.0]])
        dist = np.array([-0.15 + 0.03 * i, 0.03, 5e-4, -5e-4, 0.0])
        ext = make_4x4h_tform(np.array([0.0, ang, 0.0]),
                              np.array([0.12 * (i - 1), 0.0, 0.45]))
        cams[f"cam{i}"] = Camera(extrinsic=ext, intrinsic=k, res=list(RES),
                                 distortion_coefs=dist, name=f"cam{i}")
    gt_cams = CameraSet(camera_dict=cams)

    target = _target(nx=6, ny=6, marker=30.0, sep=8.0)  # ~0.22 m board
    poses = []
    for _ in range(8):
        rvec = rng.normal(size=3) * 0.25
        tvec = np.array([-0.11, -0.09, 0.0]) \
            + rng.normal(size=3) * [0.04, 0.04, 0.05]
        poses.append(np.concatenate([rvec, tvec]))
    _render_views(target, gt_cams, poses, tmp_path)

    fresh = _target(nx=6, ny=6, marker=30.0, sep=8.0)
    solved = calibrate_cameras(f_loc=tmp_path, calibration_target=fresh,
                               save=False,
                               problem_options={"outliers": "n"})
    err = np.mean(np.linalg.norm(
        solved.calibration_result.reshape(-1, 2), axis=1))
    assert err < 0.5, f"reprojection error too high: {err:.3f}"
    for name in gt_cams.get_names():
        assert abs(solved[name].intrinsic[0, 0]
                   - gt_cams[name].intrinsic[0, 0]) < 6.0, name

    def rel(cs, a, b):
        return cs[b].extrinsic @ np.linalg.inv(cs[a].extrinsic)

    for pair in [("cam0", "cam1"), ("cam0", "cam2")]:
        got_rel, want_rel = rel(solved, *pair), rel(gt_cams, *pair)
        assert np.abs(got_rel[:3, 3] - want_rel[:3, 3]).max() < 3e-3, pair
        cosang = (np.trace(got_rel[:3, :3] @ want_rel[:3, :3].T) - 1) / 2
        assert np.degrees(np.arccos(np.clip(cosang, -1, 1))) < 0.3, pair
