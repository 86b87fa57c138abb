"""Product synthetic renderer (utils/render.py).

The renderer is itself validated by the gold-standard E2E
(tests/test_synthetic_image_e2e.py, which consumes it); here the API
surface is tested directly: texture scale, folder layout, ground-truth
detection tables matching the live detector, and the system-level accuracy
claim of photometric corner refinement (refined corners closer to the
ANALYTIC ground truth than the raw detector's).
"""
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from pycamset_tpu.utils.render import (
    ground_truth_detections, render_target_views, target_texture)

RES = (640, 480)


def make_rig():
    from pycamset_tpu.models.camera import Camera
    from pycamset_tpu.models.camera_set import CameraSet
    from pycamset_tpu.utils.general_utils import make_4x4h_tform
    cams = {}
    for i, ang in enumerate([-0.2, 0.2]):
        k = np.array([[700.0 + 30 * i, 0, RES[0] / 2 + 2.0],
                      [0, 695.0 + 30 * i, RES[1] / 2 - 3.0],
                      [0, 0, 1.0]])
        dist = np.array([-0.12 + 0.02 * i, 0.02, 4e-4, -3e-4, 0.0])
        ext = make_4x4h_tform(np.array([0.0, ang, 0.0]),
                              np.array([0.1 * (2 * i - 1), 0.0, 0.40]))
        cams[f"cam{i}"] = Camera(extrinsic=ext, intrinsic=k, res=list(RES),
                                 distortion_coefs=dist, name=f"cam{i}")
    return CameraSet(camera_dict=cams)


def make_poses(n=3, seed=2):
    rng = np.random.default_rng(seed)
    poses = []
    for _ in range(n):
        rvec = rng.normal(size=3) * 0.2
        tvec = (np.array([-0.115, -0.09, 0.0])
                + rng.normal(size=3) * [0.03, 0.03, 0.04])
        poses.append(np.concatenate([rvec, tvec]))
    return poses


@pytest.fixture(scope="module")
def rig_and_target():
    from pycamset_tpu.models.charuco import ChArUco
    return make_rig(), ChArUco(10, 10, 25)


def _join_on_keys(det_table, gt_table, cam_name, im_idx):
    """(detected uv, gt uv) matched by corner key for one (cam, image)."""
    det = det_table.get(cam=cam_name).get(im_num=im_idx).get_data()
    gt = gt_table.get(cam=cam_name).get(im_num=im_idx).get_data()
    if det is None or gt is None:
        return np.empty((0, 2)), np.empty((0, 2))
    gt_by_key = {tuple(r[2:-2]): r[-2:] for r in gt}
    pairs = [(r[-2:], gt_by_key[tuple(r[2:-2])]) for r in det
             if tuple(r[2:-2]) in gt_by_key]
    if not pairs:
        return np.empty((0, 2)), np.empty((0, 2))
    d, g = zip(*pairs)
    return np.asarray(d), np.asarray(g)


class TestRendererSurface:
    def test_texture_scale_and_origin(self, rig_and_target):
        _, target = rig_and_target
        im, px_per_m = target_texture(target, square_px=40)
        n_sq = target.board.getChessboardSize()[0]
        assert im.shape == (n_sq * 40, n_sq * 40)
        # 25 mm squares at 40 px/square -> 1600 px/m
        assert px_per_m == pytest.approx(40 / 0.025)

    def test_folder_layout_matches_calibrate_input(self, rig_and_target,
                                                   tmp_path):
        cams, target = rig_and_target
        out = render_target_views(cams, target, make_poses(2),
                                  out_dir=tmp_path)
        for name in cams.get_names():
            assert len(out[name]) == 2
            assert out[name][0].shape == (RES[1], RES[0])
            assert out[name][0].dtype == np.uint8
            files = sorted((tmp_path / name).glob("*.png"))
            assert [f.name for f in files] == ["im000.png", "im001.png"]

    def test_non_square_board_keeps_scale(self):
        """generateImage letterboxes a mismatched canvas: a 6x10 board
        must rasterise at its own aspect with the same px/m both axes."""
        from pycamset_tpu.models.charuco import ChArUco
        target = ChArUco(6, 10, 25)
        im, px_per_m = target_texture(target, square_px=40)
        assert im.shape == (10 * 40, 6 * 40)
        assert px_per_m == pytest.approx(40 / 0.025)

    def test_non_square_board_detector_matches_truth(self):
        from pycamset_tpu.models.charuco import ChArUco
        from pycamset_tpu.models.detections import TargetDetection
        cams = make_rig()
        target = ChArUco(6, 10, 25)
        poses = [np.array([0.1, -0.15, 0.05, -0.07, -0.11, 0.0])]
        views = render_target_views(cams, target, poses)
        gt = ground_truth_detections(cams, target, poses, margin=5)
        table = TargetDetection(cam_names=list(cams.get_names()))
        for name in cams.get_names():
            table.add_detection(name, 0, target.find_in_image(views[name][0]))
        d, g = _join_on_keys(table, gt, "cam0", 0)
        assert len(d) > 10
        assert np.linalg.norm(d - g, axis=1).mean() < 0.25

    def test_unsupported_target_raises(self):
        from pycamset_tpu.models.grid import ArucoGrid
        grid = ArucoGrid(4, 4, 30, 8)
        with pytest.raises(NotImplementedError):
            target_texture(grid)


def make_converging_rig():
    """Cameras whose axes cross in front (pose sampling needs a real
    shared workspace; `make_rig`'s divergent pair has none)."""
    from pycamset_tpu.models.camera import Camera
    from pycamset_tpu.models.camera_set import CameraSet
    from pycamset_tpu.utils.synthetic import look_at_extrinsic
    cams = {}
    for i, x in enumerate([-0.12, 0.12]):
        k = np.array([[700.0, 0, RES[0] / 2], [0, 700.0, RES[1] / 2],
                      [0, 0, 1.0]])
        ext = look_at_extrinsic(np.array([x, 0.0, -0.45]), np.zeros(3))
        cams[f"cam{i}"] = Camera(
            extrinsic=ext, intrinsic=k, res=list(RES),
            distortion_coefs=np.array([-0.1, 0.02, 0.0, 0.0, 0.0]),
            name=f"cam{i}")
    return CameraSet(camera_dict=cams)


class TestCliRender:
    def test_render_command_writes_dataset(self, tmp_path, capsys):
        import json

        import pycamset_tpu.__main__ as cli

        cams = make_converging_rig()
        src = tmp_path / "rig.camset"
        cams.save(src)
        out = tmp_path / "synth"
        rc = cli.main(["render", str(src), "--target", "charuco",
                       "--nx", "10", "--ny", "10", "--square", "25",
                       "--n-ims", "2", "-o", str(out)])
        assert rc == 0
        assert "rendered 2 views" in capsys.readouterr().out
        poses = json.loads((out / "true_poses.json").read_text())
        assert np.asarray(poses).shape == (2, 6)
        for name in cams.get_names():
            files = sorted((out / name).glob("*.png"))
            assert [f.name for f in files] == ["im000.png", "im001.png"]

    def test_render_command_explicit_poses(self, rig_and_target, tmp_path):
        import json

        import pycamset_tpu.__main__ as cli

        cams, _ = rig_and_target
        src = tmp_path / "rig.camset"
        cams.save(src)
        pose_file = tmp_path / "poses.json"
        pose_file.write_text(json.dumps([p.tolist() for p in make_poses(1)]))
        out = tmp_path / "synth"
        rc = cli.main(["render", str(src), "--target", "charuco",
                       "--nx", "10", "--ny", "10", "--square", "25",
                       "--poses", str(pose_file), "-o", str(out)])
        assert rc == 0
        got = json.loads((out / "true_poses.json").read_text())
        assert np.allclose(got, make_poses(1))
        im = cv2.imread(str(out / "cam0" / "im000.png"))
        assert im is not None and im.shape[:2] == (RES[1], RES[0])


class TestCubeRendering:
    """The FaceToShape (Ccube) path: nearest-hit face occlusion, outward
    chirality (markers must DECODE — a mirrored face detects nothing),
    and analytic ground truth with back-face culling."""

    @pytest.fixture(scope="class")
    def cube_scene(self):
        from pycamset_tpu.models.camera import Camera
        from pycamset_tpu.models.camera_set import CameraSet
        from pycamset_tpu.models.ccube import Ccube
        from pycamset_tpu.utils.synthetic import look_at_extrinsic
        cube = Ccube(n_points=6, length=60)
        k = np.array([[900.0, 0, 400.0], [0, 900.0, 300.0], [0, 0, 1.0]])
        cams = {}
        for i, pos in enumerate([np.array([0.25, 0.2, 0.3]),
                                 np.array([-0.22, 0.25, 0.28])]):
            cams[f"cam{i}"] = Camera(
                extrinsic=look_at_extrinsic(pos, np.zeros(3)), intrinsic=k,
                res=[800, 600],
                distortion_coefs=np.array([-0.08, 0.01, 1e-4, -1e-4, 0.0]),
                name=f"cam{i}")
        poses = [np.array([0.1, -0.2, 0.15, 0.0, 0.0, 0.0]),
                 np.array([0.7, 0.5, -0.3, 0.01, -0.01, 0.0])]
        return CameraSet(camera_dict=cams), cube, poses

    def test_detector_decodes_rendered_faces(self, cube_scene):
        cams, cube, poses = cube_scene
        views = render_target_views(cams, cube, poses)
        gt = ground_truth_detections(cams, cube, poses, margin=3)

        from pycamset_tpu.models.detections import TargetDetection
        table = TargetDetection(cam_names=list(cams.get_names()))
        for name in cams.get_names():
            for i, im in enumerate(views[name]):
                table.add_detection(name, i, cube.find_in_image(im))

        errs, n_pairs = [], 0
        for name in cams.get_names():
            for i in range(len(poses)):
                d, g = _join_on_keys(table, gt, name, i)
                n_pairs += len(d)
                if len(d):
                    errs.append(np.linalg.norm(d - g, axis=1))
        err = np.concatenate(errs)
        # oblique small faces carry more detector noise than a frontal
        # planar board; chirality or occlusion bugs fail by miles (zero
        # decodes / multi-px mismatches), not fractions of a pixel
        assert n_pairs > 60
        assert err.mean() < 0.7
        assert err.max() < 2.5

    def test_ground_truth_culls_back_faces(self, cube_scene):
        cams, cube, poses = cube_scene
        gt = ground_truth_detections(cams, cube, poses)
        g = gt.get(cam="cam0").get(im_num=0).get_data()
        faces_seen = {int(f) for f in g[:, 2]}
        # a convex cube shows at most 3 faces from any outside viewpoint
        assert 1 <= len(faces_seen) <= 3
        n_per = np.asarray(cube.point_data).shape[-2]
        assert len(g) <= 3 * n_per

    def test_occluded_pixels_sample_the_near_face(self, cube_scene):
        cams, cube, poses = cube_scene
        views = render_target_views(cams, cube, poses, background=5.0)
        im = views["cam0"][0]
        # the 60 mm cube at ~0.44 m covers a few % of the frame: white
        # squares must be present and the background stays at its constant
        assert (im == 5).mean() > 0.5
        assert (im > 100).mean() > 0.01


class TestGroundTruth:
    def test_detector_agrees_with_analytic_corners(self, rig_and_target):
        cams, target = rig_and_target
        poses = make_poses(2)
        views = render_target_views(cams, target, poses)
        gt = ground_truth_detections(cams, target, poses, margin=5)

        from pycamset_tpu.models.detections import TargetDetection
        table = TargetDetection(cam_names=list(cams.get_names()))
        for c, name in enumerate(cams.get_names()):
            for i, im in enumerate(views[name]):
                table.add_detection(name, i, target.find_in_image(im))

        errs, n_pairs = [], 0
        for name in cams.get_names():
            for i in range(len(poses)):
                d, g = _join_on_keys(table, gt, name, i)
                n_pairs += len(d)
                if len(d):
                    errs.append(np.linalg.norm(d - g, axis=1))
        err = np.concatenate(errs)
        assert n_pairs > 80          # plenty of corners matched by key
        assert err.mean() < 0.25     # detector vs analytic truth
        assert err.max() < 1.5

    def test_photometric_refine_beats_raw_detector(self, rig_and_target):
        cams, target = rig_and_target
        poses = make_poses(2, seed=5)
        views = render_target_views(cams, target, poses, blur_sigma=1.2,
                                    noise=4.0, seed=9)
        gt = ground_truth_detections(cams, target, poses, margin=5)

        def mean_err(refine):
            from pycamset_tpu.models.detections import TargetDetection
            target.photometric_refine = refine
            try:
                table = TargetDetection(cam_names=list(cams.get_names()))
                for name in cams.get_names():
                    for i, im in enumerate(views[name]):
                        table.add_detection(name, i,
                                            target.find_in_image(im))
            finally:
                target.photometric_refine = False
            errs = []
            for name in cams.get_names():
                for i in range(len(poses)):
                    d, g = _join_on_keys(table, gt, name, i)
                    if len(d):
                        errs.append(np.linalg.norm(d - g, axis=1))
            return np.concatenate(errs).mean()

        raw, refined = mean_err(False), mean_err(True)
        assert refined < raw
        assert refined < 0.15
