"""Tests: oracle cost parity, fixed-camera pose solve, reconstruction, viz."""
import shutil
from pathlib import Path

import cv2
import numpy as np
import pytest

import matplotlib
matplotlib.use("Agg")

REF_DATA = Path("/root/reference/tests/test_data/calibration_charuco")


@pytest.fixture(scope="module")
def small_charuco(tmp_path_factory):
    """First 6 images of the 3-camera charuco set."""
    if not REF_DATA.exists():
        pytest.skip("reference test data unavailable")
    dst = tmp_path_factory.mktemp("charuco_small")
    from pycamset_tpu.utils.general_utils import natsorted
    for sub in ["1", "2", "3"]:
        (dst / sub).mkdir()
        for f in natsorted((REF_DATA / sub).glob("*.jpg"))[:6]:
            shutil.copy(f, dst / sub / f.name)
    return dst


class TestOracleCostParity:
    """BA residual matches cv2.projectPoints on real detections.

    Parity target: tests/bundle_correctness_test.py:102 (< 1e-4 px).
    """

    def test_residual_matches_opencv(self, small_charuco):
        from pycamset_tpu.calibration.camera_calibrator import (
            detect_datapoints_in_imfile, run_initial_calibration)
        from pycamset_tpu.models.charuco import ChArUco
        from pycamset_tpu.optim.driver import build_solver
        from pycamset_tpu.optim.handlers import TemplateBundleHandler
        from pycamset_tpu.utils.general_utils import make_4x4h_tform

        target = ChArUco(20, 20, 4, legacy=True)
        detections, cam_res = detect_datapoints_in_imfile(
            f_loc=small_charuco, calibration_target=target, caching=False)
        cams = run_initial_calibration(detections, target, cam_res, save=False)
        cams.set_resolutions_from_file(small_charuco)

        handler = TemplateBundleHandler(
            camset=cams, target=target, detection=detections,
            options={"outliers": "n"})
        _, residual_fn, x0 = build_solver(handler)
        ours = residual_fn(x0)

        # oracle: cv2.projectPoints with the same parameters, same rows
        prim = handler.bundlePrimitive
        dd = handler.get_detection_data(flatten=True)
        cv_pred = np.zeros((dd.shape[0], 2))
        for c in range(len(cams)):
            k = np.array([[prim.intr[c][0], 0, prim.intr[c][1]],
                          [0, prim.intr[c][2], prim.intr[c][3]],
                          [0, 0, 1]])
            dist = prim.intr[c][4:]
            ext = make_4x4h_tform(prim.extr[c][:3], prim.extr[c][3:])
            for i in range(prim.poses.shape[0]):
                rows = (dd[:, 0] == c) & (dd[:, 1] == i)
                if not np.any(rows):
                    continue
                pose = make_4x4h_tform(prim.poses[i][:3], prim.poses[i][3:])
                full = ext @ pose
                rvec, _ = cv2.Rodrigues(full[:3, :3])
                pts = target.point_data.reshape(-1, 3)[dd[rows, 2].astype(int)]
                uv, _ = cv2.projectPoints(pts, rvec, full[:3, 3], k, dist)
                cv_pred[rows] = uv[:, 0, :]
        cv_residual = cv_pred - dd[:, 3:5]
        diff = np.abs(ours - cv_residual)
        assert diff.mean() < 1e-4, f"cost oracle parity failed: {diff.mean()}"


class TestFixedCameraPoses:
    def test_pose_solve_synthetic(self):
        from pycamset_tpu.models.camera_set import CameraSet, make_cam_dict
        from pycamset_tpu.models.detections import TargetDetection
        from pycamset_tpu.optim.find_target import (
            estimate_poses_with_fixed_cameras)
        from pycamset_tpu.optim.handlers import FreePointTarget
        from pycamset_tpu.utils.general_utils import make_4x4h_tform
        from pycamset_tpu.utils.synthetic import make_synthetic_rig

        rig = make_synthetic_rig(n_cams=3, n_ims=6, grid=5, visibility=1.0,
                                 noise_px=0.0, seed=9)
        k_mats, exts, dists = [], [], []
        for c in range(3):
            i9 = rig["intr"][c]
            k_mats.append(np.array([[i9[0], 0, i9[1]], [0, i9[2], i9[3]],
                                    [0, 0, 1]]))
            dists.append(i9[4:])
            exts.append(make_4x4h_tform(rig["extr"][c][:3], rig["extr"][c][3:]))
        cams = CameraSet(camera_dict=make_cam_dict(
            ["a", "b", "c"], exts, k_mats, dists, [[1600, 1200]] * 3))

        target = FreePointTarget(rig["template"].reshape(1, -1, 3))
        det = TargetDetection(cam_names=["a", "b", "c"], data=rig["dd"])
        poses, result = estimate_poses_with_fixed_cameras(cams, target, det)

        for i in range(6):
            expect = make_4x4h_tform(rig["poses"][i][:3], rig["poses"][i][3:])
            np.testing.assert_allclose(poses[i], expect, atol=1e-6)


class TestReconstruction:
    def test_rectify_and_pairs(self):
        from pycamset_tpu.models.camera import Camera
        from pycamset_tpu.reconstruction.acmmp_utils import (
            ReconParams, calc_pairs, write_pair_file)
        from pycamset_tpu.reconstruction.reconstruction_utils import (
            rectify_camera_images, rectify_camera_pair)
        from pycamset_tpu.utils.general_utils import make_4x4h_tform

        k = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
        cam0 = Camera(intrinsic=k, res=[640, 480])
        cam1 = Camera(intrinsic=k, res=[640, 480],
                      extrinsic=make_4x4h_tform(np.zeros(3), [-0.2, 0, 0]))
        p0, p1, q, r0, r1, _ = rectify_camera_pair(cam0, cam1)
        assert p0.shape == (3, 4) and q.shape == (4, 4)

        im = np.random.default_rng(0).integers(
            0, 255, (480, 640), dtype=np.uint8)
        i0, i1, q2 = rectify_camera_images(cam0, cam1, im, im)
        assert i0.shape == im.shape

        # pair selection: ring of cameras
        angs = np.linspace(0, np.pi / 2, 8)
        vecs = np.stack([np.sin(angs), np.zeros(8), np.cos(angs)], axis=1)
        pairs = calc_pairs(vecs, ReconParams(minangle=3, maxangle=45,
                                             max_n_view=3), pick_closest=True)
        assert all(len(p) <= 3 for p in pairs)
        assert 1 in pairs[0]  # the nearest in-range neighbour is picked
        import io
        buf = io.StringIO()
        write_pair_file(buf, pairs)
        assert buf.getvalue().startswith("8\n0\n")

    def test_stereo_reconstruct_synthetic(self):
        from pycamset_tpu.models.camera import Camera
        from pycamset_tpu.reconstruction.reconstruction_utils import (
            stereo_reconstruct)
        from pycamset_tpu.utils.general_utils import make_4x4h_tform
        rng = np.random.default_rng(1)
        # textured fronto-parallel plane at z=1 seen by a rectified pair
        k = np.array([[400.0, 0, 320], [0, 400.0, 240], [0, 0, 1]])
        cam0 = Camera(intrinsic=k, res=[640, 480])
        cam1 = Camera(intrinsic=k, res=[640, 480],
                      extrinsic=make_4x4h_tform(np.zeros(3), [-0.1, 0, 0]))
        tex = (rng.uniform(0, 255, (480 // 8, 640 // 8))
               .repeat(8, 0).repeat(8, 1)).astype(np.uint8)
        # plane at depth z: disparity = f*b/z = 400*0.1/1.0 = 40 px
        im0 = tex
        im1 = np.roll(tex, 40, axis=1)
        cloud = stereo_reconstruct(cam0, cam1, im0, im1, num_disp=64,
                                   blockSize=15, mind=0.5, maxd=1.5)
        pts = cloud if isinstance(cloud, np.ndarray) else np.array(cloud.points)
        assert pts.shape[0] > 1000
        # recovered depth clusters at ~1.0
        assert abs(np.median(pts[:, 2]) - 1.0) < 0.05

        # color input is gray-converted internally (StereoBM wants 1ch)
        cloud_c = stereo_reconstruct(
            cam0, cam1, np.stack([im0] * 3, -1), np.stack([im1] * 3, -1),
            num_disp=64, blockSize=15, mind=0.5, maxd=1.5)
        pts_c = (cloud_c if isinstance(cloud_c, np.ndarray)
                 else np.array(cloud_c.points))
        assert pts_c.shape[0] > 1000


class TestVisualisation:
    def test_visualise_calibration_smoke(self, small_charuco, monkeypatch):
        import matplotlib.pyplot as plt
        monkeypatch.setattr(plt, "show", lambda *a, **k: None)
        from pycamset_tpu import calibrate_cameras
        from pycamset_tpu.models.charuco import ChArUco
        target = ChArUco(20, 20, 4, legacy=True)
        cams = calibrate_cameras(
            f_loc=small_charuco, calibration_target=target, save=False,
            problem_options={"outliers": "n", "max_nfev": 20})
        cams.visualise_calibration()
        plt.close("all")


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
