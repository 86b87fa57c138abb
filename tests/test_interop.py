"""COLMAP / NeRF / OpenCV-YAML rig interchange (utils/interop.py).

The reference exports only MVSNet blocks (cameras/camera_set.py:235-300);
these formats are beyond-reference surface, so the oracle here is the
format specs themselves: quaternion round trips, projection-convention
parity against a hand-rolled COLMAP projector, and full export->import
round trips.
"""
import json
from pathlib import Path

import numpy as np
import pytest

from pycamset_tpu.models.camera import Camera
from pycamset_tpu.models.camera_set import CameraSet, make_cam_dict
from pycamset_tpu.utils.general_utils import make_4x4h_tform
from pycamset_tpu.utils.interop import (_CV_TO_GL, export_colmap,
                                        export_nerf, export_opencv_yaml,
                                        import_colmap, import_opencv_yaml,
                                        matrix_from_quat, quat_from_matrix)


def _rig(dists=None, n=3, seed=0):
    rng = np.random.default_rng(seed)
    names = [f"cam{i}" for i in range(n)]
    exts, kmats, dd = [], [], []
    for i in range(n):
        rvec = rng.normal(size=3) * 0.6
        tvec = rng.normal(size=3) * 0.3 + [0, 0, 2.0]
        exts.append(make_4x4h_tform(rvec, tvec))
        kmats.append(np.array([[900.0 + i, 0, 640.0], [0, 905.0, 360.0],
                               [0, 0, 1]]))
        dd.append(np.zeros(5) if dists is None else np.asarray(dists[i]))
    return CameraSet(camera_dict=make_cam_dict(
        names, exts, kmats, dd, [[1280, 720]] * n))


class TestQuaternions:
    def test_round_trip_random_rotations(self):
        rng = np.random.default_rng(3)
        for _ in range(50):
            r = make_4x4h_tform(rng.normal(size=3) * 2.5,
                                np.zeros(3))[:3, :3]
            q = quat_from_matrix(r)
            assert np.allclose(matrix_from_quat(q), r, atol=1e-12)
            assert q[0] >= 0  # canonical sign

    def test_near_pi_rotations_stable(self):
        # trace ~ -1 exercises every non-w branch of Shepperd's method
        for axis in np.eye(3):
            r = make_4x4h_tform(axis * (np.pi - 1e-9), np.zeros(3))[:3, :3]
            q = quat_from_matrix(r)
            assert np.allclose(matrix_from_quat(q), r, atol=1e-9)


class TestColmap:
    def test_round_trip_standard(self, tmp_path):
        cams = _rig(dists=[[0.1, -0.05, 1e-3, -2e-3, 0.01]] * 3)
        out = export_colmap(cams, tmp_path / "model")
        back = import_colmap(out)
        assert back.get_names() == cams.get_names()
        for n in cams.get_names():
            assert np.allclose(back[n].intrinsic, cams[n].intrinsic)
            assert np.allclose(back[n].distortion_coefs,
                               cams[n].distortion_coefs)
            assert np.allclose(back[n].extrinsic, cams[n].extrinsic,
                               atol=1e-12)
            assert back[n].res == [1280, 720]

    def test_k3_zero_uses_plain_opencv_model(self, tmp_path):
        cams = _rig(dists=[[0.1, -0.05, 1e-3, -2e-3, 0.0]] * 3)
        out = export_colmap(cams, tmp_path / "m")
        txt = (out / "cameras.txt").read_text()
        assert " OPENCV " in txt and "FULL_OPENCV" not in txt
        back = import_colmap(out)
        assert np.allclose(back["cam0"].distortion_coefs,
                           cams["cam0"].distortion_coefs)

    def test_round_trip_rational(self, tmp_path):
        d8 = [0.3, -0.1, 1e-3, 2e-3, 0.05, 0.28, -0.09, 0.04]
        cams = _rig(dists=[d8] * 3)
        out = export_colmap(cams, tmp_path / "m")
        assert "FULL_OPENCV" in (out / "cameras.txt").read_text()
        back = import_colmap(out)
        assert np.allclose(back["cam1"].distortion_coefs, d8)

    def test_round_trip_fisheye(self, tmp_path):
        d4 = [0.02, -0.004, 0.001, -0.0002]
        cams = _rig(dists=[d4] * 3)
        out = export_colmap(cams, tmp_path / "m")
        assert "OPENCV_FISHEYE" in (out / "cameras.txt").read_text()
        back = import_colmap(out)
        assert back["cam2"].distortion_coefs.size == 4
        assert np.allclose(back["cam2"].distortion_coefs, d4)

    def test_thin_prism_refuses_with_convert_hint(self, tmp_path):
        cams = _rig(dists=[np.r_[0.1, -0.05, 0, 0, 0.01,
                                 0.09, -0.04, 0.008, 1e-4, 0, 0, 0]] * 3)
        with pytest.raises(ValueError, match="convert_camera_model"):
            export_colmap(cams, tmp_path / "m")

    def test_projection_convention_parity(self, tmp_path):
        """A world point projected by our Camera matches a from-scratch
        projector driven ONLY by the exported text (COLMAP semantics:
        x_cam = R x + t with R from the Hamilton wxyz quaternion)."""
        cams = _rig(dists=[[0.05, -0.02, 1e-3, -1e-3, 0.0]] * 3)
        out = export_colmap(cams, tmp_path / "m")
        cam_params = {}
        for line in (out / "cameras.txt").read_text().splitlines():
            if line.startswith("#"):
                continue
            t = line.split()
            cam_params[int(t[0])] = [float(v) for v in t[4:]]
        pts = np.array([[0.2, -0.1, 0.4], [0.0, 0.3, -0.2]])
        pose_lines = [ln for ln in
                      (out / "images.txt").read_text().splitlines()
                      if ln and not ln.startswith("#")][0::2]
        for ln in pose_lines:
            t = ln.split()
            q = np.array([float(v) for v in t[1:5]])
            tv = np.array([float(v) for v in t[5:8]])
            fx, fy, cx, cy, k1, k2, p1, p2 = cam_params[int(t[8])]
            xc = pts @ matrix_from_quat(q).T + tv
            xn = xc[:, :2] / xc[:, 2:3]
            r2 = np.sum(xn ** 2, axis=1)
            rad = 1 + k1 * r2 + k2 * r2 ** 2
            x, y = xn[:, 0], xn[:, 1]
            xd = x * rad + 2 * p1 * x * y + p2 * (r2 + 2 * x ** 2)
            yd = y * rad + p1 * (r2 + 2 * y ** 2) + 2 * p2 * x * y
            uv_colmap = np.stack([fx * xd + cx, fy * yd + cy], axis=1)
            name = Path(t[9]).stem
            uv_ours = np.asarray(cams[name].project_points(pts))
            assert np.allclose(uv_colmap, uv_ours, atol=1e-9)

    def test_points_and_tracks(self, tmp_path):
        cams = _rig()
        pts = np.array([[0, 0, 0.5], [0.1, 0.2, 0.6]])
        tracks = [[("cam0", (10.0, 20.0)), ("cam1", (30.0, 40.0))],
                  [("cam0", (50.0, 60.0))]]
        out = export_colmap(cams, tmp_path / "m", points3d=pts,
                            tracks=tracks, errors=[0.25, 0.5])
        p3d = [ln for ln in (out / "points3D.txt").read_text().splitlines()
               if not ln.startswith("#")]
        assert len(p3d) == 2
        # point 1: two track entries, error 0.25
        t = p3d[0].split()
        assert t[0] == "1" and float(t[7]) == 0.25
        assert t[8:] == ["1", "0", "2", "0"]
        # cam0's 2D line holds both its observations in order
        img_lines = [ln for ln in
                     (out / "images.txt").read_text().splitlines()
                     if not ln.startswith("#")]
        cam0_2d = img_lines[1].split()
        assert cam0_2d[:3] == ["10", "20", "1"]
        assert cam0_2d[3:6] == ["50", "60", "2"]

    def test_binary_model_message(self, tmp_path):
        (tmp_path / "cameras.bin").write_bytes(b"\x00")
        with pytest.raises(ValueError, match="model_converter"):
            import_colmap(tmp_path)

    def test_import_simple_models(self, tmp_path):
        (tmp_path / "cameras.txt").write_text(
            "1 SIMPLE_RADIAL 640 480 500 320 240 0.1\n"
            "2 PINHOLE 640 480 500 510 320 240\n")
        (tmp_path / "images.txt").write_text(
            "1 1 0 0 0 0 0 1 1 a.png\n\n"
            "2 1 0 0 0 0 0 2 2 b.jpg\n\n")
        cams = import_colmap(tmp_path)
        assert cams.get_names() == ["a", "b"]
        assert cams["a"].intrinsic[0, 0] == 500
        assert np.allclose(cams["a"].distortion_coefs, [0.1, 0, 0, 0, 0])
        assert cams["b"].intrinsic[1, 1] == 510
        assert np.allclose(cams["b"].extrinsic[:3, 3], [0, 0, 2])


class TestNerf:
    def test_transforms_json(self, tmp_path):
        cams = _rig(dists=[[0.1, -0.05, 1e-3, -2e-3, 0.01]] * 3)
        out = export_nerf(cams, tmp_path / "transforms.json",
                          image_names={"cam1": "images/left.png"})
        doc = json.loads(out.read_text())
        assert doc["camera_model"] == "OPENCV"
        assert len(doc["frames"]) == 3
        assert doc["frames"][1]["file_path"] == "images/left.png"
        assert doc["k3"] == 0.01
        for n, frame in zip(cams.get_names(), doc["frames"]):
            c2w_gl = np.asarray(frame["transform_matrix"])
            c2w_cv = c2w_gl @ np.linalg.inv(_CV_TO_GL)
            assert np.allclose(np.linalg.inv(c2w_cv), cams[n].extrinsic,
                               atol=1e-12)
            # OpenGL convention: camera looks down -z; our view axis is
            # the OpenCV +z column
            assert np.allclose(-c2w_gl[:3, 2], cams[n].view)
            assert frame["fl_x"] == cams[n].intrinsic[0, 0]

    def test_fisheye_tagging(self, tmp_path):
        cams = _rig(dists=[[0.02, -0.004, 0.001, -0.0002]] * 3)
        doc = json.loads(export_nerf(cams, tmp_path / "t.json").read_text())
        assert doc["camera_model"] == "OPENCV_FISHEYE"
        assert doc["frames"][0]["k4"] == -0.0002
        assert "p1" not in doc["frames"][0]

    def test_mixed_rig_raises(self, tmp_path):
        cams = _rig(dists=[np.zeros(5), np.zeros(4), np.zeros(5)])
        with pytest.raises(ValueError, match="mixed"):
            export_nerf(cams, tmp_path / "t.json")


class TestOpencvYaml:
    def test_round_trip(self, tmp_path):
        cams = _rig(dists=[[0.1, -0.05, 1e-3, -2e-3, 0.01],
                           np.zeros(5),
                           [0.3, -0.1, 1e-3, 2e-3, 0.05, 0.28, -0.09,
                            0.04]])
        out = export_opencv_yaml(cams, tmp_path / "rig.yaml")
        back = import_opencv_yaml(out)
        assert back.get_names() == cams.get_names()
        for n in cams.get_names():
            assert np.allclose(back[n].intrinsic, cams[n].intrinsic)
            assert np.allclose(back[n].distortion_coefs,
                               cams[n].distortion_coefs)
            assert np.allclose(back[n].extrinsic, cams[n].extrinsic)
            assert back[n].res == [1280, 720]

    def test_readable_by_plain_cv2(self, tmp_path):
        import cv2
        out = export_opencv_yaml(_rig(), tmp_path / "rig.yaml")
        fs = cv2.FileStorage(str(out), cv2.FILE_STORAGE_READ)
        k = fs.getNode("camera_matrix_0").mat()
        fs.release()
        assert k.shape == (3, 3) and k[0, 0] == 900.0


class TestCli:
    def test_export_and_import_round_trip(self, tmp_path, capsys):
        from pycamset_tpu.__main__ import main
        from pycamset_tpu.utils.saving import load_CameraSet
        cams = _rig(dists=[[0.1, -0.05, 1e-3, -2e-3, 0.01]] * 3)
        src = tmp_path / "rig.camset"
        cams.save(src)

        assert main(["export", str(src), "--format", "colmap"]) == 0
        model = tmp_path / "rig_colmap"
        assert (model / "cameras.txt").exists()

        assert main(["export", str(src), "--format", "nerf"]) == 0
        assert (tmp_path / "transforms.json").exists()

        assert main(["export", str(src), "--format", "opencv"]) == 0
        assert (tmp_path / "rig.yaml").exists()

        out = tmp_path / "back.camset"
        assert main(["import", str(model), "--out", str(out)]) == 0
        back = load_CameraSet(out)
        assert back.get_names() == cams.get_names()
        assert np.allclose(back["cam0"].extrinsic, cams["cam0"].extrinsic)
        assert "exported 3 cameras" in capsys.readouterr().out
