"""Direct unit tests for leaf utilities only covered indirectly elsewhere.

Parity targets cited per test (reference behaviour only):
geometry/diagnostic helpers from pyCamSet/utils/general_utils.py, camera
intrinsic-editing from pyCamSet/cameras/camera.py, set operations from
pyCamSet/cameras/camera_set.py, and detection-table reshaping from
pyCamSet/calibration_targets/target_detections.py.
"""
import numpy as np
import pytest

from pycamset_tpu.utils import general_utils as gu


def _basic_cam(res=(640, 480), f=500.0):
    from pycamset_tpu.models.camera import Camera
    k = np.array([[f, 0.0, res[0] / 2], [0.0, f, res[1] / 2], [0, 0, 1.0]])
    return Camera(intrinsic=k, res=list(res))


class TestGeneralUtils:
    def test_plane_fit_recovers_plane(self):
        rng = np.random.default_rng(0)
        pts = np.zeros((3, 200))
        pts[:2] = rng.uniform(-1, 1, (2, 200))
        pts += np.array([0.3, -0.2, 1.5])[:, None]
        pts[2] += rng.normal(size=200) * 1e-3
        centroid, normal = gu.plane_fit(pts)
        np.testing.assert_allclose(centroid, [0.3, -0.2, 1.5], atol=0.1)
        assert abs(abs(normal[2]) - 1.0) < 1e-3  # z-normal up to sign

    def test_mad_outlier_detection_flags_the_outlier(self):
        data = np.r_[np.random.default_rng(1).normal(size=50), 40.0]
        idx = gu.mad_outlier_detection(data, draw=False)
        assert idx is not None and 50 in np.atleast_1d(idx[0])
        # constant data: the mad==0 branch reports nothing
        assert gu.mad_outlier_detection(np.ones(10), draw=False) is None

    def test_flatten_pose_list_identity(self):
        flat = gu.flatten_pose_list([np.eye(4), np.eye(4)])
        np.testing.assert_allclose(flat, np.zeros(12), atol=1e-12)

    def test_average_tforms_cancels_opposite_rotations(self):
        from scipy.spatial.transform import Rotation as R
        t_a, t_b = np.eye(4), np.eye(4)
        t_a[:3, :3] = R.from_euler("z", 10, degrees=True).as_matrix()
        t_b[:3, :3] = R.from_euler("z", -10, degrees=True).as_matrix()
        t_a[:3, 3] = [1.0, 0, 0]
        t_b[:3, 3] = [3.0, 0, 0]
        avg = gu.average_tforms([t_a, t_b])
        np.testing.assert_allclose(avg[:3, :3], np.eye(3), atol=1e-8)
        np.testing.assert_allclose(avg[:3, 3], [2.0, 0, 0], atol=1e-12)
        # non-finite inputs are ignored; all-bad input returns nan
        np.testing.assert_allclose(gu.average_tforms(
            [np.full((4, 4), np.nan), t_a]), t_a)
        assert np.all(np.isnan(gu.average_tforms([np.full((4, 4), np.nan)])))

    def test_downsample_valid_averages_and_crops(self):
        im = np.arange(30, dtype=float).reshape(5, 6)
        out = gu.downsample_valid(im, 2)          # crops the 5th row
        assert out.shape == (2, 3)
        np.testing.assert_allclose(out[0, 0], np.mean([0, 1, 6, 7]))
        assert gu.downsample_valid(im, 1) is im

    def test_grouper_chunks_with_fill(self):
        assert list(gu.grouper("abcde", 2, fillvalue="x")) == [
            ("a", "b"), ("c", "d"), ("e", "x")]

    def test_get_close_square_tuple(self):
        for n in range(1, 30):
            a, b = gu.get_close_square_tuple(n)
            assert a * b >= n and (a - 1) * b < n

    def test_write_colour_ply_roundtrip(self, tmp_path):
        verts = np.array([[0.0, 1.0, 2.0], [3.0, 4.0, 5.0]])
        cols = np.array([[255, 0, 0], [0, 255, 0]])
        f = tmp_path / "cloud.ply"
        gu.write_colour_ply(f, verts, cols)
        lines = f.read_text().splitlines()
        assert lines[0] == "ply" and "element vertex 2" in lines[2]
        body = lines[lines.index("end_header") + 1:]
        got = np.array([ln.split()[:3] for ln in body if ln.strip()],
                       dtype=float)
        np.testing.assert_allclose(got, verts)

    def test_benchmark_smoke(self, capsys):
        out = gu.benchmark(lambda: sum(range(100)), repeats=5)
        assert out["mean"] > 0 and out["unit"] == "ms"
        assert "Mean:" in capsys.readouterr().out

    def test_pickle_roundtrip(self, tmp_path):
        from pycamset_tpu.utils.saving import load_pickle, save_pickle
        obj = {"a": np.arange(5), "b": "text"}
        save_pickle(obj, tmp_path / "o.pickle")
        back = load_pickle(tmp_path / "o.pickle")
        np.testing.assert_array_equal(back["a"], obj["a"])
        assert back["b"] == "text"


class TestCameraIntrinsicEdits:
    def test_scale_self_2n_halves_projection(self):
        """Downscaling by 2^1 must map a projection u -> (u+0.5)/2-0.5
        (the pixel-centre convention of averaging 2x2 blocks)."""
        cam = _basic_cam()
        pt = np.array([[0.2, -0.1, 2.0]])
        uv_full = cam.project_points(pt)[0]
        cam.scale_self_2n(1)
        assert cam.res == [320, 240]
        uv_half = cam.project_points(pt)[0]
        np.testing.assert_allclose(uv_half, (uv_full + 0.5) / 2 - 0.5,
                                   atol=1e-9)

    def test_crop_to_roi_shifts_principal_point(self):
        cam = _basic_cam()
        pt = np.array([[0.1, 0.2, 1.5]])
        uv = cam.project_points(pt)[0]
        cam.crop_to_roi([40, 60, 600, 400])   # [ymin, xmin, xmax, ymax]
        np.testing.assert_allclose(cam.project_points(pt)[0],
                                   uv - [60, 40], atol=1e-9)
        with pytest.raises(ValueError):
            cam.crop_to_roi([0, 0, 10_000, 10])

    def test_reset_to_original_params(self):
        cam = _basic_cam()
        k0 = cam.intrinsic.copy()
        cam.scale_self_2n(2)
        assert not np.allclose(cam.intrinsic, k0)
        cam.reset_to_original_params()
        np.testing.assert_allclose(cam.intrinsic, k0)

    def test_can_image_front_vs_behind(self):
        cam = _basic_cam()
        assert cam.can_image([0.0, 0.0, 1.0])
        assert not cam.can_image([10.0, 0.0, 1.0])  # far outside the fov

    def test_set_minimal_drops_sensor_maps(self):
        cam = _basic_cam()
        cam.set_minimal(True)
        assert cam.sensor_map is None
        cam.set_minimal(False)

    def test_camera_glyph_meshes(self):
        cam = _basic_cam()
        mesh = cam.get_mesh()
        cone = cam.get_viewcone(view_len=0.5)
        for m in (mesh, cone):
            verts = np.asarray(getattr(m, "points", m))
            assert np.all(np.isfinite(verts))


class TestCameraSetOps:
    def _rig(self):
        from pycamset_tpu.models.camera_set import CameraSet, make_cam_dict
        from pycamset_tpu.utils.general_utils import make_4x4h_tform
        k = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
        names = [f"cam{i}" for i in range(4)]
        # cameras fanned about y: 0, 5, 10, 40 degrees
        exts = [make_4x4h_tform(np.array([0, np.radians(a), 0]),
                                np.array([0.1 * i, 0, 0]))
                for i, a in enumerate([0, 5, 10, 40])]
        return CameraSet(camera_dict=make_cam_dict(
            names, exts, [k.copy() for _ in names],
            [np.zeros(5) for _ in names], [[640, 480]] * 4))

    def test_make_subset(self):
        cams = self._rig()
        sub = cams.make_subset([0, 2])           # reference contract: indices
        assert sub.get_names() == ["cam0", "cam2"]
        sub_n = cams.make_subset(["cam0", "cam2"])  # name-list convenience
        assert sub_n.get_names() == ["cam0", "cam2"]
        sub_i = cams.make_subset(np.array([1, 3]))
        assert sub_i.get_names() == ["cam1", "cam3"]
        with pytest.raises(ValueError):
            cams.make_subset(["nope"])

    def test_get_similar_angles_orders_by_view_direction(self):
        cams = self._rig()
        nearest = cams.get_similar_angles(0, 2)
        assert list(nearest) == [1, 2]   # 5 and 10 degrees beat 40

    def test_scale_set_2n_applies_to_every_camera(self):
        cams = self._rig()
        cams.scale_set_2n(1)
        assert all(cam.res == [320, 240] for cam in cams)

    def test_draw_camera_distortions_smoke(self, monkeypatch):
        import matplotlib
        matplotlib.use("Agg", force=True)
        from matplotlib import pyplot as plt
        monkeypatch.setattr(plt, "show", lambda: None)
        cams = self._rig()
        cams.draw_camera_distortions()
        plt.close("all")


class TestDetectionTableEdits:
    def _table(self):
        from pycamset_tpu.models.detections import TargetDetection
        data = np.array([
            [0, 0, 0, 10.0, 11.0],
            [0, 1, 1, 20.0, 21.0],
            [1, 0, 0, 30.0, 31.0],
            [1, 1, 2, 40.0, 41.0],
        ])
        return TargetDetection(cam_names=["a", "b"], data=data)

    def test_get_key_list_groups_by_key(self):
        det = self._table()
        per_key = det.get_key_list()
        assert len(per_key) == 3
        counts = sorted(d.get_data().shape[0] for d in per_key)
        assert counts == [1, 1, 2]

    def test_delete_col_removes_a_key_column(self):
        from pycamset_tpu.models.detections import TargetDetection
        data = np.array([[0, 0, 2, 7, 10.0, 11.0],
                         [1, 0, 1, 3, 30.0, 31.0]])
        det = TargetDetection(cam_names=["a", "b"], data=data)
        smaller = det.delete_col(2)
        np.testing.assert_allclose(
            smaller.get_data(),
            np.array([[0, 0, 7, 10.0, 11.0], [1, 0, 3, 30.0, 31.0]]))


class TestReconstructionLeaves:
    def test_disparity_to_ptcld_masks_depth(self):
        from pycamset_tpu.reconstruction.reconstruction_utils import (
            disparity_to_ptcld)
        # canonical rectified q: f=500, baseline 0.1 -> z = f*b/d
        q = np.array([[1, 0, 0, -320.0],
                      [0, 1, 0, -240.0],
                      [0, 0, 0, 500.0],
                      [0, 0, 10.0, 0.0]])   # 1/baseline
        disp = np.full((10, 10), 50.0 * 16)  # fixed-point *16 -> z = 1.0
        cloud, keep = disparity_to_ptcld(disp, q, mind=0.5, maxd=1.5)
        pts = cloud if isinstance(cloud, np.ndarray) else np.array(
            cloud.points)
        assert keep.sum() == 100
        np.testing.assert_allclose(pts[:, 2], 1.0, atol=1e-6)
        _, none_kept = disparity_to_ptcld(disp, q, mind=2.0, maxd=3.0)
        assert none_kept.sum() == 0


class TestOpsLeaves:
    def test_intr9_pack_unpack_roundtrip(self):
        import jax.numpy as jnp
        from pycamset_tpu.ops.projection import (
            intr9_from_k_dist, k_dist_from_intr9)
        k = np.array([[512.0, 0, 321.5], [0, 498.0, 239.5], [0, 0, 1]])
        d = np.array([0.1, -0.05, 1e-3, -2e-3, 0.01])
        packed = intr9_from_k_dist(k, d)
        k2, d2 = k_dist_from_intr9(jnp.asarray(packed))
        np.testing.assert_allclose(np.asarray(k2), k)
        np.testing.assert_allclose(np.asarray(d2), d)

    def test_fisheye_distort_undistort_roundtrip(self):
        import jax.numpy as jnp
        from pycamset_tpu.ops.distortion import (
            fisheye_distort_normalized, fisheye_theta_d,
            fisheye_undistort_normalized)
        dist4 = jnp.asarray([0.02, -0.005, 0.001, -2e-4])
        xy = jnp.asarray(np.random.default_rng(3).uniform(-0.5, 0.5, (40, 2)))
        xyd = fisheye_distort_normalized(xy, dist4)
        back = fisheye_undistort_normalized(xyd, dist4)
        np.testing.assert_allclose(np.asarray(back), np.asarray(xy),
                                   atol=1e-9)
        # zero distortion reduces to the pure equidistant model
        r = float(jnp.linalg.norm(xy[0]))
        xyd0 = np.asarray(fisheye_distort_normalized(xy[:1],
                                                     jnp.zeros(4)))[0]
        np.testing.assert_allclose(np.linalg.norm(xyd0), np.arctan(r),
                                   atol=1e-12)
        np.testing.assert_allclose(
            float(fisheye_theta_d(jnp.asarray(0.3), jnp.zeros(4))), 0.3)

    def test_se3_to_pose_inverts_make_tform(self):
        import jax.numpy as jnp
        from pycamset_tpu.ops.transforms import se3_to_pose
        from pycamset_tpu.utils.general_utils import make_4x4h_tform
        rvec, t = np.array([0.1, -0.2, 0.3]), np.array([1.0, 2.0, 3.0])
        pose6 = np.asarray(se3_to_pose(jnp.asarray(make_4x4h_tform(rvec, t))))
        np.testing.assert_allclose(pose6, np.r_[rvec, t], atol=1e-12)

    def test_project_h_matches_manual_projection(self):
        import jax.numpy as jnp
        from pycamset_tpu.ops.transforms import project_h
        k = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
        p34 = k @ np.eye(4)[:3]
        pts = np.array([[0.2, -0.1, 2.0], [0.0, 0.0, 1.0]])
        uv = np.asarray(project_h(jnp.asarray(pts), jnp.asarray(p34)))
        expected = (pts @ k.T)[:, :2] / pts[:, 2:3]
        np.testing.assert_allclose(uv, expected, atol=1e-12)
