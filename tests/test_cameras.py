"""Camera / CameraSet tests.

Mirrors the reference's tests/coordinate_system_test.py round trips plus
save/load round trips of the .camset format.
"""
import numpy as np
import pytest

from pycamset_tpu.models.camera import Camera
from pycamset_tpu.models.camera_set import CameraSet, make_cam_dict
from pycamset_tpu.utils.general_utils import make_4x4h_tform
from pycamset_tpu.utils.saving import load_CameraSet

RNG = np.random.default_rng(11)


def make_two_cam_set(dist=False):
    k = np.array([[1000.0, 0, 500], [0, 1000.0, 500], [0, 0, 1]])
    e0 = np.eye(4)
    e1 = make_4x4h_tform(np.array([0.0, 0.3, 0.0]), np.array([-0.5, 0.0, 0.2]))
    d = np.array([-0.1, 0.02, 1e-3, -1e-3, 0.0]) if dist else np.zeros(5)
    cam_dict = make_cam_dict(
        ["a", "b"], [e0, e1], [k, k], dist_coefs=[d, d],
        res=[[1000, 1000], [1000, 1000]])
    return CameraSet(camera_dict=cam_dict)


class TestCamera:
    def test_sensor_map_corners(self):
        # sensor-map corners reproject to pixel corners
        # (ref: coordinate_system_test.py:5-36)
        for ppoint in [[500.0, 500.0], [440.0, 560.0]]:
            k = np.array([[1000.0, 0, ppoint[0]], [0, 1000.0, ppoint[1]], [0, 0, 1]])
            cam = Camera(intrinsic=k, res=[1000, 1000], minimal=False)
            corners = np.array([[0, 0], [0, 999], [999, 0], [999, 999]])
            rays = cam.world_sensor_map[corners[:, 0], corners[:, 1]]
            pts = cam.position + rays * 2.0
            uv = cam.project_points(pts)
            np.testing.assert_allclose(uv, corners, atol=1e-6)

    def test_ray_projection_round_trip(self):
        # im_to_world_ray -> project_points identity on random extrinsics
        # (ref: coordinate_system_test.py:39-70)
        ext = make_4x4h_tform(RNG.normal(size=3) * 0.3, RNG.normal(size=3) * 0.1)
        cam = Camera(extrinsic=ext, res=[100, 100],
                     intrinsic=np.array([[100.0, 0, 50], [0, 100.0, 50], [0, 0, 1]]))
        cords = RNG.integers(0, 100, size=(20, 2))
        rays = cam.im_to_world_ray(cords)
        uv = cam.project_points(rays)
        np.testing.assert_allclose(uv, cords, atol=1e-6)

    def test_project_with_distortion_round_trip(self):
        cam = Camera(distortion_coefs=np.array([-0.2, 0.05, 1e-3, -2e-3, 0.01]))
        pts = RNG.normal(size=(10, 3)) * 0.2 + [0, 0, 2]
        uv = cam.project_points(pts)
        ideal = cam.project_points(pts, distort=False)
        back = cam.undistort_points(uv, iters=20)
        np.testing.assert_allclose(back, ideal, atol=1e-8)

    def test_equality(self):
        a = Camera(name="x")
        b = Camera(name="y")
        assert a == b
        b.set_distortion_coefs(np.array([0.1, 0, 0, 0, 0]))
        assert a != b


class TestCameraSet:
    def test_triangulation_round_trip(self):
        # project 7 world points to 2 cams -> multi_cam_triangulate recovers
        # (ref: coordinate_system_test.py:73-115)
        cams = make_two_cam_set(dist=True)
        pts = RNG.normal(size=(7, 3)) * 0.2 + [0, 0, 2.0]
        dicts = cams.project_points_to_all_cams(pts)
        recon = cams.multi_cam_triangulate(dicts)
        np.testing.assert_allclose(recon, pts, atol=1e-6)

    def test_indexing(self):
        cams = make_two_cam_set()
        assert cams["a"] is cams[0]
        assert cams["b"] is cams[1]
        sub = cams[[1]]
        assert sub.get_names() == ["b"]
        assert len(cams) == 2
        assert [c.name for c in cams] == ["a", "b"]

    def test_add_and_eq(self):
        a = make_two_cam_set()
        with pytest.raises(ValueError):
            a + make_two_cam_set()
        assert a == make_two_cam_set()

    def test_transform_reference(self):
        cams = make_two_cam_set()
        cams.set_reference_cam(1)
        np.testing.assert_allclose(cams[1].extrinsic @ np.linalg.inv(cams[1].extrinsic),
                                   np.eye(4), atol=1e-12)
        np.testing.assert_allclose(cams[1].position, np.zeros(3), atol=1e-12)

    def test_save_load_round_trip(self, tmp_path):
        cams = make_two_cam_set(dist=True)
        floc = tmp_path / "test.camset"
        cams.save(floc)
        loaded = load_CameraSet(floc)
        assert loaded == cams
        assert loaded.get_names() == cams.get_names()


class TestEpipolar:
    def _world_points(self, n=200):
        return np.column_stack([RNG.uniform(-0.3, 0.3, n),
                                RNG.uniform(-0.3, 0.3, n),
                                RNG.uniform(0.8, 2.0, n)])

    def test_essential_matrix_constraint(self):
        cams = make_two_cam_set()
        e = cams.essential_matrix("a", "b")
        pts = self._world_points()
        xa = (pts @ cams["a"].extrinsic[:3, :3].T
              + cams["a"].extrinsic[:3, 3])
        xb = (pts @ cams["b"].extrinsic[:3, :3].T
              + cams["b"].extrinsic[:3, 3])
        na = xa / xa[:, 2:3]
        nb = xb / xb[:, 2:3]
        resid = np.einsum("ni,ij,nj->n", nb, e, na)
        assert np.abs(resid).max() < 1e-12

    def test_fundamental_matrix_on_pixels(self):
        cams = make_two_cam_set(dist=True)
        f = cams.fundamental_matrix("a", "b")
        pts = self._world_points()
        # distorted detections must be undistorted before using F
        ua = cams["a"].undistort_points(cams["a"].project_points(pts))
        ub = cams["b"].undistort_points(cams["b"].project_points(pts))
        ha = np.concatenate([ua, np.ones((len(ua), 1))], 1)
        hb = np.concatenate([ub, np.ones((len(ub), 1))], 1)
        resid = np.einsum("ni,ij,nj->n", hb, f, ha)
        # scale-free check: residual against the epipolar line norm
        lines = ha @ f.T
        d_px = np.abs(resid) / np.linalg.norm(lines[:, :2], axis=1)
        assert d_px.max() < 1e-3          # px distance to the epipolar line
        assert np.abs(f).max() == pytest.approx(1.0)

    def test_fundamental_undistorted_camera_skips_undistort(self):
        cams = make_two_cam_set(dist=False)
        f = cams.fundamental_matrix("a", "b")
        pts = self._world_points()
        ha = np.concatenate([cams["a"].project_points(pts),
                             np.ones((len(pts), 1))], 1)
        hb = np.concatenate([cams["b"].project_points(pts),
                             np.ones((len(pts), 1))], 1)
        lines = ha @ f.T
        d_px = np.abs(np.einsum("ni,ij,nj->n", hb, f, ha)) \
            / np.linalg.norm(lines[:, :2], axis=1)
        assert d_px.max() < 1e-9


def test_save_load_round_trip_all_camera_models(tmp_path):
    """.camset persistence must round-trip every distortion-model width
    (5/8/12/14 coefficients) with identical projections."""
    import jax.numpy as jnp
    from pycamset_tpu.models.camera import Camera
    from pycamset_tpu.models.camera_set import CameraSet
    from pycamset_tpu.utils.general_utils import make_4x4h_tform
    from pycamset_tpu.utils.saving import load_CameraSet

    rng = np.random.default_rng(0)
    k = np.array([[900.0, 0, 640], [0, 910.0, 480], [0, 0, 1]])
    widths = {"standard": 5, "rational": 8, "thin_prism": 12, "tilted": 14}
    cams = {}
    for i, (name, n) in enumerate(widths.items()):
        d = rng.normal(size=n) * 0.01
        ext = make_4x4h_tform(rng.normal(size=3) * 0.1,
                              np.array([0.05 * i, 0, 0.4]))
        cams[name] = Camera(extrinsic=ext, intrinsic=k, distortion_coefs=d,
                            res=[1280, 960], name=name)
    cs = CameraSet(camera_dict=cams)
    f = tmp_path / "models.camset"
    cs.save(f)
    back = load_CameraSet(f)

    pts = rng.normal(size=(20, 3)) * 0.1 + [0, 0, 1.0]
    for name, n in widths.items():
        assert np.reshape(back[name].distortion_coefs, -1).size == n, name
        np.testing.assert_allclose(back[name].project_points(pts),
                                   cs[name].project_points(pts),
                                   atol=1e-12, err_msg=name)


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
