"""Gold-standard E2E: rendered ChArUco images with KNOWN ground truth.

The real datasets validate against px thresholds only; here board images are
rendered through known cameras (including distortion, via inverse-mapped
remap), the full pipeline runs (cv2 detection -> OpenCV seeding -> PnP
initialisation -> TPU-resident bundle adjustment), and the recovered
intrinsics/extrinsics are compared against the generating ground truth.
"""
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


RES = (800, 600)  # (w, h)


def make_gt_cameras():
    from pycamset_tpu.models.camera import Camera
    from pycamset_tpu.models.camera_set import CameraSet
    from pycamset_tpu.utils.general_utils import make_4x4h_tform
    rng = np.random.default_rng(0)
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
    return CameraSet(camera_dict=cams)


def render_views(target, cams, poses, out_dir):
    """Render through the product renderer (utils/render.py)."""
    from pycamset_tpu.utils.render import render_target_views
    render_target_views(cams, target, poses, out_dir=out_dir)


@pytest.fixture(scope="module")
def rendered_dataset(tmp_path_factory):
    from pycamset_tpu.models.charuco import ChArUco
    out = tmp_path_factory.mktemp("synth_ims")
    target = ChArUco(10, 10, 25)  # 25 mm squares -> 0.25 m board
    cams = make_gt_cameras()
    rng = np.random.default_rng(4)
    poses = []
    for i in range(10):
        # near-frontal poses: the cameras view the board's printed (+z) face
        rvec = rng.normal(size=3) * 0.25
        tvec = np.array([-0.125, -0.1, 0.0]) \
            + rng.normal(size=3) * [0.04, 0.04, 0.05]
        poses.append(np.concatenate([rvec, tvec]))
    render_views(target, cams, poses, out)
    return out, target, cams


def test_pipeline_recovers_ground_truth(rendered_dataset):
    from pycamset_tpu import calibrate_cameras
    from pycamset_tpu.models.charuco import ChArUco
    data_dir, target, gt_cams = rendered_dataset
    fresh_target = ChArUco(10, 10, 25)
    cams = calibrate_cameras(
        f_loc=data_dir, calibration_target=fresh_target, save=False,
        problem_options={"outliers": "n"})

    err = np.mean(np.linalg.norm(
        cams.calibration_result.reshape(-1, 2), axis=1))
    assert err < 0.5, f"reprojection error too high: {err:.3f}"

    # intrinsics recovered against the generating ground truth
    for name in gt_cams.get_names():
        got, want = cams[name], gt_cams[name]
        assert abs(got.intrinsic[0, 0] - want.intrinsic[0, 0]) < 5.0, name
        assert abs(got.intrinsic[1, 1] - want.intrinsic[1, 1]) < 5.0, name
        # individual k coefficients trade off when the board does not reach
        # the image corners; compare the distortion FUNCTION over the
        # observed field instead (displacement agreement in px)
        grid = np.stack(np.meshgrid(
            np.linspace(RES[0] * 0.2, RES[0] * 0.8, 7),
            np.linspace(RES[1] * 0.2, RES[1] * 0.8, 7)), -1).reshape(-1, 2)
        import jax.numpy as jnp
        from pycamset_tpu.ops.distortion import distort_pixels
        d_got = np.array(distort_pixels(
            jnp.asarray(grid), jnp.asarray(want.intrinsic),
            jnp.asarray(np.reshape(got.distortion_coefs, -1))))
        d_want = np.array(distort_pixels(
            jnp.asarray(grid), jnp.asarray(want.intrinsic),
            jnp.asarray(want.distortion_coefs)))
        assert np.abs(d_got - d_want).max() < 0.5, name

    # relative extrinsics (world gauge differs; compare cam0-relative)
    def rel(cs, a, b):
        return cs[b].extrinsic @ np.linalg.inv(cs[a].extrinsic)

    for pair in [("cam0", "cam1"), ("cam0", "cam2")]:
        got_rel = rel(cams, *pair)
        want_rel = rel(gt_cams, *pair)
        assert np.abs(got_rel[:3, 3] - want_rel[:3, 3]).max() < 2e-3, pair
        cosang = (np.trace(got_rel[:3, :3] @ want_rel[:3, :3].T) - 1) / 2
        assert np.degrees(np.arccos(np.clip(cosang, -1, 1))) < 0.2, pair


if __name__ == "__main__":
    pytest.main([__file__, "-v", "-s"])


def make_gt_fisheye_cameras():
    """A three-camera rig of Kannala-Brandt fisheye lenses (4-wide dist)."""
    from pycamset_tpu.models.camera import Camera
    from pycamset_tpu.models.camera_set import CameraSet
    from pycamset_tpu.utils.general_utils import make_4x4h_tform
    rng = np.random.default_rng(1)
    cams = {}
    for i, ang in enumerate([-0.25, 0.0, 0.25]):
        k = np.array([[520.0 + 25 * i, 0, RES[0] / 2 + rng.normal() * 3],
                      [0, 515.0 + 25 * i, RES[1] / 2 + rng.normal() * 3],
                      [0, 0, 1.0]])
        dist = np.array([-0.04 + 0.01 * i, 0.015, -2e-3, 5e-4])
        ext = make_4x4h_tform(np.array([0.0, ang, 0.0]),
                              np.array([0.12 * (i - 1), 0.0, 0.45]))
        cams[f"cam{i}"] = Camera(extrinsic=ext, intrinsic=k, res=list(RES),
                                 distortion_coefs=dist, name=f"cam{i}")
    return CameraSet(camera_dict=cams)


@pytest.fixture(scope="module")
def rendered_fisheye_dataset(tmp_path_factory):
    from pycamset_tpu.models.charuco import ChArUco
    out = tmp_path_factory.mktemp("synth_fisheye_ims")
    target = ChArUco(10, 10, 25)
    cams = make_gt_fisheye_cameras()
    rng = np.random.default_rng(6)
    poses = []
    for _ in range(10):
        rvec = rng.normal(size=3) * 0.25
        tvec = np.array([-0.125, -0.1, 0.0]) \
            + rng.normal(size=3) * [0.04, 0.04, 0.05]
        poses.append(np.concatenate([rvec, tvec]))
    render_views(target, cams, poses, out)  # undistort_pixels dispatches
    return out, target, cams


def test_pipeline_recovers_fisheye_ground_truth(rendered_fisheye_dataset):
    """The FULL fisheye image pipeline: cv2 detection on rendered fisheye
    views -> cv2.fisheye.calibrate seeding -> undistort-then-solve PnP ->
    structured BA with the a=14 kernels -> ground-truth recovery."""
    import jax.numpy as jnp

    from pycamset_tpu import calibrate_cameras
    from pycamset_tpu.models.charuco import ChArUco
    from pycamset_tpu.ops.distortion import distort_pixels

    data_dir, target, gt_cams = rendered_fisheye_dataset
    cams = calibrate_cameras(
        f_loc=data_dir, calibration_target=ChArUco(10, 10, 25), save=False,
        problem_options={"outliers": "n", "camera_model": "fisheye"})

    err = np.mean(np.linalg.norm(
        cams.calibration_result.reshape(-1, 2), axis=1))
    assert err < 0.5, f"reprojection error too high: {err:.3f}"

    for name in gt_cams.get_names():
        got, want = cams[name], gt_cams[name]
        assert np.reshape(got.distortion_coefs, -1).size == 4, name
        assert abs(got.intrinsic[0, 0] - want.intrinsic[0, 0]) < 5.0, name
        # distortion FUNCTION agreement over the observed field
        grid = np.stack(np.meshgrid(
            np.linspace(RES[0] * 0.2, RES[0] * 0.8, 7),
            np.linspace(RES[1] * 0.2, RES[1] * 0.8, 7)), -1).reshape(-1, 2)
        d_got = np.array(distort_pixels(
            jnp.asarray(grid), jnp.asarray(want.intrinsic),
            jnp.asarray(np.reshape(got.distortion_coefs, -1))))
        d_want = np.array(distort_pixels(
            jnp.asarray(grid), jnp.asarray(want.intrinsic),
            jnp.asarray(want.distortion_coefs)))
        # worst case sits at the extreme grid corners (model extrapolation
        # against ~0.2 px detector noise); the interior agrees to <0.1 px
        assert np.abs(d_got - d_want).max() < 0.6, name
        assert np.abs(d_got - d_want).mean() < 0.12, name

    def rel(cs, a, b):
        return cs[b].extrinsic @ np.linalg.inv(cs[a].extrinsic)

    for pair in [("cam0", "cam1"), ("cam0", "cam2")]:
        got_rel = rel(cams, *pair)
        want_rel = rel(gt_cams, *pair)
        assert np.abs(got_rel[:3, 3] - want_rel[:3, 3]).max() < 2e-3, pair
        cosang = (np.trace(got_rel[:3, :3] @ want_rel[:3, :3].T) - 1) / 2
        assert np.degrees(np.arccos(np.clip(cosang, -1, 1))) < 0.2, pair


def make_gt_cube_ring():
    """Three cameras on a ring looking at a 60 mm cube at the origin."""
    from pycamset_tpu.models.camera import Camera
    from pycamset_tpu.models.camera_set import CameraSet
    from pycamset_tpu.utils.synthetic import look_at_extrinsic
    rng = np.random.default_rng(0)
    cams = {}
    for i in range(3):
        ang = 2 * np.pi * i / 3
        pos = np.array([0.3 * np.cos(ang), 0.3 * np.sin(ang), 0.18])
        k = np.array([[1100.0 + 40 * i, 0, RES[0] / 2 + rng.normal() * 3],
                      [0, 1095.0 + 40 * i, RES[1] / 2 + rng.normal() * 3],
                      [0, 0, 1.0]])
        dist = np.array([-0.1 + 0.02 * i, 0.02, 3e-4, -2e-4, 0.0])
        cams[f"cam{i}"] = Camera(
            extrinsic=look_at_extrinsic(pos, np.zeros(3)), intrinsic=k,
            res=list(RES), distortion_coefs=dist, name=f"cam{i}")
    return CameraSet(camera_dict=cams)


def test_pipeline_recovers_cube_ground_truth(tmp_path):
    """Gold-standard E2E for the 3D target family: rendered Ccube views
    (nearest-hit face occlusion, outward chirality) -> 6-detector cube
    detection -> PnP seeding -> structured BA -> ground-truth recovery.
    The reference validates Ccube only against real-dataset px thresholds
    (/root/reference/tests/test_full_calibrations.py); here the generating
    cameras are known exactly."""
    from pycamset_tpu import calibrate_cameras
    from pycamset_tpu.models.ccube import Ccube
    from pycamset_tpu.utils.render import render_target_views

    gt_cams = make_gt_cube_ring()
    cube = Ccube(n_points=6, length=60)
    rng = np.random.default_rng(0)
    poses = []
    for _ in range(14):
        # full-sphere rotations show every face; the translation spread
        # walks the cube around the shared view volume for extrinsic
        # leverage (it subtends only ~200 px per camera)
        rv = rng.normal(size=3)
        rv = rv / np.linalg.norm(rv) * rng.uniform(0, np.pi)
        poses.append(np.concatenate([rv, rng.normal(size=3) * 0.05]))
    render_target_views(gt_cams, cube, poses, out_dir=tmp_path)

    cams = calibrate_cameras(
        f_loc=tmp_path, calibration_target=Ccube(n_points=6, length=60),
        save=False, problem_options={"outliers": "n"})

    err = np.mean(np.linalg.norm(
        cams.calibration_result.reshape(-1, 2), axis=1))
    assert err < 0.35, f"reprojection error too high: {err:.3f}"

    for name in gt_cams.get_names():
        got, want = cams[name], gt_cams[name]
        assert abs(got.intrinsic[0, 0] - want.intrinsic[0, 0]) < 5.0, name
        assert abs(got.intrinsic[1, 1] - want.intrinsic[1, 1]) < 5.0, name

    def rel(cs, a, b):
        return cs[b].extrinsic @ np.linalg.inv(cs[a].extrinsic)

    # the cube subtends ~200 px: extrinsic leverage is weaker than the
    # full-frame planar board, hence the looser rotation bound
    for pair in [("cam0", "cam1"), ("cam0", "cam2")]:
        got_rel = rel(cams, *pair)
        want_rel = rel(gt_cams, *pair)
        assert np.abs(got_rel[:3, 3] - want_rel[:3, 3]).max() < 3e-3, pair
        cosang = (np.trace(got_rel[:3, :3] @ want_rel[:3, :3].T) - 1) / 2
        assert np.degrees(np.arccos(np.clip(cosang, -1, 1))) < 1.2, pair
