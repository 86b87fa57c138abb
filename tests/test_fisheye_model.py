"""Fisheye (Kannala-Brandt / cv2.fisheye) camera model.

Neither the reference nor its dead-code flags cover the fisheye family;
here it is a first-class camera model selected by
``options={"camera_model": "fisheye"}`` — 8-wide per-camera intrinsics
[fx,px,fy,py,k1,k2,k3,k4] with pixel radius f * theta_d,
theta_d = theta (1 + k1 th^2 + k2 th^4 + k3 th^6 + k4 th^8). A 4-wide
distortion vector marks the model throughout the host layers (seeding,
PnP, image undistortion, sensor maps).
"""
import numpy as np
import pytest

K4 = np.array([-0.05, 0.02, -0.004, 0.001])
KMAT = np.array([[600.0, 0, 640], [0, 610.0, 480], [0, 0, 1.0]])


def test_fisheye_projection_matches_cv2():
    import cv2
    import jax.numpy as jnp
    from pycamset_tpu.ops.projection import project_cam_points

    rng = np.random.default_rng(0)
    pts = rng.normal(size=(64, 3)) * 0.3 + [0, 0, 1.2]
    intr8 = np.concatenate([KMAT[[0, 0, 1, 1], [0, 2, 1, 2]], K4])
    ours = np.array(project_cam_points(jnp.asarray(intr8), jnp.asarray(pts)))
    ref, _ = cv2.fisheye.projectPoints(
        pts.reshape(-1, 1, 3), np.zeros(3), np.zeros(3), KMAT, K4)
    np.testing.assert_allclose(ours, ref.reshape(-1, 2), atol=1e-9)


def test_fisheye_undistort_roundtrip_and_on_axis_jac():
    import jax
    import jax.numpy as jnp
    from pycamset_tpu.ops.distortion import (
        distort_normalized, undistort_normalized)

    rng = np.random.default_rng(1)
    xy = jnp.asarray(rng.uniform(-0.5, 0.5, size=(128, 2)))
    xy_d = distort_normalized(xy, jnp.asarray(K4))
    back = undistort_normalized(xy_d, jnp.asarray(K4), iters=20)
    np.testing.assert_allclose(np.array(back), np.array(xy), atol=1e-10)

    # the smoothed radius keeps jacfwd finite through the on-axis point
    jac = jax.jacfwd(distort_normalized)(jnp.zeros(2), jnp.asarray(K4))
    assert np.isfinite(np.array(jac)).all()


def test_fisheye_block_jacobian_matches_fd():
    import jax
    import jax.numpy as jnp
    from pycamset_tpu.optim.blocks import ProjectionFisheye

    blk = ProjectionFisheye()
    assert blk.params.n == 8
    p = jnp.asarray(np.concatenate([[600.0, 640, 610.0, 480], K4]))
    x = jnp.asarray([0.4, -0.3, 1.1])
    jac = np.array(jax.jacfwd(blk.compute, argnums=0)(p, x))
    for j in range(8):
        dp = np.zeros(8)
        dp[j] = 1e-6
        num = (np.array(blk.compute(p + dp, x))
               - np.array(blk.compute(p - dp, x))) / 2e-6
        np.testing.assert_allclose(jac[:, j], num, atol=1e-3, rtol=1e-3)


def _fisheye_handler(noise=0.1, seed=9):
    from pycamset_tpu.models.camera_set import CameraSet, make_cam_dict
    from pycamset_tpu.models.detections import TargetDetection
    from pycamset_tpu.optim.handlers import (
        FreePointTarget, TemplateBundleHandler)
    from pycamset_tpu.utils.general_utils import make_4x4h_tform
    from pycamset_tpu.utils.synthetic import make_synthetic_rig

    rig = make_synthetic_rig(n_cams=3, n_ims=10, grid=7, visibility=0.95,
                             noise_px=noise, seed=seed,
                             camera_model="fisheye")
    k_mats, exts, dists = [], [], []
    for c in range(3):
        i8 = rig["intr"][c]
        k_mats.append(np.array([[i8[0], 0, i8[1]], [0, i8[2], i8[3]],
                                [0, 0, 1]]))
        dists.append(i8[4:])  # 4-wide: the fisheye marker
        exts.append(make_4x4h_tform(rig["extr"][c][:3], rig["extr"][c][3:]))
    cams = CameraSet(camera_dict=make_cam_dict(
        ["a", "b", "c"], exts, k_mats, dists, [[1600, 1200]] * 3))
    handler = TemplateBundleHandler(
        cams, FreePointTarget(rig["template"].reshape(1, -1, 3)),
        TargetDetection(cam_names=["a", "b", "c"], data=rig["dd"]),
        options={"outliers": "n", "camera_model": "fisheye"})
    return handler, rig


def test_handler_fisheye_layout():
    from pycamset_tpu.optim.blocks import ProjectionFisheye
    handler, rig = _fisheye_handler()
    prim = handler.bundlePrimitive
    assert prim.intr.shape == (3, 8)
    assert isinstance(handler.op_fun.blocks[0], ProjectionFisheye)
    x0 = handler.get_initial_params()
    assert x0.size == 3 * 8 + 3 * 6 + (rig["n_ims"] - 1) * 6


def test_fisheye_bundle_adjustment_recovers_model():
    import jax.numpy as jnp
    from pycamset_tpu.ops.distortion import distort_normalized
    from pycamset_tpu.optim.driver import run_bundle_adjustment

    handler, rig = _fisheye_handler()
    res, cams = run_bundle_adjustment(handler, backend="structured")
    rms = np.sqrt(np.mean(res["fun"] ** 2))
    assert rms < 2.0 * rig["noise_px"], rms

    # the recovered distortion FUNCTION matches truth over the observed
    # field of each camera (sub-pixel; coefficients are correlated)
    dd = rig["dd"]
    for c, name in enumerate(["a", "b", "c"]):
        true_i = rig["intr"][c]
        got_d = np.reshape(cams[name].distortion_coefs, -1)
        assert got_d.size == 4
        grid = np.stack([(dd[dd[:, 0] == c, 3] - true_i[1]) / true_i[0],
                         (dd[dd[:, 0] == c, 4] - true_i[3]) / true_i[2]],
                        axis=-1)
        err_n = np.array(distort_normalized(jnp.asarray(grid),
                                            jnp.asarray(got_d))) \
            - np.array(distort_normalized(jnp.asarray(grid),
                                          jnp.asarray(true_i[4:])))
        assert np.max(np.abs(err_n) * true_i[0]) < 0.5, name


def test_fisheye_seeding_via_cv2_fisheye_calibrate():
    """initial_calibration(camera_model='fisheye') seeds K and a 4-wide
    distortion vector from cv2.fisheye.calibrate."""
    from pycamset_tpu.models.detections import TargetDetection
    from pycamset_tpu.optim.handlers import FreePointTarget
    from pycamset_tpu.utils.synthetic import make_synthetic_rig

    rig = make_synthetic_rig(n_cams=1, n_ims=12, grid=7, visibility=1.0,
                             noise_px=0.05, seed=3, camera_model="fisheye",
                             pose_scale=(0.25, 0.1))
    target = FreePointTarget(rig["template"].reshape(1, -1, 3))
    det = TargetDetection(cam_names=["a"], data=rig["dd"])
    cam = target.initial_calibration("a", det, [1600, 1200], pose_im=0,
                                     camera_model="fisheye")
    d = np.reshape(cam.distortion_coefs, -1)
    assert d.size == 4
    true_i = rig["intr"][0]
    assert abs(cam.intrinsic[0, 0] - true_i[0]) / true_i[0] < 0.05
    assert abs(cam.intrinsic[1, 1] - true_i[2]) / true_i[2] < 0.05


def test_fisheye_camera_object_roundtrip():
    """Camera.project_points / undistort_points route through the fisheye
    kernels when the distortion vector is 4 wide."""
    import cv2
    from pycamset_tpu.models.camera import Camera

    cam = Camera(intrinsic=KMAT, distortion_coefs=K4, res=[1280, 960],
                 name="f")
    rng = np.random.default_rng(4)
    pts = rng.normal(size=(32, 3)) * 0.3 + [0, 0, 1.5]
    uv = cam.project_points(pts)
    ref, _ = cv2.fisheye.projectPoints(
        pts.reshape(-1, 1, 3), np.zeros(3), np.zeros(3), KMAT, K4)
    np.testing.assert_allclose(uv, ref.reshape(-1, 2), atol=1e-8)

    undone = cam.undistort_points(uv, iters=20)
    pinhole = (pts[:, :2] / pts[:, 2:3]) * np.diag(KMAT)[:2] + KMAT[:2, 2]
    np.testing.assert_allclose(undone, pinhole, atol=1e-6)


def test_fisheye_camset_persistence_roundtrip(tmp_path):
    """.camset save/load keeps the 4-wide fisheye distortion marker."""
    from pycamset_tpu.models.camera import Camera
    from pycamset_tpu.models.camera_set import CameraSet
    from pycamset_tpu.utils.saving import load_CameraSet

    cams = CameraSet(camera_dict={
        "f0": Camera(intrinsic=KMAT, distortion_coefs=K4,
                     res=[1280, 960], name="f0")})
    f = tmp_path / "fisheye.camset"
    cams.save(f)
    back = load_CameraSet(f)
    got = np.reshape(back["f0"].distortion_coefs, -1)
    assert got.size == 4
    np.testing.assert_allclose(got, K4)
    assert back == cams


def test_fisheye_analytic_chain_matches_jacfwd():
    """The registered closed form for the fisheye template chain matches
    the jacfwd oracle (same pattern as tests/test_analytic.py)."""
    import jax
    import jax.numpy as jnp
    from pycamset_tpu.optim.analytic import analytic_block_rj_for_chain
    from pycamset_tpu.optim.blocks import (
        Extrinsic3D, ProjectionFisheye, TemplatePoints)
    from pycamset_tpu.optim.chain import OptimFunction

    op_fun = OptimFunction([ProjectionFisheye(), Extrinsic3D(),
                            TemplatePoints()])
    rj = analytic_block_rj_for_chain(op_fun)
    assert rj is not None, "fisheye chain missing from the analytic registry"

    rng = np.random.default_rng(2)
    cam = jnp.asarray(np.concatenate(
        [[600.0, 640, 610.0, 480], K4, [0.02, -0.03, 0.01, 0.05, 0.02, 1.1]]))
    pose = jnp.asarray([0.1, -0.05, 0.2, 0.01, 0.02, 0.3])
    tpl = jnp.asarray(rng.normal(size=(24, 3)) * 0.1)
    uv = jnp.asarray(rng.normal(size=(24, 2)) * 100 + 500)

    r, jc, ji, jk = rj(cam, pose, jnp.zeros((24, 0)), tpl, uv)

    point_fn = op_fun.make_point_fn()

    def slot(cam_p, pose_p, t, u):
        return point_fn(jnp.concatenate([cam_p, pose_p]), t) - u

    r_ref = jax.vmap(slot, in_axes=(None, None, 0, 0))(cam, pose, tpl, uv)
    jc_ref, ji_ref = jax.vmap(
        jax.jacfwd(slot, argnums=(0, 1)), in_axes=(None, None, 0, 0))(
            cam, pose, tpl, uv)
    np.testing.assert_allclose(np.array(r), np.array(r_ref), atol=1e-9)
    np.testing.assert_allclose(np.array(jc), np.array(jc_ref), atol=1e-7)
    np.testing.assert_allclose(np.array(ji), np.array(ji_ref), atol=1e-7)
    assert jk.shape[-1] == 0
def test_fisheye_target_tracking():
    """TargetTracker projects through the fisheye model when the rig's
    distortion vectors are 4 wide."""
    from pycamset_tpu.models.camera_set import CameraSet, make_cam_dict
    from pycamset_tpu.models.detections import TargetDetection
    from pycamset_tpu.optim.handlers import FreePointTarget
    from pycamset_tpu.tracking import TargetTracker
    from pycamset_tpu.utils.general_utils import make_4x4h_tform
    from pycamset_tpu.utils.synthetic import make_synthetic_rig

    rig = make_synthetic_rig(n_cams=3, n_ims=6, grid=6, visibility=0.9,
                             noise_px=0.2, seed=12, camera_model="fisheye")
    k_mats, exts, dists = [], [], []
    for c in range(3):
        i8 = rig["intr"][c]
        k_mats.append(np.array([[i8[0], 0, i8[1]], [0, i8[2], i8[3]],
                                [0, 0, 1]]))
        dists.append(i8[4:])
        exts.append(make_4x4h_tform(rig["extr"][c][:3], rig["extr"][c][3:]))
    cams = CameraSet(camera_dict=make_cam_dict(
        [f"c{i}" for i in range(3)], exts, k_mats, dists, [[1600, 1200]] * 3))
    det = TargetDetection(cam_names=[f"c{i}" for i in range(3)],
                          data=rig["dd"])
    tracker = TargetTracker(cams, FreePointTarget(
        rig["template"].reshape(1, -1, 3)))
    poses, info = tracker.track_batch(det)
    assert float(np.max(info["rms"])) < 0.4
    for i in range(6):
        want = make_4x4h_tform(rig["poses"][i][:3], rig["poses"][i][3:])
        # the short fisheye focal (~600 px) halves angular resolution
        # vs the Brown fixtures; tolerance scales accordingly
        np.testing.assert_allclose(poses[i], want, atol=6e-3)
def test_fisheye_rectification_path(tmp_path):
    """The stereo-rectification pipeline accepts fisheye cameras: the
    pre-undistortion routes through cv2.fisheye, and a rendered dot lands
    at its pinhole position after undistort_im."""
    import cv2
    from pycamset_tpu.models.camera import Camera
    from pycamset_tpu.reconstruction.reconstruction_utils import (
        rectify_camera_images, undistort_im)
    from pycamset_tpu.utils.general_utils import make_4x4h_tform

    cam0 = Camera(intrinsic=KMAT, distortion_coefs=K4, res=[1280, 960],
                  name="L")
    cam1 = Camera(extrinsic=make_4x4h_tform(np.zeros(3), [0.1, 0, 0]),
                  intrinsic=KMAT, distortion_coefs=K4, res=[1280, 960],
                  name="R")

    # render one dot at the fisheye projection of a world point
    world_pt = np.array([[0.35, 0.22, 1.3]])
    im = np.zeros((960, 1280), np.uint8)
    uv_fish = cam0.project_points(world_pt)[0]
    cv2.circle(im, tuple(np.round(uv_fish).astype(int)), 4, 255, -1)

    und = undistort_im(im, cam0)
    pin = (world_pt[0, :2] / world_pt[0, 2]) * np.diag(KMAT)[:2] + KMAT[:2, 2]
    ys, xs = np.nonzero(und > 64)
    centroid = np.array([xs.mean(), ys.mean()])
    np.testing.assert_allclose(centroid, pin, atol=1.5)

    r0, r1, q = rectify_camera_images(cam0, cam1, im, im.copy())
    assert r0.shape == im.shape and np.isfinite(q).all()
def test_fisheye_marker_semantics():
    """The width-4 marker's edge semantics (review findings): zero-k
    fisheye is EQUIDISTANT (never pinhole), distort=False triangulation is
    a true identity, mixed-family rigs raise loudly, and raw-fisheye
    rectification on the distortion-aware path refuses."""
    import pytest
    from pycamset_tpu.models.camera import Camera
    from pycamset_tpu.optim.handlers import infer_shared_n_dist
    from pycamset_tpu.reconstruction.reconstruction_utils import (
        rectify_camera_pair)
    from pycamset_tpu.utils.general_utils import make_4x4h_tform

    # zero-k fisheye projects equidistant, not pinhole
    cam = Camera(intrinsic=KMAT, distortion_coefs=np.zeros(4),
                 res=[1280, 960])
    pt = np.array([[0.6, 0.0, 1.0]])
    uv = cam.project_points(pt)[0]
    pinhole_u = 0.6 * KMAT[0, 0] + KMAT[0, 2]
    equi_u = np.arctan(0.6) * KMAT[0, 0] + KMAT[0, 2]
    assert abs(uv[0] - equi_u) < 1e-6
    assert abs(uv[0] - pinhole_u) > 20  # clearly not pinhole

    # family width inference: pure rigs resolve, mixed rigs raise
    assert infer_shared_n_dist([np.zeros(4), np.zeros(4)]) == 4
    assert infer_shared_n_dist([np.zeros(5), np.zeros(8)]) == 8
    with pytest.raises(ValueError, match="mixes fisheye"):
        infer_shared_n_dist([np.zeros(4), np.zeros(5)])

    # raw fisheye images cannot take the distortion-aware rectify path
    cam2 = Camera(extrinsic=make_4x4h_tform(np.zeros(3), [0.1, 0, 0]),
                  intrinsic=KMAT, distortion_coefs=K4, res=[1280, 960])
    with pytest.raises(ValueError, match="pre-undistorted"):
        rectify_camera_pair(cam, cam2, zero_flag=False)


def test_fisheye_triangulation_identity_when_undistorted():
    """multi_cam_triangulate(distort=False) on a fisheye rig must use the
    pinhole identity, not the equidistant warp (review finding)."""
    from pycamset_tpu.models.camera_set import CameraSet, make_cam_dict
    from pycamset_tpu.utils.general_utils import make_4x4h_tform

    exts = [np.eye(4), make_4x4h_tform(np.zeros(3), [0.2, 0, 0])]
    cams = CameraSet(camera_dict=make_cam_dict(
        ["L", "R"], exts, [KMAT.copy(), KMAT.copy()],
        [K4.copy(), K4.copy()], [[1280, 960]] * 2))
    world = np.array([[0.2, -0.1, 1.4], [-0.3, 0.2, 1.1]])

    # feed PINHOLE (already-undistorted) observations
    rows = []
    for ci, cam in enumerate(cams):
        xc = world @ cam.extrinsic[:3, :3].T + cam.extrinsic[:3, 3]
        uv = (xc[:, :2] / xc[:, 2:3]) * np.diag(KMAT)[:2] + KMAT[:2, 2]
        for k in range(len(world)):
            rows.append([ci, 0, k, uv[k, 0], uv[k, 1]])
    got = cams.multi_cam_triangulate(np.array(rows, dtype=float),
                                     distort=False)
    np.testing.assert_allclose(got, world, atol=1e-8)


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
