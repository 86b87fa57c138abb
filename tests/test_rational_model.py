"""Rational (8-coefficient, cv2.CALIB_RATIONAL_MODEL) camera model.

The reference only carries the rational-model flag as commented-out dead code
in its initial_calibration; here it is a first-class camera model selected by
``options={"camera_model": "rational"}`` — 12-wide per-camera intrinsics
[fx,px,fy,py,k1,k2,p1,p2,k3,k4,k5,k6] with
radial = (1 + k1 r2 + k2 r4 + k3 r6) / (1 + k4 r2 + k5 r4 + k6 r6).
"""
import numpy as np
import pytest

RAT = np.array([-0.21, 0.05, 3e-4, -2e-4, 0.004, -0.08, 0.015, -0.002])


def test_rational_distort_matches_cv2():
    import cv2
    import jax.numpy as jnp
    from pycamset_tpu.ops.projection import project_cam_points

    rng = np.random.default_rng(3)
    pts = rng.normal(size=(64, 3)) * 0.2 + [0, 0, 1.5]
    k = np.array([[1500.0, 0, 800], [0, 1520.0, 600], [0, 0, 1]])
    intr12 = np.concatenate([[k[0, 0], k[0, 2], k[1, 1], k[1, 2]], RAT])

    ours = np.array(project_cam_points(jnp.asarray(intr12), jnp.asarray(pts)))
    ref, _ = cv2.projectPoints(pts, np.zeros(3), np.zeros(3), k, RAT)
    np.testing.assert_allclose(ours, ref.reshape(-1, 2), atol=1e-6)


def test_rational_undistort_roundtrip():
    import jax.numpy as jnp
    from pycamset_tpu.ops.distortion import (
        distort_normalized, undistort_normalized)

    rng = np.random.default_rng(0)
    xy = jnp.asarray(rng.uniform(-0.3, 0.3, size=(128, 2)))
    xy_d = distort_normalized(xy, jnp.asarray(RAT))
    back = undistort_normalized(xy_d, jnp.asarray(RAT), iters=20)
    np.testing.assert_allclose(np.array(back), np.array(xy), atol=1e-8)


def test_rational_block_jacobian_matches_fd():
    import jax
    import jax.numpy as jnp
    from pycamset_tpu.optim.blocks import ProjectionRational

    blk = ProjectionRational()
    assert blk.params.n == 12
    p = jnp.asarray(np.concatenate([[1500.0, 800, 1510.0, 600], RAT]))
    x = jnp.asarray([0.2, -0.1, 1.4])
    jac = np.array(jax.jacfwd(blk.compute, argnums=0)(p, x))
    eps = 1e-6
    for j in range(12):
        dp = np.zeros(12)
        dp[j] = eps
        num = (np.array(blk.compute(p + dp, x))
               - np.array(blk.compute(p - dp, x))) / (2 * eps)
        np.testing.assert_allclose(jac[:, j], num, atol=1e-3, rtol=1e-3)


def _make_rational_handler(noise=0.05, seed=7, seed_truncated=True):
    from pycamset_tpu.models.camera_set import CameraSet, make_cam_dict
    from pycamset_tpu.models.detections import TargetDetection
    from pycamset_tpu.optim.handlers import (
        FreePointTarget, TemplateBundleHandler)
    from pycamset_tpu.utils.general_utils import make_4x4h_tform
    from pycamset_tpu.utils.synthetic import make_synthetic_rig

    # low noise / many views: the rational tail (k4..k6) is statistically
    # loose at realistic noise; this test checks the machinery, and the
    # max-error criterion over the field needs the tail pinned
    rig = make_synthetic_rig(n_cams=3, n_ims=12, grid=7, visibility=0.95,
                             noise_px=noise, seed=seed,
                             camera_model="rational")
    k_mats, exts, dists = [], [], []
    for c in range(3):
        i12 = rig["intr"][c]
        k_mats.append(np.array([[i12[0], 0, i12[1]],
                                [0, i12[2], i12[3]], [0, 0, 1]]))
        # a realistic seed: the 5-coefficient truncation (as if upgraded
        # from a standard calibration); the BA must recover k4..k6
        dists.append(i12[4:9] if seed_truncated else i12[4:])
        exts.append(make_4x4h_tform(rig["extr"][c][:3], rig["extr"][c][3:]))
    cams = CameraSet(camera_dict=make_cam_dict(
        ["a", "b", "c"], exts, k_mats, dists, [[1600, 1200]] * 3))
    target = FreePointTarget(rig["template"].reshape(1, -1, 3))
    det = TargetDetection(cam_names=["a", "b", "c"], data=rig["dd"])
    handler = TemplateBundleHandler(
        cams, target, det,
        options={"outliers": "n", "camera_model": "rational"})
    return handler, rig


def test_handler_rational_layout():
    from pycamset_tpu.optim.blocks import ProjectionRational
    handler, rig = _make_rational_handler()
    prim = handler.bundlePrimitive
    assert prim.intr.shape == (3, 12)
    assert prim.intr_width == 12
    assert isinstance(handler.op_fun.blocks[0], ProjectionRational)
    # seed packs the truncated dist padded with zeros
    x0 = handler.get_initial_params()
    n_free_poses = rig["n_ims"] - 1  # fixed_pose=0 pins the gauge
    assert x0.size == 3 * 12 + 3 * 6 + n_free_poses * 6


def test_rational_bundle_adjustment_recovers_model():
    import jax.numpy as jnp
    from pycamset_tpu.ops.distortion import distort_normalized
    from pycamset_tpu.optim.driver import run_bundle_adjustment

    handler, rig = _make_rational_handler()
    res, cams = run_bundle_adjustment(handler, backend="structured")
    rms = np.sqrt(np.mean(res["fun"] ** 2))
    assert rms < 2.0 * rig["noise_px"], rms

    # the recovered distortion FUNCTION must match truth over each camera's
    # OBSERVED field (individual coefficients of a rational are not
    # separately observable, and neither is the function beyond the data)
    dd = rig["dd"]
    for c, name in enumerate(["a", "b", "c"]):
        true_i = rig["intr"][c]
        got_d = np.reshape(cams[name].distortion_coefs, -1)
        assert got_d.size == 8
        f = np.array([true_i[0], true_i[2]])
        m = dd[:, 0] == c
        # evaluate both functions at the observed normalized coordinates —
        # inside the data there is signal; outside it is extrapolation
        grid = np.stack([(dd[m, 3] - true_i[1]) / true_i[0],
                         (dd[m, 4] - true_i[3]) / true_i[2]], axis=-1)
        err_n = np.array(distort_normalized(jnp.asarray(grid),
                                            jnp.asarray(got_d))) \
            - np.array(distort_normalized(jnp.asarray(grid),
                                          jnp.asarray(true_i[4:])))
        assert np.max(np.abs(err_n * f)) < 0.5, name  # < 0.5 px over field


def test_rational_self_calibration_end_to_end():
    """Self-cal (free geometry + gauge transform) composes with the
    rational model: 12-wide intrinsics + per-point params solve and the
    similarity re-alignment recovers the reference geometry."""
    import numpy as np
    from pycamset_tpu.models.camera_set import CameraSet, make_cam_dict
    from pycamset_tpu.models.detections import TargetDetection
    from pycamset_tpu.optim.driver import run_bundle_adjustment
    from pycamset_tpu.optim.handlers import (
        FreePointTarget, SelfBundleHandler)
    from pycamset_tpu.utils.general_utils import make_4x4h_tform
    from pycamset_tpu.utils.synthetic import make_synthetic_rig

    rig = make_synthetic_rig(n_cams=3, n_ims=8, grid=5, visibility=0.95,
                             noise_px=0.1, seed=5, camera_model="rational")
    k_mats, exts, dists = [], [], []
    for c in range(3):
        i = rig["intr"][c]
        k_mats.append(np.array([[i[0], 0, i[1]], [0, i[2], i[3]],
                                [0, 0, 1]]))
        dists.append(i[4:])
        exts.append(make_4x4h_tform(rig["extr"][c][:3], rig["extr"][c][3:]))
    cams = CameraSet(camera_dict=make_cam_dict(
        ["a", "b", "c"], exts, k_mats, dists, [[1600, 1200]] * 3))
    h = SelfBundleHandler(
        cams, FreePointTarget(rig["template"].reshape(1, -1, 3)),
        TargetDetection(cam_names=["a", "b", "c"], data=rig["dd"]),
        options={"outliers": "n", "camera_model": "rational"})
    res, out = run_bundle_adjustment(h)
    assert np.sqrt(np.mean(res["fun"] ** 2)) < 0.15
    pts = h.get_updated_target(res["x"])
    assert np.abs(pts - rig["template"]).max() < 5e-4  # metres
    assert np.reshape(out["a"].distortion_coefs, -1).size == 8


def test_standard_model_layout_unchanged():
    from pycamset_tpu.optim.blocks import Projection, ProjectionRational
    from tests.test_scipy_parity import _make_handler
    handler, _ = _make_handler()
    assert handler.bundlePrimitive.intr.shape[1] == 9
    blk = handler.op_fun.blocks[0]
    assert isinstance(blk, Projection) and not isinstance(
        blk, ProjectionRational)


def test_unknown_camera_model_raises():
    from tests.test_scipy_parity import _make_handler
    with pytest.raises(ValueError, match="camera_model"):
        from pycamset_tpu.models.camera_set import CameraSet
        from pycamset_tpu.optim.handlers import TemplateBundleHandler
        h, _ = _make_handler()
        TemplateBundleHandler(h.camset, h.target, h.detection,
                              options={"camera_model": "omnidirectional"})


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
