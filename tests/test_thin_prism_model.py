"""Thin-prism (12-coefficient) camera model.

camera_model="thin_prism" = OpenCV CALIB_RATIONAL_MODEL |
CALIB_THIN_PRISM_MODEL: dist = [k1,k2,p1,p2,k3,k4,k5,k6,s1,s2,s3,s4],
16-wide per-camera intrinsics. Built on the same width-generic plumbing
as the rational model (tests/test_rational_model.py).
"""
import numpy as np
import pytest

TP = np.array([-0.21, 0.05, 3e-4, -2e-4, 0.004, -0.08, 0.015, -0.002,
               1.5e-3, -8e-4, -1.2e-3, 6e-4])


def test_thin_prism_distort_matches_cv2():
    import cv2
    import jax.numpy as jnp
    from pycamset_tpu.ops.projection import project_cam_points

    rng = np.random.default_rng(5)
    pts = rng.normal(size=(64, 3)) * 0.2 + [0, 0, 1.5]
    k = np.array([[1500.0, 0, 800], [0, 1520.0, 600], [0, 0, 1]])
    intr16 = np.concatenate([[k[0, 0], k[0, 2], k[1, 1], k[1, 2]], TP])

    ours = np.array(project_cam_points(jnp.asarray(intr16), jnp.asarray(pts)))
    ref, _ = cv2.projectPoints(pts, np.zeros(3), np.zeros(3), k, TP)
    np.testing.assert_allclose(ours, ref.reshape(-1, 2), atol=1e-6)


def test_thin_prism_undistort_roundtrip():
    import jax.numpy as jnp
    from pycamset_tpu.ops.distortion import (
        distort_normalized, undistort_normalized)

    rng = np.random.default_rng(1)
    xy = jnp.asarray(rng.uniform(-0.3, 0.3, size=(128, 2)))
    xy_d = distort_normalized(xy, jnp.asarray(TP))
    back = undistort_normalized(xy_d, jnp.asarray(TP), iters=20)
    np.testing.assert_allclose(np.array(back), np.array(xy), atol=1e-8)


def test_host_distort_points_matches_device():
    import jax.numpy as jnp
    from pycamset_tpu.ops.distortion import distort_pixels
    from pycamset_tpu.utils.general_utils import distort_points

    rng = np.random.default_rng(2)
    uv = rng.uniform([300, 300], [1300, 900], size=(32, 2))
    k = np.array([[1500.0, 0, 800], [0, 1520.0, 600], [0, 0, 1]])
    host = np.array([distort_points(p, k, TP) for p in uv])  # per-point API
    dev = np.array(distort_pixels(jnp.asarray(uv), jnp.asarray(k),
                                  jnp.asarray(TP)))
    np.testing.assert_allclose(host, dev, atol=1e-9)


def test_thin_prism_bundle_adjustment_end_to_end():
    from pycamset_tpu.models.camera_set import CameraSet, make_cam_dict
    from pycamset_tpu.models.detections import TargetDetection
    from pycamset_tpu.optim.blocks import ProjectionThinPrism
    from pycamset_tpu.optim.driver import run_bundle_adjustment
    from pycamset_tpu.optim.handlers import (
        FreePointTarget, TemplateBundleHandler)
    from pycamset_tpu.utils.general_utils import make_4x4h_tform
    from pycamset_tpu.utils.synthetic import make_synthetic_rig

    rig = make_synthetic_rig(n_cams=3, n_ims=12, grid=7, visibility=0.95,
                             noise_px=0.05, seed=11,
                             camera_model="thin_prism")
    k_mats, exts, dists = [], [], []
    for c in range(3):
        i16 = rig["intr"][c]
        k_mats.append(np.array([[i16[0], 0, i16[1]],
                                [0, i16[2], i16[3]], [0, 0, 1]]))
        dists.append(i16[4:9])  # truncated seed; BA recovers the tail
        exts.append(make_4x4h_tform(rig["extr"][c][:3], rig["extr"][c][3:]))
    cams = CameraSet(camera_dict=make_cam_dict(
        ["a", "b", "c"], exts, k_mats, dists, [[1600, 1200]] * 3))
    target = FreePointTarget(rig["template"].reshape(1, -1, 3))
    det = TargetDetection(cam_names=["a", "b", "c"], data=rig["dd"])
    handler = TemplateBundleHandler(
        cams, target, det,
        options={"outliers": "n", "camera_model": "thin_prism"})
    assert handler.bundlePrimitive.intr.shape == (3, 16)
    assert isinstance(handler.op_fun.blocks[0], ProjectionThinPrism)

    res, out = run_bundle_adjustment(handler, backend="structured")
    rms = np.sqrt(np.mean(res["fun"] ** 2))
    assert rms < 2.0 * rig["noise_px"], rms
    assert np.reshape(out["a"].distortion_coefs, -1).size == 12


def test_fixed_camera_handler_autodetects_thin_prism():
    from pycamset_tpu.models.camera_set import CameraSet, make_cam_dict
    from pycamset_tpu.models.detections import TargetDetection
    from pycamset_tpu.optim.find_target import FixedCameraPoseHandler
    from pycamset_tpu.optim.handlers import FreePointTarget
    from pycamset_tpu.utils.general_utils import make_4x4h_tform
    from pycamset_tpu.utils.synthetic import make_synthetic_rig

    rig = make_synthetic_rig(n_cams=2, n_ims=2, grid=4, visibility=1.0,
                             noise_px=0.0, seed=3, camera_model="thin_prism")
    k_mats, exts, dists = [], [], []
    for c in range(2):
        i = rig["intr"][c]
        k_mats.append(np.array([[i[0], 0, i[1]], [0, i[2], i[3]], [0, 0, 1]]))
        dists.append(i[4:])  # 12 coefficients
        exts.append(make_4x4h_tform(rig["extr"][c][:3], rig["extr"][c][3:]))
    cams = CameraSet(camera_dict=make_cam_dict(
        ["a", "b"], exts, k_mats, dists, [[1600, 1200]] * 2))
    target = FreePointTarget(rig["template"].reshape(1, -1, 3))
    det = TargetDetection(cam_names=["a", "b"], data=rig["dd"])
    fh = FixedCameraPoseHandler(cams, target, det, options={"outliers": "n"})
    # a 12-coef rig must NOT be truncated to the 8-coef rational model
    assert fh.camera_model == "thin_prism"
    assert fh.bundlePrimitive.intr.shape[1] == 16


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
