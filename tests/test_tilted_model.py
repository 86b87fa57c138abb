"""Tilted / Scheimpflug (14-coefficient, CALIB_TILTED_MODEL) camera model.

camera_model="tilted" = the full OpenCV distortion family:
dist = [k1,k2,p1,p2,k3,k4,k5,k6,s1,s2,s3,s4,taux,tauy], 18-wide per-camera
intrinsics. The sensor-tilt step is a 3x3 homography after the Brown/
rational/prism terms (cv2's computeTiltProjectionMatrix).
"""
import numpy as np
import pytest

TILT = np.array([-0.21, 0.05, 3e-4, -2e-4, 0.004, -0.08, 0.015, -0.002,
                 1.5e-3, -8e-4, -1.2e-3, 6e-4, 0.012, -0.008])


def test_tilted_distort_matches_cv2():
    import cv2
    import jax.numpy as jnp
    from pycamset_tpu.ops.projection import project_cam_points

    rng = np.random.default_rng(9)
    pts = rng.normal(size=(64, 3)) * 0.2 + [0, 0, 1.5]
    k = np.array([[1500.0, 0, 800], [0, 1520.0, 600], [0, 0, 1]])
    intr20 = np.concatenate([[k[0, 0], k[0, 2], k[1, 1], k[1, 2]], TILT])

    ours = np.array(project_cam_points(jnp.asarray(intr20), jnp.asarray(pts)))
    ref, _ = cv2.projectPoints(pts, np.zeros(3), np.zeros(3), k, TILT)
    np.testing.assert_allclose(ours, ref.reshape(-1, 2), atol=1e-6)


def test_tilted_undistort_roundtrip():
    import jax.numpy as jnp
    from pycamset_tpu.ops.distortion import (
        distort_normalized, undistort_normalized)

    rng = np.random.default_rng(2)
    xy = jnp.asarray(rng.uniform(-0.3, 0.3, size=(128, 2)))
    xy_d = distort_normalized(xy, jnp.asarray(TILT))
    back = undistort_normalized(xy_d, jnp.asarray(TILT), iters=25)
    np.testing.assert_allclose(np.array(back), np.array(xy), atol=1e-7)


def test_tilted_bundle_adjustment_end_to_end():
    from pycamset_tpu.models.camera_set import CameraSet, make_cam_dict
    from pycamset_tpu.models.detections import TargetDetection
    from pycamset_tpu.optim.blocks import ProjectionTilted
    from pycamset_tpu.optim.driver import run_bundle_adjustment
    from pycamset_tpu.optim.handlers import (
        FreePointTarget, TemplateBundleHandler)
    from pycamset_tpu.utils.general_utils import make_4x4h_tform
    from pycamset_tpu.utils.synthetic import make_synthetic_rig

    rig = make_synthetic_rig(n_cams=3, n_ims=12, grid=7, visibility=0.95,
                             noise_px=0.05, seed=17, camera_model="tilted")
    k_mats, exts, dists = [], [], []
    for c in range(3):
        i20 = rig["intr"][c]
        k_mats.append(np.array([[i20[0], 0, i20[1]],
                                [0, i20[2], i20[3]], [0, 0, 1]]))
        dists.append(i20[4:9])  # truncated seed; the BA recovers the tail
        exts.append(make_4x4h_tform(rig["extr"][c][:3], rig["extr"][c][3:]))
    cams = CameraSet(camera_dict=make_cam_dict(
        ["a", "b", "c"], exts, k_mats, dists, [[1600, 1200]] * 3))
    target = FreePointTarget(rig["template"].reshape(1, -1, 3))
    det = TargetDetection(cam_names=["a", "b", "c"], data=rig["dd"])
    handler = TemplateBundleHandler(
        cams, target, det,
        options={"outliers": "n", "camera_model": "tilted"})
    assert handler.bundlePrimitive.intr.shape == (3, 18)
    assert isinstance(handler.op_fun.blocks[0], ProjectionTilted)

    res, out = run_bundle_adjustment(handler, backend="structured")
    rms = np.sqrt(np.mean(res["fun"] ** 2))
    assert rms < 2.0 * rig["noise_px"], rms
    assert np.reshape(out["a"].distortion_coefs, -1).size == 14


def test_fixed_camera_autodetects_tilted():
    from pycamset_tpu.models.camera_set import CameraSet, make_cam_dict
    from pycamset_tpu.models.detections import TargetDetection
    from pycamset_tpu.optim.find_target import FixedCameraPoseHandler
    from pycamset_tpu.optim.handlers import FreePointTarget
    from pycamset_tpu.utils.general_utils import make_4x4h_tform
    from pycamset_tpu.utils.synthetic import make_synthetic_rig

    rig = make_synthetic_rig(n_cams=2, n_ims=2, grid=4, visibility=1.0,
                             noise_px=0.0, seed=4, camera_model="tilted")
    k_mats, exts, dists = [], [], []
    for c in range(2):
        i = rig["intr"][c]
        k_mats.append(np.array([[i[0], 0, i[1]], [0, i[2], i[3]], [0, 0, 1]]))
        dists.append(i[4:])  # 14 coefficients
        exts.append(make_4x4h_tform(rig["extr"][c][:3], rig["extr"][c][3:]))
    cams = CameraSet(camera_dict=make_cam_dict(
        ["a", "b"], exts, k_mats, dists, [[1600, 1200]] * 2))
    fh = FixedCameraPoseHandler(
        cams, FreePointTarget(rig["template"].reshape(1, -1, 3)),
        TargetDetection(cam_names=["a", "b"], data=rig["dd"]),
        options={"outliers": "n"})
    assert fh.camera_model == "tilted"
    assert fh.bundlePrimitive.intr.shape[1] == 18


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
