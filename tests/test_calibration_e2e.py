"""End-to-end calibration tests on the reference image datasets.

Mirrors the reference integration tests (SURVEY.md §4) with the same
accuracy thresholds:
- 3-cam ChArUco: mean euclidean reprojection < 1.8 px
  (ref: tests/calibration_test.py:26)
- ChArUco self-calibration: < 1.07 px
  (ref: tests/self_calibration_target_test.py:36)

The reference test data is read from /root/reference/tests/test_data (never
written to); caches go to a session tmp dir.
"""
import shutil
from pathlib import Path

import numpy as np
import pytest

REF_DATA = Path("/root/reference/tests/test_data/calibration_charuco")

pytestmark = pytest.mark.skipif(
    not REF_DATA.exists(), reason="reference test data unavailable")


@pytest.fixture(scope="module")
def charuco_dir(tmp_path_factory):
    dst = tmp_path_factory.mktemp("charuco_data")
    for sub in ["1", "2", "3"]:
        shutil.copytree(REF_DATA / sub, dst / sub)
    return dst


@pytest.fixture(scope="module")
def charuco_cams(charuco_dir):
    from pycamset_tpu import calibrate_cameras
    from pycamset_tpu.models.charuco import ChArUco
    target = ChArUco(20, 20, 4, legacy=True)
    cams = calibrate_cameras(
        f_loc=charuco_dir, calibration_target=target, save=True,
        problem_options={"outliers": "n"})
    return cams, target, charuco_dir


def test_calibration_charuco(charuco_cams):
    cams, _, _ = charuco_cams
    final_euclid = np.mean(np.linalg.norm(
        np.reshape(cams.calibration_result, (-1, 2)), axis=1))
    assert final_euclid < 1.8, (
        f"regression found in charuco calibration: {final_euclid:.3f} px")


def test_self_calibration_charuco(charuco_cams):
    from pycamset_tpu.calibration.camera_calibrator import (
        detect_datapoints_in_imfile, run_stereo_calibration)
    from pycamset_tpu.optim.handlers import SelfBundleHandler

    cams, target, data_dir = charuco_cams
    detections, _ = detect_datapoints_in_imfile(
        f_loc=data_dir, calibration_target=target, caching=True)

    handler = SelfBundleHandler(
        detection=detections, target=target, camset=cams,
        options={"outliers": "n"})
    handler.set_from_templated_camset(cams)
    final_cams = run_stereo_calibration(
        cams, detections, target, param_handler=handler, save=False)
    final_euclid = np.mean(np.linalg.norm(
        np.reshape(final_cams.calibration_result, (-1, 2)), axis=1))
    assert final_euclid < 1.07, (
        f"regression found in charuco self-calibration: {final_euclid:.3f} px")
    # the RETURNED cameras must be gauge-aligned with finite transforms
    # (an empty scale-anchor selection used to NaN every extrinsic here)
    for cam in final_cams:
        assert np.all(np.isfinite(cam.extrinsic)), cam.name


def test_calibration_save_load_round_trip(charuco_cams):
    from pycamset_tpu.utils.saving import load_CameraSet
    cams, _, data_dir = charuco_cams
    loaded = load_CameraSet(data_dir / "optimised_cameras.camset")
    assert loaded == cams
    # the handler reconstructs: calibration history survives the round trip
    assert loaded.calibration_handler is not None
    np.testing.assert_allclose(loaded.calibration_params,
                               cams.calibration_params)


if __name__ == "__main__":
    pytest.main([__file__, "-v", "-s"])
