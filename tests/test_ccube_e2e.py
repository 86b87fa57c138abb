"""End-to-end Ccube calibration on the reference image dataset.

Same thresholds as the reference:
- 3-cam Ccube E2E: < 5.10 px (ref: tests/calibrate_ccube_test.py:19)
- Ccube self-calibration: < 0.50 px (ref: tests/self_calibrate_ccube_test.py:37)
"""
import shutil
from pathlib import Path

import numpy as np
import pytest
from cv2 import aruco

REF_DATA = Path("/root/reference/tests/test_data/calibration_ccube")

pytestmark = pytest.mark.skipif(
    not REF_DATA.exists(), reason="reference test data unavailable")


@pytest.fixture(scope="module")
def ccube_dir(tmp_path_factory):
    dst = tmp_path_factory.mktemp("ccube_data")
    for sub in ["cam0", "cam1", "cam2"]:
        shutil.copytree(REF_DATA / sub, dst / sub)
    return dst


@pytest.fixture(scope="module")
def ccube_cams(ccube_dir):
    from pycamset_tpu import calibrate_cameras
    from pycamset_tpu.models.ccube import Ccube
    target = Ccube(n_points=10, length=40, aruco_dict=aruco.DICT_6X6_1000,
                   border_fraction=0.2)
    cams = calibrate_cameras(
        f_loc=ccube_dir, calibration_target=target, save=True,
        problem_options={"outliers": "n"})
    return cams, target, ccube_dir


def test_calib_ccube(ccube_cams):
    cams, _, _ = ccube_cams
    final_euclid = np.mean(np.linalg.norm(
        np.reshape(cams.calibration_result, (-1, 2)), axis=1))
    assert final_euclid < 5.10, (
        f"ccube calibration accuracy did not pass: {final_euclid:.3f} px")


def test_self_calib_ccube(ccube_cams):
    from pycamset_tpu.optim.driver import run_bundle_adjustment
    from pycamset_tpu.optim.handlers import SelfBundleHandler
    cams, target, _ = ccube_cams
    param_handler = SelfBundleHandler(
        detection=cams.calibration_handler.detection, target=target,
        camset=cams, options={"max_nfev": 100, "outliers": "n"})
    param_handler.set_from_templated_camset(cams)
    _, final_cams = run_bundle_adjustment(param_handler=param_handler)
    final_euclid = np.mean(np.linalg.norm(
        np.reshape(final_cams.calibration_result, (-1, 2)), axis=1))
    assert final_euclid < 0.50, (
        f"regression in ccube self-calibration: {final_euclid:.3f} px")


if __name__ == "__main__":
    pytest.main([__file__, "-v", "-s"])
