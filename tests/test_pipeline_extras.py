"""Pipeline extras: high-distortion second pass, cached initial calibration,
detection cache reuse, initial_cams passthrough."""
import shutil
from pathlib import Path

import numpy as np
import pytest

REF_DATA = Path("/root/reference/tests/test_data/calibration_charuco")

pytestmark = pytest.mark.skipif(
    not REF_DATA.exists(), reason="reference test data unavailable")


@pytest.fixture(scope="module")
def tiny_charuco(tmp_path_factory):
    dst = tmp_path_factory.mktemp("charuco_tiny")
    from pycamset_tpu.utils.general_utils import natsorted
    for sub in ["1", "2", "3"]:
        (dst / sub).mkdir()
        for f in natsorted((REF_DATA / sub).glob("*.jpg"))[:5]:
            shutil.copy(f, dst / sub / f.name)
    return dst


def test_high_distortion_two_pass(tiny_charuco, monkeypatch):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    monkeypatch.setattr(plt, "show", lambda *a, **k: None)
    from pycamset_tpu import calibrate_cameras
    from pycamset_tpu.models.charuco import ChArUco
    target = ChArUco(20, 20, 4, legacy=True)
    cams = calibrate_cameras(
        f_loc=tiny_charuco, calibration_target=target, save=True,
        high_distortion=True,
        problem_options={"outliers": "n", "max_nfev": 25})
    err = np.mean(np.linalg.norm(cams.calibration_result.reshape(-1, 2), axis=1))
    assert err < 3.0
    # both detection caches written
    assert (tiny_charuco / "detected_datapoints.pickle").exists()
    assert (tiny_charuco / "detected_datapoints_with_calib.pickle").exists()
    assert (tiny_charuco / "initial_cameras_high_distortion.camset").exists()


def test_caches_are_reused(tiny_charuco):
    import pycamset_tpu.calibration.camera_calibrator as cc
    from pycamset_tpu.models.charuco import ChArUco
    target = ChArUco(20, 20, 4, legacy=True)
    # with caches present, find_in_imfolder must not be called again
    called = []
    orig = target.find_in_imfolder
    target.find_in_imfolder = lambda *a, **k: called.append(1) or orig(*a, **k)
    detections, res = cc.detect_datapoints_in_imfile(
        f_loc=tiny_charuco, calibration_target=target, caching=True)
    assert called == []
    assert detections.get_data().shape[0] > 100

    cams = cc.run_initial_calibration(
        detections, target, res, save=True,
        save_loc=tiny_charuco / "initial_cameras.camset")
    assert cams.get_n_cams() == 3


def test_initial_cams_passthrough(tiny_charuco):
    from pycamset_tpu import calibrate_cameras
    from pycamset_tpu.models.charuco import ChArUco
    from pycamset_tpu.utils.saving import load_CameraSet
    target = ChArUco(20, 20, 4, legacy=True)
    prev = load_CameraSet(tiny_charuco / "initial_cameras.camset")
    cams = calibrate_cameras(
        f_loc=tiny_charuco, calibration_target=target, save=False,
        initial_cams=prev,
        problem_options={"outliers": "n", "max_nfev": 25})
    err = np.mean(np.linalg.norm(cams.calibration_result.reshape(-1, 2), axis=1))
    assert err < 3.0


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
