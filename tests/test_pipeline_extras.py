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


def test_stale_detection_cache_invalidated(tmp_path):
    """The detection cache is fingerprinted: changing the target geometry
    or a detector-affecting flag (photometric_refine) must re-detect
    instead of silently reusing stale corners; legacy fingerprint-less
    caches re-detect once."""
    from pycamset_tpu.utils.general_utils import natsorted
    from pycamset_tpu.utils.saving import save_pickle
    import pycamset_tpu.calibration.camera_calibrator as cc
    from pycamset_tpu.models.charuco import ChArUco

    for sub in ["1", "2"]:
        (tmp_path / sub).mkdir()
        for f in natsorted((REF_DATA / sub).glob("*.jpg"))[:2]:
            shutil.copy(f, tmp_path / sub / f.name)

    def counted(target):
        calls = []
        orig = target.find_in_imfolder
        target.find_in_imfolder = \
            lambda *a, **k: calls.append(1) or orig(*a, **k)
        return calls

    t1 = ChArUco(20, 20, 4, legacy=True)
    c1 = counted(t1)
    det1, _ = cc.detect_datapoints_in_imfile(
        f_loc=tmp_path, calibration_target=t1, caching=True)
    assert len(c1) == 2  # detected both cameras

    # same configuration -> cache hit
    t2 = ChArUco(20, 20, 4, legacy=True)
    c2 = counted(t2)
    det2, _ = cc.detect_datapoints_in_imfile(
        f_loc=tmp_path, calibration_target=t2, caching=True)
    assert c2 == []
    np.testing.assert_array_equal(det1.get_data(), det2.get_data())

    # detector-affecting flag flipped -> MUST re-detect
    t3 = ChArUco(20, 20, 4, legacy=True)
    t3.photometric_refine = True
    c3 = counted(t3)
    det3, _ = cc.detect_datapoints_in_imfile(
        f_loc=tmp_path, calibration_target=t3, caching=True)
    assert len(c3) == 2, "stale cache served for a changed detector"
    assert not np.array_equal(det1.get_data(), det3.get_data())

    # ANY declared detector flag participates (DETECTOR_FLAGS), not just
    # photometric_refine
    t3a = ChArUco(20, 20, 4, legacy=True)
    t3a.photometric_refine = True
    t3a.fast_detection = not getattr(t3a, "fast_detection", False)
    c3a = counted(t3a)
    cc.detect_datapoints_in_imfile(
        f_loc=tmp_path, calibration_target=t3a, caching=True)
    assert len(c3a) == 2, "stale cache served for a toggled detector flag"

    # NEW images arrive -> the image-list key must re-detect
    for sub in ["1", "2"]:
        extra = natsorted((REF_DATA / sub).glob("*.jpg"))[2]
        shutil.copy(extra, tmp_path / sub / f"zz_{extra.name}")
    t3b = ChArUco(20, 20, 4, legacy=True)
    t3b.photometric_refine = True
    c3b = counted(t3b)
    det3b, _ = cc.detect_datapoints_in_imfile(
        f_loc=tmp_path, calibration_target=t3b, caching=True)
    assert len(c3b) == 2, "stale cache served after images changed"
    assert det3b.get_data().shape[0] > det3.get_data().shape[0]
    for sub in ["1", "2"]:
        extra = natsorted((REF_DATA / sub).glob("*.jpg"))[2]
        (tmp_path / sub / f"zz_{extra.name}").unlink()

    # legacy 2-tuple cache (no fingerprint) -> re-detect once, re-key
    save_pickle((det1, [(1080, 1920)] * 2),
                tmp_path / "detected_datapoints.pickle")
    t4 = ChArUco(20, 20, 4, legacy=True)
    c4 = counted(t4)
    cc.detect_datapoints_in_imfile(
        f_loc=tmp_path, calibration_target=t4, caching=True)
    assert len(c4) == 2
    t5 = ChArUco(20, 20, 4, legacy=True)
    c5 = counted(t5)
    cc.detect_datapoints_in_imfile(
        f_loc=tmp_path, calibration_target=t5, caching=True)
    assert c5 == []  # re-keyed cache hits again


def test_detection_cache_handles_symlinked_images(tmp_path):
    """Symlinked captures (common for large datasets) must not crash the
    fingerprint (resolved paths escape f_loc) and must still key the
    cache by the per-camera-folder image lists."""
    from pycamset_tpu.utils.general_utils import natsorted
    import pycamset_tpu.calibration.camera_calibrator as cc
    from pycamset_tpu.models.charuco import ChArUco

    for sub in ["1", "2"]:
        (tmp_path / sub).mkdir()
        for f in natsorted((REF_DATA / sub).glob("*.jpg"))[:2]:
            (tmp_path / sub / f.name).symlink_to(f)

    t = ChArUco(20, 20, 4, legacy=True)
    det, _ = cc.detect_datapoints_in_imfile(
        f_loc=tmp_path, calibration_target=t, caching=True)
    assert det.get_data().shape[0] > 50

    calls = []
    t2 = ChArUco(20, 20, 4, legacy=True)
    orig = t2.find_in_imfolder
    t2.find_in_imfolder = lambda *a, **k: calls.append(1) or orig(*a, **k)
    det2, _ = cc.detect_datapoints_in_imfile(
        f_loc=tmp_path, calibration_target=t2, caching=True)
    assert calls == []  # cache hits through the symlinks
    np.testing.assert_array_equal(det.get_data(), det2.get_data())


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


def test_threaded_detection_matches_serial(tiny_charuco):
    """find_in_imfolder with a forced multi-thread pool returns detections
    identical to the serial loop (shared OpenCV detector objects are only
    used through const methods, and ordering is preserved)."""
    from pycamset_tpu.models.charuco import ChArUco
    import pycamset_tpu.utils.general_utils as gu

    target = ChArUco(20, 20, 4, legacy=True)
    folder = tiny_charuco / "1"

    orig = gu.thread_map

    def forced_serial(fn, items, n_threads=None):
        return orig(fn, items, n_threads=1)

    def forced_threads(fn, items, n_threads=None):
        return orig(fn, items, n_threads=4)

    try:
        gu.thread_map = forced_serial
        d_serial = target.find_in_imfolder(folder, None)
        gu.thread_map = forced_threads
        d_thread = target.find_in_imfolder(folder, None)
    finally:
        gu.thread_map = orig
    np.testing.assert_array_equal(d_serial.get_data(), d_thread.get_data())


def test_thread_map_preserves_order_and_errors():
    from pycamset_tpu.utils.general_utils import thread_map

    assert thread_map(lambda x: x * 2, range(37), n_threads=5) == [
        x * 2 for x in range(37)]
    assert thread_map(lambda x: x, [], n_threads=8) == []
    with pytest.raises(ValueError, match="boom"):
        def bad(x):
            raise ValueError("boom")
        thread_map(bad, [1, 2], n_threads=2)
