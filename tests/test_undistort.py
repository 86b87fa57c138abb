"""Batch image undistortion (utils/undistort.py, CLI ``undistort``)."""
import cv2
import numpy as np
import pytest

from pycamset_tpu.models.camera_set import CameraSet, make_cam_dict
from pycamset_tpu.utils.saving import save_camset
from pycamset_tpu.utils.undistort import undistort_folder

RES = (64, 48)  # (w, h)


def _make_rig(dists):
    k = np.array([[60.0, 0, 32.0], [0, 60.0, 24.0], [0, 0, 1]])
    names = [f"cam{i}" for i in range(len(dists))]
    return CameraSet(camera_dict=make_cam_dict(
        names, [np.eye(4)] * len(dists), [k] * len(dists), dists,
        [list(RES)] * len(dists)))


def _write_capture(root, names, n_ims=2):
    rng = np.random.default_rng(3)
    for name in names:
        sub = root / name
        sub.mkdir(parents=True)
        for i in range(n_ims):
            img = (rng.uniform(0, 255, size=(RES[1], RES[0]))
                   ).astype(np.uint8)
            assert cv2.imwrite(str(sub / f"im{i:03d}.png"), img)


def test_undistort_folder_brown(tmp_path):
    cams = _make_rig([np.array([-0.3, 0.05, 0.0, 0.0, 0.0])] * 2)
    cap = tmp_path / "capture"
    _write_capture(cap, cams.get_names())
    out, n = undistort_folder(cams, cap)
    assert out == tmp_path / "capture_undistorted"
    assert n == 4
    for name in cams.get_names():
        for i in range(2):
            src = cv2.imread(str(cap / name / f"im{i:03d}.png"),
                             cv2.IMREAD_UNCHANGED)
            und = cv2.imread(str(out / name / f"im{i:03d}.png"),
                             cv2.IMREAD_UNCHANGED)
            assert und is not None and und.shape == src.shape
            # nonzero distortion must actually move pixels
            assert not np.array_equal(und, src)


def test_undistort_folder_fisheye(tmp_path):
    # 4-wide distortion marks Kannala-Brandt and routes via cv2.fisheye
    cams = _make_rig([np.array([0.05, -0.01, 0.0, 0.0])])
    cap = tmp_path / "cap"
    _write_capture(cap, cams.get_names(), n_ims=1)
    out, n = undistort_folder(cams, cap, out_dir=tmp_path / "flat")
    assert n == 1 and out == tmp_path / "flat"
    und = cv2.imread(str(out / "cam0" / "im000.png"), cv2.IMREAD_UNCHANGED)
    assert und is not None and und.shape == (RES[1], RES[0])


def test_undistort_missing_camera_folder_raises(tmp_path):
    cams = _make_rig([np.zeros(5)] * 2)
    cap = tmp_path / "cap"
    _write_capture(cap, ["cam0"])  # cam1's folder is absent
    with pytest.raises(ValueError, match="cam1"):
        undistort_folder(cams, cap)


def test_cli_undistort(tmp_path, capsys):
    from pycamset_tpu.__main__ import main

    cams = _make_rig([np.array([-0.2, 0.0, 0.0, 0.0, 0.0])])
    cap = tmp_path / "cap"
    _write_capture(cap, cams.get_names(), n_ims=2)
    camset = tmp_path / "rig.camset"
    save_camset(cams, camset)
    rc = main(["undistort", str(camset), str(cap),
               "--out", str(tmp_path / "und")])
    assert rc == 0
    assert "undistorted 2 images" in capsys.readouterr().out
    assert (tmp_path / "und" / "cam0" / "im001.png").is_file()
