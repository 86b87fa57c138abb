"""Rectified stereo-pair export (CLI ``rectify``)."""
import cv2
import numpy as np

from pycamset_tpu.models.camera_set import CameraSet, make_cam_dict
from pycamset_tpu.utils.general_utils import make_4x4h_tform
from pycamset_tpu.utils.saving import save_camset

RES = (64, 48)  # (w, h)


def _stereo_camset(tmp_path):
    k = np.array([[60.0, 0, 32.0], [0, 60.0, 24.0], [0, 0, 1]])
    exts = [np.eye(4), make_4x4h_tform(np.zeros(3), [-0.1, 0.0, 0.0])]
    cams = CameraSet(camera_dict=make_cam_dict(
        ["left", "right"], exts, [k] * 2,
        [np.array([-0.1, 0.0, 0.0, 0.0, 0.0])] * 2, [list(RES)] * 2))
    path = tmp_path / "rig.camset"
    save_camset(cams, path)
    return path


def _write_ims(folder, names, n_ims):
    rng = np.random.default_rng(7)
    paths = []
    for name in names:
        sub = folder / name
        sub.mkdir(parents=True)
        for i in range(n_ims):
            p = sub / f"f{i:03d}.png"
            assert cv2.imwrite(
                str(p), rng.integers(0, 255, (RES[1], RES[0]), np.uint8))
            paths.append(p)
    return paths


def test_cli_rectify_single_pair(tmp_path, capsys):
    from pycamset_tpu.__main__ import main

    camset = _stereo_camset(tmp_path)
    ims = _write_ims(tmp_path / "cap", ["left", "right"], 1)
    out = tmp_path / "rect"
    rc = main(["rectify", str(camset), "--cams", "left", "right",
               "--images", str(ims[0]), str(ims[1]), "--out", str(out)])
    assert rc == 0
    assert "rectified 1 pair(s)" in capsys.readouterr().out
    for name in ("left_000000.png", "right_000000.png"):
        im = cv2.imread(str(out / name), cv2.IMREAD_UNCHANGED)
        assert im is not None and im.shape == (RES[1], RES[0])
    q = np.loadtxt(out / "Q.txt")
    assert q.shape == (4, 4) and np.all(np.isfinite(q))
    # baseline along +x: Q[3, 2] encodes -1/Tx, so it must be finite+nonzero
    assert abs(q[3, 2]) > 1.0


def test_cli_rectify_folder_mode(tmp_path, capsys):
    from pycamset_tpu.__main__ import main

    camset = _stereo_camset(tmp_path)
    _write_ims(tmp_path / "cap", ["left", "right"], 2)
    out = tmp_path / "rect"
    rc = main(["rectify", str(camset), "--cams", "left", "right",
               "--folder", str(tmp_path / "cap"), "--out", str(out)])
    assert rc == 0
    assert "rectified 2 pair(s)" in capsys.readouterr().out
    assert sorted(p.name for p in out.glob("*.png")) == [
        "left_000000.png", "left_000001.png",
        "right_000000.png", "right_000001.png"]
    assert (out / "Q.txt").is_file()


def test_cli_rectify_needs_exactly_one_source(tmp_path, capsys):
    from pycamset_tpu.__main__ import main

    camset = _stereo_camset(tmp_path)
    rc = main(["rectify", str(camset), "--cams", "left", "right"])
    assert rc == 2
    assert "exactly one of" in capsys.readouterr().out
