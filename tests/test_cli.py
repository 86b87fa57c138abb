"""CLI tests (python -m pycamset_tpu)."""
import shutil
from pathlib import Path

import numpy as np
import pytest

REF_DATA = Path("/root/reference/tests/test_data/calibration_charuco")

pytestmark = pytest.mark.skipif(
    not REF_DATA.exists(), reason="reference test data unavailable")


@pytest.fixture(scope="module")
def cli_data(tmp_path_factory):
    dst = tmp_path_factory.mktemp("cli_data")
    from pycamset_tpu.utils.general_utils import natsorted
    for sub in ["1", "2", "3"]:
        (dst / sub).mkdir()
        for f in natsorted((REF_DATA / sub).glob("*.jpg"))[:5]:
            shutil.copy(f, dst / sub / f.name)
    return dst


def test_cli_calibrate_and_info(cli_data, capsys):
    from pycamset_tpu.__main__ import main
    rc = main(["calibrate", str(cli_data), "--target", "charuco",
               "--nx", "20", "--ny", "20", "--square", "4", "--legacy",
               "--outliers", "n", "--max-nfev", "25"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "calibrated 3 cameras" in out

    rc = main(["info", str(cli_data / "optimised_cameras.camset")])
    assert rc == 0
    out = capsys.readouterr().out
    assert "3 cameras" in out and "mean reprojection error" in out

    # track against the rig just calibrated (reuses the detection cache)
    import json
    out_json = cli_data / "poses.json"
    rc = main(["track", str(cli_data), "--camset",
               str(cli_data / "optimised_cameras.camset"),
               "--target", "charuco", "--nx", "20", "--ny", "20",
               "--square", "4", "--legacy", "--out", str(out_json)])
    assert rc == 0
    records = json.loads(out_json.read_text())
    assert len(records) == 5
    for rec in records:
        assert np.array(rec["pose"]).shape == (4, 4)
        assert rec["rms_px"] < 5.0
        assert len(rec["pose_sigma"]) == 6
        assert all(v is None or v >= 0 for v in rec["pose_sigma"])

    # ordered-video variant: warm-started frames land on the same poses
    stream_json = cli_data / "poses_stream.json"
    rc = main(["track", str(cli_data), "--camset",
               str(cli_data / "optimised_cameras.camset"),
               "--target", "charuco", "--nx", "20", "--ny", "20",
               "--square", "4", "--legacy", "--stream",
               "--out", str(stream_json)])
    assert rc == 0
    stream_records = json.loads(stream_json.read_text())
    assert len(stream_records) == 5
    # calibration images are NOT video (each frame is an unrelated board
    # placement), so the warm start is a legitimately poor seed here and
    # pose/basin equality with the batch solve is not expected — assert
    # the stream path runs end-to-end and still converges acceptably
    # (synthetic video accuracy is covered in test_tracking.py)
    for rec, srec in zip(records, stream_records):
        assert srec["rms_px"] < 5.0
        assert srec["n_detections"] == rec["n_detections"]

    # serving artifact round trip: freeze from the live tracker, then
    # serve the same frames from the artifact without --camset
    art = cli_data / "rig.trkz"
    rc = main(["track", str(cli_data), "--camset",
               str(cli_data / "optimised_cameras.camset"),
               "--target", "charuco", "--nx", "20", "--ny", "20",
               "--square", "4", "--legacy", "--export-artifact", str(art),
               "--out", str(cli_data / "poses_live.json")])
    assert rc == 0 and art.exists()
    art_json = cli_data / "poses_art.json"
    rc = main(["track", str(cli_data), "--artifact", str(art),
               "--target", "charuco", "--nx", "20", "--ny", "20",
               "--square", "4", "--legacy", "--out", str(art_json)])
    assert rc == 0
    art_records = json.loads(art_json.read_text())
    live_records = json.loads((cli_data / "poses_live.json").read_text())
    for lrec, arec in zip(live_records, art_records):
        np.testing.assert_allclose(arec["pose"], lrec["pose"], atol=1e-9)

    # exactly one of --camset/--artifact
    assert main(["track", str(cli_data), "--target", "charuco",
                 "--nx", "20", "--ny", "20", "--square", "4",
                 "--legacy"]) == 2


if __name__ == "__main__":
    pytest.main([__file__, "-v"])


def test_cli_info_uncertainty(tmp_path):
    """Self-contained (no dependence on the calibrate test's side
    effects): solve a small synthetic rig, save it, read it back with
    --uncertainty."""
    import numpy as np
    from pycamset_tpu.__main__ import main
    from pycamset_tpu.models.camera_set import CameraSet, make_cam_dict
    from pycamset_tpu.models.detections import TargetDetection
    from pycamset_tpu.optim.driver import run_bundle_adjustment
    from pycamset_tpu.optim.handlers import (
        FreePointTarget, TemplateBundleHandler)
    from pycamset_tpu.utils.general_utils import make_4x4h_tform
    from pycamset_tpu.utils.saving import save_camset
    from pycamset_tpu.utils.synthetic import make_synthetic_rig

    rig = make_synthetic_rig(n_cams=2, n_ims=4, grid=4, visibility=1.0,
                             noise_px=0.2, seed=5)
    k_mats = [np.array([[i9[0], 0, i9[1]], [0, i9[2], i9[3]], [0, 0, 1]])
              for i9 in rig["intr"]]
    exts = [make_4x4h_tform(e[:3], e[3:]) for e in rig["extr"]]
    cams = CameraSet(camera_dict=make_cam_dict(
        ["a", "b"], exts, k_mats, [i9[4:] for i9 in rig["intr"]],
        [[1600, 1200]] * 2))
    handler = TemplateBundleHandler(
        cams, FreePointTarget(rig["template"].reshape(1, -1, 3)),
        TargetDetection(cam_names=["a", "b"], data=rig["dd"]),
        options={"outliers": "n"})
    _res, solved = run_bundle_adjustment(handler, backend="structured")
    path = tmp_path / "solved.camset"
    save_camset(solved, path)

    rc = main(["info", str(path), "--uncertainty"])
    assert rc == 0


def test_cli_calibrate_sharded_backend(cli_data, capsys):
    """--backend sharded routes the CLI calibrate through the multi-device
    solve (8 virtual CPU devices in the test tier)."""
    from pycamset_tpu.__main__ import main
    rc = main(["calibrate", str(cli_data), "--target", "charuco",
               "--nx", "20", "--ny", "20", "--square", "4", "--legacy",
               "--outliers", "n", "--max-nfev", "25",
               "--backend", "sharded"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "mean reprojection error" in out
    err = float(out.rsplit("error", 1)[1].split("px")[0])
    assert err < 1.8


@pytest.fixture(scope="module")
def recon_rig(tmp_path_factory):
    """Synthetic 3-camera rig + rendered plane views, saved to disk the
    way a CLI user would have them (a .camset file + image files)."""
    import cv2

    from pycamset_tpu.models.camera_set import CameraSet

    dst = tmp_path_factory.mktemp("recon_rig")
    h, w = 120, 160
    k = np.array([[140.0, 0, w / 2], [0, 140.0, h / 2], [0, 0, 1]])

    def tex(x, y):
        return (np.sin(6.1 * x) * np.cos(4.3 * y)
                + 0.5 * np.sin(11.7 * x + 2.1 * y)
                + 0.4 * np.cos(3.3 * x - 8.1 * y)) * 60 + 128

    exts, names = [], []
    for i, tx in enumerate([0.0, 0.4, -0.4]):
        ext = np.eye(4)
        ext[:3, 3] = [-tx, 0, 0]
        exts.append(ext)
        names.append(f"cam{i}")
    cams = CameraSet(camera_names=names, extrinsic_matrices=exts,
                     intrinsic_matrices=[k] * 3,
                     distortion_coefs=[np.zeros(5)] * 3,
                     res=[(w, h)] * 3)
    camset = dst / "rig.camset"
    cams.save(camset)

    paths = []
    for name in names:
        cam = cams[name]
        u, v = np.meshgrid(np.arange(w, dtype=float),
                           np.arange(h, dtype=float))
        rays = np.linalg.inv(k) @ np.stack(
            [u.ravel(), v.ravel(), np.ones(h * w)])
        rot = cam.cam_to_world[:3, :3]
        org = cam.cam_to_world[:3, 3:4]
        dw = rot @ rays
        p = org + dw * (5.0 - org[2]) / dw[2]
        im = tex(p[0], p[1]).reshape(h, w)
        path = dst / f"{name}.png"
        cv2.imwrite(str(path), np.clip(im, 0, 255).astype(np.uint8))
        paths.append(str(path))
    return dst, str(camset), names, paths


def _read_ply(path):
    lines = Path(path).read_text().splitlines()
    n = int(next(l for l in lines if l.startswith("element vertex")).split()[-1])
    body = lines[lines.index("end_header") + 1:]
    pts = np.array([[float(v) for v in l.split()[:3]] for l in body[:n]])
    return pts


def test_cli_reconstruct_sweep(recon_rig, capsys):
    from pycamset_tpu.__main__ import main
    dst, camset, names, paths = recon_rig
    out = dst / "sweep.ply"
    rc = main(["reconstruct", camset, "--cams", *names,
               "--images", *paths, "--near", "3", "--far", "8",
               "--n-planes", "48", "--top-k", "2", "--out", str(out)])
    assert rc == 0
    assert "sweep:" in capsys.readouterr().out
    pts = _read_ply(out)
    assert len(pts) > 0.5 * 120 * 160
    # the scene is the z=5 plane in the world frame
    assert abs(np.median(pts[:, 2]) - 5.0) < 0.1


def test_cli_reconstruct_stereo_sgm(recon_rig, capsys):
    from pycamset_tpu.__main__ import main
    dst, camset, names, paths = recon_rig
    out = dst / "stereo.ply"
    rc = main(["reconstruct", camset, "--cams", "cam0", "cam1",
               "--images", paths[0], paths[1], "--matcher", "sgm",
               "--num-disp", "32", "--mind", "2", "--maxd", "8",
               "--out", str(out)])
    assert rc == 0
    assert "stereo:" in capsys.readouterr().out
    pts = _read_ply(out)
    assert len(pts) > 1000
    assert abs(np.median(np.linalg.norm(pts, axis=1)) - 5.0) < 0.5


def test_cli_reconstruct_fused(recon_rig, capsys):
    from pycamset_tpu.__main__ import main
    dst, camset, names, paths = recon_rig
    out = dst / "fused.ply"
    rc = main(["reconstruct", camset, "--cams", *names,
               "--images", *paths, "--mode", "fused",
               "--near", "3", "--far", "8", "--n-planes", "48",
               "--out", str(out)])
    assert rc == 0
    assert "fused:" in capsys.readouterr().out
    pts = _read_ply(out)
    # consumption dedup: one point per surface patch, not per view
    assert 0.3 * 120 * 160 < len(pts) < 1.5 * 120 * 160
    assert abs(np.median(pts[:, 2]) - 5.0) < 0.1


def test_cli_reconstruct_mesh(recon_rig, capsys):
    from pycamset_tpu.__main__ import main
    dst, camset, names, paths = recon_rig
    out = dst / "mesh.ply"
    rc = main(["reconstruct", camset, "--cams", *names,
               "--images", *paths, "--mode", "mesh",
               "--near", "3", "--far", "8", "--n-planes", "48",
               "--out", str(out)])
    assert rc == 0
    assert "mesh:" in capsys.readouterr().out
    text = out.read_text().splitlines()
    nv = int(next(l for l in text if l.startswith("element vertex"))
             .split()[-1])
    nf = int(next(l for l in text if l.startswith("element face"))
             .split()[-1])
    assert nv > 500 and nf > 500
    body = text[text.index("end_header") + 1:]
    verts = np.array([[float(x) for x in l.split()] for l in body[:nv]])
    assert abs(np.median(verts[:, 2]) - 5.0) < 0.1


def test_cli_reconstruct_arg_errors(recon_rig, capsys):
    from pycamset_tpu.__main__ import main
    dst, camset, names, paths = recon_rig
    # unknown camera
    rc = main(["reconstruct", camset, "--cams", "nope", "cam1",
               "--images", paths[0], paths[1]])
    assert rc == 2
    # sweep without near/far
    rc = main(["reconstruct", camset, "--cams", *names,
               "--images", *paths])
    assert rc == 2
    # image count mismatch
    rc = main(["reconstruct", camset, "--cams", *names,
               "--images", paths[0]])
    assert rc == 2
    capsys.readouterr()


def test_cli_camera_model_arg_parsing():
    from pycamset_tpu.__main__ import _parse_camera_model_arg
    assert _parse_camera_model_arg("standard") == "standard"
    assert _parse_camera_model_arg("fisheye,standard") == [
        "fisheye", "standard"]
    assert _parse_camera_model_arg("a=fisheye,b=standard") == {
        "a": "fisheye", "b": "standard"}


def test_cli_calibrate_per_camera_model_map(cli_data, capsys):
    """A per-camera model map calibrates a mixed-width rig end to end
    (cameras 1/2 standard, camera 3 rational: the rational chain with the
    narrow cameras' extra coefficients pinned by the column mask)."""
    from pycamset_tpu.__main__ import main
    rc = main(["calibrate", str(cli_data), "--target", "charuco",
               "--nx", "20", "--ny", "20", "--square", "4", "--legacy",
               "--outliers", "n", "--max-nfev", "25",
               "--camera-model", "1=standard,2=standard,3=rational",
               "--no-save"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "calibrated 3 cameras" in out
