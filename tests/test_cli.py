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
