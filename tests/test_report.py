"""Standalone HTML calibration reports."""
import numpy as np
import pytest


@pytest.fixture(scope="module")
def solved_camset(tmp_path_factory):
    from pycamset_tpu.models.camera_set import CameraSet, make_cam_dict
    from pycamset_tpu.models.detections import TargetDetection
    from pycamset_tpu.optim.driver import run_bundle_adjustment
    from pycamset_tpu.optim.handlers import (FreePointTarget,
                                             TemplateBundleHandler)
    from pycamset_tpu.utils.general_utils import make_4x4h_tform
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
    path = tmp_path_factory.mktemp("report") / "solved.camset"
    from pycamset_tpu.utils.saving import save_camset
    save_camset(solved, path)
    return solved, path


def test_report_full_diagnostics(solved_camset, tmp_path):
    from pycamset_tpu.utils.report import write_calibration_report
    solved, _ = solved_camset
    out = write_calibration_report(solved, tmp_path / "rep.html",
                                   title="unit test rig")
    text = out.read_text()
    assert "unit test rig" in text
    assert "Rig (2 cameras)" in text
    assert "Calibration quality" in text
    # the four diagnostic panels + the distortion quiver, embedded inline
    assert text.count("data:image/png;base64,") >= 4
    assert "Residual distribution" in text
    assert "Per-camera coverage" in text
    assert "Accuracy vs precision" in text
    assert "Parameter uncertainty" in text
    assert "sigma fx" in text
    # every camera row present
    assert ">a<" in text and ">b<" in text


def test_report_degrades_without_history(tmp_path):
    from pycamset_tpu.models.camera_set import CameraSet, make_cam_dict
    from pycamset_tpu.utils.report import write_calibration_report
    k = np.array([[1500.0, 0, 800], [0, 1500.0, 600], [0, 0, 1]])
    cams = CameraSet(camera_dict=make_cam_dict(
        ["solo"], [np.eye(4)], [k], [np.zeros(5)], [[1600, 1200]]))
    out = write_calibration_report(cams, tmp_path / "bare.html")
    text = out.read_text()
    assert "rig summary only" in text
    assert "Calibration quality" not in text
    assert "data:image/png;base64," in text  # distortion quiver still drawn


def test_cli_report_from_saved_camset(solved_camset, tmp_path, capsys):
    from pycamset_tpu.__main__ import main
    _, path = solved_camset
    out = tmp_path / "cli_rep.html"
    rc = main(["report", str(path), "--out", str(out)])
    assert rc == 0
    assert "calibration report" in capsys.readouterr().out
    text = out.read_text()
    # the .camset load rebuilt the full history, so diagnostics render
    assert text.count("data:image/png;base64,") >= 4
    assert "Parameter uncertainty" in text

    # default output path + skipped uncertainty
    rc = main(["report", str(path), "--no-uncertainty"])
    assert rc == 0
    default_out = path.with_suffix(".html")
    assert default_out.exists()
    assert "Parameter uncertainty" not in default_out.read_text()
