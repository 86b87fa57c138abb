"""Calibration planning (calibration/plan.py) — beyond the reference.

Oracles: zero-noise synthetic detections must reproject exactly through
the cameras that generated them; planner sigmas must follow first-order
statistics (scale linearly with noise, shrink with more data); the
triangulation ellipsoid must reflect rig geometry (a narrow-baseline
pair is worse in depth than a wide one).
"""
import numpy as np
import pytest

from pycamset_tpu.calibration.plan import (_triangulation_sigma,
                                           format_plan_report,
                                           plan_calibration,
                                           synthesize_detections,
                                           workspace_center)
from pycamset_tpu.models.camera_set import CameraSet, make_cam_dict
from pycamset_tpu.utils.general_utils import make_4x4h_tform
from pycamset_tpu.utils.synthetic import look_at_extrinsic


def _ring_rig(n=4, radius=1.0, z=0.5, f=1500.0):
    names, exts, kmats, dists = [], [], [], []
    for i in range(n):
        ang = 2 * np.pi * i / n
        pos = np.array([radius * np.cos(ang), radius * np.sin(ang), z])
        exts.append(look_at_extrinsic(pos, np.zeros(3)))
        kmats.append(np.array([[f, 0, 800.0], [0, f, 600.0], [0, 0, 1]]))
        dists.append(np.array([-0.1, 0.02, 1e-4, -1e-4, 0.0]))
        names.append(f"cam{i}")
    return CameraSet(camera_dict=make_cam_dict(
        names, exts, kmats, dists, [[1600, 1200]] * n))


def _grid_target(g=6, pitch=0.02):
    xy = np.stack(np.meshgrid(np.arange(g), np.arange(g)), -1).reshape(-1, 2)
    return np.concatenate([(xy - g / 2) * pitch, np.zeros((g * g, 1))], 1)


def test_workspace_center_of_a_ring_is_its_focus():
    cams = _ring_rig()
    c = workspace_center(cams)
    assert np.linalg.norm(c) < 1e-9  # the ring looks at the origin


def test_synthetic_detections_reproject_exactly_at_zero_noise():
    cams = _ring_rig()
    tpl = _grid_target()
    det, poses = synthesize_detections(cams, tpl, n_ims=6, noise_px=0.0,
                                       seed=3)
    dd = det.get_data()
    assert len(dd) > 200
    names = cams.get_names()
    for row in dd[:: max(1, len(dd) // 50)]:
        ci, im, key = int(row[0]), int(row[1]), int(row[2])
        t = make_4x4h_tform(poses[im, :3], poses[im, 3:])
        world = tpl[key] @ t[:3, :3].T + t[:3, 3]
        uv = np.asarray(cams[names[ci]].project_points(world[None]))[0]
        assert np.allclose(uv, row[3:5], atol=1e-9)
        assert 0 <= uv[0] <= 1600 and 0 <= uv[1] <= 1200


def test_impossible_rig_raises():
    # two cameras looking AWAY from each other share no view volume
    names = ["a", "b"]
    e1 = look_at_extrinsic(np.array([0, 0, -1.0]), np.array([0, 0, -5.0]))
    e2 = look_at_extrinsic(np.array([0, 0, 1.0]), np.array([0, 0, 5.0]))
    k = np.array([[1500.0, 0, 800], [0, 1500.0, 600], [0, 0, 1]])
    cams = CameraSet(camera_dict=make_cam_dict(
        names, [e1, e2], [k, k], [np.zeros(5)] * 2, [[1600, 1200]] * 2))
    with pytest.raises(ValueError, match="shared view volume"):
        synthesize_detections(cams, _grid_target(), n_ims=5, min_cams=2)


def test_plan_report_statistics():
    cams = _ring_rig()
    tpl = _grid_target()
    rep = plan_calibration(cams, tpl, n_ims=16, noise_px=0.3, seed=0)
    assert abs(rep["expected_rms_px"] - 0.3) < 0.1
    assert set(rep["cameras"]) == set(cams.get_names())
    for c in rep["cameras"].values():
        assert 0 < c["focal_sigma_px"] < 50
        assert 0 < c["trans_sigma"] < 0.05
        assert 0 < c["coverage"] <= 1
    t = rep["triangulation_sigma"]
    assert 0 < t["best_axis"] <= t["worst_axis"] < 1e-3

    # first-order scaling: doubling the noise doubles the sigmas
    rep2 = plan_calibration(cams, tpl, n_ims=16, noise_px=0.6, seed=0)
    r = (rep2["cameras"]["cam0"]["focal_sigma_px"]
         / rep["cameras"]["cam0"]["focal_sigma_px"])
    assert 1.6 < r < 2.4
    # rendered report mentions the headline numbers
    txt = format_plan_report(rep)
    assert "triangulation sigma" in txt and "cam0" in txt


def test_more_images_shrink_sigmas():
    cams = _ring_rig()
    tpl = _grid_target()
    rep_a = plan_calibration(cams, tpl, n_ims=8, noise_px=0.3, seed=2)
    rep_b = plan_calibration(cams, tpl, n_ims=32, noise_px=0.3, seed=2)
    fa = rep_a["cameras"]["cam1"]["focal_sigma_px"]
    fb = rep_b["cameras"]["cam1"]["focal_sigma_px"]
    # ~1/sqrt(4x data) = 0.5; allow wide slack (coverage also changes)
    assert fb < 0.75 * fa


def test_triangulation_geometry_narrow_vs_wide_baseline():
    k = np.array([[1500.0, 0, 800], [0, 1500.0, 600], [0, 0, 1]])

    def pair(half_angle):
        names = ["l", "r"]
        exts = []
        for s in (-1, 1):
            pos = np.array([np.sin(half_angle) * s, 0.0,
                            -np.cos(half_angle)])
            exts.append(look_at_extrinsic(pos, np.zeros(3)))
        return CameraSet(camera_dict=make_cam_dict(
            names, exts, [k, k], [np.zeros(5)] * 2, [[1600, 1200]] * 2))

    narrow = _triangulation_sigma(pair(np.deg2rad(4)), np.zeros(3), 0.3)
    wide = _triangulation_sigma(pair(np.deg2rad(40)), np.zeros(3), 0.3)
    # depth axis (worst) is drastically better at a wide baseline
    assert wide[-1] < 0.2 * narrow[-1]


def test_cli_plan(tmp_path, monkeypatch, capsys):
    import json

    import pycamset_tpu.__main__ as cli

    cams = _ring_rig()
    src = tmp_path / "rig.camset"
    cams.save(src)

    class _Tgt:
        point_data = _grid_target().reshape(1, -1, 3)

    monkeypatch.setattr(cli, "_make_target", lambda args: _Tgt())
    out = tmp_path / "plan.json"
    rc = cli.main(["plan", str(src), "--target", "charuco",
                   "--n-ims", "10", "--noise", "0.3",
                   "--out", str(out)])
    assert rc == 0
    assert "expected reprojection rms" in capsys.readouterr().out
    rep = json.loads(out.read_text())
    assert rep["n_ims"] == 10
    assert "cam0" in rep["cameras"]
