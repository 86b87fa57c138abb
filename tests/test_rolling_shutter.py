"""Rolling-shutter-aware calibration (optim/handlers.py
RSTemplateBundleHandler + the RSPoseVel/RSTemplateTime chain).

Beyond-reference capability: the reference assumes global shutter
everywhere. Here a detection on image row v reprojects through the target
pose sampled at tau = readout * (v/H - 1/2) (constant-velocity
within-frame motion — the convention shared with the tracker and temporal
sync), with per-image [pose | velocity] parameters and a per-camera
readout, estimated jointly with the calibration. Only the products
readout_c * velocity_i are observable within one capture, so the
reference camera's readout is pinned (see the handler docstring)."""
from __future__ import annotations

import numpy as np
import pytest

from pycamset_tpu.models.camera_set import CameraSet, make_cam_dict
from pycamset_tpu.models.detections import TargetDetection
from pycamset_tpu.utils.general_utils import make_4x4h_tform

RES = (1600, 1200)


def _ring_rig(n_cams=3, seed=0):
    rng = np.random.default_rng(seed)
    from pycamset_tpu.utils.synthetic import look_at_extrinsic
    names, exts, kmats, dists = [], [], [], []
    for c in range(n_cams):
        f = rng.uniform(1400, 1600)
        kmats.append(np.array([[f, 0, RES[0] / 2 + rng.normal() * 5],
                               [0, f * 1.002, RES[1] / 2 + rng.normal() * 5],
                               [0, 0, 1]]))
        dists.append(np.array([rng.uniform(-0.2, -0.05),
                               rng.uniform(0, 0.05), 1e-4, -1e-4, 0.0]))
        ang = 2 * np.pi * c / n_cams
        pos = np.array([np.cos(ang), np.sin(ang), rng.uniform(0.4, 0.7)])
        exts.append(look_at_extrinsic(pos, np.zeros(3)))
        names.append(f"cam{c}")
    return CameraSet(camera_dict=make_cam_dict(
        names, exts, kmats, dists, [list(RES)] * n_cams))


def _grid_template(grid=7, pitch=0.03):
    k = grid * grid
    tpl = np.stack(np.meshgrid(np.arange(grid), np.arange(grid)),
                   -1).reshape(-1, 2)
    return np.concatenate([(tpl - grid / 2) * pitch, np.zeros((k, 1))], 1)


def _rs_capture(cams, tpl, n_ims, readouts, vel_rot=0.15, vel_tr=0.08,
                noise=0.0, seed=0):
    """Observations of a target moving with constant velocity WITHIN each
    frame, sampled row-by-row (fixed point on the row like the sync-test
    generator). Returns (dd, poses (I,6), vels (I,6))."""
    rng = np.random.default_rng(seed)
    n_keys = tpl.shape[0]
    poses = np.zeros((n_ims, 6))
    poses[:, :3] = rng.normal(size=(n_ims, 3)) * 0.3
    poses[:, 3:] = rng.normal(size=(n_ims, 3)) * 0.1
    poses[0] = 0.0  # gauge pose
    vels = np.zeros((n_ims, 6))
    vels[:, :3] = rng.normal(size=(n_ims, 3)) * vel_rot
    vels[:, 3:] = rng.normal(size=(n_ims, 3)) * vel_tr

    def project(cam, p6):
        t = make_4x4h_tform(p6[:3], p6[3:])
        world = tpl @ t[:3, :3].T + t[:3, 3]
        z = (world @ cam.extrinsic[:3, :3].T + cam.extrinsic[:3, 3])[:, 2]
        return np.asarray(cam.project_points(world)), z

    rows = []
    for c, name in enumerate(cams.get_names()):
        cam = cams[name]
        h = float(cam.res[1])
        for i in range(n_ims):
            uv, z = project(cam, poses[i])
            for _ in range(8):
                tau = readouts[c] * (uv[:, 1] / h - 0.5)
                new = np.stack([
                    project(cam, poses[i] + vels[i] * tk)[0][k]
                    for k, tk in enumerate(tau)])
                if np.abs(new - uv).max() < 1e-11:
                    uv = new
                    break
                uv = new
            ok = ((z > 0.1) & (uv[:, 0] > 0) & (uv[:, 0] < RES[0])
                  & (uv[:, 1] > 0) & (uv[:, 1] < RES[1]))
            kk = np.flatnonzero(ok)
            obs = uv[kk] + rng.normal(size=(kk.size, 2)) * noise
            rows.append(np.column_stack([
                np.full(kk.size, c), np.full(kk.size, i), kk, obs]))
    return np.concatenate(rows), poses, vels


def _rs_handler(cams, tpl, dd, ref_readout, options=None):
    from pycamset_tpu.optim.handlers import (
        FreePointTarget, RSTemplateBundleHandler)
    opts = {"outliers": "n", "rolling_shutter": ref_readout}
    opts.update(options or {})
    return RSTemplateBundleHandler(
        cams, FreePointTarget(tpl.reshape(1, -1, 3)),
        TargetDetection(cam_names=list(cams.get_names()), data=dd),
        options=opts)


TRUE_READOUTS = np.array([0.7, 0.9, 0.5])


def test_rs_chain_residual_at_truth():
    """The RS chain reproduces the generator exactly: residuals at the
    true parameters sit at machine precision on a zero-noise capture."""
    from pycamset_tpu.config import default_device_dtype
    from pycamset_tpu.optim.structured_driver import (
        build_structured_problem)

    cams = _ring_rig()
    tpl = _grid_template()
    dd, poses, vels = _rs_capture(cams, tpl, 8, TRUE_READOUTS, seed=3)
    handler = _rs_handler(cams, tpl, dd, TRUE_READOUTS[0])

    # pack the exact generating parameters (the PnP seeding's extrinsics
    # are biased by the RS smear — overwrite everything with truth)
    from pycamset_tpu.utils.general_utils import ext_4x4_to_rod
    handler.get_initial_params()  # runs seeding (missing-pose bookkeeping)
    prim = handler.bundlePrimitive
    for c, name in enumerate(cams.get_names()):
        rvec, tvec = ext_4x4_to_rod(cams[name].extrinsic)
        prim.extr[c] = np.concatenate([rvec, tvec])
    prim.poses[:, :6] = poses
    prim.poses[:, 6:] = vels
    prim.readout[:, 0] = TRUE_READOUTS
    x_true = prim.base_full()[prim.unfixed_full()]

    _solve, residual_fn, _x0 = build_structured_problem(
        handler, default_device_dtype())
    r = residual_fn(x_true)
    # sub-1e-4 px: exact up to the generator's row fixed-point tolerance
    assert np.sqrt(np.mean(r ** 2)) < 1e-4


def test_rs_calibration_recovers_readout_and_motion():
    from pycamset_tpu.optim.driver import run_bundle_adjustment

    cams = _ring_rig()
    tpl = _grid_template()
    noise = 0.1
    dd, poses, vels = _rs_capture(cams, tpl, 14, TRUE_READOUTS,
                                  noise=noise, seed=5)
    handler = _rs_handler(cams, tpl, dd, TRUE_READOUTS[0])
    res, solved = run_bundle_adjustment(handler, backend="structured")
    rms = np.sqrt(np.mean(res["fun"] ** 2))
    assert rms < 2.0 * noise, rms

    # the injected readouts come back (cam0 pinned at truth anchors the
    # readout*velocity scale gauge, so cam1/cam2 are absolute)
    got = handler.get_readouts(res["x"])
    assert got["cam0"] == pytest.approx(TRUE_READOUTS[0])
    assert abs(got["cam1"] - TRUE_READOUTS[1]) < 0.05, got
    assert abs(got["cam2"] - TRUE_READOUTS[2]) < 0.05, got

    # within-frame velocities recovered (skip the gauge image's pinned
    # counterpart only if degenerate; all rows are free here)
    got_v = handler.get_velocities(res["x"])
    assert np.abs(got_v - vels).max() < 0.02, np.abs(got_v - vels).max()


def test_global_shutter_handler_degrades_on_rs_data():
    """The standard handler on rolling-shutter data leaves a large
    systematic residual — the failure mode the RS chain removes."""
    from pycamset_tpu.models.detections import TargetDetection
    from pycamset_tpu.optim.driver import run_bundle_adjustment
    from pycamset_tpu.optim.handlers import (
        FreePointTarget, TemplateBundleHandler)

    cams = _ring_rig()
    tpl = _grid_template()
    noise = 0.1
    dd, _p, _v = _rs_capture(cams, tpl, 14, TRUE_READOUTS, noise=noise,
                             seed=5)
    gs = TemplateBundleHandler(
        cams, FreePointTarget(tpl.reshape(1, -1, 3)),
        TargetDetection(cam_names=list(cams.get_names()), data=dd),
        options={"outliers": "n"})
    res, _ = run_bundle_adjustment(gs, backend="structured")
    rms = np.sqrt(np.mean(res["fun"] ** 2))
    assert rms > 10 * noise, rms  # RS smear dominates the residual


def test_rs_rejected_on_generic_and_scipy_backends():
    cams = _ring_rig()
    tpl = _grid_template()
    dd, _p, _v = _rs_capture(cams, tpl, 6, TRUE_READOUTS, seed=2)
    for backend in ("generic", "scipy"):
        handler = _rs_handler(cams, tpl, dd, TRUE_READOUTS[0])
        from pycamset_tpu.optim.driver import run_bundle_adjustment
        with pytest.raises(ValueError, match="structured"):
            run_bundle_adjustment(handler, backend=backend)


def test_rs_gauge_image_velocity_stays_free():
    cams = _ring_rig()
    tpl = _grid_template()
    dd, _p, _v = _rs_capture(cams, tpl, 6, TRUE_READOUTS, seed=2)
    handler = _rs_handler(cams, tpl, dd, TRUE_READOUTS[0])
    prim = handler.bundlePrimitive
    # pose half of the gauge image pinned, velocity half free
    assert not prim.pose_colmask[0, :6].any()
    assert prim.pose_colmask[0, 6:].all()
    # reference camera's readout pinned, others free
    assert not prim.readout_unfixed[0]
    assert prim.readout_unfixed[1:].all()


def test_cli_rolling_shutter_flag(tmp_path, monkeypatch, capsys):
    """--rolling-shutter wires through calibrate to the RS handler and
    reports per-camera readouts."""
    import pycamset_tpu.__main__ as cli
    import pycamset_tpu.calibration.camera_calibrator as cc
    from pycamset_tpu.models.camera_set import CameraSet
    from pycamset_tpu.optim.handlers import FreePointTarget

    cams = _ring_rig()
    tpl = _grid_template()
    dd, _p, _v = _rs_capture(cams, tpl, 12, TRUE_READOUTS, noise=0.1,
                             seed=7)
    det = TargetDetection(cam_names=list(cams.get_names()), data=dd)
    target = FreePointTarget(tpl.reshape(1, -1, 3))

    monkeypatch.setattr(cli, "_make_target", lambda args: target)
    monkeypatch.setattr(cc, "detect_datapoints_in_imfile",
                        lambda **kw: (det, [list(RES)] * 3))
    monkeypatch.setattr(cc, "run_initial_calibration",
                        lambda *a, **kw: cams)
    monkeypatch.setattr(CameraSet, "set_resolutions_from_file",
                        lambda self, floc: None)
    rc = cli.main(["calibrate", str(tmp_path), "--target", "charuco",
                   "--outliers", "n",
                   "--rolling-shutter", str(TRUE_READOUTS[0]),
                   "--backend", "structured"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "rolling-shutter readouts" in out
    assert "calibrated 3 cameras" in out
    import re
    got = dict(re.findall(r"(cam\d)=([\d.]+)", out))
    assert abs(float(got["cam1"]) - TRUE_READOUTS[1]) < 0.05
    assert abs(float(got["cam2"]) - TRUE_READOUTS[2]) < 0.05
    # the readouts land in a track --sync-consumable JSON
    import json
    rec = json.loads((tmp_path / "rolling_shutter.json").read_text())
    assert rec["cam_names"] == ["cam0", "cam1", "cam2"]
    assert abs(rec["readout_frames"][1] - TRUE_READOUTS[1]) < 0.05


def test_rs_uncertainty_raises_clearly():
    """calibration_uncertainty on an RS solve names the actual gap
    instead of surfacing the backend guard's confusing message."""
    from pycamset_tpu.optim.driver import run_bundle_adjustment

    cams = _ring_rig()
    tpl = _grid_template()
    dd, _p, _v = _rs_capture(cams, tpl, 6, TRUE_READOUTS, noise=0.1,
                             seed=2)
    handler = _rs_handler(cams, tpl, dd, TRUE_READOUTS[0])
    _res, solved = run_bundle_adjustment(handler, backend="structured")
    with pytest.raises(NotImplementedError, match="rolling-shutter"):
        solved.calibration_uncertainty()
