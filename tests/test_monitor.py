"""Rig health monitoring + extrinsic-only recalibration."""
import numpy as np
import pytest


def _rig(n_cams=4, n_ims=10, noise=0.2, seed=21):
    from pycamset_tpu.models.camera_set import CameraSet, make_cam_dict
    from pycamset_tpu.models.detections import TargetDetection
    from pycamset_tpu.optim.handlers import FreePointTarget
    from pycamset_tpu.utils.general_utils import make_4x4h_tform
    from pycamset_tpu.utils.synthetic import make_synthetic_rig

    rig = make_synthetic_rig(n_cams=n_cams, n_ims=n_ims, grid=6,
                             visibility=0.9, noise_px=noise, seed=seed)
    names = [f"cam{c}" for c in range(n_cams)]
    k_mats, exts, dists = [], [], []
    for c in range(n_cams):
        i = rig["intr"][c]
        k_mats.append(np.array([[i[0], 0, i[1]], [0, i[2], i[3]],
                                [0, 0, 1]]))
        dists.append(i[4:])
        exts.append(make_4x4h_tform(rig["extr"][c][:3], rig["extr"][c][3:]))
    cams = CameraSet(camera_dict=make_cam_dict(
        names, exts, k_mats, dists, [[1600, 1200]] * n_cams))
    target = FreePointTarget(rig["template"].reshape(1, -1, 3))
    det = TargetDetection(cam_names=names, data=rig["dd"])
    return cams, det, target, rig


def _bump(cams, name, rot_rad=0.004, shift=0.004):
    """Return a copy of the rig with one camera's STORED extrinsic stale
    (the physical camera moved; detections reflect the true position)."""
    import copy

    import cv2
    stale = copy.deepcopy(cams)
    old = stale[name].extrinsic.copy()
    d = np.eye(4)
    d[:3, :3] = cv2.Rodrigues(np.array([rot_rad, 0.0, 0.0]))[0]
    d[:3, 3] = [shift, 0.0, 0.0]
    stale[name].set_extrinsic(d @ old)
    return stale


def test_rig_health_clean():
    from pycamset_tpu.calibration.monitor import rig_health
    cams, det, target, rig = _rig()
    rep = rig_health(cams, det, target)
    assert rep["drifted"] == []
    assert rep["overall_rms_px"] < 2 * rig["noise_px"]
    for name, v in rep["per_camera_rms_px"].items():
        assert v < 3 * rig["noise_px"], name
    for name, v in rep["leave_one_out_rms_px"].items():
        assert np.isfinite(v) and v < 4 * rig["noise_px"], name
    assert len(rep["per_image_rms_px"]) == 10
    assert rep["poses"].shape == (10, 4, 4)


def test_rig_health_flags_the_bumped_camera():
    from pycamset_tpu.calibration.monitor import rig_health
    cams, det, target, rig = _rig()
    stale = _bump(cams, "cam2")
    rep = rig_health(stale, det, target)
    assert rep["drifted"] == ["cam2"]
    loo = rep["leave_one_out_rms_px"]
    others = [loo[n] for n in loo if n != "cam2"]
    assert loo["cam2"] > 3 * max(others)


def test_recalibrate_extrinsics_recovers_the_bump():
    from pycamset_tpu.calibration.monitor import (recalibrate_extrinsics,
                                                  rig_health)
    cams, det, target, rig = _rig()
    stale = _bump(cams, "cam2")
    fixed, rep = recalibrate_extrinsics(stale, det, target,
                                        refresh=["cam2"])
    # placement recovered to the truth the detections encode
    true_ext = cams["cam2"].extrinsic
    got = fixed["cam2"].extrinsic
    assert np.abs(got[:3, 3] - true_ext[:3, 3]).max() < 1e-3
    assert np.abs(got[:3, :3] - true_ext[:3, :3]).max() < 1e-3
    # anchors untouched
    for n in ("cam0", "cam1", "cam3"):
        assert np.allclose(fixed[n].extrinsic, stale[n].extrinsic)
        assert np.allclose(fixed[n].intrinsic, stale[n].intrinsic)
    # intrinsics pinned on the refreshed camera too
    assert np.allclose(fixed["cam2"].intrinsic, stale["cam2"].intrinsic)
    assert rep["rms_px"] < 2 * rig["noise_px"]
    d = rep["deltas"]["cam2"]
    # the injected bump was 4 mrad / ~4 mm
    assert 2.0 < d["rotation_mrad"] < 6.0
    assert 2.0 < d["translation_mm"] < 6.0
    # and the refreshed rig is healthy again
    health = rig_health(fixed, det, target)
    assert health["drifted"] == []


def test_cli_monitor_with_auto_refresh(tmp_path, monkeypatch, capsys):
    import json

    import pycamset_tpu.__main__ as cli
    import pycamset_tpu.calibration.camera_calibrator as cc
    from pycamset_tpu.utils.saving import load_CameraSet

    cams, det, target, rig = _rig()
    stale = _bump(cams, "cam1")
    camset_path = tmp_path / "rig.camset"
    stale.save(camset_path)
    monkeypatch.setattr(cli, "_make_target", lambda args: target)
    monkeypatch.setattr(cc, "detect_datapoints_in_imfile",
                        lambda **kw: (det, None))
    out = tmp_path / "health.json"
    save = tmp_path / "fixed.camset"
    rc = cli.main(["monitor", str(tmp_path), "--camset", str(camset_path),
                   "--refresh", "auto", "--save", str(save),
                   "--out", str(out)])
    assert rc == 0
    rep = json.loads(out.read_text())
    assert rep["drifted"] == ["cam1"]
    assert rep["refresh"]["refreshed"] == ["cam1"]
    assert rep["refresh"]["rms_px"] < 2 * rig["noise_px"]
    fixed = load_CameraSet(save)
    assert np.abs(fixed["cam1"].extrinsic[:3, 3]
                  - cams["cam1"].extrinsic[:3, 3]).max() < 1.5e-3

    # lens variant: a refocused camera repaired through --refresh-lens
    import copy
    stale2 = copy.deepcopy(cams)
    k = stale2["cam3"].intrinsic.copy()
    k[0, 0] *= 1.01
    k[1, 1] *= 1.01
    stale2["cam3"].intrinsic = k
    stale2["cam3"]._update_state()
    camset2 = tmp_path / "rig2.camset"
    stale2.save(camset2)
    out2 = tmp_path / "health2.json"
    save2 = tmp_path / "fixed2.camset"
    rc = cli.main(["monitor", str(tmp_path), "--camset", str(camset2),
                   "--refresh-lens", "auto", "--save", str(save2),
                   "--out", str(out2)])
    assert rc == 0
    rep2 = json.loads(out2.read_text())
    assert rep2["drifted"] == ["cam3"]
    assert rep2["refresh"]["deltas"]["cam3"]["focal_px"] > 10.0
    fixed2 = load_CameraSet(save2)
    assert np.abs(fixed2["cam3"].intrinsic[0, 0]
                  - cams["cam3"].intrinsic[0, 0]) < 1.0

    # the two refresh modes are mutually exclusive
    assert cli.main(["monitor", str(tmp_path), "--camset", str(camset2),
                     "--refresh", "auto", "--refresh-lens", "auto"]) == 2


def test_recalibrate_intrinsics_recovers_a_refocus():
    import copy

    from pycamset_tpu.calibration.monitor import (recalibrate_intrinsics,
                                                  rig_health)
    cams, det, target, rig = _rig()
    stale = copy.deepcopy(cams)
    k = stale["cam1"].intrinsic.copy()
    k[0, 0] *= 1.01                      # refocus: ~15 px focal shift
    k[1, 1] *= 1.01
    stale["cam1"].intrinsic = k
    stale["cam1"]._update_state()
    assert rig_health(stale, det, target)["drifted"] == ["cam1"]

    fixed, rep = recalibrate_intrinsics(stale, det, target,
                                        refresh=["cam1"])
    true_k = cams["cam1"].intrinsic
    assert np.abs(fixed["cam1"].intrinsic[0, 0] - true_k[0, 0]) < 1.0
    assert np.abs(fixed["cam1"].intrinsic[1, 1] - true_k[1, 1]) < 1.0
    # placements and the other lenses untouched
    for n in cams.get_names():
        assert np.allclose(fixed[n].extrinsic, stale[n].extrinsic)
        if n != "cam1":
            assert np.allclose(fixed[n].intrinsic, stale[n].intrinsic)
    assert rep["rms_px"] < 2 * rig["noise_px"]
    assert rep["deltas"]["cam1"]["focal_px"] > 10.0
    assert rig_health(fixed, det, target)["drifted"] == []


def test_recalibrate_extrinsics_default_refresh_and_validation():
    from pycamset_tpu.calibration.monitor import recalibrate_extrinsics
    cams, det, target, rig = _rig(n_ims=8)
    stale = _bump(cams, "cam3")
    fixed, rep = recalibrate_extrinsics(stale, det, target)  # all but cam0
    assert rep["anchors"] == ["cam0"]
    assert np.abs(fixed["cam3"].extrinsic[:3, 3]
                  - cams["cam3"].extrinsic[:3, 3]).max() < 1.5e-3
    with pytest.raises(ValueError, match="unknown cameras"):
        recalibrate_extrinsics(stale, det, target, refresh=["nope"])
    with pytest.raises(ValueError, match="anchor"):
        recalibrate_extrinsics(stale, det, target,
                               refresh=list(cams.get_names()))
