"""Wand (targetless) extrinsic calibration (calibration/wand.py).

Oracle: a synthetic capture projected through a KNOWN rig — the
recovered extrinsics (camera-0 frame, wand-metric scale) must match the
generating rig's relative geometry at the noise floor, regardless of
the (scrambled) extrinsics on the input camset.
"""
import numpy as np
import pytest

from pycamset_tpu.calibration.wand import (calibrate_extrinsics_from_wand,
                                           register_cameras_incremental)
from pycamset_tpu.models.camera_set import CameraSet, make_cam_dict
from pycamset_tpu.utils.general_utils import make_4x4h_tform
from pycamset_tpu.utils.synthetic import look_at_extrinsic

SPACING = 0.25
WAND = np.array([[0.0, 0, 0], [SPACING, 0, 0], [2 * SPACING, 0, 0]])


def _ring_rig(n=4, radius=1.6, z=0.7, f=1400.0, scramble=False):
    names, exts, kmats, dists = [], [], [], []
    rng = np.random.default_rng(11)
    for i in range(n):
        ang = 2 * np.pi * i / n
        pos = np.array([radius * np.cos(ang), radius * np.sin(ang), z])
        ext = look_at_extrinsic(pos, np.zeros(3))
        if scramble:  # the input camset's extrinsics must not matter
            ext = make_4x4h_tform(rng.normal(size=3),
                                  rng.normal(size=3))
        exts.append(ext)
        kmats.append(np.array([[f, 0, 800.0], [0, f, 600.0], [0, 0, 1]]))
        dists.append(np.array([-0.12, 0.03, 1e-4, -1e-4, 0.0]))
        names.append(f"cam{i}")
    return CameraSet(camera_dict=make_cam_dict(
        names, exts, kmats, dists, [[1600, 1200]] * n))


def _wand_capture(true_cams, n_frames=150, noise=0.2, seed=0,
                  drop_cam_frame=0.3, skip_cam=None):
    """Wave the 3-marker wand through the volume; rows
    [cam, frame, marker, u, v]."""
    rng = np.random.default_rng(seed)
    names = true_cams.get_names()
    rows = []
    ph = 2 * np.pi * np.arange(n_frames) / n_frames
    for j in range(n_frames):
        pos = np.array([0.45 * np.sin(ph[j] * 2),
                        0.45 * np.cos(ph[j] * 3 + 0.6),
                        0.35 * np.sin(ph[j] + 1.1)])
        rvec = np.array([1.8 * np.sin(ph[j] * 2 + 0.3),
                         1.5 * np.cos(ph[j]),
                         1.1 * np.sin(ph[j] * 3)])
        tf = make_4x4h_tform(rvec, pos)
        world = WAND @ tf[:3, :3].T + tf[:3, 3]
        for c, name in enumerate(names):
            if skip_cam is not None and c == skip_cam:
                continue
            if rng.uniform() < drop_cam_frame:
                continue
            cam = true_cams[name]
            z = (world @ cam.extrinsic[:3, :3].T + cam.extrinsic[:3, 3])[:, 2]
            uv = np.asarray(cam.project_points(world))
            ok = ((z > 0.1) & (uv[:, 0] > 0) & (uv[:, 0] < 1600)
                  & (uv[:, 1] > 0) & (uv[:, 1] < 1200))
            kk = np.flatnonzero(ok)
            obs = uv[kk] + rng.normal(size=(kk.size, 2)) * noise
            rows.append(np.column_stack([
                np.full(kk.size, c), np.full(kk.size, j), kk, obs]))
    return np.concatenate(rows)


def _relative_errors(solved, truth):
    """Max rotation (rad) / translation error of every cam-0-relative
    transform (both solutions expressed in their own cam-0 frame)."""
    names = truth.get_names()
    e0s = np.linalg.inv(solved[names[0]].extrinsic)
    e0t = np.linalg.inv(truth[names[0]].extrinsic)
    rot, trans = 0.0, 0.0
    for n in names[1:]:
        rs = solved[n].extrinsic @ e0s
        rt = truth[n].extrinsic @ e0t
        dr = rs[:3, :3] @ rt[:3, :3].T
        ang = np.arccos(np.clip((np.trace(dr) - 1) / 2, -1, 1))
        rot = max(rot, float(ang))
        trans = max(trans, float(np.linalg.norm(rs[:3, 3] - rt[:3, 3])))
    return rot, trans


def test_wand_recovers_extrinsics_metric():
    truth = _ring_rig()
    dd = _wand_capture(truth, noise=0.2, seed=1)
    stale = _ring_rig(scramble=True)   # garbage input extrinsics
    solved, rep = calibrate_extrinsics_from_wand(stale, dd,
                                                 wand_template=WAND)
    assert rep["rms_px"] < 0.3
    rot, trans = _relative_errors(solved, truth)
    assert rot < 2e-4            # 0.2 mrad
    assert trans < 1.5e-3        # metres, metric thanks to the wand
    assert rep["metric"] and rep["wand_lengths"]["n_segments"] > 100
    assert rep["wand_lengths"]["relative_spread_rms"] < 5e-3
    assert set(rep["registration_order"]) == set(truth.get_names())
    # camera 0 is the world frame
    assert np.allclose(solved["cam0"].extrinsic, np.eye(4), atol=1e-12)
    # wand points came back at the true metric positions (up to the
    # cam0-frame change): check segment lengths directly
    pts = rep["wand_points"]
    assert abs(np.median(np.linalg.norm(
        pts[1::3] - pts[0::3], axis=1)) - SPACING) < 1e-3


def test_wand_without_template_is_unit_scale(caplog):
    import logging
    truth = _ring_rig(n=3)
    dd = _wand_capture(truth, noise=0.2, seed=2)
    with caplog.at_level(logging.WARNING):
        solved, rep = calibrate_extrinsics_from_wand(_ring_rig(n=3), dd)
    assert not rep["metric"] and rep["scale_applied"] == 1.0
    assert any("scale" in r.message for r in caplog.records)
    # geometry is right up to ONE global scale
    rot, _ = _relative_errors(solved, truth)
    assert rot < 3e-4
    names = truth.get_names()
    s = (np.linalg.norm(solved[names[1]].extrinsic[:3, 3])
         / np.linalg.norm((truth[names[1]].extrinsic
                           @ np.linalg.inv(truth[names[0]].extrinsic))[:3, 3]))
    t_err = []
    for n in names[1:]:
        rs = solved[n].extrinsic
        rt = truth[n].extrinsic @ np.linalg.inv(truth[names[0]].extrinsic)
        t_err.append(np.linalg.norm(rs[:3, 3] / s - rt[:3, 3]))
    assert max(t_err) < 2e-3


def test_disconnected_camera_raises():
    truth = _ring_rig()
    dd = _wand_capture(truth, seed=3, skip_cam=3)
    # camera 3 recorded nothing that overlaps the others
    solo = np.array([[3.0, 0, 0, 800.0, 600.0]])
    with pytest.raises(ValueError, match="connect|too few"):
        calibrate_extrinsics_from_wand(
            _ring_rig(), np.concatenate([dd, solo]), wand_template=WAND)


def test_cli_wand_wiring(tmp_path, capsys):
    import json

    import pycamset_tpu.__main__ as cli
    from pycamset_tpu.utils.saving import load_CameraSet

    truth = _ring_rig()
    dd = _wand_capture(truth, noise=0.2, seed=5)
    det_path = tmp_path / "wand.npy"
    np.save(det_path, dd)
    stale = _ring_rig(scramble=True)
    camset_path = tmp_path / "rig.camset"
    stale.save(camset_path)
    save = tmp_path / "solved.camset"
    out = tmp_path / "report.json"
    rc = cli.main(["wand", str(det_path), "--camset", str(camset_path),
                   "--spacing", str(SPACING), "--save", str(save),
                   "--out", str(out)])
    assert rc == 0
    rep = json.loads(out.read_text())
    assert rep["rms_px"] < 0.3 and rep["metric"]
    solved = load_CameraSet(save)
    rot, trans = _relative_errors(solved, truth)
    assert rot < 3e-4 and trans < 2e-3


def _draw_wand_frame(uv, res=(320, 240), radius=2.5):
    """Render bright anti-aliased discs at subpixel positions."""
    import cv2
    img = np.full((res[1], res[0]), 20, np.uint8)
    shift = 4
    for p in uv:
        cv2.circle(img, (int(round(p[0] * 16)), int(round(p[1] * 16))),
                   int(radius * 16), 255, -1, lineType=cv2.LINE_AA,
                   shift=shift)
    return img


def test_detect_wand_markers_subpixel_and_ordering():
    from pycamset_tpu.calibration.wand import detect_wand_markers
    # asymmetric gaps: short (40 px) then long (80 px)
    truth = np.array([[60.25, 100.5], [100.7, 110.25], [180.4, 130.75]])
    img = _draw_wand_frame(truth)
    pts = detect_wand_markers(img, 3)
    assert pts is not None
    assert np.abs(pts - truth).max() < 0.15
    # mirrored view: identity must be preserved (short gap first)
    pts_m = detect_wand_markers(img[:, ::-1].copy(), 3)
    assert np.abs(pts_m - np.column_stack(
        [319 - truth[:, 0], truth[:, 1]])).max() < 0.2
    # a frame without markers declines
    assert detect_wand_markers(np.full((240, 320), 20, np.uint8), 3) is None


def test_cli_wand_from_rendered_images(tmp_path):
    """Full image E2E: rendered wand frames per camera folder -> blob
    detection -> registration -> device BA -> calibrated rig."""
    import json

    import cv2

    import pycamset_tpu.__main__ as cli
    from pycamset_tpu.utils.saving import load_CameraSet

    res = (320, 240)
    f = 280.0
    names, exts, kmats = [], [], []
    for i in range(3):
        ang = 2 * np.pi * i / 3
        pos = np.array([1.6 * np.cos(ang), 1.6 * np.sin(ang), 0.7])
        exts.append(look_at_extrinsic(pos, np.zeros(3)))
        kmats.append(np.array([[f, 0, res[0] / 2], [0, f, res[1] / 2],
                               [0, 0, 1]]))
        names.append(f"cam{i}")
    truth = CameraSet(camera_dict=make_cam_dict(
        names, exts, kmats, [np.zeros(5)] * 3, [list(res)] * 3))

    rng = np.random.default_rng(6)
    n_frames = 60
    ph = 2 * np.pi * np.arange(n_frames) / n_frames
    for c, name in enumerate(names):
        (tmp_path / name).mkdir()
    wand_img = np.array([[0.0, 0, 0], [0.18, 0, 0], [0.5, 0, 0]])
    for j in range(n_frames):
        pos = np.array([0.4 * np.sin(ph[j] * 2),
                        0.4 * np.cos(ph[j] * 3 + 0.6),
                        0.3 * np.sin(ph[j] + 1.1)])
        rvec = np.array([1.8 * np.sin(ph[j] * 2 + 0.3),
                         1.5 * np.cos(ph[j]), 1.1 * np.sin(ph[j] * 3)])
        tf = make_4x4h_tform(rvec, pos)
        world = wand_img @ tf[:3, :3].T + tf[:3, 3]
        for c, name in enumerate(names):
            cam = truth[name]
            uv = np.asarray(cam.project_points(world))
            img = _draw_wand_frame(
                uv[(uv[:, 0] > 5) & (uv[:, 0] < res[0] - 5)
                   & (uv[:, 1] > 5) & (uv[:, 1] < res[1] - 5)], res=res)
            cv2.imwrite(str(tmp_path / name / f"{j:04d}.png"), img)

    stale = CameraSet(camera_dict=make_cam_dict(
        names, [np.eye(4)] * 3, kmats, [np.zeros(5)] * 3, [list(res)] * 3))
    camset_path = tmp_path / "rig.camset"
    stale.save(camset_path)
    wand_path = tmp_path / "wand.json"
    wand_path.write_text(json.dumps(wand_img.tolist()))
    save = tmp_path / "solved.camset"
    out = tmp_path / "report.json"
    rc = cli.main(["wand", str(tmp_path), "--camset", str(camset_path),
                   "--markers", "3", "--wand-template", str(wand_path),
                   "--save", str(save), "--out", str(out)])
    assert rc == 0
    rep = json.loads(out.read_text())
    assert rep["rms_px"] < 0.5          # blob-centroid noise floor
    solved = load_CameraSet(save)
    rot, trans = _relative_errors(solved, truth)
    assert rot < 3e-3 and trans < 8e-3


def test_registration_seed_pair_override():
    truth = _ring_rig()
    dd = _wand_capture(truth, noise=0.1, seed=4)
    from pycamset_tpu.calibration.wand import _normalized_obs
    norm = _normalized_obs(truth, dd)
    obs = {c: {} for c in range(4)}
    g = dd[:, 1].astype(int) * 3 + dd[:, 2].astype(int)
    for i in range(len(dd)):
        obs[int(dd[i, 0])][int(g[i])] = norm[i]
    exts, pts, order = register_cameras_incremental(
        obs, 4, seed_pair=(2, 3), ransac_norm=2.0 / 1400)
    assert order[:2] == [2, 3]
    assert len(pts) > 200 and len(exts) == 4
