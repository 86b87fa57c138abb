"""Streaming marker-cloud reconstruction (pycamset_tpu/markers.py)."""
import numpy as np
import pytest

from pycamset_tpu.markers import MarkerTriangulator
from pycamset_tpu.models.camera_set import CameraSet, make_cam_dict
from pycamset_tpu.utils.synthetic import look_at_extrinsic

N_MARKERS = 5


def _rig(n=4, f=1400.0):
    names, exts, kmats, dists = [], [], [], []
    for i in range(n):
        ang = 2 * np.pi * i / n
        pos = np.array([1.5 * np.cos(ang), 1.5 * np.sin(ang), 0.6])
        exts.append(look_at_extrinsic(pos, np.zeros(3)))
        kmats.append(np.array([[f, 0, 800.0], [0, f, 600.0], [0, 0, 1]]))
        dists.append(np.array([-0.15, 0.04, 1e-4, -1e-4, 0.0]))
        names.append(f"cam{i}")
    return CameraSet(camera_dict=make_cam_dict(
        names, exts, kmats, dists, [[1600, 1200]] * n))


def _capture(cams, n_frames=30, noise=0.2, seed=0, occlude=None):
    """Markers on independent smooth paths; rows [cam,frame,marker,u,v].
    ``occlude``: (frame, marker) pairs stripped to < 2 cameras."""
    rng = np.random.default_rng(seed)
    names = cams.get_names()
    ph = 2 * np.pi * np.arange(n_frames) / n_frames
    truth = np.zeros((n_frames, N_MARKERS, 3))
    rows = []
    for m in range(N_MARKERS):
        truth[:, m, 0] = 0.35 * np.sin(ph * (1 + m % 3) + m)
        truth[:, m, 1] = 0.35 * np.cos(ph * (2 + m % 2) + 0.7 * m)
        truth[:, m, 2] = 0.25 * np.sin(ph + 1.3 * m)
    for j in range(n_frames):
        for c, name in enumerate(names):
            cam = cams[name]
            uv = np.asarray(cam.project_points(truth[j]))
            z = (truth[j] @ cam.extrinsic[:3, :3].T
                 + cam.extrinsic[:3, 3])[:, 2]
            ok = ((z > 0.1) & (uv[:, 0] > 0) & (uv[:, 0] < 1600)
                  & (uv[:, 1] > 0) & (uv[:, 1] < 1200))
            for m in np.flatnonzero(ok):
                if occlude and (j, m) in occlude and c != 0:
                    continue  # leave only camera 0
                rows.append([c, j, m,
                             uv[m, 0] + rng.normal() * noise,
                             uv[m, 1] + rng.normal() * noise])
    return np.asarray(rows, dtype=float), truth


def test_reconstruct_accuracy_and_sigma():
    cams = _rig()
    dd, truth = _capture(cams, noise=0.2, seed=1)
    tri = MarkerTriangulator(cams, N_MARKERS)
    pts, info = tri.reconstruct(dd)
    assert pts.shape == truth.shape
    seen = info["n_views"] >= 2
    err = np.linalg.norm(pts - truth, axis=-1)
    assert np.nanmedian(err[seen]) < 3e-4          # sub-mm at 0.2 px
    assert abs(np.nanmean(info["rms"][seen]) - 0.2) < 0.1
    # sigma is honest: per-point dof-scaled variance is noisy at 2-3
    # views (dof 1-3), so test the population, not the worst case
    per_axis = np.abs(pts - truth)
    ratio = (per_axis[seen] / np.maximum(info["sigma"][seen], 1e-12))
    assert 0.2 < np.median(ratio) < 3.0
    assert np.mean(ratio < 5.0) > 0.95
    assert np.isfinite(info["sigma"][seen]).all()


def test_gn_polish_beats_raw_dlt_under_distortion():
    cams = _rig()
    dd, truth = _capture(cams, noise=0.0, seed=2)
    raw = MarkerTriangulator(cams, N_MARKERS, refine_iters=0)
    ref = MarkerTriangulator(cams, N_MARKERS, refine_iters=3)
    pts0, info0 = raw.reconstruct(dd)
    pts1, info1 = ref.reconstruct(dd)
    e0 = np.nanmedian(np.linalg.norm(pts0 - truth, axis=-1))
    e1 = np.nanmedian(np.linalg.norm(pts1 - truth, axis=-1))
    # at zero noise the polish solves the true pixel problem exactly
    assert e1 < 1e-7
    assert e1 < 0.5 * e0
    assert np.nanmax(info1["rms"]) < 1e-5


def test_underdetermined_markers_are_nan_with_inf_sigma():
    cams = _rig()
    occl = {(3, 1), (7, 4)}
    dd, truth = _capture(cams, noise=0.1, seed=3, occlude=occl)
    tri = MarkerTriangulator(cams, N_MARKERS)
    pts, info = tri.reconstruct(dd)
    for (j, m) in occl:
        assert info["n_views"][j, m] < 2
        assert np.isnan(pts[j, m]).all()
        assert np.isinf(info["sigma"][j, m]).all()
    # everything else unaffected
    seen = info["n_views"] >= 2
    assert np.nanmedian(np.linalg.norm(
        (pts - truth)[seen], axis=-1)) < 3e-4


def test_cli_markers_wiring(tmp_path):
    import json

    import pycamset_tpu.__main__ as cli

    cams = _rig(n=3)
    dd, truth = _capture(cams, n_frames=6, noise=0.1, seed=4)
    det_path = tmp_path / "markers.npy"
    np.save(det_path, dd)
    camset_path = tmp_path / "rig.camset"
    cams.save(camset_path)
    out = tmp_path / "cloud.json"
    rc = cli.main(["markers", str(det_path), "--camset", str(camset_path),
                   "--out", str(out)])
    assert rc == 0
    recs = json.loads(out.read_text())
    assert len(recs) == 6 and len(recs[0]["points"]) == N_MARKERS
    p0 = np.asarray(recs[2]["points"], dtype=float)
    ok = ~np.isnan(p0).any(axis=1)
    assert np.abs(p0[ok] - truth[2][ok]).max() < 2e-3


def test_marker_id_bounds_checked():
    cams = _rig(n=2)
    tri = MarkerTriangulator(cams, 2)
    with pytest.raises(ValueError, match="n_markers"):
        tri.reconstruct(np.array([[0, 0, 5, 800.0, 600.0]]))
