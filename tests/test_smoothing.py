"""Trajectory smoothing (pycamset_tpu/smoothing.py).

Oracles: a from-scratch numpy RTS smoother (parity on random problems),
synthetic constant-velocity trajectories with known noise (the smoother
must beat the raw measurements), and gap interpolation through marked
lost frames. The tracker integration test feeds real ``track_batch``
covariances through the smoother.
"""
import numpy as np
import pytest

from pycamset_tpu.smoothing import (smooth_pose_trajectory, unwrap_rvecs,
                                    _build_cv_model)
from pycamset_tpu.utils.general_utils import ext_4x4_to_rod, make_4x4h_tform


def _numpy_rts(z, r_all, f, q, x0, p0):
    """Reference RTS smoother, straight from the textbook equations."""
    n = len(z)
    h = np.zeros((6, 12))
    h[:, :6] = np.eye(6)
    xf, pf, xp, pp = [], [], [], []
    x, p = x0, p0
    for k in range(n):
        s = h @ p @ h.T + r_all[k]
        kk = p @ h.T @ np.linalg.inv(s)
        x = x + kk @ (z[k] - h @ x)
        ikh = np.eye(12) - kk @ h
        p = ikh @ p @ ikh.T + kk @ r_all[k] @ kk.T
        xf.append(x); pf.append(p)
        x, p = f @ x, f @ p @ f.T + q
        xp.append(x); pp.append(p)
    xs, ps = [None] * n, [None] * n
    xs[-1], ps[-1] = xf[-1], pf[-1]
    for k in range(n - 2, -1, -1):
        g = pf[k] @ f.T @ np.linalg.inv(pp[k])
        xs[k] = xf[k] + g @ (xs[k + 1] - xp[k])
        ps[k] = pf[k] + g @ (ps[k + 1] - pp[k]) @ g.T
    return np.stack(xs), np.stack(ps)


def _noisy_cv_trajectory(n=60, seed=0, sigma_r=0.01, sigma_t=0.02):
    """Ground-truth constant-velocity pose path + noisy measurements."""
    rng = np.random.default_rng(seed)
    rv0 = np.array([0.2, -0.1, 0.05])
    om = np.array([0.01, 0.02, -0.005])
    t0 = np.array([0.1, -0.2, 1.0])
    vt = np.array([0.01, -0.005, 0.02])
    ts = np.arange(n)
    true6 = np.concatenate([rv0 + ts[:, None] * om,
                            t0 + ts[:, None] * vt], axis=1)
    noise = np.concatenate([rng.normal(0, sigma_r, (n, 3)),
                            rng.normal(0, sigma_t, (n, 3))], axis=1)
    meas6 = true6 + noise
    cov = np.tile(np.diag([sigma_r ** 2] * 3 + [sigma_t ** 2] * 3),
                  (n, 1, 1))
    return true6, meas6, cov


def test_matches_numpy_rts_reference():
    true6, meas6, cov = _noisy_cv_trajectory(n=40, seed=1)
    dt, qr, qt = 1.0, 1e-4, 1e-4
    sm_poses, sm_sig = smooth_pose_trajectory(meas6, pose_cov=cov, dt=dt,
                                              q_rot=qr, q_trans=qt)
    f, q = _build_cv_model(dt, qr, qt, np.float64)
    x0 = np.concatenate([meas6[0], np.zeros(6)])
    p0 = np.eye(12)
    p0[:6, :6] = cov[0]
    p0[6:, 6:] *= 1e2 * max(qr, qt)
    xs, ps = _numpy_rts(meas6, cov, f, q, x0, p0)
    ours6 = np.stack([np.concatenate(ext_4x4_to_rod(t)) for t in sm_poses])
    assert np.allclose(ours6, xs[:, :6], atol=1e-8)
    ref_sig = np.sqrt(np.einsum("fii->fi", ps[:, :6, :6]))
    assert np.allclose(sm_sig, ref_sig, atol=1e-8)


def test_beats_raw_measurements():
    true6, meas6, cov = _noisy_cv_trajectory(n=80, seed=2)
    sm_poses, _ = smooth_pose_trajectory(meas6, pose_cov=cov,
                                         q_rot=1e-5, q_trans=1e-5)
    sm6 = np.stack([np.concatenate(ext_4x4_to_rod(t)) for t in sm_poses])
    raw_err = np.linalg.norm(meas6 - true6, axis=1)
    sm_err = np.linalg.norm(sm6 - true6, axis=1)
    # the smoother uses the whole trajectory: expect a large average win
    assert sm_err.mean() < 0.4 * raw_err.mean()


def test_gap_interpolation():
    true6, meas6, cov = _noisy_cv_trajectory(n=60, seed=3)
    # frames 25..34 lost: non-finite covariance marks them
    cov = cov.copy()
    cov[25:35] = np.inf
    meas6 = meas6.copy()
    meas6[25:35] = 123.0  # garbage measurements must be ignored
    sm_poses, sm_sig = smooth_pose_trajectory(meas6, pose_cov=cov,
                                              q_rot=1e-5, q_trans=1e-5)
    sm6 = np.stack([np.concatenate(ext_4x4_to_rod(t)) for t in sm_poses])
    gap_err = np.linalg.norm(sm6[25:35] - true6[25:35], axis=1)
    assert gap_err.max() < 0.05     # interpolated through the gap
    # and the smoother is honest: gap sigmas exceed tracked-frame sigmas
    assert sm_sig[30].mean() > 2 * sm_sig[10].mean()


def test_velocity_estimate():
    true6, meas6, cov = _noisy_cv_trajectory(n=80, seed=4)
    _, vel, _ = smooth_pose_trajectory(meas6, pose_cov=cov,
                                       q_rot=1e-6, q_trans=1e-6,
                                       return_velocity=True)
    true_vel = np.concatenate([[0.01, 0.02, -0.005], [0.01, -0.005, 0.02]])
    mid = vel[20:60]
    assert np.allclose(mid.mean(axis=0), true_vel, atol=2e-3)


def test_unwrap_rvecs_across_pi():
    # spin steadily about z through the pi boundary
    th = np.linspace(3.0, 3.6, 13)          # crosses pi ~ 3.1416
    rv = []
    for t in th:
        # cv2/rodrigues canonical representative has angle <= pi
        ang = t if t <= np.pi else t - 2 * np.pi
        rv.append([0, 0, ang])
    un = unwrap_rvecs(np.array(rv))
    # continuity restored: the unwrapped z-angle is monotone ~ th
    assert np.allclose(un[:, 2], th, atol=1e-12)
    d = np.diff(un[:, 2])
    assert np.all(d > 0)


def test_4x4_input_and_output_shape():
    true6, meas6, cov = _noisy_cv_trajectory(n=20, seed=5)
    mats = np.stack([make_4x4h_tform(m[:3], m[3:]) for m in meas6])
    sm, sig = smooth_pose_trajectory(mats, pose_cov=cov)
    assert sm.shape == (20, 4, 4)
    assert sig.shape == (20, 6)
    # valid rigid transforms out
    for m in sm:
        assert np.allclose(m[:3, :3] @ m[:3, :3].T, np.eye(3), atol=1e-10)
        assert np.allclose(m[3], [0, 0, 0, 1])


def test_input_validation():
    with pytest.raises(ValueError, match="at least 2"):
        smooth_pose_trajectory(np.zeros((1, 6)))
    with pytest.raises(ValueError, match="poses must be"):
        smooth_pose_trajectory(np.zeros((5, 7)))


def _tracker_rig(n_ims=24, seed=11):
    from pycamset_tpu.models.camera_set import CameraSet, make_cam_dict
    from pycamset_tpu.models.detections import TargetDetection
    from pycamset_tpu.utils.general_utils import make_4x4h_tform as mk
    from pycamset_tpu.utils.synthetic import make_synthetic_rig

    rig = make_synthetic_rig(n_cams=3, n_ims=n_ims, grid=4,
                             visibility=0.95, noise_px=0.3, seed=seed)
    k_mats, exts, dists = [], [], []
    for c in range(3):
        i9 = rig["intr"][c]
        k_mats.append(np.array([[i9[0], 0, i9[1]], [0, i9[2], i9[3]],
                                [0, 0, 1]]))
        dists.append(i9[4:])
        exts.append(mk(rig["extr"][c][:3], rig["extr"][c][3:]))
    cams = CameraSet(camera_dict=make_cam_dict(
        ["a", "b", "c"], exts, k_mats, dists, [[1600, 1200]] * 3))

    class _Tgt:
        point_data = rig["template"].reshape(-1, 3)

    det = TargetDetection(cam_names=["a", "b", "c"], data=rig["dd"])
    return cams, det, _Tgt(), rig


def test_cli_track_smooth(tmp_path, monkeypatch):
    import json

    import pycamset_tpu.__main__ as cli
    import pycamset_tpu.calibration.camera_calibrator as cc

    cams, det, target, rig = _tracker_rig()
    camset_path = tmp_path / "rig.camset"
    cams.save(camset_path)
    monkeypatch.setattr(cli, "_make_target", lambda args: target)
    monkeypatch.setattr(cc, "detect_datapoints_in_imfile",
                        lambda **kw: (det, None))
    out = tmp_path / "poses.json"
    rc = cli.main(["track", str(tmp_path), "--camset", str(camset_path),
                   "--target", "charuco", "--smooth",
                   "--q-rot", "1e-2", "--q-trans", "1e-2",
                   "--out", str(out)])
    assert rc == 0
    records = json.loads(out.read_text())
    assert len(records) == 24
    for rec in records:
        assert np.array(rec["pose"]).shape == (4, 4)
        assert len(rec["velocity"]) == 6
        assert all(v is not None and v >= 0 for v in rec["pose_sigma"])


def test_tracker_integration():
    """Real track_batch covariances through the smoother: smoothed poses
    stay near the tracker's (already good) estimates, pose_cov is exposed
    and finite on tracked frames."""
    from pycamset_tpu.models.camera_set import CameraSet, make_cam_dict
    from pycamset_tpu.models.detections import TargetDetection
    from pycamset_tpu.tracking import TargetTracker
    from pycamset_tpu.utils.general_utils import make_4x4h_tform as mk
    from pycamset_tpu.utils.synthetic import make_synthetic_rig

    rig = make_synthetic_rig(n_cams=3, n_ims=24, grid=4, visibility=0.95,
                             noise_px=0.3, seed=11)
    k_mats, exts, dists = [], [], []
    for c in range(3):
        i9 = rig["intr"][c]
        k_mats.append(np.array([[i9[0], 0, i9[1]], [0, i9[2], i9[3]],
                                [0, 0, 1]]))
        dists.append(i9[4:])
        exts.append(mk(rig["extr"][c][:3], rig["extr"][c][3:]))
    cams = CameraSet(camera_dict=make_cam_dict(
        ["a", "b", "c"], exts, k_mats, dists, [[1600, 1200]] * 3))

    class _Tgt:
        point_data = rig["template"].reshape(-1, 3)

    tracker = TargetTracker(cams, _Tgt())
    det = TargetDetection(cam_names=["a", "b", "c"], data=rig["dd"])
    poses, info = tracker.track_batch(det)
    assert "pose_cov" in info and info["pose_cov"].shape == (24, 6, 6)
    assert np.all(np.isfinite(info["pose_cov"]))

    sm, sig = smooth_pose_trajectory(poses, pose_cov=info["pose_cov"],
                                     q_rot=1e-2, q_trans=1e-2)
    # with a loose prior the smoother must not distort accurate tracks
    for a, b in zip(sm, poses):
        da = np.concatenate(ext_4x4_to_rod(a))
        db = np.concatenate(ext_4x4_to_rod(b))
        assert np.linalg.norm(da - db) < 0.05
    assert np.all(np.isfinite(sig))
