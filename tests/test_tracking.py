"""TargetTracker: the precompiled streaming pose-tracking serving path."""
import numpy as np
import pytest


def _rig(n_ims=20, camera_model="standard", noise=0.2, seed=8):
    from pycamset_tpu.models.camera_set import CameraSet, make_cam_dict
    from pycamset_tpu.models.detections import TargetDetection
    from pycamset_tpu.optim.handlers import FreePointTarget
    from pycamset_tpu.utils.general_utils import make_4x4h_tform
    from pycamset_tpu.utils.synthetic import make_synthetic_rig

    rig = make_synthetic_rig(n_cams=3, n_ims=n_ims, grid=6, visibility=0.9,
                             noise_px=noise, seed=seed,
                             camera_model=camera_model)
    k_mats, exts, dists = [], [], []
    for c in range(3):
        i = rig["intr"][c]
        k_mats.append(np.array([[i[0], 0, i[1]], [0, i[2], i[3]],
                                [0, 0, 1]]))
        dists.append(i[4:])
        exts.append(make_4x4h_tform(rig["extr"][c][:3], rig["extr"][c][3:]))
    cams = CameraSet(camera_dict=make_cam_dict(
        ["a", "b", "c"], exts, k_mats, dists, [[1600, 1200]] * 3))
    target = FreePointTarget(rig["template"].reshape(1, -1, 3))
    det = TargetDetection(cam_names=["a", "b", "c"], data=rig["dd"])
    true = np.stack([make_4x4h_tform(p[:3], p[3:]) for p in rig["poses"]])
    return cams, target, det, true, rig


def test_track_batch_recovers_poses():
    from pycamset_tpu.tracking import TargetTracker
    cams, target, det, true, rig = _rig()
    tr = TargetTracker(cams, target)
    poses, info = tr.track_batch(det)
    assert poses.shape == true.shape
    assert np.abs(poses[:, :3, 3] - true[:, :3, 3]).max() < 2e-4  # metres
    assert info["rms"].mean() < 2 * rig["noise_px"]
    assert (info["n_used"] > 0).all()


def test_track_single_frames_with_warm_start():
    from pycamset_tpu.tracking import TargetTracker
    cams, target, det, true, rig = _rig(n_ims=5)
    tr = TargetTracker(cams, target)
    frames = det.get_image_list()
    p0, info0 = tr.track(frames[0])      # PnP-seeded
    assert np.abs(p0[:3, 3] - true[0][:3, 3]).max() < 2e-4
    p1, info1 = tr.track(frames[1])      # warm start from frame 0
    assert np.abs(p1[:3, 3] - true[1][:3, 3]).max() < 2e-4
    assert info1["status"] > 0           # converged, not budget-exhausted


def test_track_robust_loss_rejects_outliers():
    from pycamset_tpu.tracking import TargetTracker
    cams, target, det, true, rig = _rig(n_ims=3, noise=0.1)
    dd = det.get_data().copy()
    rng = np.random.default_rng(0)
    bad = rng.choice(len(dd), len(dd) // 10, replace=False)
    dd[bad, -2:] += rng.normal(size=(len(bad), 2)) * 60.0
    from pycamset_tpu.models.detections import TargetDetection
    det_bad = TargetDetection(cam_names=["a", "b", "c"], data=dd)

    plain = TargetTracker(cams, target)
    robust = TargetTracker(cams, target, loss="cauchy", f_scale=1.0,
                           max_nfev=60)
    p_plain, _ = plain.track_batch(det_bad)
    # the production cascade: robustify from the plain solve's poses (a
    # cold cauchy start from a PnP seed poisoned by the same outliers can
    # stall in the flattened basin)
    p_rob, _ = robust.track_batch(det_bad, inits=p_plain)
    err_plain = np.abs(p_plain[:, :3, 3] - true[:, :3, 3]).max()
    err_rob = np.abs(p_rob[:, :3, 3] - true[:, :3, 3]).max()
    assert err_rob < err_plain / 3       # outliers pulled the plain solve
    assert err_rob < 5e-4


def test_tracker_follows_camera_model_width():
    from pycamset_tpu.tracking import TargetTracker
    cams, target, det, true, rig = _rig(n_ims=3, camera_model="rational",
                                        noise=0.1)
    tr = TargetTracker(cams, target)
    assert tr._intr.shape[1] == 12        # 4 + 8 rational coefficients
    poses, info = tr.track_batch(det)
    assert np.abs(poses[:, :3, 3] - true[:, :3, 3]).max() < 2e-4


def test_tracker_capacity_and_empty_frame():
    import logging
    from pycamset_tpu.models.detections import TargetDetection
    from pycamset_tpu.tracking import TargetTracker
    cams, target, det, true, rig = _rig(n_ims=3)

    small = TargetTracker(cams, target, max_detections=10)
    frames = det.get_image_list()
    # truncation warns but still solves (10 points pin a 6-dof pose)
    p, info = small.track(frames[0], init=rig["poses"][0])
    assert info["n_used"] == 10

    tr = TargetTracker(cams, target)
    empty = TargetDetection(cam_names=["a", "b", "c"], data=None)
    with pytest.raises(ValueError, match="no detections"):
        tr.track(empty)


def test_device_seed_batch_quality():
    """The in-dispatch triangulate + rigid-fit seeder lands close enough
    to the true poses that LM converges in a few iterations."""
    import jax.numpy as jnp
    from pycamset_tpu.tracking import TargetTracker
    cams, target, det, true, rig = _rig(n_ims=8)
    tr = TargetTracker(cams, target)
    flat = det.return_flattened_keys(
        target.point_data.shape[:-1]).sort(["im_num"])
    dd = flat.get_data()
    n_frames = int(det.max_ims)
    uv_grid = np.zeros((n_frames, tr.n_keys, tr.n_cams, 2))
    mask_grid = np.zeros((n_frames, tr.n_keys, tr.n_cams))
    im_c, key_c, cam_c = (dd[:, 1].astype(int), dd[:, 2].astype(int),
                          dd[:, 0].astype(int))
    uv_grid[im_c, key_c, cam_c] = dd[:, -2:]
    mask_grid[im_c, key_c, cam_c] = 1.0
    seeds = np.asarray(tr._seed_batch(jnp.asarray(uv_grid),
                                      jnp.asarray(mask_grid)))
    assert np.abs(seeds[:, 3:] - rig["poses"][:, 3:]).max() < 5e-3  # m
    assert np.abs(seeds[:, :3] - rig["poses"][:, :3]).max() < 5e-3  # rad


def test_unknown_seed_mode_raises():
    from pycamset_tpu.tracking import TargetTracker
    cams, target, det, true, rig = _rig(n_ims=2)
    tr = TargetTracker(cams, target)
    with pytest.raises(ValueError, match="seed_mode"):
        tr.track_batch(det, seed_mode="Device")  # typo must not mean pnp


def test_stream_lost_frames_report_inf_rms():
    """A frame with < 3 detections carries the pose forward; its rms must
    be inf (the drifted LM residuals never describe the carried pose)."""
    from pycamset_tpu.tracking import TargetTracker
    cams, target, det, true, rig = _rig(n_ims=6)
    rows = det.get_data()
    # frame 3 keeps only cam 0's keys 0-1: 2 detections < the 3 needed
    keep = (rows[:, 1] != 3) | ((rows[:, 0] == 0) & (rows[:, 2] < 2))
    from pycamset_tpu.models.detections import TargetDetection
    det2 = TargetDetection(cam_names=det.cam_names, data=rows[keep],
                           max_ims=6)
    tr = TargetTracker(cams, target)
    poses, info = tr.track_stream(det2)
    assert np.isinf(info["rms"][3])
    assert np.all(np.isinf(info["pose_sigma"][3]))
    np.testing.assert_allclose(poses[3], poses[2], atol=1e-12)  # carried
    ok = [i for i in range(6) if i != 3]
    np.testing.assert_allclose(poses[ok], true[ok], atol=2e-2)


def test_inhomogeneous_triangulation_matches_homogeneous():
    """The seeding-grade 3x3 closed-form DLT agrees with the accuracy-
    grade 4x4 eigh path on finite points (clean and noisy), and padding
    rows stay finite."""
    import jax.numpy as jnp

    from pycamset_tpu.ops.triangulation import triangulate_observations
    from pycamset_tpu.utils.general_utils import make_4x4h_tform
    from pycamset_tpu.utils.synthetic import make_synthetic_rig

    rig = make_synthetic_rig(n_cams=4, n_ims=3, grid=6, visibility=1.0,
                             noise_px=0.2, seed=5)
    kmats = np.stack([np.array([[i[0], 0, i[1]], [0, i[2], i[3]],
                                [0, 0, 1]]) for i in rig["intr"]])
    dists = np.stack([i[4:] for i in rig["intr"]])
    exts = np.stack([make_4x4h_tform(e[:3], e[3:]) for e in rig["extr"]])
    proj = np.einsum("cij,cjk->cik", kmats, exts[:, :3, :])
    dd = rig["dd"]
    # pack per (im, key): up to 4 views each
    n_pts = 3 * 36
    uv = np.zeros((n_pts, 4, 2))
    mask = np.zeros((n_pts, 4))
    rows = (dd[:, 1] * 36 + dd[:, 2]).astype(int)
    uv[rows, dd[:, 0].astype(int)] = dd[:, 3:5]
    mask[rows, dd[:, 0].astype(int)] = 1.0
    cam_idx = np.broadcast_to(np.arange(4), (n_pts, 4))
    args = (jnp.asarray(proj), jnp.asarray(kmats), jnp.asarray(dists),
            jnp.asarray(cam_idx), jnp.asarray(uv), jnp.asarray(mask))
    p_h = np.asarray(triangulate_observations(*args))
    p_i = np.asarray(triangulate_observations(*args,
                                              method="inhomogeneous"))
    seen = mask.sum(axis=1) >= 2
    np.testing.assert_allclose(p_i[seen], p_h[seen], atol=1e-5)
    assert np.all(np.isfinite(p_i))  # padding rows (det ~ 0) stay finite


def test_track_batch_seed_modes_agree():
    from pycamset_tpu.tracking import TargetTracker
    cams, target, det, true, rig = _rig(n_ims=6)
    tr = TargetTracker(cams, target)
    p_dev, i_dev = tr.track_batch(det, seed_mode="device")
    p_pnp, i_pnp = tr.track_batch(det, seed_mode="pnp")
    np.testing.assert_allclose(p_dev, p_pnp, atol=1e-5)
    np.testing.assert_allclose(i_dev["rms"], i_pnp["rms"], atol=1e-6)


def test_track_batch_monocular_frames_rescued():
    """Frames seen by only ONE camera can't triangulate-seed; the auto
    rescue PnP-reseeds them and they still recover the true pose."""
    from pycamset_tpu.models.detections import TargetDetection
    from pycamset_tpu.tracking import TargetTracker
    cams, target, det, true, rig = _rig(n_ims=6, noise=0.1)
    dd = det.get_data()
    mono = {1, 4}  # frames stripped to camera 0 only
    keep = ~(np.isin(dd[:, 1], list(mono)) & (dd[:, 0] != 0))
    det_mono = TargetDetection(cam_names=["a", "b", "c"], data=dd[keep])
    tr = TargetTracker(cams, target)
    poses, info = tr.track_batch(det_mono)
    assert np.abs(poses[:, :3, 3] - true[:, :3, 3]).max() < 1e-3
    assert (info["n_used"] > 0).all()


def test_track_stream_warm_start_and_dropout():
    """track_stream: one dispatch, each frame seeded by the previous
    solution; a frame that loses the target carries the pose forward
    with inf sigma instead of wandering."""
    from pycamset_tpu.models.detections import TargetDetection
    from pycamset_tpu.tracking import TargetTracker
    cams, target, det, true, rig = _rig(n_ims=8, noise=0.2)
    dd = det.get_data()
    lost = 3  # strip frame 3 to two detections: 6 dof, 4 residuals
    rows_lost = np.nonzero(dd[:, 1] == lost)[0]
    keep = np.ones(len(dd), bool)
    keep[rows_lost[2:]] = False
    det2 = TargetDetection(cam_names=["a", "b", "c"], data=dd[keep])
    tr = TargetTracker(cams, target)
    poses, info = tr.track_stream(det2)
    ok = np.arange(8) != lost
    assert np.abs(poses[ok, :3, 3] - true[ok, :3, 3]).max() < 5e-4
    assert np.isinf(info["pose_sigma"][lost]).all()
    # the lost frame reports the PREVIOUS frame's pose, not a drifted one
    np.testing.assert_allclose(poses[lost], poses[lost - 1], atol=1e-12)
    # explicit init variant agrees on fully-seen frames
    poses2, _ = tr.track_stream(det2, init=true[0])
    np.testing.assert_allclose(poses2[ok], poses[ok], atol=1e-5)


def _temporal_capture(offsets=None, readouts=None, n_frames=24, noise=0.1,
                      seed=9):
    """Moving-target capture with per-camera clock offsets and/or
    rolling-shutter row sampling (generator shared with the sync tests).
    The trajectory is LINEAR in pose space, so the tracker's per-frame
    constant-velocity model is exact — a clean oracle."""
    from test_sync import _grid_target, _moving_capture, _ring_rig

    cams = _ring_rig()
    tpl, target = _grid_target()
    det, knots = _moving_capture(
        cams, tpl, n_frames,
        np.zeros(3) if offsets is None else np.asarray(offsets),
        readouts=readouts, noise=noise, seed=seed, linear=True)
    return cams, target, det, knots


def test_track_batch_rolling_shutter_correction():
    """A moving target under rolling shutter: the 12-dof [pose|velocity]
    model removes the skew bias and recovers the true inter-frame
    velocity; ignoring the readout fits measurably worse."""
    from pycamset_tpu.tracking import TargetTracker
    true_rs = np.array([0.7, 0.7, 0.7])
    cams, target, det, knots = _temporal_capture(readouts=true_rs)
    tr_gs = TargetTracker(cams, target)
    tr_rs = TargetTracker(cams, target, rolling_shutter=true_rs)
    poses_gs, info_gs = tr_gs.track_batch(det)
    poses_rs, info_rs = tr_rs.track_batch(det)
    # the temporal model reaches the injected 0.1 px noise floor; the
    # global-shutter fit cannot (rolling-shutter skew residual)
    assert info_rs["rms"].mean() < 0.11
    assert info_gs["rms"].mean() > 1.2 * info_rs["rms"].mean()
    # mid-scan poses must match the trajectory knots (t = frame index)
    from pycamset_tpu.utils.general_utils import make_4x4h_tform
    true_t = np.stack([make_4x4h_tform(k[:3], k[3:])[:3, 3]
                       for k in knots])
    assert np.abs(poses_rs[1:-1, :3, 3] - true_t[1:-1]).max() < 5e-4
    # velocity output matches the knot-to-knot motion
    vel = info_rs["velocity"]
    true_vel = np.diff(knots, axis=0)[0]  # constant on the linear path
    err = np.abs(vel[1:-1] - true_vel)
    # unbiased but noisy (the rolling-shutter lever is a fraction of a
    # frame): consistent with its own reported sigma, and the per-frame
    # average tracks the truth
    assert (err < 5 * info_rs["velocity_sigma"][1:-1] + 1e-6).all()
    assert np.abs(vel[1:-1].mean(axis=0) - true_vel).max() < 2e-3
    assert np.isfinite(info_rs["velocity_sigma"][1:-1]).all()


def test_track_batch_honors_clock_offsets():
    """Per-camera time offsets from the sync calibration feed the
    tracker: residuals drop and poses land on the time base."""
    from pycamset_tpu.tracking import TargetTracker
    toff = np.array([0.0, 0.3, -0.35])
    cams, target, det, knots = _temporal_capture(offsets=toff)
    tr_plain = TargetTracker(cams, target)
    tr_sync = TargetTracker(cams, target, time_offsets=toff)
    _, info_plain = tr_plain.track_batch(det)
    poses, info_sync = tr_sync.track_batch(det)
    assert info_sync["rms"].mean() < 0.6 * info_plain["rms"].mean()
    from pycamset_tpu.utils.general_utils import make_4x4h_tform
    true_t = np.stack([make_4x4h_tform(k[:3], k[3:])[:3, 3]
                       for k in knots])
    assert np.abs(poses[1:-1, :3, 3] - true_t[1:-1]).max() < 1e-3


def test_track_stream_and_single_frame_with_temporal_model():
    from pycamset_tpu.tracking import TargetTracker
    cams, target, det, knots = _temporal_capture(readouts=[0.6, 0.6, 0.6])
    tr = TargetTracker(cams, target, rolling_shutter=0.6)
    poses_s, info_s = tr.track_stream(det)
    assert info_s["rms"][2:].mean() < 0.25
    frame = det.get_image_list()[2]
    pose1, info1 = tr.track(frame, init=np.concatenate(
        [knots[2], np.zeros(6)]))
    assert info1["rms"] < 0.25
    assert info1["velocity"].shape == (6,)
    # a static scene keeps velocity at ~0 (the weak prior pins the
    # unobservable direction instead of letting it wander)
    from test_sync import _grid_target, _moving_capture, _ring_rig
    det_static, _ = _moving_capture(_ring_rig(), _grid_target()[0], 24,
                                    np.zeros(3), noise=0.1, seed=2,
                                    static=True)
    poses_st, info_st = tr.track_batch(det_static)
    # noise-level phantom velocity only (the rolling-shutter lever is a
    # fraction of a frame, so the bound is loose but far from the real
    # capture's 0.02-0.05/frame motion)
    assert np.abs(info_st["velocity"]).max() < 0.03


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
