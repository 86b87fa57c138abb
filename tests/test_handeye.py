"""Hand-eye / robot-world calibration (beyond-reference capability).

Oracle strategy: exact synthetic ground truth. With zero noise the
closed forms must recover X to numerical precision (a far stronger check
than cross-library comparison); with pixel noise the device refinement
must sit at the noise floor. cv2.calibrateHandEye is absent from this
cv2 5.0 build, so Park and Tsai cross-check each other.
"""
import numpy as np
import pytest


def _rand_rigid(rng, rot_scale=1.0, t_scale=0.5):
    import cv2
    t = np.eye(4)
    t[:3, :3] = cv2.Rodrigues(rng.normal(size=3) * rot_scale)[0]
    t[:3, 3] = rng.normal(size=3) * t_scale
    return t


def _inv(t):
    out = np.eye(4)
    out[:3, :3] = t[:3, :3].T
    out[:3, 3] = -t[:3, :3].T @ t[:3, 3]
    return out


class TestAxXb:
    def test_park_and_tsai_recover_exactly(self):
        from pycamset_tpu.calibration.handeye import solve_ax_xb
        rng = np.random.default_rng(3)
        x = _rand_rigid(rng)
        bs = np.stack([_rand_rigid(rng) for _ in range(10)])
        as_ = np.stack([x @ b @ _inv(x) for b in bs])
        for method in ("park", "tsai"):
            got = solve_ax_xb(as_, bs, method=method)
            assert np.abs(got - x).max() < 1e-8, method

    def test_methods_agree_under_noise(self):
        import cv2
        from pycamset_tpu.calibration.handeye import solve_ax_xb
        rng = np.random.default_rng(4)
        x = _rand_rigid(rng)
        bs, as_ = [], []
        for _ in range(40):
            b = _rand_rigid(rng)
            a = x @ b @ _inv(x)
            # small pose noise on both motion measurements
            for t in (a, b):
                t[:3, :3] = t[:3, :3] @ cv2.Rodrigues(
                    rng.normal(size=3) * 1e-3)[0]
                t[:3, 3] += rng.normal(size=3) * 1e-4
            as_.append(a)
            bs.append(b)
        park = solve_ax_xb(np.stack(as_), np.stack(bs), method="park")
        tsai = solve_ax_xb(np.stack(as_), np.stack(bs), method="tsai")
        assert np.abs(park - x).max() < 5e-3
        assert np.abs(tsai - x).max() < 5e-3
        assert np.abs(park - tsai).max() < 5e-3

    def test_degenerate_single_axis_raises(self):
        import cv2
        from pycamset_tpu.calibration.handeye import solve_ax_xb
        rng = np.random.default_rng(5)
        x = _rand_rigid(rng)
        bs = []
        for _ in range(8):
            b = np.eye(4)
            b[:3, :3] = cv2.Rodrigues(
                np.array([0.0, 0.0, rng.uniform(0.2, 1.0)]))[0]
            b[:3, 3] = rng.normal(size=3)
            bs.append(b)
        bs = np.stack(bs)
        as_ = np.stack([x @ b @ _inv(x) for b in bs])
        with pytest.raises(ValueError, match="degenerate"):
            solve_ax_xb(as_, bs)


class TestSolveHandEye:
    def _poses(self, rng, n=12):
        # target poses in the rig frame, like a tracker would produce
        return np.stack([_rand_rigid(rng, rot_scale=0.4, t_scale=0.15)
                         for _ in range(n)])

    def test_eye_in_hand_exact(self):
        from pycamset_tpu.calibration.handeye import solve_hand_eye
        rng = np.random.default_rng(6)
        x, z = _rand_rigid(rng), _rand_rigid(rng)
        p = self._poses(rng)
        g = np.stack([z @ _inv(pi) @ _inv(x) for pi in p])  # G X P = Z
        gx, gz = solve_hand_eye(g, p, mode="eye_in_hand")
        assert np.abs(gx - x).max() < 1e-8
        assert np.abs(gz - z).max() < 1e-8

    def test_eye_to_hand_exact(self):
        from pycamset_tpu.calibration.handeye import solve_hand_eye
        rng = np.random.default_rng(7)
        x, z = _rand_rigid(rng), _rand_rigid(rng)
        p = self._poses(rng)
        g = np.stack([x @ pi @ _inv(z) for pi in p])        # X P = G Z
        gx, gz = solve_hand_eye(g, p, mode="eye_to_hand")
        assert np.abs(gx - x).max() < 1e-8
        assert np.abs(gz - z).max() < 1e-8

    def test_shape_validation(self):
        from pycamset_tpu.calibration.handeye import solve_hand_eye
        with pytest.raises(ValueError, match="N, 4, 4"):
            solve_hand_eye(np.eye(4), np.eye(4))
        two = np.stack([np.eye(4)] * 2)
        with pytest.raises(ValueError, match="at least 3"):
            solve_hand_eye(two, two)


def _handeye_rig(mode, rng_seed=11, noise=0.2, n_ims=12):
    """Synthetic rig + robot poses consistent with ground-truth (X, Z)."""
    from pycamset_tpu.models.camera_set import CameraSet, make_cam_dict
    from pycamset_tpu.models.detections import TargetDetection
    from pycamset_tpu.optim.handlers import FreePointTarget
    from pycamset_tpu.utils.general_utils import make_4x4h_tform
    from pycamset_tpu.utils.synthetic import make_synthetic_rig

    rig = make_synthetic_rig(n_cams=3, n_ims=n_ims, grid=6, visibility=0.9,
                             noise_px=noise, seed=rng_seed)
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
    p = np.stack([make_4x4h_tform(q[:3], q[3:]) for q in rig["poses"]])

    rng = np.random.default_rng(rng_seed + 50)
    x, z = _rand_rigid(rng), _rand_rigid(rng)
    if mode == "eye_in_hand":
        g = np.stack([z @ _inv(pi) @ _inv(x) for pi in p])
    else:
        g = np.stack([x @ pi @ _inv(z) for pi in p])
    return cams, det, target, g, x, z, rig


@pytest.mark.parametrize("mode", ["eye_in_hand", "eye_to_hand"])
def test_calibrate_hand_eye_pipeline(mode):
    from pycamset_tpu.calibration.handeye import calibrate_hand_eye
    cams, det, target, g, x, z, rig = _handeye_rig(mode)
    res = calibrate_hand_eye(cams, det, g, target, mode=mode)
    # pixel noise 0.2 px over ~12 images x 3 cams: sub-mm / sub-mrad
    assert np.abs(res.x[:3, 3] - x[:3, 3]).max() < 1e-3
    assert np.abs(res.x[:3, :3] - x[:3, :3]).max() < 2e-3
    assert np.abs(res.z[:3, 3] - z[:3, 3]).max() < 1e-3
    assert np.abs(res.z[:3, :3] - z[:3, :3]).max() < 2e-3
    assert res.rms < 2 * rig["noise_px"]
    assert res.info["status"] > 0
    assert res.info["xz_sigma"].shape == (12,)
    assert np.isfinite(res.info["xz_sigma"]).all()
    # the refinement should not be worse than its closed-form seed
    seed_err = np.abs(res.info["x_seed"] - x).max()
    ref_err = np.abs(res.x - x).max()
    assert ref_err <= seed_err + 1e-6


def test_calibrate_hand_eye_closed_form_only():
    from pycamset_tpu.calibration.handeye import calibrate_hand_eye
    cams, det, target, g, x, z, rig = _handeye_rig("eye_in_hand",
                                                   rng_seed=13)
    res = calibrate_hand_eye(cams, det, g, target, refine=False)
    assert np.isnan(res.rms)
    assert np.abs(res.x[:3, 3] - x[:3, 3]).max() < 5e-3
    assert np.abs(res.z[:3, 3] - z[:3, 3]).max() < 5e-3


def test_cli_handeye(tmp_path, monkeypatch, capsys):
    """CLI wiring: robot-pose file loading, JSON output, frame naming."""
    import json

    import pycamset_tpu.__main__ as cli
    import pycamset_tpu.calibration.camera_calibrator as cc

    cams, det, target, g, x, z, rig = _handeye_rig("eye_in_hand",
                                                   rng_seed=19)
    camset_path = tmp_path / "rig.camset"
    cams.save(camset_path)
    poses_path = tmp_path / "robot.npy"
    np.save(poses_path, g)
    monkeypatch.setattr(cli, "_make_target", lambda args: target)
    monkeypatch.setattr(cc, "detect_datapoints_in_imfile",
                        lambda **kw: (det, None))
    out = tmp_path / "handeye.json"
    rc = cli.main(["handeye", str(tmp_path), "--camset", str(camset_path),
                   "--robot-poses", str(poses_path), "--out", str(out)])
    assert rc == 0
    rec = json.loads(out.read_text())
    got_x = np.asarray(rec["gripper_T_rig"])
    assert np.abs(got_x - x).max() < 5e-3
    assert rec["reprojection_rms_px"] < 2 * rig["noise_px"]
    assert rec["images_used"] >= 3
    assert len(rec["xz_sigma"]) == 12


def test_load_robot_poses_formats(tmp_path):
    import json

    from pycamset_tpu.__main__ import _load_robot_poses
    rng = np.random.default_rng(2)
    g = np.stack([_rand_rigid(rng) for _ in range(4)])
    np.save(tmp_path / "g.npy", g)
    assert np.allclose(_load_robot_poses(tmp_path / "g.npy"), g)
    (tmp_path / "g.json").write_text(json.dumps(g.tolist()))
    assert np.allclose(_load_robot_poses(tmp_path / "g.json"), g)
    # 6-vector [rvec, t] rows
    from pycamset_tpu.utils.general_utils import ext_4x4_to_rod
    six = np.stack([np.concatenate(ext_4x4_to_rod(t)) for t in g])
    (tmp_path / "g6.json").write_text(json.dumps(six.tolist()))
    assert np.abs(_load_robot_poses(tmp_path / "g6.json") - g).max() < 1e-12
    (tmp_path / "bad.json").write_text("[[1, 2], [3, 4]]")
    with pytest.raises(ValueError, match="robot poses"):
        _load_robot_poses(tmp_path / "bad.json")


def test_calibrate_hand_eye_pose_count_mismatch():
    from pycamset_tpu.calibration.handeye import calibrate_hand_eye
    cams, det, target, g, x, z, rig = _handeye_rig("eye_in_hand",
                                                   rng_seed=17, n_ims=6)
    with pytest.raises(ValueError, match="synchronized"):
        calibrate_hand_eye(cams, det, g[:-1], target)
