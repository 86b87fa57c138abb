"""Shared-intrinsics (tied) bundle adjustment."""
import numpy as np
import pytest


def _rig(n_cams=4, n_ims=8, grid=6, noise=0.2, seed=6, shared=True):
    from pycamset_tpu.models.camera_set import CameraSet, make_cam_dict
    from pycamset_tpu.models.detections import TargetDetection
    from pycamset_tpu.optim.handlers import FreePointTarget
    from pycamset_tpu.utils.general_utils import make_4x4h_tform
    from pycamset_tpu.utils.synthetic import make_synthetic_rig

    rig = make_synthetic_rig(n_cams=n_cams, n_ims=n_ims, grid=grid,
                             visibility=0.9, noise_px=noise, seed=seed,
                             shared_intrinsics=shared)
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


def _handler(cams, det, target, shared=True, **extra):
    from pycamset_tpu.optim.handlers import TemplateBundleHandler
    opts = {"outliers": "n", "shared_intrinsics": shared}
    opts.update(extra)
    return TemplateBundleHandler(cams, target, det, options=opts)


def _scipy_tied_oracle(rig, n_cams, n_ims, gid=None):
    """Independent tied solve: numpy residuals + scipy TRF over
    [shared(9G) | extr(6C) | poses(6(I-1))], pose 0 pinned (the gauge)."""
    from scipy.optimize import least_squares

    import cv2
    gid = np.zeros(n_cams, dtype=int) if gid is None else np.asarray(gid)
    n_grp = int(gid.max()) + 1
    dd = rig["dd"]
    tpl = rig["template"]
    cam_i = dd[:, 0].astype(int)
    im_i = dd[:, 1].astype(int)
    key_i = dd[:, 2].astype(int)
    uv = dd[:, 3:5]

    def residuals(x):
        sh = x[:9 * n_grp].reshape(n_grp, 9)
        ext = x[9 * n_grp:9 * n_grp + 6 * n_cams].reshape(n_cams, 6)
        poses = np.zeros((n_ims, 6))
        poses[1:] = x[9 * n_grp + 6 * n_cams:].reshape(n_ims - 1, 6)
        out = np.zeros((len(dd), 2))
        for i in range(n_ims):
            rt = np.eye(4)
            rt[:3, :3] = cv2.Rodrigues(poses[i, :3])[0]
            rt[:3, 3] = poses[i, 3:]
            world = tpl @ rt[:3, :3].T + rt[:3, 3]
            for c in range(n_cams):
                rows = np.flatnonzero((cam_i == c) & (im_i == i))
                if not rows.size:
                    continue
                fx, px, fy, py, k1, k2, p1, p2, k3 = sh[gid[c]]
                et = np.eye(4)
                et[:3, :3] = cv2.Rodrigues(ext[c, :3])[0]
                et[:3, 3] = ext[c, 3:]
                xc = world[key_i[rows]] @ et[:3, :3].T + et[:3, 3]
                x_, y_ = xc[:, 0] / xc[:, 2], xc[:, 1] / xc[:, 2]
                r2 = x_ * x_ + y_ * y_
                rad = 1 + r2 * (k1 + r2 * (k2 + r2 * k3))
                xd = x_ * rad + 2 * p1 * x_ * y_ + p2 * (r2 + 2 * x_ * x_)
                yd = y_ * rad + p1 * (r2 + 2 * y_ * y_) + 2 * p2 * x_ * y_
                out[rows, 0] = xd * fx + px - uv[rows, 0]
                out[rows, 1] = yd * fy + py - uv[rows, 1]
        return out.reshape(-1)

    x0 = np.concatenate(
        [np.concatenate([rig["intr"][np.flatnonzero(gid == g)[0]]
                         for g in range(n_grp)]),
         rig["extr"].reshape(-1),
         rig["poses"][1:].reshape(-1)])
    sol = least_squares(residuals, x0, x_scale="jac", max_nfev=100)
    return sol, residuals


def test_tied_solve_matches_independent_scipy_oracle():
    from pycamset_tpu.optim.driver import run_bundle_adjustment
    cams, det, target, rig = _rig(n_cams=3, n_ims=6, grid=5)
    handler = _handler(cams, det, target)
    res, solved = run_bundle_adjustment(handler)

    sol, _ = _scipy_tied_oracle(rig, 3, 6)
    # same tied objective, independent implementations: optima must agree
    assert res.cost == pytest.approx(sol.cost, rel=1e-6)
    fx = solved["cam0"].intrinsic[0, 0]
    assert fx == pytest.approx(sol.x[0], abs=0.05)


def test_tied_output_is_identical_across_cameras_and_accurate():
    from pycamset_tpu.optim.driver import run_bundle_adjustment
    cams, det, target, rig = _rig()
    handler = _handler(cams, det, target)
    res, solved = run_bundle_adjustment(handler)
    k0 = solved["cam0"].intrinsic
    d0 = np.reshape(solved["cam0"].distortion_coefs, -1)
    for n in solved.get_names()[1:]:
        assert np.array_equal(solved[n].intrinsic, k0)
        assert np.array_equal(np.reshape(solved[n].distortion_coefs, -1),
                              d0)
    # recovers the generating shared lens (planar boards correlate focal
    # with depth, so ~0.1-0.2% is the statistical floor at this coverage)
    assert abs(k0[0, 0] - rig["intr"][0][0]) < 3.0
    assert abs(k0[1, 1] - rig["intr"][0][2]) < 3.0
    err = np.mean(np.linalg.norm(res.fun.reshape(-1, 2), axis=1))
    assert err < 2 * rig["noise_px"]
    assert res.status in (1, 2, 3)


def test_tied_beats_untied_on_thin_coverage():
    """With few images per camera the tied model pools evidence: its
    intrinsic error should not exceed the mean untied per-camera error."""
    from pycamset_tpu.optim.driver import run_bundle_adjustment
    cams, det, target, rig = _rig(n_cams=4, n_ims=4, noise=0.4, seed=9)
    _, tied = run_bundle_adjustment(_handler(cams, det, target))
    _, untied = run_bundle_adjustment(
        _handler(cams, det, target, shared=False))
    true_fx = rig["intr"][0][0]
    tied_err = abs(tied["cam0"].intrinsic[0, 0] - true_fx)
    untied_errs = [abs(untied[n].intrinsic[0, 0] - true_fx)
                   for n in untied.get_names()]
    assert tied_err <= np.mean(untied_errs) + 1e-9


def test_tied_robust_loss_runs():
    from pycamset_tpu.optim.driver import run_bundle_adjustment
    cams, det, target, rig = _rig(n_cams=3, n_ims=6)
    dd = det.get_data().copy()
    rng = np.random.default_rng(0)
    bad = rng.choice(len(dd), len(dd) // 20, replace=False)
    dd[bad, -2:] += rng.normal(size=(len(bad), 2)) * 50.0
    from pycamset_tpu.models.detections import TargetDetection
    det_bad = TargetDetection(cam_names=det.cam_names, data=dd)
    handler = _handler(cams, det_bad, target, loss="cauchy", f_scale=1.0)
    res, solved = run_bundle_adjustment(handler)
    _, plain = run_bundle_adjustment(_handler(cams, det_bad, target))
    true_fx = rig["intr"][0][0]
    # the robust tied solve resists the outliers the linear one absorbs
    assert abs(solved["cam0"].intrinsic[0, 0] - true_fx) \
        < abs(plain["cam0"].intrinsic[0, 0] - true_fx)
    assert abs(solved["cam0"].intrinsic[0, 0] - true_fx) < 8.0


def test_tied_honours_extrinsic_anchor():
    from pycamset_tpu.optim.driver import run_bundle_adjustment
    cams, det, target, rig = _rig(n_cams=3, n_ims=6)
    fixed = {"cam1": {"ext": cams["cam1"].extrinsic}}
    from pycamset_tpu.optim.handlers import TemplateBundleHandler
    handler = TemplateBundleHandler(
        cams, target, det, fixed_params=fixed,
        options={"outliers": "n", "shared_intrinsics": True})
    res, solved = run_bundle_adjustment(handler)
    assert np.allclose(solved["cam1"].extrinsic, cams["cam1"].extrinsic)
    err = np.mean(np.linalg.norm(res.fun.reshape(-1, 2), axis=1))
    assert err < 2 * rig["noise_px"]


def test_lens_groups_match_oracle_and_recover_two_lenses():
    """Mixed lens batch: cams {0,1} share lens A, {2,3} lens B."""
    from pycamset_tpu.models.camera_set import CameraSet, make_cam_dict
    from pycamset_tpu.models.detections import TargetDetection
    from pycamset_tpu.optim.driver import run_bundle_adjustment
    from pycamset_tpu.optim.handlers import FreePointTarget
    from pycamset_tpu.utils.general_utils import make_4x4h_tform
    from pycamset_tpu.utils.synthetic import make_synthetic_rig

    gid = [0, 0, 1, 1]
    rig = make_synthetic_rig(n_cams=4, n_ims=6, grid=5, visibility=0.9,
                             noise_px=0.2, seed=12, shared_intrinsics=gid)
    names = [f"cam{c}" for c in range(4)]
    k_mats, exts, dists = [], [], []
    for c in range(4):
        i = rig["intr"][c]
        k_mats.append(np.array([[i[0], 0, i[1]], [0, i[2], i[3]],
                                [0, 0, 1]]))
        dists.append(i[4:])
        exts.append(make_4x4h_tform(rig["extr"][c][:3], rig["extr"][c][3:]))
    cams = CameraSet(camera_dict=make_cam_dict(
        names, exts, k_mats, dists, [[1600, 1200]] * 4))
    target = FreePointTarget(rig["template"].reshape(1, -1, 3))
    det = TargetDetection(cam_names=names, data=rig["dd"])

    handler = _handler(cams, det, target, shared=["a", "a", "b", "b"])
    res, solved = run_bundle_adjustment(handler)
    # broadcast within groups, distinct across
    assert np.array_equal(solved["cam0"].intrinsic,
                          solved["cam1"].intrinsic)
    assert np.array_equal(solved["cam2"].intrinsic,
                          solved["cam3"].intrinsic)
    assert not np.array_equal(solved["cam0"].intrinsic,
                              solved["cam2"].intrinsic)
    # both lenses recovered
    assert abs(solved["cam0"].intrinsic[0, 0] - rig["intr"][0][0]) < 3.0
    assert abs(solved["cam2"].intrinsic[0, 0] - rig["intr"][2][0]) < 3.0
    # independent scipy oracle on the SAME grouped objective
    sol, _ = _scipy_tied_oracle(rig, 4, 6, gid=gid)
    assert res.cost == pytest.approx(sol.cost, rel=1e-6)
    # tied uncertainty: per-group sigmas broadcast
    unc = solved.calibration_uncertainty()
    assert np.array_equal(unc["cameras"]["cam0"]["int_sigma"],
                          unc["cameras"]["cam1"]["int_sigma"])
    assert not np.array_equal(unc["cameras"]["cam0"]["int_sigma"],
                              unc["cameras"]["cam2"]["int_sigma"])


def test_lens_group_option_validation():
    from pycamset_tpu.optim.shared_intr import resolve_lens_groups
    names = ["a", "b", "c"]
    assert resolve_lens_groups(True, names).tolist() == [0, 0, 0]
    assert resolve_lens_groups(["x", "y", "x"], names).tolist() == [0, 1, 0]
    assert resolve_lens_groups({"a": 1, "b": 1, "c": 2},
                               names).tolist() == [0, 0, 1]
    with pytest.raises(ValueError, match="one label per camera"):
        resolve_lens_groups(["x"], names)
    with pytest.raises(ValueError, match="misses cameras"):
        resolve_lens_groups({"a": 1}, names)


def test_tied_uncertainty_pools_and_broadcasts():
    from pycamset_tpu.optim.driver import run_bundle_adjustment
    cams, det, target, rig = _rig()
    _, tied = run_bundle_adjustment(_handler(cams, det, target))
    _, untied = run_bundle_adjustment(
        _handler(cams, det, target, shared=False))
    u_tied = tied.calibration_uncertainty()
    u_untied = untied.calibration_uncertainty()
    sigs = [u_tied["cameras"][n]["int_sigma"]
            for n in tied.get_names()]
    # every camera reports the SHARED lens sigma
    for s in sigs[1:]:
        assert np.array_equal(s, sigs[0])
    assert np.all(sigs[0] > 0)
    # pooling across 4 cameras must shrink the focal sigma vs untied
    untied_fx = np.mean([u_untied["cameras"][n]["int_sigma"][0]
                         for n in untied.get_names()])
    assert sigs[0][0] < untied_fx
    # extrinsic/pose sigmas stay per-camera/per-image and finite
    assert np.isfinite(u_tied["pose_sigma"]).all()
    e0 = u_tied["cameras"]["cam0"]["ext_sigma"]
    e1 = u_tied["cameras"]["cam1"]["ext_sigma"]
    assert not np.array_equal(e0, e1)


@pytest.mark.slow
def test_tied_sigma_matches_monte_carlo():
    """The predicted shared-focal sigma matches the empirical scatter of
    repeated noisy calibrations (the uncertainty module's MC validation
    pattern, applied to the tied path)."""
    from pycamset_tpu.optim.driver import run_bundle_adjustment
    fxs, pred = [], None
    for rep in range(10):
        cams, det, target, rig = _rig(n_cams=3, n_ims=6, grid=5,
                                      noise=0.3, seed=100 + rep)
        _, solved = run_bundle_adjustment(_handler(cams, det, target))
        fxs.append(solved["cam0"].intrinsic[0, 0] - rig["intr"][0][0])
        if pred is None:
            pred = solved.calibration_uncertainty()[
                "cameras"]["cam0"]["int_sigma"][0]
    emp = np.std(fxs)
    assert pred / 2.5 < emp < pred * 2.5, (emp, pred)


def test_tied_rejects_per_camera_fixed_intrinsics():
    from pycamset_tpu.optim.driver import run_bundle_adjustment
    from pycamset_tpu.optim.handlers import TemplateBundleHandler
    from pycamset_tpu.optim.structured import UnsupportedChain
    cams, det, target, rig = _rig(n_cams=3, n_ims=6)
    fixed = {"cam0": {"int": cams["cam0"].intrinsic,
                      "dst": cams["cam0"].distortion_coefs}}
    handler = TemplateBundleHandler(
        cams, target, det, fixed_params=fixed,
        options={"outliers": "n", "shared_intrinsics": True})
    with pytest.raises(UnsupportedChain, match="fixed intrinsics"):
        run_bundle_adjustment(handler)


def test_tied_rejects_selfcal_chain():
    from pycamset_tpu.optim.driver import run_bundle_adjustment
    from pycamset_tpu.optim.handlers import SelfBundleHandler
    from pycamset_tpu.optim.structured import UnsupportedChain
    cams, det, target, rig = _rig(n_cams=3, n_ims=6)
    handler = SelfBundleHandler(
        detection=det, target=target, camset=cams,
        options={"outliers": "n", "shared_intrinsics": True})
    with pytest.raises(UnsupportedChain, match="template chains"):
        run_bundle_adjustment(handler)


def test_tied_rejects_untying_backends():
    """scipy/generic backends have no tying fold: asking for them with
    shared_intrinsics must raise, never silently solve untied."""
    import pytest

    from pycamset_tpu.optim.driver import run_bundle_adjustment

    cams, det, target, _ = _rig(n_cams=2, n_ims=4, grid=4)
    h = _handler(cams, det, target)
    for backend in ("scipy", "generic"):
        with pytest.raises(ValueError, match="silently solve untied"):
            run_bundle_adjustment(h, backend=backend)
