"""Calibration uncertainty (optim/uncertainty.py).

Validated the only way an error bar can be: Monte-Carlo. The SAME rig is
re-observed with independent noise draws; the empirical scatter of the
recovered parameters must match the predicted first-order sigmas.
"""
import numpy as np
import pytest


def test_sigma_matches_monte_carlo_scatter():
    """Predicted sigma(fx) must agree with the empirical std of the
    recovered fx across independent noise draws (within MC error)."""
    from pycamset_tpu.optim.uncertainty import calibration_uncertainty

    # NOTE: make_synthetic_rig derives observation noise from the same
    # seed as the geometry, so different seeds give different geometry.
    # For a true fixed-geometry MC, re-noise the clean table by hand.
    from pycamset_tpu.models.camera_set import CameraSet, make_cam_dict
    from pycamset_tpu.models.detections import TargetDetection
    from pycamset_tpu.optim.driver import run_bundle_adjustment
    from pycamset_tpu.optim.handlers import (
        FreePointTarget, TemplateBundleHandler)
    from pycamset_tpu.utils.general_utils import make_4x4h_tform
    from pycamset_tpu.utils.synthetic import make_synthetic_rig

    noise_px = 0.5
    rig = make_synthetic_rig(n_cams=3, n_ims=8, grid=6, visibility=1.0,
                             noise_px=0.0, seed=21)   # CLEAN observations
    k_mats, exts, dists = [], [], []
    for c in range(3):
        i9 = rig["intr"][c]
        k_mats.append(np.array([[i9[0], 0, i9[1]], [0, i9[2], i9[3]],
                                [0, 0, 1]]))
        dists.append(i9[4:])
        exts.append(make_4x4h_tform(rig["extr"][c][:3], rig["extr"][c][3:]))

    def solve_with_noise(noise_seed):
        rng = np.random.default_rng(noise_seed)
        dd = rig["dd"].copy()
        dd[:, 3:5] += rng.normal(size=(dd.shape[0], 2)) * noise_px
        cams = CameraSet(camera_dict=make_cam_dict(
            ["a", "b", "c"], [e.copy() for e in exts],
            [k.copy() for k in k_mats], [d.copy() for d in dists],
            [[1600, 1200]] * 3))
        handler = TemplateBundleHandler(
            cams, FreePointTarget(rig["template"].reshape(1, -1, 3)),
            TargetDetection(cam_names=["a", "b", "c"], data=dd),
            options={"outliers": "n"})
        res, solved = run_bundle_adjustment(handler, backend="structured")
        return res, solved

    fx = {"a": [], "b": [], "c": []}
    predicted = None
    n_draws = 12
    for t in range(n_draws):
        res, solved = solve_with_noise(100 + t)
        for name in fx:
            fx[name].append(float(solved[name].intrinsic[0, 0]))
        if t == 0:
            unc = calibration_uncertainty(solved, x=res["x"])
            predicted = {n: float(unc["cameras"][n]["int_sigma"][0])
                         for n in fx}
            # sanity on the variance estimate itself
            assert abs(np.sqrt(unc["sigma2"]) - noise_px) < 0.1 * noise_px
            # fixed gauge pose carries zero uncertainty
            assert np.all(unc["pose_sigma"][0] == 0.0)
            assert np.all(unc["pose_sigma"][1:] > 0.0)

    for name in fx:
        empirical = float(np.std(fx[name], ddof=1))
        ratio = empirical / predicted[name]
        # 12 draws put ~25% MC error on the std; allow a factor-2 band
        assert 0.5 < ratio < 2.0, (name, empirical, predicted[name])


def test_selfcal_uncertainty_shapes():
    """Self-calibration handlers expose per-point sigmas; gauge-pinned
    coordinates read zero."""
    from pycamset_tpu.models.camera_set import CameraSet, make_cam_dict
    from pycamset_tpu.models.detections import TargetDetection
    from pycamset_tpu.optim.driver import run_bundle_adjustment
    from pycamset_tpu.optim.handlers import FreePointTarget, SelfBundleHandler
    from pycamset_tpu.optim.uncertainty import calibration_uncertainty
    from pycamset_tpu.utils.general_utils import make_4x4h_tform
    from pycamset_tpu.utils.synthetic import make_synthetic_rig

    rig = make_synthetic_rig(n_cams=3, n_ims=8, grid=5, visibility=0.95,
                             noise_px=0.2, seed=23)
    k_mats, exts, dists = [], [], []
    for c in range(3):
        i9 = rig["intr"][c]
        k_mats.append(np.array([[i9[0], 0, i9[1]], [0, i9[2], i9[3]],
                                [0, 0, 1]]))
        dists.append(i9[4:])
        exts.append(make_4x4h_tform(rig["extr"][c][:3], rig["extr"][c][3:]))
    cams = CameraSet(camera_dict=make_cam_dict(
        ["a", "b", "c"], exts, k_mats, dists, [[1600, 1200]] * 3))
    h = SelfBundleHandler(
        cams, FreePointTarget(rig["template"].reshape(1, -1, 3)),
        TargetDetection(cam_names=["a", "b", "c"], data=rig["dd"]),
        options={"outliers": "n"})
    res, solved = run_bundle_adjustment(h)
    unc = calibration_uncertainty(solved, x=res["x"])
    pts = unc["point_sigma"]
    assert pts.shape == (rig["n_keys"], 3)
    # the 7 gauge-pinned coordinates carry zero sigma; the rest are positive
    n_zero = int((pts == 0.0).sum())
    assert n_zero == 7, n_zero
    assert float(pts.max()) > 0.0


def test_tracker_reports_pose_sigma():
    """TargetTracker attaches per-frame pose standard errors; a frame's
    sigma must bracket the true pose error magnitude (order of)."""
    from pycamset_tpu.models.camera_set import CameraSet, make_cam_dict
    from pycamset_tpu.models.detections import TargetDetection
    from pycamset_tpu.optim.handlers import FreePointTarget
    from pycamset_tpu.tracking import TargetTracker
    from pycamset_tpu.utils.general_utils import make_4x4h_tform
    from pycamset_tpu.utils.synthetic import make_synthetic_rig

    rig = make_synthetic_rig(n_cams=3, n_ims=8, grid=6, visibility=0.9,
                             noise_px=0.3, seed=31)
    k_mats, exts, dists = [], [], []
    for c in range(3):
        i9 = rig["intr"][c]
        k_mats.append(np.array([[i9[0], 0, i9[1]], [0, i9[2], i9[3]],
                                [0, 0, 1]]))
        dists.append(i9[4:])
        exts.append(make_4x4h_tform(rig["extr"][c][:3], rig["extr"][c][3:]))
    cams = CameraSet(camera_dict=make_cam_dict(
        ["a", "b", "c"], exts, k_mats, dists, [[1600, 1200]] * 3))
    det = TargetDetection(cam_names=["a", "b", "c"], data=rig["dd"])
    tracker = TargetTracker(cams, FreePointTarget(
        rig["template"].reshape(1, -1, 3)))
    poses, info = tracker.track_batch(det)

    sig = info["pose_sigma"]
    assert sig.shape == (8, 6)
    assert np.all(sig > 0)
    # true per-frame translation error vs predicted sigma: same order
    t_err = np.array([np.linalg.norm(
        poses[i][:3, 3] - make_4x4h_tform(rig["poses"][i][:3],
                                          rig["poses"][i][3:])[:3, 3])
        for i in range(8)])
    t_sig = np.linalg.norm(sig[:, 3:], axis=1)
    assert np.median(t_err / t_sig) < 4.0
    assert np.median(t_err / t_sig) > 0.05

    # single-frame API carries the same field
    _pose, one = tracker.track(det.get(im_num=0))
    assert one["pose_sigma"].shape == (6,)
    assert np.all(one["pose_sigma"] > 0)

def _small_solved_rig(noise_px=0.3, seed=41, loss="linear", outlier=False):
    from pycamset_tpu.models.camera_set import CameraSet, make_cam_dict
    from pycamset_tpu.models.detections import TargetDetection
    from pycamset_tpu.optim.driver import run_bundle_adjustment
    from pycamset_tpu.optim.handlers import (
        FreePointTarget, TemplateBundleHandler)
    from pycamset_tpu.utils.general_utils import make_4x4h_tform
    from pycamset_tpu.utils.synthetic import make_synthetic_rig

    rig = make_synthetic_rig(n_cams=3, n_ims=6, grid=5, visibility=1.0,
                             noise_px=noise_px, seed=seed)
    dd = rig["dd"].copy()
    if outlier:  # one wildly wrong observation
        dd[7, 3:5] += 400.0
    k_mats, exts, dists = [], [], []
    for c in range(3):
        i9 = rig["intr"][c]
        k_mats.append(np.array([[i9[0], 0, i9[1]], [0, i9[2], i9[3]],
                                [0, 0, 1]]))
        dists.append(i9[4:])
        exts.append(make_4x4h_tform(rig["extr"][c][:3], rig["extr"][c][3:]))
    cams = CameraSet(camera_dict=make_cam_dict(
        ["a", "b", "c"], exts, k_mats, dists, [[1600, 1200]] * 3))
    opts = {"outliers": "n"}
    if loss != "linear":
        opts |= {"loss": loss, "f_scale": 2.0}
    handler = TemplateBundleHandler(
        cams, FreePointTarget(rig["template"].reshape(1, -1, 3)),
        TargetDetection(cam_names=["a", "b", "c"], data=dd), options=opts)
    res, solved = run_bundle_adjustment(handler, backend="structured")
    return res, solved


def test_robust_loss_weights_covariance():
    """With a huber loss, one gross outlier must NOT inflate sigma2: the
    IRLS weighting downweights it in the covariance the same way the
    solver does in the objective."""
    from pycamset_tpu.optim.uncertainty import calibration_uncertainty

    res, solved = _small_solved_rig(loss="huber", outlier=True)
    unc = calibration_uncertainty(solved, x=res["x"])
    # unweighted, the 400px outlier alone puts sqrt(sigma2) near 14px
    # (400^2/dof); huber-weighted it contributes ~2*f_scale*400/dof ~ 1px^2
    # on top of the fit distortion the un-rejected outlier itself causes
    assert np.sqrt(unc["sigma2"]) < 5.0, unc["sigma2"]

    # and a clean linear solve agrees with its robust counterpart's scale
    res_l, solved_l = _small_solved_rig(loss="linear", outlier=False)
    unc_l = calibration_uncertainty(solved_l, x=res_l["x"])
    assert np.sqrt(unc_l["sigma2"]) < 0.5


def test_sparse_sigma_matches_dense(monkeypatch):
    """Forcing the large-problem sparse path must reproduce the dense
    camera/pose sigmas (point sigmas are intentionally omitted)."""
    from pycamset_tpu.optim import uncertainty as U

    res, solved = _small_solved_rig()
    dense = U.calibration_uncertainty(solved, x=res["x"])
    monkeypatch.setattr(U, "DENSE_COV_MAX_PARAMS", 1)
    sparse = U.calibration_uncertainty(solved, x=res["x"])

    assert "point_sigma" not in sparse
    np.testing.assert_allclose(sparse["pose_sigma"], dense["pose_sigma"],
                               rtol=1e-8, atol=1e-12)
    for name in dense["cameras"]:
        np.testing.assert_allclose(
            sparse["cameras"][name]["int_sigma"],
            dense["cameras"][name]["int_sigma"], rtol=1e-8, atol=1e-12)
        np.testing.assert_allclose(
            sparse["cameras"][name]["ext_sigma"],
            dense["cameras"][name]["ext_sigma"], rtol=1e-8, atol=1e-12)


def test_sparse_sigma_selfcal_schur_matches_dense(monkeypatch):
    """On a SELF-cal handler (free geometry in the tail) the forced sparse
    path eliminates the point block via the Schur selected inverse — ALL
    sigmas, point sigmas included, must agree with the dense inverse
    (which test_sigma_matches_monte_carlo_scatter validates against MC)."""
    from pycamset_tpu.models.camera_set import CameraSet, make_cam_dict
    from pycamset_tpu.models.detections import TargetDetection
    from pycamset_tpu.optim.driver import run_bundle_adjustment
    from pycamset_tpu.optim.handlers import FreePointTarget, SelfBundleHandler
    from pycamset_tpu.optim import uncertainty as U
    from pycamset_tpu.utils.general_utils import make_4x4h_tform
    from pycamset_tpu.utils.synthetic import make_synthetic_rig

    # FULL visibility: partially-seen features make the self-cal system
    # near-singular, where the trailing digits of any factorization are
    # noise and sigma parity is meaningless (both honestly read "huge")
    rig = make_synthetic_rig(n_cams=3, n_ims=8, grid=5, visibility=1.0,
                             noise_px=0.2, seed=23)
    k_mats, exts, dists = [], [], []
    for c in range(3):
        i9 = rig["intr"][c]
        k_mats.append(np.array([[i9[0], 0, i9[1]], [0, i9[2], i9[3]],
                                [0, 0, 1]]))
        dists.append(i9[4:])
        exts.append(make_4x4h_tform(rig["extr"][c][:3], rig["extr"][c][3:]))
    cams = CameraSet(camera_dict=make_cam_dict(
        ["a", "b", "c"], exts, k_mats, dists, [[1600, 1200]] * 3))
    h = SelfBundleHandler(
        cams, FreePointTarget(rig["template"].reshape(1, -1, 3)),
        TargetDetection(cam_names=["a", "b", "c"], data=rig["dd"]),
        options={"outliers": "n"})
    res, solved = run_bundle_adjustment(h)

    dense = U.calibration_uncertainty(solved, x=res["x"])
    assert "point_sigma" in dense
    monkeypatch.setattr(U, "DENSE_COV_MAX_PARAMS", 1)
    sparse = U.calibration_uncertainty(solved, x=res["x"])

    assert "point_sigma" in sparse, "Schur path must solve point sigmas"

    # self-cal systems can carry genuinely near-null directions (features
    # triangulated from ~2 close views): there BOTH factorizations report
    # "effectively unbounded" but the garbage digits differ, so parity is
    # only meaningful on well-constrained entries
    def check(a, b):
        well = (b > 0) & (b < 1.0)
        np.testing.assert_allclose(a[well], b[well], rtol=1e-5, atol=1e-10)
        assert np.all(a[b >= 1.0] >= 0.1)  # huge stays huge

    check(sparse["pose_sigma"], dense["pose_sigma"])
    check(sparse["point_sigma"].ravel(), dense["point_sigma"].ravel())
    # the gauge-pinned point coordinates stay exactly zero on both paths
    np.testing.assert_array_equal(sparse["point_sigma"] == 0.0,
                                  dense["point_sigma"] == 0.0)
    for name in dense["cameras"]:
        for field in ("int_sigma", "ext_sigma"):
            check(sparse["cameras"][name][field],
                  dense["cameras"][name][field])


@pytest.mark.slow
def test_sparse_sigma_large_selfcal_real_scale():
    """A genuinely >DENSE_COV_MAX_PARAMS self-cal (no monkeypatch): the
    Schur path must produce finite, positive point sigmas at the scale the
    dense inverse cannot reach, near the injected noise in magnitude."""
    from pycamset_tpu.models.camera_set import CameraSet, make_cam_dict
    from pycamset_tpu.models.detections import TargetDetection
    from pycamset_tpu.optim.driver import run_bundle_adjustment
    from pycamset_tpu.optim.handlers import FreePointTarget, SelfBundleHandler
    from pycamset_tpu.optim.uncertainty import calibration_uncertainty
    from pycamset_tpu.utils.general_utils import make_4x4h_tform
    from pycamset_tpu.utils.synthetic import make_synthetic_rig

    # 47x47 grid -> 2209 points -> 6627 geometry params + cams/poses > 6000
    rig = make_synthetic_rig(n_cams=4, n_ims=12, grid=47, visibility=1.0,
                             noise_px=0.3, seed=31)
    k_mats, exts, dists = [], [], []
    for c in range(4):
        i9 = rig["intr"][c]
        k_mats.append(np.array([[i9[0], 0, i9[1]], [0, i9[2], i9[3]],
                                [0, 0, 1]]))
        dists.append(i9[4:])
        exts.append(make_4x4h_tform(rig["extr"][c][:3], rig["extr"][c][3:]))
    cams = CameraSet(camera_dict=make_cam_dict(
        ["a", "b", "c", "d"], exts, k_mats, dists, [[1600, 1200]] * 4))
    h = SelfBundleHandler(
        cams, FreePointTarget(rig["template"].reshape(1, -1, 3)),
        TargetDetection(cam_names=["a", "b", "c", "d"], data=rig["dd"]),
        options={"outliers": "n"})
    assert int(h.bundlePrimitive.unfixed_full().sum()) > 6000
    res, solved = run_bundle_adjustment(h)
    unc = calibration_uncertainty(solved, x=res["x"])

    pts = unc["point_sigma"]
    assert pts.shape == (rig["n_keys"], 3)
    assert np.all(np.isfinite(pts))
    free = pts[pts > 0]
    assert free.size >= pts.size - 7
    # 0.3 px noise at ~1500 px focal, ~1 m range: well-constrained points
    # sit at 0.1-5 mm; the self-cal gauge coupling inflates the weak tail.
    # The band catches order-of-magnitude breakage, not exact values.
    assert 1e-6 < np.percentile(free, 25) < 1e-2, np.percentile(free, 25)
    assert np.median(free) < 0.5, np.median(free)


def test_tracker_degenerate_frame_reports_inf_not_nan():
    """Collinear target points leave rotation about the line unconstrained
    with dof >= 1: the sigma must surface as the documented inf sentinel,
    never NaN (advisor finding: the old absolute 1e-12 ridge was invisible
    against px-scale JtJ entries)."""
    from pycamset_tpu.models.camera import Camera
    from pycamset_tpu.models.camera_set import CameraSet
    from pycamset_tpu.models.detections import TargetDetection
    from pycamset_tpu.optim.handlers import FreePointTarget
    from pycamset_tpu.tracking import TargetTracker

    cam = Camera(name="a", res=[1600, 1200])
    cams = CameraSet(camera_dict={"a": cam})
    # 8 points on a line through the optical axis direction
    line = np.zeros((8, 3))
    line[:, 0] = np.linspace(-0.1, 0.1, 8)
    tracker = TargetTracker(cams, FreePointTarget(line.reshape(1, -1, 3)))

    # observe the line at z=1 in front of the single camera
    uv = cam.project_points(line + np.array([0.0, 0.0, 1.0]))
    dd = np.column_stack([np.zeros(8), np.zeros(8), np.arange(8), uv])
    det = TargetDetection(cam_names=["a"], data=dd)
    _pose, info = tracker.track(det)

    sig = np.asarray(info["pose_sigma"])
    assert not np.any(np.isnan(sig)), sig
    # the unconstrained direction reads inf or a huge finite value; the
    # constrained ones stay finite
    assert np.all((sig > 0) | np.isinf(sig)), sig
