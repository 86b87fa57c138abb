"""Metric scale bars for self-calibration (beyond the reference).

Scale is a pure gauge freedom of a target self-calibration, so anchoring
it post-hoc on user-MEASURED point-pair distances is exactly equivalent to
constraining those distances inside the bundle adjustment. The
``scale_bars`` option overrides the nominal reference-model anchor in
``SelfBundleHandler.apply_gauge_transform``.
"""
import numpy as np
import pytest


def _setup(seed=29):
    from pycamset_tpu.models.camera_set import CameraSet, make_cam_dict
    from pycamset_tpu.models.detections import TargetDetection
    from pycamset_tpu.optim.handlers import FreePointTarget
    from pycamset_tpu.utils.general_utils import make_4x4h_tform
    from pycamset_tpu.utils.synthetic import make_synthetic_rig

    rig = make_synthetic_rig(n_cams=3, n_ims=6, grid=5, visibility=0.95,
                             noise_px=0.2, seed=seed)
    k_mats, exts, dists = [], [], []
    for c in range(3):
        i9 = rig["intr"][c]
        k_mats.append(np.array([[i9[0], 0, i9[1]], [0, i9[2], i9[3]],
                                [0, 0, 1]]))
        dists.append(i9[4:])
        exts.append(make_4x4h_tform(rig["extr"][c][:3], rig["extr"][c][3:]))
    cams = CameraSet(camera_dict=make_cam_dict(
        ["a", "b", "c"], exts, k_mats, dists, [[1600, 1200]] * 3))
    target = FreePointTarget(rig["template"].reshape(1, -1, 3))
    det = TargetDetection(cam_names=["a", "b", "c"], data=rig["dd"])
    return cams, target, det, rig


def _solve(cams, target, det, options):
    from pycamset_tpu.optim.driver import run_bundle_adjustment
    from pycamset_tpu.optim.handlers import SelfBundleHandler
    handler = SelfBundleHandler(cams, target, det, options=options)
    result, out_cams = run_bundle_adjustment(handler)
    return handler, result, out_cams


def test_scale_bars_set_metric_scale_and_preserve_reprojection():
    cams, target, det, rig = _setup()
    base_opts = {"outliers": "n"}
    h0, r0, cams0 = _solve(cams, target, det, base_opts)

    # pretend the physical target is exactly 2x the nominal CAD model:
    # measure two bars at twice their reference-model lengths
    ref = rig["template"].reshape(-1, 3)
    n = len(ref)
    pairs = [(0, n - 1), (2, n // 2)]
    bars = [(i, j, 2.0 * float(np.linalg.norm(ref[i] - ref[j])))
            for i, j in pairs]
    h1, r1, cams1 = _solve(cams, target, det,
                           {**base_opts, "scale_bars": bars})

    # gauge freedom: the reprojection error must be IDENTICAL
    assert np.allclose(np.sqrt(np.mean(r0["fun"] ** 2)),
                       np.sqrt(np.mean(r1["fun"] ** 2)), atol=1e-9)
    assert np.sqrt(np.mean(r1["fun"] ** 2)) < 0.3

    # recovered geometry carries the measured scale (bars reproduce their
    # measured lengths to the noise floor)
    pts = h1.get_updated_target(r1["x"])
    for (i, j, d) in bars:
        est = np.linalg.norm(pts[i] - pts[j])
        assert abs(est - d) / d < 1e-3
    # the whole model scales coherently: every pairwise distance doubles
    pts0 = h0.get_updated_target(r0["x"])
    vm = h1.visible_feature_mask
    d1 = np.linalg.norm(pts[vm][:1] - pts[vm][1:], axis=1)
    d0 = np.linalg.norm(pts0[vm][:1] - pts0[vm][1:], axis=1)
    # rtol: the two runs anchor s on different pair subsets of the same
    # noisy solve, so the ratio matches 2 only to the anchoring noise
    assert np.allclose(d1 / d0, 2.0, rtol=1e-3)

    # camera baselines double too (the rig is metric now)
    def baseline(cs):
        p = [cs[nm].position for nm in cs.get_names()]
        return np.linalg.norm(p[0] - p[1])
    assert np.isclose(baseline(cams1) / baseline(cams0), 2.0, rtol=1e-3)


def test_multiple_bars_least_squares():
    """Inconsistent bars resolve by least squares: min_s sum (s*e - d)^2."""
    cams, target, det, rig = _setup(seed=31)
    ref = rig["template"].reshape(-1, 3)
    n = len(ref)
    e1 = float(np.linalg.norm(ref[0] - ref[n - 1]))
    e2 = float(np.linalg.norm(ref[1] - ref[n // 2]))
    bars = [(0, n - 1, 1.9 * e1), (1, n // 2, 2.1 * e2)]
    h, r, _ = _solve(cams, target, det,
                     {"outliers": "n", "scale_bars": bars})
    pts = h.get_updated_target(r["x"])
    est = [np.linalg.norm(pts[i] - pts[j]) for i, j, _ in bars]
    # the recovered scale sits between the two implied scales, at the
    # (e-weighted) least-squares blend
    s1, s2 = est[0] / e1, est[1] / e2
    assert 1.9 < s1 < 2.1 and 1.9 < s2 < 2.1
    d = np.array([b[2] for b in bars])
    e_noise = np.array(est) / np.array([s1, s2])  # recovered pre-scale
    s_ls = float(np.dot(d, e_noise) / np.dot(e_noise, e_noise))
    assert np.isclose(s1, s_ls, rtol=1e-3)


def test_bad_bars_raise():
    from pycamset_tpu.optim.handlers import SelfBundleHandler
    cams, target, det, rig = _setup(seed=32)

    h = SelfBundleHandler(cams, target, det,
                          options={"outliers": "n",
                                   "scale_bars": [(0, 0, 1.0)]})
    model = h.bundlePrimitive.return_bundle_primitives(
        h.get_initial_params())
    with pytest.raises(ValueError, match="distinct"):
        h.apply_gauge_transform(*model)

    h2 = SelfBundleHandler(cams, target, det,
                           options={"outliers": "n",
                                    "scale_bars": [(0, 1, -2.0)]})
    with pytest.raises(ValueError, match="positive"):
        h2.apply_gauge_transform(*model)


def test_unseen_endpoint_warns(caplog):
    import logging
    cams, target, det, rig = _setup(seed=33)
    from pycamset_tpu.optim.handlers import SelfBundleHandler
    h = SelfBundleHandler(cams, target, det,
                          options={"outliers": "n",
                                   "scale_bars": [(0, 1, 0.1)]})
    h.visible_feature_mask = h.visible_feature_mask.copy()
    h.visible_feature_mask[0] = False
    model = h.bundlePrimitive.return_bundle_primitives(
        h.get_initial_params())
    with caplog.at_level(logging.WARNING):
        h.apply_gauge_transform(*model)
    assert any("never observed" in m for m in caplog.messages)
