"""Self-cal gauge options: custom bundle_points_unfixed / always_correct_gauge.

The reference documents (but ships commented out,
standard_bundle_handler.py:140-148) letting the caller pin their own target
coordinates instead of the automatic 7-coordinate gauge fix, optionally
still applying the post-hoc similarity alignment.
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


def test_custom_pins_skip_gauge_alignment():
    from pycamset_tpu.optim.driver import run_bundle_adjustment
    from pycamset_tpu.optim.handlers import SelfBundleHandler

    cams, target, det, rig = _setup()
    n_pts = rig["n_keys"]
    # pin the first three full points (9 coordinates >= 7 gauge dof)
    unfixed = np.ones(3 * n_pts, dtype=bool)
    unfixed[:9] = False
    handler = SelfBundleHandler(cams, target, det,
                                options={"outliers": "n"},
                                bundle_points_unfixed=unfixed)
    assert handler.correct_gauge is False
    assert handler.fixed_inds is None

    result, out_cams = run_bundle_adjustment(handler)
    assert np.sqrt(np.mean(result["fun"] ** 2)) < 0.3

    # the user's pinned coordinates survive EXACTLY (no similarity realign)
    pts = handler.get_updated_target(result["x"]).reshape(-1)
    ref = rig["template"].reshape(-1)
    np.testing.assert_array_equal(pts[:9], ref[:9])


def test_custom_pins_with_always_correct_gauge():
    from pycamset_tpu.optim.driver import run_bundle_adjustment
    from pycamset_tpu.optim.handlers import SelfBundleHandler

    cams, target, det, rig = _setup(seed=30)
    n_pts = rig["n_keys"]
    unfixed = np.ones(3 * n_pts, dtype=bool)
    unfixed[:9] = False
    handler = SelfBundleHandler(cams, target, det,
                                options={"outliers": "n"},
                                bundle_points_unfixed=unfixed,
                                always_correct_gauge=True)
    assert handler.correct_gauge is True
    result, out_cams = run_bundle_adjustment(handler)
    assert np.sqrt(np.mean(result["fun"] ** 2)) < 0.3
    # alignment ran: recovered geometry is similarity-fit onto the
    # reference model (mean displacement tiny on a clean synthetic)
    pts = handler.get_updated_target(result["x"])
    ref = rig["template"]
    assert np.mean(np.linalg.norm(pts - ref, axis=1)) < 5e-4


def test_gauge_mask_validation():
    from pycamset_tpu.optim.handlers import SelfBundleHandler
    cams, target, det, rig = _setup()
    n_pts = rig["n_keys"]
    with pytest.raises(ValueError, match="fixes nothing"):
        SelfBundleHandler(cams, target, det, options={"outliers": "n"},
                          bundle_points_unfixed=np.ones(3 * n_pts, bool))
    with pytest.raises(ValueError, match="shape"):
        SelfBundleHandler(cams, target, det, options={"outliers": "n"},
                          bundle_points_unfixed=np.zeros(5, bool))


if __name__ == "__main__":
    pytest.main([__file__, "-v"])


def test_planar_gauge_pin_is_not_degenerate():
    """Regression: the automatic 7-coordinate gauge must actually pin the
    rotation about the p0-p1 axis. For a planar z=0 target that rotation
    moves every point purely in z, so the old always-pin-p2.x rule left
    an EXACT null mode (equilibrated JtJ cond ~5e16); the fixed rule pins
    p2's coordinate along v = axis x (p2 - p0) and the system is
    well-posed."""
    from pycamset_tpu.optim.driver import (make_optimisation_function,
                                           run_bundle_adjustment)
    from pycamset_tpu.optim.handlers import SelfBundleHandler

    cams, target, det, rig = _setup(seed=29)
    h = SelfBundleHandler(cams, target, det, options={"outliers": "n"})
    # the planar target must pin a z coordinate as its 7th gauge pin
    pinned = np.nonzero(~h.feat_unfixed)[0]
    assert any(i % 3 == 2 for i in pinned), pinned
    res, _ = run_bundle_adjustment(h)
    _loss, jac_fn, _ = make_optimisation_function(h)
    jtj = (lambda J: J.T @ J)(jac_fn(np.asarray(res["x"])).toarray())
    d = np.sqrt(np.clip(np.diag(jtj), 1e-30, None))
    ev = np.linalg.eigvalsh(jtj / d[:, None] / d[None, :])
    assert ev[0] > 1e-10, f"self-cal gauge left a near-null mode: {ev[0]}"
