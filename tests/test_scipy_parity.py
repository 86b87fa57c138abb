"""Parity of the TPU-resident LM against scipy.optimize.least_squares (TRF).

BASELINE.md requires "RMS px error equal to scipy reference". Both solvers
run the identical problem (same residual kernels; scipy consumes the
device-evaluated sparse Jacobian) and must land on the same minimum.
"""
import numpy as np
import pytest
from scipy.optimize import approx_fprime


def _make_handler(noise=0.25, seed=13):
    from pycamset_tpu.models.camera_set import CameraSet, make_cam_dict
    from pycamset_tpu.models.detections import TargetDetection
    from pycamset_tpu.optim.handlers import FreePointTarget, TemplateBundleHandler
    from pycamset_tpu.utils.general_utils import make_4x4h_tform
    from pycamset_tpu.utils.synthetic import make_synthetic_rig

    rig = make_synthetic_rig(n_cams=3, n_ims=6, grid=5, visibility=0.9,
                             noise_px=noise, seed=seed)
    k_mats, exts, dists = [], [], []
    for c in range(3):
        i9 = rig["intr"][c]
        k_mats.append(np.array([[i9[0], 0, i9[1]], [0, i9[2], i9[3]], [0, 0, 1]]))
        dists.append(i9[4:])
        exts.append(make_4x4h_tform(rig["extr"][c][:3], rig["extr"][c][3:]))
    cams = CameraSet(camera_dict=make_cam_dict(
        ["a", "b", "c"], exts, k_mats, dists, [[1600, 1200]] * 3))
    target = FreePointTarget(rig["template"].reshape(1, -1, 3))
    det = TargetDetection(cam_names=["a", "b", "c"], data=rig["dd"])
    handler = TemplateBundleHandler(cams, target, det,
                                    options={"outliers": "n"})
    return handler, rig


def test_sparse_jacobian_matches_finite_difference():
    from pycamset_tpu.optim.driver import make_optimisation_function
    handler, _ = _make_handler()
    loss_fn, jac_fn, x0 = make_optimisation_function(handler)
    jac = jac_fn(x0).toarray()
    # spot-check a random subset of columns against central differences
    rng = np.random.default_rng(0)
    for j in rng.choice(x0.size, 12, replace=False):
        eps = 1e-6 * max(1.0, abs(x0[j]))
        dp = np.zeros_like(x0)
        dp[j] = eps
        num = (loss_fn(x0 + dp) - loss_fn(x0 - dp)) / (2 * eps)
        np.testing.assert_allclose(jac[:, j], num, atol=1e-4, rtol=1e-4)


def test_lm_matches_scipy_minimum():
    from pycamset_tpu.optim.driver import run_bundle_adjustment
    handler_a, _ = _make_handler()
    handler_b, _ = _make_handler()
    # both handlers share the same initial params path (PnP seeding)
    res_ours, _ = run_bundle_adjustment(handler_a, backend="structured")
    res_scipy, _ = run_bundle_adjustment(handler_b, backend="scipy")

    rms_ours = np.sqrt(np.mean(res_ours["fun"] ** 2))
    rms_scipy = np.sqrt(np.mean(res_scipy["fun"] ** 2))
    # same minimum: RMS difference far below a thousandth of a pixel.
    # (Individual parameters are NOT compared: planar-target BA has
    # near-flat fx-vs-depth directions, so distinct parameter vectors of
    # equal cost are expected — scipy itself stops at max_nfev with
    # first-order optimality ~0.5 on this problem.)
    assert abs(rms_ours - rms_scipy) < 1e-4, (rms_ours, rms_scipy)
    assert rms_ours <= rms_scipy + 1e-6  # at least as good as scipy


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
