"""Robust loss (IRLS) tests: outlier-contaminated BA recovers with cauchy."""
import numpy as np
import pytest


def _handler_with_outliers(loss, outlier_frac=0.05, seed=31):
    from pycamset_tpu.models.camera_set import CameraSet, make_cam_dict
    from pycamset_tpu.models.detections import TargetDetection
    from pycamset_tpu.optim.handlers import FreePointTarget, TemplateBundleHandler
    from pycamset_tpu.utils.general_utils import make_4x4h_tform
    from pycamset_tpu.utils.synthetic import make_synthetic_rig

    rig = make_synthetic_rig(n_cams=3, n_ims=8, grid=6, visibility=0.95,
                             noise_px=0.2, seed=seed)
    dd = rig["dd"].copy()
    rng = np.random.default_rng(seed)
    n_out = int(outlier_frac * dd.shape[0])
    idx = rng.choice(dd.shape[0], n_out, replace=False)
    dd[idx, 3:5] += rng.normal(size=(n_out, 2)) * 60.0  # gross outliers

    k_mats, exts, dists = [], [], []
    for c in range(3):
        i9 = rig["intr"][c]
        k_mats.append(np.array([[i9[0], 0, i9[1]], [0, i9[2], i9[3]], [0, 0, 1]]))
        dists.append(i9[4:])
        exts.append(make_4x4h_tform(rig["extr"][c][:3], rig["extr"][c][3:]))
    cams = CameraSet(camera_dict=make_cam_dict(
        ["a", "b", "c"], exts, k_mats, dists, [[1600, 1200]] * 3))
    target = FreePointTarget(rig["template"].reshape(1, -1, 3))
    det = TargetDetection(cam_names=["a", "b", "c"], data=dd)
    handler = TemplateBundleHandler(
        cams, target, det,
        options={"outliers": "n", "loss": loss, "f_scale": 1.0})
    return handler, rig


def _intrinsic_error(handler, rig, x):
    intr, _, _ = handler.bundlePrimitive.return_bundle_primitives(x)
    return float(np.abs(intr[:, 0] - rig["intr"][:, 0]).mean())  # fx error


@pytest.mark.parametrize("loss", ["huber", "cauchy", "soft_l1"])
def test_robust_beats_linear_under_outliers(loss):
    from pycamset_tpu.optim.driver import run_bundle_adjustment
    h_lin, rig = _handler_with_outliers("linear")
    res_lin, _ = run_bundle_adjustment(h_lin)
    err_lin = _intrinsic_error(h_lin, rig, res_lin["x"])

    # clean reference: same problem without outliers (the planar-grid
    # geometry has an irreducible fx-depth uncertainty of a few px)
    h_clean, _ = _handler_with_outliers("linear", outlier_frac=0.0)
    res_clean, _ = run_bundle_adjustment(h_clean)
    err_clean = _intrinsic_error(h_clean, rig, res_clean["x"])

    h_rob, rig = _handler_with_outliers(loss)
    res_rob, _ = run_bundle_adjustment(h_rob)
    err_rob = _intrinsic_error(h_rob, rig, res_rob["x"])

    assert err_rob < err_lin * 0.6, (
        f"{loss}: fx error {err_rob:.3f} vs linear {err_lin:.3f}")
    # robust recovery lands close to the outlier-free solution quality
    assert err_rob < 3 * err_clean + 1.0, (
        f"{loss}: {err_rob:.3f} vs clean {err_clean:.3f}")


@pytest.mark.parametrize("loss", ["huber", "cauchy"])
def test_device_vs_scipy_robust_semantics_bounded(loss):
    """Quantify the documented semantics divergence (optim/losses.py)
    when OPTING INTO the Ceres per-2-D-observation convention (the default
    since round 4 is "component" = bitwise scipy parity); the scipy
    backend applies rho per residual COMPONENT.

    Two numeric statements replace the hand-wave:
    1. Pointwise, concavity/subadditivity of every shipped rho bounds the
       per-component objective within [1x, 2x] of the per-observation one
       (exactly equal on huber inliers) — asserted on the final residuals.
    2. At the default budget the device IRLS solution is BETTER than the
       scipy TRF solution even under scipy's OWN per-component objective
       (measured ratios: 0.29 huber, 0.09 cauchy — scipy's robust TRF
       creeps on this problem and is the weaker oracle, not a stricter
       one).
    """
    from pycamset_tpu.optim.driver import (
        make_optimisation_function, run_bundle_adjustment)

    def rho_np(z, loss):
        return (np.where(z <= 1, z, 2 * np.sqrt(z) - 1) if loss == "huber"
                else np.log1p(z))

    h_d, _ = _handler_with_outliers(loss)
    h_d.problem_opts["loss_semantics"] = "observation"  # opt into Ceres
    res_d, _ = run_bundle_adjustment(h_d, backend="structured")
    h_s, _ = _handler_with_outliers(loss)
    res_s, _ = run_bundle_adjustment(h_s, backend="scipy")
    h_e, _ = _handler_with_outliers(loss)
    loss_fn, _, _ = make_optimisation_function(h_e)

    def per_component(x):
        return float(np.sum(rho_np(loss_fn(x) ** 2, loss)))

    def per_observation(x):
        r = loss_fn(x).reshape(-1, 2)
        return float(np.sum(rho_np((r ** 2).sum(axis=1), loss)))

    # (1) pointwise objective bracket on the device solution's residuals
    obs = per_observation(res_d["x"])
    comp = per_component(res_d["x"])
    assert obs <= comp * (1 + 1e-12)
    assert comp <= 2 * obs

    # (2) the device argmin dominates under scipy's own semantics
    assert comp <= per_component(res_s["x"]) * (1 + 1e-6), (
        f"{loss}: device solution worse under scipy's objective")


@pytest.mark.parametrize("loss", ["huber", "cauchy"])
def test_per_component_semantics_match_scipy_objective(loss):
    """options={'loss_semantics': 'component'} gives BITWISE scipy
    objective semantics on the device backend: the structured cost at any
    parameter vector equals sum(rho(r_i^2)) over residual COMPONENTS."""
    from pycamset_tpu.optim.driver import (
        make_optimisation_function, run_bundle_adjustment)

    h, _ = _handler_with_outliers(loss)
    h.problem_opts["loss_semantics"] = "component"
    h.problem_opts["max_nfev"] = 8
    res, _ = run_bundle_adjustment(h, backend="structured")

    h2, _ = _handler_with_outliers(loss)
    loss_fn, _, _ = make_optimisation_function(h2)
    r = loss_fn(res["x"])
    z = r ** 2
    rho = (np.where(z <= 1, z, 2 * np.sqrt(z) - 1) if loss == "huber"
           else np.log1p(z))
    # res['cost'] is scipy-convention 0.5 * sum rho
    np.testing.assert_allclose(2.0 * res["cost"], np.sum(rho),
                               rtol=1e-9)


def test_per_component_solve_still_beats_linear():
    from pycamset_tpu.optim.driver import run_bundle_adjustment
    h_lin, rig = _handler_with_outliers("linear")
    res_lin, _ = run_bundle_adjustment(h_lin)
    err_lin = _intrinsic_error(h_lin, rig, res_lin["x"])
    h, rig = _handler_with_outliers("huber")
    h.problem_opts["loss_semantics"] = "component"
    res, _ = run_bundle_adjustment(h)
    err = _intrinsic_error(h, rig, res["x"])
    assert err < err_lin * 0.6


def test_loss_functions_shapes():
    import jax.numpy as jnp
    from pycamset_tpu.optim.losses import LOSSES, make_loss
    s = jnp.array([0.0, 0.5, 1.0, 10.0, 1e6])
    for name in LOSSES:
        rho, w = make_loss(name, f_scale=2.0)
        r, ww = np.asarray(rho(s)), np.asarray(w(s))
        assert np.all(np.isfinite(r)) and np.all(np.isfinite(ww))
        assert np.all(ww <= 1.0 + 1e-9) and np.all(ww >= 0)
        # rho ~ s for small s (all scipy losses are normalised this way)
        np.testing.assert_allclose(r[1], 0.5, rtol=0.15)


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
