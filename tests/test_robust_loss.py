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
