"""Adversarial LM-vs-scipy battery (VERDICT r2 item 5).

"RMS parity with scipy" (BASELINE.md) must survive hard problems, not just
benign fixtures: outlier contamination under robust losses, corrupted
seeds, near-degenerate geometry, high-distortion intrinsics, and float32.
Every cell runs the SAME problem from the SAME initial parameters through
the device LM and through scipy.optimize.least_squares (TRF, sparse
device-evaluated Jacobian — the reference's solver,
pyCamSet/optimisation/optimisation_handling.py:88-98), and asserts the
device minimum is at least as low as scipy's.

Robust cells use loss_semantics="component" so both optimisers minimise
the bitwise-identical scipy objective.
"""
import numpy as np
import pytest


def _build_pair(noise=0.3, outlier_frac=0.0, seed=17, camera_model="standard",
                pose_scale=(0.4, 0.15), seed_noise=None, n_cams=3, n_ims=8,
                options=None):
    """Two handlers over one problem, sharing identical initial params.

    :param seed_noise: (pose rad/m, intr fraction) corruption of the
        PnP-seeded initial parameter vector.
    :return: (device handler, scipy handler)
    """
    from pycamset_tpu.models.camera_set import CameraSet, make_cam_dict
    from pycamset_tpu.models.detections import TargetDetection
    from pycamset_tpu.optim.handlers import (
        FreePointTarget, TemplateBundleHandler)
    from pycamset_tpu.utils.general_utils import make_4x4h_tform
    from pycamset_tpu.utils.synthetic import make_synthetic_rig

    rig = make_synthetic_rig(n_cams=n_cams, n_ims=n_ims, grid=6,
                             visibility=0.9, noise_px=noise, seed=seed,
                             camera_model=camera_model,
                             pose_scale=pose_scale)
    dd = rig["dd"].copy()
    if outlier_frac:
        rng = np.random.default_rng(seed + 1)
        bad = rng.random(dd.shape[0]) < outlier_frac
        dd[bad, 3:5] += rng.normal(size=(int(bad.sum()), 2)) * 40.0

    intr_w = rig["intr"].shape[1]
    k_mats = [np.array([[i9[0], 0, i9[1]], [0, i9[2], i9[3]], [0, 0, 1]])
              for i9 in rig["intr"]]
    exts = [make_4x4h_tform(e[:3], e[3:]) for e in rig["extr"]]
    dists = [i9[4:] for i9 in rig["intr"]]
    names = [f"c{i}" for i in range(n_cams)]
    opts = {"outliers": "n", "max_nfev": 100}
    if intr_w != 9:
        opts["camera_model"] = {8: "fisheye", 12: "rational",
                                16: "thin_prism", 18: "tilted"}[intr_w]
    opts.update(options or {})

    def handler():
        cams = CameraSet(camera_dict=make_cam_dict(
            names, [e.copy() for e in exts], [k.copy() for k in k_mats],
            [d.copy() for d in dists], [[1600, 1200]] * n_cams))
        det = TargetDetection(cam_names=names, data=dd.copy())
        return TemplateBundleHandler(
            cams, FreePointTarget(rig["template"].reshape(1, -1, 3)), det,
            options=dict(opts))

    h_dev, h_sp = handler(), handler()
    x0 = np.asarray(h_dev.get_initial_params(), dtype=float)
    if seed_noise is not None:
        pose_n, intr_frac = seed_noise
        rng = np.random.default_rng(seed + 2)
        x0 = x0 + rng.normal(size=x0.size) * pose_n
        n_intr = n_cams * intr_w
        x0[:n_intr] *= 1.0 + rng.normal(size=n_intr) * intr_frac
    h_dev.set_initial_params(x0.copy())
    h_sp.set_initial_params(x0.copy())
    return h_dev, h_sp


def _final_costs(h_dev, h_sp, dtype=None):
    from pycamset_tpu.optim.driver import run_bundle_adjustment
    res_dev, _ = run_bundle_adjustment(h_dev, backend="structured",
                                       dtype=dtype)
    res_sp, _ = run_bundle_adjustment(h_sp, backend="scipy")
    return float(res_dev["cost"]), float(res_sp["cost"])


CELLS = {
    "clean": dict(),
    "outliers10_huber": dict(
        outlier_frac=0.10,
        options={"loss": "huber", "f_scale": 2.0,
                 "loss_semantics": "component"}),
    "outliers20_cauchy": dict(
        outlier_frac=0.20, seed=23,
        options={"loss": "cauchy", "f_scale": 2.0,
                 "loss_semantics": "component"}),
    "bad_seeds": dict(seed_noise=(0.03, 0.05), seed=29),
    "near_degenerate_poses": dict(pose_scale=(0.02, 0.01), seed=31,
                                  n_ims=10),
    "high_distortion_rational": dict(camera_model="rational", seed=37),
    "fisheye_outliers10_huber": dict(
        camera_model="fisheye", outlier_frac=0.10, seed=41,
        options={"loss": "huber", "f_scale": 2.0}),
}


@pytest.mark.parametrize("cell", sorted(CELLS))
def test_device_lm_at_least_as_good_as_scipy(cell):
    h_dev, h_sp = _build_pair(**CELLS[cell])
    c_dev, c_sp = _final_costs(h_dev, h_sp)
    # the device minimum must not be worse than scipy TRF's (identical
    # objective; robust cells share component semantics bitwise)
    assert c_dev <= c_sp * (1 + 1e-6) + 1e-12, (cell, c_dev, c_sp)


def test_float32_device_close_to_float64_scipy():
    import jax.numpy as jnp
    h_dev, h_sp = _build_pair(seed=41)
    c_dev, c_sp = _final_costs(h_dev, h_sp, dtype=jnp.float32)
    # f32 conditioning loses a little; it must stay within a relative hair
    # of the f64 scipy minimum
    assert c_dev <= c_sp * 1.01 + 1e-12, (c_dev, c_sp)


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
