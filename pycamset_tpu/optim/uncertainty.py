"""Calibration uncertainty: parameter covariances from the solved system.

Beyond the reference (which reports residual statistics only): first-order
error propagation of the bundle adjustment,

    Cov(x) ~= sigma^2 (J^T J)^{-1},   sigma^2 = RSS / (n_res - n_free),

evaluated at the solution with the device-computed sparse Jacobian
(optim.driver.make_optimisation_function — the same kernels the solver
uses, so the covariance matches the optimised objective for every chain
and camera model). Gauge-fixed and user-fixed parameters carry zero
uncertainty by construction (they are not in the free vector).

The headline consumer is :func:`calibration_uncertainty`, which maps the
free-vector covariance back onto named per-camera intrinsic / extrinsic
sigma arrays and per-image pose sigmas.
"""
from __future__ import annotations

import logging

import numpy as np


def parameter_covariance(param_handler, x=None):
    """Covariance of the FREE parameter vector at the solution.

    :param x: the solved free vector (defaults to the handler's current
        initial params — pass the optimiser's ``res["x"]``).
    :return: (cov (n_free, n_free), sigma (n_free,), sigma2, dof)
    """
    from pycamset_tpu.optim.driver import make_optimisation_function

    loss_fn, jac_fn, x0 = make_optimisation_function(param_handler)
    x = np.asarray(x0 if x is None else x, dtype=float)
    r = np.asarray(loss_fn(x), dtype=float).reshape(-1)
    jac = jac_fn(x)
    n_res, n_free = jac.shape
    dof = max(n_res - n_free, 1)
    sigma2 = float(r @ r) / dof

    jtj = np.asarray((jac.T @ jac).todense(), dtype=float)
    try:
        cov = sigma2 * np.linalg.inv(jtj)
    except np.linalg.LinAlgError:
        logging.warning(
            "J^T J is singular at the solution (degenerate geometry or an "
            "unconstrained gauge direction); falling back to the "
            "pseudo-inverse — sigmas along null directions read as the "
            "minimum-norm values, not true uncertainties")
        cov = sigma2 * np.linalg.pinv(jtj)
    return cov, np.sqrt(np.clip(np.diag(cov), 0.0, None)), sigma2, dof


def _scatter_free(prim, sigma_free: np.ndarray) -> np.ndarray:
    """Free-vector sigmas -> full-layout sigmas (0 for fixed params)."""
    full = np.zeros(prim.unfixed_full().shape[0])
    full[prim.unfixed_full()] = sigma_free
    return full


def calibration_uncertainty(camset, x=None) -> dict:
    """Per-parameter standard errors of a calibrated CameraSet.

    Requires the calibration history (``camset.calibration_handler``).

    :return: dict with
        - ``"cameras"``: {name: {"int_sigma" (intr_w,), "ext_sigma" (6,)}}
          — intrinsic rows are [fx, px, fy, py | dist...] in the model's
          packed order; extrinsic rows [rvec (rad), t (m)];
        - ``"pose_sigma"``: (n_ims, 6) per-image target-pose sigmas;
        - ``"point_sigma"``: (n_points, 3) for self-calibration handlers
          (absent otherwise);
        - ``"sigma2"``, ``"dof"``: the residual variance and its degrees
          of freedom (sigma2 in px^2).
    """
    handler = camset.calibration_handler
    if handler is None:
        raise ValueError("the CameraSet has no calibration history")
    if x is None:
        x = camset.calibration_params

    _cov, sigma_free, sigma2, dof = parameter_covariance(handler, x)
    prim = handler.bundlePrimitive
    full = _scatter_free(prim, sigma_free)

    n_c = prim.intr.shape[0]
    w = prim.intr_width
    intr_sig = full[:w * n_c].reshape(n_c, w)
    extr_sig = full[w * n_c:(w + 6) * n_c].reshape(n_c, 6)
    n_p = prim.poses.shape[0]
    pose_lo = (w + 6) * n_c
    pose_sig = full[pose_lo:pose_lo + 6 * n_p].reshape(n_p, 6)

    out = {
        "cameras": {
            name: {"int_sigma": intr_sig[i], "ext_sigma": extr_sig[i]}
            for i, name in enumerate(handler.cam_names)
        },
        "pose_sigma": pose_sig,
        "sigma2": sigma2,
        "dof": dof,
    }
    tail = full[pose_lo + 6 * n_p:]
    if tail.size and tail.size % 3 == 0:
        out["point_sigma"] = tail.reshape(-1, 3)  # self-cal free geometry
    elif tail.size:
        out["extra_sigma"] = tail  # custom handlers with extra parameters
    return out
