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


# above this many free parameters the dense inverse is skipped; sigmas
# come from a sparse factorization solved column-by-column for the
# camera/pose blocks only (point sigmas are omitted with a warning)
DENSE_COV_MAX_PARAMS = 6000


def _weighted_r_jac(param_handler, x):
    """Residuals + sparse Jacobian at x, IRLS-weighted to match the
    calibration's robust loss (the solver's own objective)."""
    from pycamset_tpu.optim.driver import make_optimisation_function
    from pycamset_tpu.optim.losses import make_loss

    loss_fn, jac_fn, x0 = make_optimisation_function(param_handler)
    x = np.asarray(x0 if x is None else x, dtype=float)
    r = np.asarray(loss_fn(x), dtype=float).reshape(-1)
    jac = jac_fn(x)

    loss = param_handler.problem_opts.get("loss", "linear")
    if loss != "linear":
        from scipy.sparse import diags
        _rho, weight_fn = make_loss(
            loss, float(param_handler.problem_opts.get("f_scale", 1.0)))
        semantics = param_handler.problem_opts.get("loss_semantics",
                                                   "observation")
        if semantics == "component":
            s = r * r
            sw = np.sqrt(np.asarray(weight_fn(s), dtype=float))
        else:  # per 2-D observation
            s = np.sum(r.reshape(-1, 2) ** 2, axis=1)
            sw = np.repeat(np.sqrt(np.asarray(weight_fn(s), dtype=float)), 2)
        r = r * sw
        jac = diags(sw) @ jac
    return r, jac, x


def parameter_covariance(param_handler, x=None):
    """Covariance of the FREE parameter vector at the solution.

    Robust-loss calibrations are IRLS-weighted with the solver's own
    weights (first-order Gauss-Newton approximation of the robust
    covariance), so down-weighted outliers do not inflate sigma^2.

    :param x: the solved free vector (defaults to the handler's current
        initial params — pass the optimiser's ``res["x"]``).
    :return: (cov (n_free, n_free), sigma (n_free,), sigma2, dof)
    """
    r, jac, _x = _weighted_r_jac(param_handler, x)
    n_res, n_free = jac.shape
    if n_free > DENSE_COV_MAX_PARAMS:
        raise ValueError(
            f"{n_free} free parameters: the dense covariance would be "
            "infeasible — use calibration_uncertainty (sparse sigmas) or "
            "fix parameters")
    dof = max(n_res - n_free, 1)
    sigma2 = float(r @ r) / dof

    jtj = np.asarray((jac.T @ jac).todense(), dtype=float)
    # Jacobi equilibration: raw BA parameters mix px-scale intrinsics with
    # metre-scale geometry, putting cond(JtJ) near 1e16+ and making the
    # plain inverse garbage along the weak directions. Scaling by
    # 1/sqrt(diag) brings the system to O(1) conditioning; the covariance
    # transforms back exactly.
    d = 1.0 / np.sqrt(np.maximum(np.diag(jtj), np.finfo(float).tiny))
    scaled = jtj * d[:, None] * d[None, :]
    try:
        cov_s = np.linalg.inv(scaled)
    except np.linalg.LinAlgError:
        logging.warning(
            "J^T J is singular at the solution (degenerate geometry or an "
            "unconstrained gauge direction); falling back to the "
            "pseudo-inverse — sigmas along null directions read as the "
            "minimum-norm values, not true uncertainties")
        cov_s = np.linalg.pinv(scaled)
    cov = sigma2 * cov_s * d[:, None] * d[None, :]
    return cov, np.sqrt(np.clip(np.diag(cov), 0.0, None)), sigma2, dof


def _sparse_sigma(param_handler, x, n_sigma_cols: int):
    """Sigmas of the FIRST n_sigma_cols free parameters (the camera/pose
    blocks) via a sparse LU of J^T J — the large-self-cal path where the
    dense inverse cannot be formed. Point sigmas are not computed.
    """
    from scipy.sparse import diags
    from scipy.sparse.linalg import splu

    r, jac, _x = _weighted_r_jac(param_handler, x)
    n_res, n_free = jac.shape
    dof = max(n_res - n_free, 1)
    sigma2 = float(r @ r) / dof
    jtj = (jac.T @ jac).tocsc()
    # same Jacobi equilibration as the dense path (see parameter_covariance)
    d = 1.0 / np.sqrt(np.maximum(jtj.diagonal(), np.finfo(float).tiny))
    lu = splu(diags(d) @ jtj @ diags(d))
    cols = np.arange(n_sigma_cols)
    rhs = np.zeros((n_free, n_sigma_cols))
    rhs[cols, cols] = 1.0
    diag = lu.solve(rhs)[cols, cols] * d[:n_sigma_cols] ** 2
    sigma = np.zeros(n_free)
    sigma[:n_sigma_cols] = np.sqrt(np.clip(diag * sigma2, 0.0, None))
    return sigma, sigma2, dof


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

    prim = handler.bundlePrimitive
    free_mask = np.asarray(prim.unfixed_full(), dtype=bool)
    n_c = prim.intr.shape[0]
    w = prim.intr_width
    n_p = prim.poses.shape[0]
    pose_lo = (w + 6) * n_c
    pose_hi = pose_lo + 6 * n_p

    points_available = True
    if int(free_mask.sum()) > DENSE_COV_MAX_PARAMS:
        # large self-cal: the free camera/pose block leads the free vector
        # (full layout order), so only those columns are solved for
        head = int(free_mask[:pose_hi].sum())
        logging.warning(
            "%d free parameters: computing camera/pose sigmas via a sparse "
            "factorization; point sigmas are omitted at this scale",
            int(free_mask.sum()))
        sigma_free, sigma2, dof = _sparse_sigma(handler, x, head)
        points_available = False
    else:
        _cov, sigma_free, sigma2, dof = parameter_covariance(handler, x)
    full = _scatter_free(prim, sigma_free)

    intr_sig = full[:w * n_c].reshape(n_c, w)
    extr_sig = full[w * n_c:pose_lo].reshape(n_c, 6)
    pose_sig = full[pose_lo:pose_hi].reshape(n_p, 6)

    out = {
        "cameras": {
            name: {"int_sigma": intr_sig[i], "ext_sigma": extr_sig[i]}
            for i, name in enumerate(handler.cam_names)
        },
        "pose_sigma": pose_sig,
        "sigma2": sigma2,
        "dof": dof,
    }
    # the trailing block is the primitive's free geometry (bundle_pts,
    # matching base_full's layout); anything between the poses and it —
    # e.g. the relative target poses of a multi-target handler — is
    # reported separately instead of being mislabelled as points
    tail = full[pose_hi:]
    bp = getattr(prim, "bundle_pts", None)
    if not points_available:
        pass  # sparse path: geometry sigmas were not solved for
    elif bp is not None and tail.size >= bp.size > 0:
        if tail.size > bp.size:
            out["extra_sigma"] = tail[:tail.size - bp.size]
        out["point_sigma"] = tail[tail.size - bp.size:].reshape(-1, 3)
    elif tail.size:
        out["extra_sigma"] = tail
    return out
