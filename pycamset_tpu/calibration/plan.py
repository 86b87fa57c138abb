"""Calibration planning: predict a proposed rig's achievable accuracy.

Beyond the reference: answer "will this rig layout reach the accuracy I
need?" BEFORE building it. Given a proposed CameraSet (positions, lenses,
resolutions), a calibration target, and a capture plan (number of target
presentations, expected corner noise), the planner

1. synthesizes realistic detections — target poses sampled around the
   rig's mutual working volume, projected through each camera's full
   distortion model, visibility-clipped to the sensors;
2. runs the REAL bundle adjustment (same device solver the calibration
   uses) on the synthetic data, seeded at truth;
3. propagates first-order uncertainty at the optimum
   (optim/uncertainty.py) into the numbers a rig designer acts on:
   per-camera focal / principal-point / extrinsic sigmas, triangulation
   error ellipsoids at the working volume, and target-pose tracking
   sigmas.

The report is a prediction of the BEST CASE (perfect detector noise
model, no outliers); real calibrations add detector systematics on top.
"""
from __future__ import annotations

import logging

import numpy as np

from pycamset_tpu.utils.general_utils import ext_4x4_to_rod, make_4x4h_tform


def workspace_center(cams) -> np.ndarray:
    """The point minimising squared distance to every camera's optical
    axis — where the rig's views intersect, i.e. the natural place to
    present a target or measure an object."""
    a = np.zeros((3, 3))
    b = np.zeros(3)
    for name in cams.get_names():
        cam = cams[name]
        d = cam.view / np.linalg.norm(cam.view)
        p = cam.position
        m = np.eye(3) - np.outer(d, d)   # projector off the axis
        a += m
        b += m @ p
    # lstsq: collinear axes (e.g. an anti-parallel pair) make the normal
    # matrix singular along the shared line — take the min-norm point
    return np.linalg.lstsq(a, b, rcond=None)[0]


def synthesize_detections(cams, target_points: np.ndarray, n_ims: int,
                          noise_px: float = 0.3, seed: int = 0,
                          rot_spread: float = 0.45,
                          trans_spread: float | None = None,
                          min_cams: int = 2):
    """Synthetic TargetDetection table for a GIVEN rig.

    Target poses are sampled around :func:`workspace_center`, facing back
    along the mean view direction, with rotation/translation jitter;
    points project through each camera's full model
    (``Camera.project_points``) and are kept only when in front of and
    inside the sensor.

    :param target_points: (K, 3) target-local corner coordinates.
    :param trans_spread: translation jitter (m); default 15% of the mean
        camera-to-workspace distance.
    :returns: (TargetDetection, true_poses (I, 6) rodrigues+t rows).
    """
    from pycamset_tpu.models.detections import TargetDetection

    rng = np.random.default_rng(seed)
    names = cams.get_names()
    tpl = np.asarray(target_points, dtype=float).reshape(-1, 3)
    k = len(tpl)
    center = workspace_center(cams)
    mean_dist = float(np.mean(
        [np.linalg.norm(cams[n].position - center) for n in names]))
    if trans_spread is None:
        trans_spread = 0.15 * mean_dist
    vbar = np.mean([cams[n].view for n in names], axis=0)
    nv = np.linalg.norm(vbar)
    # a ring rig's view directions cancel: fall back to an arbitrary
    # facing (the rotation jitter covers orientations anyway)
    vbar = vbar / nv if nv > 0.2 else np.array([0.0, 0.0, 1.0])
    # base orientation: target +z ALONG the mean view, so the cameras sit
    # on the board's -z side — the side from which a printed (one-sided)
    # pattern reads correctly. Projection statistics are side-agnostic,
    # but utils/render.py shares these poses and chirality matters there.
    zt = vbar
    up = np.array([0.0, 0.0, 1.0])
    if abs(np.dot(up, zt)) > 0.95:
        up = np.array([0.0, 1.0, 0.0])
    xt = np.cross(up, zt)
    xt /= np.linalg.norm(xt)
    yt = np.cross(zt, xt)
    r_base = np.stack([xt, yt, zt], axis=1)   # target->world columns

    rows = []
    poses = np.zeros((n_ims, 6))
    tpl_c = tpl - tpl.mean(axis=0)
    i = 0
    attempts = 0
    while i < n_ims and attempts < 20 * n_ims:
        attempts += 1
        rv = rng.normal(size=3)
        rv = rv / np.linalg.norm(rv) * rng.uniform(0, rot_spread)
        t = center + rng.normal(size=3) * trans_spread
        rot = make_4x4h_tform(rv, np.zeros(3))[:3, :3] @ r_base
        tf = np.eye(4)
        tf[:3, :3] = rot
        tf[:3, 3] = t - rot @ tpl.mean(axis=0)  # centre the target at t
        world = tpl @ rot.T + tf[:3, 3]
        frame_rows = []
        cams_seen = 0
        for ci, n in enumerate(names):
            cam = cams[n]
            z = (world @ cam.extrinsic[:3, :3].T
                 + cam.extrinsic[:3, 3])[:, 2]
            uv = np.asarray(cam.project_points(world))
            ok = ((z > 0.05 * mean_dist)
                  & (uv[:, 0] > 0) & (uv[:, 0] < cam.res[0])
                  & (uv[:, 1] > 0) & (uv[:, 1] < cam.res[1]))
            kk = np.flatnonzero(ok)
            if kk.size >= 4:
                cams_seen += 1
            if kk.size:
                uvn = uv[kk] + rng.normal(size=(kk.size, 2)) * noise_px
                frame_rows.append(np.column_stack([
                    np.full(kk.size, ci), np.full(kk.size, i), kk,
                    uvn]))
        if cams_seen >= min_cams:
            rows.extend(frame_rows)
            poses[i, :3], poses[i, 3:] = ext_4x4_to_rod(tf)
            i += 1
    if i < n_ims:
        raise ValueError(
            f"could only place {i}/{n_ims} target poses visible to >= "
            f"{min_cams} cameras — the rig has too little shared view "
            "volume (check camera aims), or min_cams is too high")
    dd = np.concatenate(rows, axis=0)
    return TargetDetection(cam_names=names, data=dd), poses


def _triangulation_sigma(cams, point: np.ndarray, sigma_px: float):
    """First-order 3D error ellipsoid of triangulating ``point`` from all
    cameras that see it: sqrt eigvals of sigma_px^2 (J^T J)^-1 with J the
    stacked pixel Jacobians (FD through the full camera model)."""
    js = []
    eps = 1e-6
    for n in cams.get_names():
        cam = cams[n]
        z = (point @ cam.extrinsic[:3, :3].T + cam.extrinsic[:3, 3])[2]
        uv0 = np.asarray(cam.project_points(point[None]))[0]
        if not (z > 0 and 0 <= uv0[0] < cam.res[0]
                and 0 <= uv0[1] < cam.res[1]):
            continue
        j = np.zeros((2, 3))
        for a in range(3):
            dp = point.copy()
            dp[a] += eps
            j[:, a] = (np.asarray(cam.project_points(dp[None]))[0]
                       - uv0) / eps
        js.append(j)
    if len(js) < 2:
        return None
    jtj = sum(j.T @ j for j in js)
    w = np.linalg.eigvalsh(np.linalg.inv(jtj)) * sigma_px ** 2
    return np.sqrt(np.clip(w, 0.0, None))  # ascending: best..worst axis


def plan_calibration(cams, target_points: np.ndarray, n_ims: int = 30,
                     noise_px: float = 0.3, seed: int = 0,
                     options: dict | None = None,
                     min_cams: int = 2) -> dict:
    """Predict the accuracy a proposed rig achieves after calibration.

    :param cams: the PROPOSED CameraSet (treated as ground truth).
    :param target_points: (K, 3) target-local corners (e.g.
        ``ChArUco(...).point_data.reshape(-1, 3)``).
    :param n_ims: planned number of target presentations.
    :param noise_px: expected detector corner noise (px, 1-sigma).
    :returns: dict report — see the keys below; distances in the rig's
        units (conventionally metres), angles in radians.
    """
    from pycamset_tpu.optim.driver import run_bundle_adjustment
    from pycamset_tpu.optim.handlers import (FreePointTarget,
                                             TemplateBundleHandler)

    tpl = np.asarray(target_points, dtype=float).reshape(-1, 3)
    det, true_poses = synthesize_detections(
        cams, tpl, n_ims, noise_px=noise_px, seed=seed, min_cams=min_cams)
    opts = {"outliers": "n", "verbosity": 0}
    if options:
        opts.update(options)
    handler = TemplateBundleHandler(
        cams, FreePointTarget(tpl.reshape(1, -1, 3)), det, options=opts)
    res, solved = run_bundle_adjustment(handler)
    rms = float(np.sqrt(np.mean(res["fun"] ** 2)))
    if rms > 3 * noise_px:
        logging.warning(
            "planner solve finished at %.2f px rms against %.2f px noise "
            "— the synthetic problem did not reach its floor; treat the "
            "sigma report as pessimistic", rms, noise_px)

    unc = solved.calibration_uncertainty()
    center = workspace_center(cams)
    tri = _triangulation_sigma(cams, center, noise_px)

    per_cam = {}
    n_det = {n: 0 for n in cams.get_names()}
    dd = det.get_data()
    for ci, n in enumerate(cams.get_names()):
        sel = dd[dd[:, 0] == ci]
        n_det[n] = int(len(sel))
        # sensor coverage: occupancy of an 8x8 grid over the image
        cam = cams[n]
        gx = np.clip((sel[:, 3] / cam.res[0] * 8).astype(int), 0, 7)
        gy = np.clip((sel[:, 4] / cam.res[1] * 8).astype(int), 0, 7)
        cov_frac = len(set(zip(gx, gy))) / 64.0
        u = unc["cameras"][n]
        per_cam[n] = {
            "n_detections": n_det[n],
            "coverage": cov_frac,
            "focal_sigma_px": float(np.max(u["int_sigma"][[0, 2]])),
            "principal_sigma_px": float(np.max(u["int_sigma"][[1, 3]])),
            "rot_sigma_rad": float(np.max(u["ext_sigma"][:3])),
            "trans_sigma": float(np.max(u["ext_sigma"][3:])),
        }

    report = {
        "n_ims": n_ims,
        "noise_px": noise_px,
        "n_detections": int(len(dd)),
        "expected_rms_px": rms,
        "workspace_center": center.tolist(),
        "cameras": per_cam,
        "pose_sigma_rot_rad": float(np.median(
            np.max(unc["pose_sigma"][:, :3], axis=1))),
        "pose_sigma_trans": float(np.median(
            np.max(unc["pose_sigma"][:, 3:], axis=1))),
    }
    if tri is not None:
        report["triangulation_sigma"] = {
            "best_axis": float(tri[0]), "worst_axis": float(tri[-1]),
            "rss": float(np.sqrt(np.sum(tri ** 2))),
        }
    return report


def format_plan_report(report: dict) -> str:
    """Human-readable rendering of :func:`plan_calibration`'s output."""
    lines = [
        f"calibration plan: {report['n_ims']} presentations, "
        f"{report['n_detections']} detections at "
        f"{report['noise_px']:.2f} px corner noise",
        f"expected reprojection rms: {report['expected_rms_px']:.3f} px",
    ]
    if "triangulation_sigma" in report:
        t = report["triangulation_sigma"]
        lines.append(
            "triangulation sigma at workspace centre: "
            f"{t['best_axis'] * 1e3:.4f}–{t['worst_axis'] * 1e3:.4f} mm "
            f"per axis ({t['rss'] * 1e3:.4f} mm rss)")
    lines.append(
        f"target pose tracking: rot {report['pose_sigma_rot_rad'] * 1e3:.3f}"
        f" mrad, trans {report['pose_sigma_trans'] * 1e3:.4f} mm (median)")
    lines.append(" cam           dets  cover  f_sig(px)  c_sig(px)  "
                 "rot(mrad)  trans(mm)")
    for n, c in report["cameras"].items():
        lines.append(
            f" {n:<12} {c['n_detections']:>6} {c['coverage']:>5.0%}  "
            f"{c['focal_sigma_px']:>9.3f}  {c['principal_sigma_px']:>9.3f}"
            f"  {c['rot_sigma_rad'] * 1e3:>9.3f}"
            f"  {c['trans_sigma'] * 1e3:>9.4f}")
    return "\n".join(lines)
