"""Rig health monitoring and extrinsic-only recalibration.

Production rigs drift: a camera gets bumped, a mount creeps with
temperature, a lens is refocused. This module answers the two questions a
deployed rig asks between full calibrations (beyond-reference capability —
rlav440/pyCamSet has no monitoring surface):

1. ``rig_health`` — is the calibration still good, and if not, WHICH
   camera moved? Per-frame target poses are fitted against the fixed rig
   (one batched TargetTracker dispatch), then every camera gets a
   leave-one-out predictive score: poses re-fitted WITHOUT that camera's
   detections, and the camera's reprojection rms measured against those
   independent poses. A healthy camera scores at the consensus noise
   floor; a moved camera scores high while the others stay put (a shared
   excess in everyone's within-fit rms, by contrast, cannot localize the
   fault).
2. ``recalibrate_extrinsics`` — refresh camera placements with the lens
   models pinned: a template bundle adjustment where every camera's
   intrinsics (and the non-refreshed cameras' extrinsics) ride
   ``fixed_params``, so only the drifted mounts move. The anchor cameras
   define the gauge, keeping the refreshed rig in the ORIGINAL world
   frame (no target-pose gauge: ``fixed_pose=None``).

Both run from a detection table of any fresh target recording — no
re-calibration imagery requirements beyond what tracking already needs.
"""
from __future__ import annotations

import logging

import numpy as np

logger = logging.getLogger(__name__)


def _per_camera_rms(camset, dd: np.ndarray, poses: np.ndarray,
                    tpl: np.ndarray, names) -> tuple[dict, np.ndarray]:
    """Reprojection rms per camera (and per row), host-side.

    :param dd: (N, 5) [cam, im, key, u, v] detection table.
    :param poses: (I, 4, 4) target->world per image (NaN rows skipped).
    :param tpl: (K, 3) template points.
    """
    err2 = np.full(dd.shape[0], np.nan)
    cam_i = dd[:, 0].astype(int)
    im_i = dd[:, 1].astype(int)
    key_i = dd[:, 2].astype(int)
    for c, name in enumerate(names):
        cam = camset[name]
        rows_c = np.flatnonzero(cam_i == c)
        for i in np.unique(im_i[rows_c]):
            pose = poses[i]
            if not np.isfinite(pose).all():
                continue
            rows = rows_c[im_i[rows_c] == i]
            world = tpl[key_i[rows]] @ pose[:3, :3].T + pose[:3, 3]
            pred = cam.project_points(world)
            err2[rows] = np.sum((pred - dd[rows, 3:5]) ** 2, axis=1)
    per_cam = {}
    for c, name in enumerate(names):
        e = err2[cam_i == c]
        e = e[np.isfinite(e)]
        per_cam[name] = float(np.sqrt(e.mean())) if e.size else float("nan")
    return per_cam, err2


def rig_health(camset, detection, target, robust_fit: bool = True,
               f_scale: float = 1.0, drift_ratio: float = 2.0,
               drift_abs_px: float = 0.5) -> dict:
    """Health report for a calibrated rig against fresh detections.

    :param camset: the calibrated rig.
    :param detection: a fresh TargetDetection of the rig's target.
    :param target: the calibration target.
    :param robust_fit: fit the attribution poses with a Cauchy loss
        (warm-started from the plain solve). This is what LOCALIZES a
        fault: under a quadratic loss a drifted camera's biased
        detections contaminate every leave-one-out pose fit and the
        excess smears across the rig; the robust fit downweights them so
        only the moved camera scores high. Disable to score against the
        plain (least-squares) poses.
    :param drift_ratio / drift_abs_px: a camera is flagged as drifted when
        its leave-one-out rms exceeds BOTH ``drift_ratio`` x the median
        leave-one-out rms of the other cameras AND ``drift_abs_px``.
    :return: dict with overall/per-camera/per-image rms, leave-one-out
        scores, the fitted per-frame poses, and the ``drifted`` list.
    """
    from pycamset_tpu.models.detections import TargetDetection
    from pycamset_tpu.tracking import TargetTracker

    names = camset.get_names()
    tpl = np.asarray(target.point_data.reshape(-1, 3), dtype=float)
    tracker = TargetTracker(camset, target)
    rob = TargetTracker(camset, target, loss="cauchy",
                        f_scale=f_scale) if robust_fit else None

    def fit(det):
        # the production cascade (tracking.py): plain solve, then the
        # robust loss warm-starts from it (a cold robust start from a
        # seed poisoned by the very outliers it should reject can stall)
        p, i = tracker.track_batch(det)
        if rob is None:
            return p, i
        return rob.track_batch(det, inits=p)

    poses, info = fit(detection)
    dd = detection.get_data()

    per_cam, err2 = _per_camera_rms(camset, dd, poses, tpl, names)
    im_i = dd[:, 1].astype(int)
    per_image = {}
    for i in np.unique(im_i):
        e = err2[im_i == i]
        e = e[np.isfinite(e)]
        per_image[int(i)] = float(np.sqrt(e.mean())) if e.size else \
            float("nan")

    # leave-one-out: poses fitted without camera c, c scored against them
    loo = {}
    cam_i = dd[:, 0].astype(int)
    for c, name in enumerate(names):
        rest = dd[cam_i != c]
        held = dd[cam_i == c]
        if not held.size:
            loo[name] = float("nan")
            continue
        counts = np.bincount(rest[:, 1].astype(int),
                             minlength=poses.shape[0])
        if rest.size == 0 or (counts >= 3).sum() < 1:
            loo[name] = float("nan")
            continue
        det_rest = TargetDetection(cam_names=names, data=rest)
        # warm-start from the main fit's poses (already consensus-robust):
        # a cold subset fit can be dragged off by the very camera whose
        # detections remain in the subset
        solver = rob if rob is not None else tracker
        poses_rest, _ = solver.track_batch(det_rest, inits=poses)
        _, e2 = _per_camera_rms(camset, held, poses_rest, tpl, names)
        e2 = e2[np.isfinite(e2)]
        loo[name] = float(np.sqrt(e2.mean())) if e2.size else float("nan")

    drifted = []
    for name in names:
        v = loo[name]
        others = np.array([loo[n] for n in names
                           if n != name and np.isfinite(loo[n])])
        if not np.isfinite(v) or others.size == 0:
            continue
        if v > drift_ratio * np.median(others) and v > drift_abs_px:
            drifted.append(name)

    all_e = err2[np.isfinite(err2)]
    report = {
        "overall_rms_px": float(np.sqrt(all_e.mean())) if all_e.size
        else float("nan"),
        "per_camera_rms_px": per_cam,
        "per_image_rms_px": per_image,
        "leave_one_out_rms_px": loo,
        "drifted": drifted,
        "poses": poses,
        "tracker_info": info,
        "thresholds": {"drift_ratio": drift_ratio,
                       "drift_abs_px": drift_abs_px},
    }
    if drifted:
        logger.warning("rig drift detected: %s (leave-one-out rms %s px)",
                       drifted, {n: round(loo[n], 3) for n in drifted})
    return report


def _model_of(camset):
    """Infer the problem camera_model from the rig's distortion widths.

    Heterogeneous rigs (4-wide fisheye mixed with Brown) return a
    per-camera model LIST — the handlers calibrate them on the het
    chain, so mixed rigs monitor/recalibrate like uniform ones."""
    from pycamset_tpu.optim.handlers import infer_shared_n_dist
    of_width = {4: "fisheye", 5: "standard", 8: "rational",
                12: "thin_prism", 14: "tilted"}
    def brown_of(n):
        return ("tilted" if n > 12 else "thin_prism" if n > 8
                else "rational" if n > 5 else "standard")

    dl = [np.reshape(camset[n].distortion_coefs, -1)
          for n in camset.get_names()]
    sizes = {d.size for d in dl}
    if 4 in sizes and sizes != {4}:
        return ["fisheye" if d.size == 4 else brown_of(d.size)
                for d in dl]
    return of_width[infer_shared_n_dist(dl)]


def _recalibrate(camset, detection, target, refresh, free: str,
                 options: dict | None):
    """Shared core of the partial recalibrations: a template BA where
    everything is pinned through ``fixed_params`` except the ``free``
    block ("ext" or "int") of the ``refresh`` cameras."""
    from pycamset_tpu.optim.driver import run_bundle_adjustment
    from pycamset_tpu.optim.handlers import TemplateBundleHandler

    names = camset.get_names()
    unknown = [n for n in refresh if n not in names]
    if unknown:
        raise ValueError(f"unknown cameras {unknown}; rig has {names}")

    fixed = {}
    for name in names:
        cam = camset[name]
        f = {"int": np.asarray(cam.intrinsic, dtype=float),
             "dst": np.reshape(np.asarray(cam.distortion_coefs, float), -1),
             "ext": np.asarray(cam.extrinsic, dtype=float)}
        if name in refresh:
            del f[free]
            if free == "int":
                del f["dst"]  # the lens refresh frees distortion too
        fixed[name] = f

    opts = {"outliers": "n", "camera_model": _model_of(camset),
            # the pinned cameras ARE the gauge; a pinned target pose
            # would over-constrain (it belongs to the old recording)
            "fixed_pose": None}
    if options:
        opts.update(options)
    handler = TemplateBundleHandler(camset, target, detection,
                                    fixed_params=fixed, options=opts)
    _res, new_cams = run_bundle_adjustment(handler)
    rms = float(np.sqrt(np.mean(
        np.sum(np.reshape(new_cams.calibration_result, (-1, 2)) ** 2,
               axis=1))))
    return new_cams, rms


def recalibrate_extrinsics(camset, detection, target, refresh=None,
                           options: dict | None = None):
    """Refresh camera placements with every lens model pinned.

    :param camset: the calibrated rig (source of the pinned intrinsics
        and of the anchor extrinsics).
    :param detection: fresh detections to refit against.
    :param refresh: camera names whose extrinsics are re-solved; default
        every camera except the first. The NON-refreshed cameras keep
        their extrinsics pinned and define the gauge, so the result stays
        in the original world frame. At least one camera must stay
        pinned.
    :param options: extra problem options (loss, max_nfev, backend, ...).
    :return: (new CameraSet, report dict with per-camera rotation (mrad)
        and translation (mm) deltas and the solve rms).
    """
    names = camset.get_names()
    if refresh is None:
        refresh = list(names[1:])
    anchors = [n for n in names if n not in refresh]
    if not anchors:
        raise ValueError(
            "every camera is being refreshed: at least one camera must "
            "keep its extrinsic to anchor the world frame (pass refresh= "
            "excluding a trusted camera, e.g. the least-drifted one from "
            "rig_health)")
    new_cams, rms = _recalibrate(camset, detection, target, refresh,
                                 "ext", options)

    deltas = {}
    for name in refresh:
        old, new = camset[name].extrinsic, new_cams[name].extrinsic
        drot = new[:3, :3] @ old[:3, :3].T
        ang = np.arccos(np.clip((np.trace(drot) - 1) / 2, -1.0, 1.0))
        old_c = -old[:3, :3].T @ old[:3, 3]
        new_c = -new[:3, :3].T @ new[:3, 3]
        deltas[name] = {
            "rotation_mrad": float(ang * 1e3),
            "translation_mm": float(np.linalg.norm(new_c - old_c) * 1e3),
        }
    report = {"rms_px": rms, "deltas": deltas, "anchors": anchors,
              "refreshed": list(refresh)}
    logger.info("extrinsic refresh: rms %.3f px; deltas %s", rms,
                {n: (round(d['rotation_mrad'], 3),
                     round(d['translation_mm'], 3))
                 for n, d in deltas.items()})
    return new_cams, report


def recalibrate_intrinsics(camset, detection, target, refresh=None,
                           options: dict | None = None):
    """Refresh lens models with every camera placement pinned.

    The refocus/re-aperture repair: when a lens was adjusted but the
    mount did not move, re-solve that camera's intrinsics + distortion
    against fresh detections while ALL extrinsics stay pinned (they fully
    fix the gauge, so no target pose or camera needs anchoring).

    :param refresh: camera names whose lens models are re-solved;
        default all cameras.
    :return: (new CameraSet, report dict with per-camera focal /
        principal-point deltas in px and the solve rms).
    """
    names = camset.get_names()
    if refresh is None:
        refresh = list(names)
    new_cams, rms = _recalibrate(camset, detection, target, refresh,
                                 "int", options)

    deltas = {}
    for name in refresh:
        old, new = camset[name].intrinsic, new_cams[name].intrinsic
        deltas[name] = {
            "focal_px": float(np.hypot(new[0, 0] - old[0, 0],
                                       new[1, 1] - old[1, 1])),
            "principal_px": float(np.hypot(new[0, 2] - old[0, 2],
                                           new[1, 2] - old[1, 2])),
            "dist_delta": float(np.abs(
                np.reshape(new_cams[name].distortion_coefs, -1)
                - np.reshape(camset[name].distortion_coefs, -1)).max()),
        }
    report = {"rms_px": rms, "deltas": deltas, "refreshed": list(refresh)}
    logger.info("intrinsic refresh: rms %.3f px; deltas %s", rms, deltas)
    return new_cams, report
