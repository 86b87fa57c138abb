"""Wand (targetless) extrinsic calibration — the MoCap workflow.

Beyond the reference (rlav440/pyCamSet calibrates only from rigid
printed targets): large tracking volumes are calibrated by waving a
small marker wand through the air — no board has to be visible to every
camera at once, and the volume covered is the volume calibrated. Each
frame contributes a handful of unconstrained 3D points seen by whichever
cameras caught them; the solve is pose-free structure-from-motion with
KNOWN intrinsics and free extrinsics.

:func:`calibrate_extrinsics_from_wand` runs the full pipeline:

1. undistort + normalize every detection through the known lens models;
2. incremental registration: the camera pair sharing the most
   observations seeds the geometry (essential matrix + recoverPose,
   RANSAC), every further camera joins by PnP on already-triangulated
   points, and the structure re-triangulates as cameras join
   (multi-view DLT) — a disconnected camera is reported by name;
3. one device bundle adjustment over [extrinsics | wand points] with
   every lens model pinned (the existing pose-free
   FreePointBundleHandler, optim/handlers.py) — gauge: camera 0 is the
   world frame (identity, fixed) and ONE point coordinate pins the
   scale mode (perspective projection is invariant to scaling all
   points and translations together when cam 0 sits at the origin);
4. metric scale from the wand itself: the known marker spacing
   (``wand_template``) anchors the similarity gauge exactly (pure gauge
   — reprojection-invariant), and the residual spread of the
   reconstructed wand lengths is reported as a quality metric.

Outputs are in CAMERA 0's frame. Anything detectable works as a "wand"
— a lit marker swung by hand, an LED bar, a small board — as long as
the caller supplies a correspondence table [cam, frame, marker, u, v];
marker identity only needs to be consistent within a frame.
"""
from __future__ import annotations

import logging

import numpy as np

from pycamset_tpu.utils.general_utils import make_4x4h_tform


def detect_wand_markers(image, n_markers: int, min_area: int = 4,
                        max_area: int = 5000):
    """Bright-blob wand markers in one image -> ordered (M, 2) centroids.

    Thresholded connected components, the ``n_markers`` largest by area,
    intensity-weighted subpixel centroids, ordered along the wand's
    image line. For >= 3 markers the orientation is disambiguated by the
    ASYMMETRIC spacing rule (the shorter inter-marker gap comes first),
    so identity is consistent across cameras viewing the wand from
    opposite sides — use a wand with unequal spacings. Returns None when
    the frame does not show exactly a clean wand.
    """
    import cv2
    img = np.asarray(image)
    gray = (cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
            if img.ndim == 3 else img).astype(np.float64)
    hi, med = float(gray.max()), float(np.median(gray))
    if hi - med < 30:           # no bright markers over the background
        return None
    bw = (gray > (med + 0.6 * (hi - med))).astype(np.uint8)
    n_lab, _lab, stats, cents = cv2.connectedComponentsWithStats(bw)
    areas = stats[1:, cv2.CC_STAT_AREA]
    keep = np.flatnonzero((areas >= min_area) & (areas <= max_area))
    if len(keep) < n_markers:
        return None
    keep = keep[np.argsort(areas[keep])[::-1][:n_markers]]
    pts = []
    for k in keep:
        x, y, w, h = (stats[k + 1, cv2.CC_STAT_LEFT],
                      stats[k + 1, cv2.CC_STAT_TOP],
                      stats[k + 1, cv2.CC_STAT_WIDTH],
                      stats[k + 1, cv2.CC_STAT_HEIGHT])
        # subpixel: intensity-weighted centroid over the blob's window
        # (background-subtracted so the window edge does not bias it)
        win = np.clip(gray[y:y + h, x:x + w] - med, 0.0, None)
        ys, xs = np.mgrid[y:y + h, x:x + w]
        s = win.sum()
        if s <= 0:
            pts.append(cents[k + 1])
            continue
        pts.append([float((xs * win).sum() / s),
                    float((ys * win).sum() / s)])
    pts = np.asarray(pts, dtype=float)
    if n_markers == 1:
        return pts
    # order along the wand's image line (PCA axis)
    ctr = pts.mean(axis=0)
    _, _, vt = np.linalg.svd(pts - ctr, full_matrices=False)
    proj = (pts - ctr) @ vt[0]
    order = np.argsort(proj)
    pts = pts[order]
    if n_markers >= 3:
        gaps = np.linalg.norm(np.diff(pts, axis=0), axis=1)
        if gaps[0] > gaps[-1]:  # asymmetric rule: short gap first
            pts = pts[::-1]
    return pts


def detect_wand_in_imfolder(f_loc, n_markers: int, min_area: int = 4,
                            max_area: int = 5000, n_lim=None):
    """Detect the wand in every camera subfolder of ``f_loc``.

    Frame index = the image's position in the camera's (sorted) file
    list — synchronized captures must write frame-aligned filenames,
    exactly like the board pipeline (and utils/video.py extraction).

    :returns: (rows [cam, frame, marker, u, v], camera names).
    """
    import cv2

    from pycamset_tpu.utils.general_utils import (get_subfolder_names,
                                                  glob_ims, thread_map)

    folders = get_subfolder_names(f_loc, return_full_path=True)
    if not folders:
        raise ValueError(f"no camera subfolders found in {f_loc}")
    names = get_subfolder_names(f_loc)

    def one_cam(args):
        ci, folder = args
        rows = []
        ims = glob_ims(folder)
        if n_lim is not None:
            ims = ims[:n_lim]
        for j, im_path in enumerate(ims):
            img = cv2.imread(str(im_path))
            if img is None:
                continue
            pts = detect_wand_markers(img, n_markers, min_area=min_area,
                                      max_area=max_area)
            if pts is None:
                continue
            rows.append(np.column_stack([
                np.full(len(pts), ci), np.full(len(pts), j),
                np.arange(len(pts)), pts]))
        return rows

    per_cam = thread_map(one_cam, list(enumerate(folders)))
    rows = [r for cam_rows in per_cam for r in cam_rows]
    if not rows:
        raise ValueError(f"no wand detections in {f_loc}")
    return np.concatenate(rows), names


def _normalized_obs(camset, dd):
    """Per-row undistorted normalized coordinates (K^-1, distortion
    inverted through each camera's own model)."""
    names = camset.get_names()
    out = np.zeros((len(dd), 2))
    cam_col = dd[:, 0].astype(int)
    for ci, name in enumerate(names):
        sel = np.flatnonzero(cam_col == ci)
        if not sel.size:
            continue
        cam = camset[name]
        und = np.asarray(cam.undistort_points(dd[sel, -2:]))
        k = np.asarray(cam.intrinsic, dtype=float)
        out[sel, 0] = (und[:, 0] - k[0, 2]) / k[0, 0]
        out[sel, 1] = (und[:, 1] - k[1, 2]) / k[1, 1]
    return out


def _triangulate_multiview(exts, xns):
    """DLT of one point from >= 2 normalized views [(ext4x4, (2,)), ...]."""
    rows = []
    for ext, xn in zip(exts, xns):
        p = ext[:3]
        rows.append(xn[0] * p[2] - p[0])
        rows.append(xn[1] * p[2] - p[1])
    a = np.stack(rows)
    _, _, vt = np.linalg.svd(a, full_matrices=False)
    h = vt[-1]
    if abs(h[3]) < 1e-12:
        return None
    return h[:3] / h[3]


def _cheirality_ok(ext, x):
    return (ext[:3, :3] @ x + ext[:3, 3])[2] > 1e-6


def register_cameras_incremental(obs, n_cams, min_pair: int = 20,
                                 ransac_norm: float = 2e-3,
                                 seed_pair=None):
    """Incremental pose-graph registration from normalized observations.

    :param obs: {cam: {gkey: (2,) normalized xy}}.
    :returns: (exts {cam: 4x4 world->cam}, pts {gkey: (3,)}, order).
    """
    import cv2

    def shared(a, b):
        return sorted(set(obs[a]) & set(obs[b]))

    if seed_pair is None:
        best, best_n = None, -1
        for a in range(n_cams):
            for b in range(a + 1, n_cams):
                n = len(shared(a, b))
                if n > best_n:
                    best, best_n = (a, b), n
        seed_pair = best
        if best_n < max(min_pair, 8):
            raise ValueError(
                f"best camera pair {best} shares only {best_n} wand "
                "observations — capture more frames with the wand "
                "visible to overlapping cameras")
    a, b = seed_pair
    keys = shared(a, b)
    pa = np.stack([obs[a][k] for k in keys])
    pb = np.stack([obs[b][k] for k in keys])
    e_mat, inl = cv2.findEssentialMat(
        pa, pb, np.eye(3), method=cv2.RANSAC, prob=0.999,
        threshold=ransac_norm)
    if e_mat is None or e_mat.shape != (3, 3):
        raise ValueError(f"essential-matrix estimation failed for the "
                         f"seed pair {seed_pair}")
    _, r, t, _pose_inl = cv2.recoverPose(
        e_mat, pa, pb, np.eye(3), mask=inl.copy())
    ext_b = np.eye(4)
    ext_b[:3, :3] = r
    ext_b[:3, 3] = np.ravel(t)
    exts = {a: np.eye(4), b: ext_b}
    order = [a, b]

    def retriangulate():
        counts = {}
        for c in exts:
            for k in obs[c]:
                counts[k] = counts.get(k, 0) + 1
        pts = {}
        for k, n in counts.items():
            if n < 2:
                continue
            views = [(exts[c], obs[c][k]) for c in exts if k in obs[c]]
            x = _triangulate_multiview([v[0] for v in views],
                                       [v[1] for v in views])
            if x is None or not all(_cheirality_ok(v[0], x) for v in views):
                continue
            pts[k] = x
        return pts

    pts = retriangulate()
    if len(pts) < 8:
        raise ValueError(
            f"seed pair {seed_pair} triangulated only {len(pts)} points "
            "— degenerate relative geometry (pure rotation?) or too few "
            "inliers")
    remaining = set(range(n_cams)) - set(exts)
    while remaining:
        scores = {c: len(set(obs[c]) & set(pts)) for c in remaining}
        c = max(scores, key=scores.get)
        if scores[c] < 6:
            raise ValueError(
                f"cameras {sorted(remaining)} share too few wand points "
                f"with the registered set (best: camera {c} sees "
                f"{scores[c]}) — the capture does not connect the rig; "
                "wave the wand through the shared view volumes")
        keys_c = sorted(set(obs[c]) & set(pts))
        obj = np.stack([pts[k] for k in keys_c])
        img = np.stack([obs[c][k] for k in keys_c])
        okf, rvec, tvec, _inl = cv2.solvePnPRansac(
            obj.astype(np.float64), img.astype(np.float64), np.eye(3),
            None, reprojectionError=4 * ransac_norm)
        if not okf:
            raise ValueError(f"PnP registration failed for camera {c}")
        exts[c] = make_4x4h_tform(np.ravel(rvec), np.ravel(tvec))
        order.append(c)
        remaining.discard(c)
        pts = retriangulate()
    return exts, pts, order


def calibrate_extrinsics_from_wand(camset, detections,
                                   wand_template=None, *,
                                   options: dict | None = None,
                                   min_pair: int = 20,
                                   ransac_px: float = 2.0,
                                   seed_pair=None):
    """Calibrate a rig's extrinsics from a waved-wand capture.

    :param camset: rig with TRUSTED intrinsics (per-camera K + distortion
        from a prior lens calibration); extrinsics may be arbitrary.
    :param detections: TargetDetection whose rows are
        ``[cam, frame, marker, u, v]`` (marker identity consistent within
        a frame), or a raw (N, 5) table of the same.
    :param wand_template: (M, 3) marker coordinates in the wand's own
        frame (e.g. ``[[0,0,0],[0.25,0,0],[0.5,0,0]]`` for a 0.5 m bar)
        — anchors the METRIC scale via the inter-marker distances. None
        leaves the scale at the seed pair's unit baseline (a warning).
    :param options: extra ``problem_options`` for the bundle adjustment
        (loss, max_nfev, ...).
    :param ransac_px: registration RANSAC threshold in pixels (converted
        to normalized units with each rig's mean focal length).
    :returns: (calibrated CameraSet in CAMERA 0's frame, report dict —
        rms_px, wand length spread, per-camera stats, registration
        order).
    """
    from pycamset_tpu.models.detections import TargetDetection
    from pycamset_tpu.optim.driver import run_bundle_adjustment
    from pycamset_tpu.optim.handlers import (FreePointBundleHandler,
                                             FreePointTarget)

    names = camset.get_names()
    n_cams = len(names)
    if n_cams < 2:
        raise ValueError("wand calibration needs >= 2 cameras")
    if isinstance(detections, TargetDetection):
        dd = detections.get_data()
    else:
        dd = np.asarray(detections, dtype=float)
    if dd is None or dd.ndim != 2 or dd.shape[1] != 5:
        raise ValueError("detections must be rows [cam, frame, marker, "
                         f"u, v]; got shape {None if dd is None else dd.shape}")
    n_markers = int(dd[:, 2].max()) + 1
    if wand_template is not None:
        wand_template = np.asarray(wand_template, dtype=float).reshape(-1, 3)
        if len(wand_template) < n_markers:
            raise ValueError(
                f"wand_template has {len(wand_template)} markers but the "
                f"detections reference marker id {n_markers - 1}")

    # global point id: one free 3D point per (frame, marker)
    gkey = (dd[:, 1].astype(int) * n_markers + dd[:, 2].astype(int))
    norm = _normalized_obs(camset, dd)
    cam_col = dd[:, 0].astype(int)
    obs = {c: {} for c in range(n_cams)}
    for i in range(len(dd)):
        obs[cam_col[i]][int(gkey[i])] = norm[i]

    f_mean = float(np.mean([np.asarray(camset[n].intrinsic)[0, 0]
                            for n in names]))
    exts, pts, order = register_cameras_incremental(
        obs, n_cams, min_pair=min_pair, ransac_norm=ransac_px / f_mean,
        seed_pair=seed_pair)

    # world frame = camera 0
    t0 = exts[0].copy()
    t0_inv = np.linalg.inv(t0)
    exts = {c: e @ t0_inv for c, e in exts.items()}
    pts = {k: (t0[:3, :3] @ x + t0[:3, 3]) for k, x in pts.items()}

    # keep only detections whose point survived registration, relabel
    keep_keys = sorted(pts)
    key_of = {k: i for i, k in enumerate(keep_keys)}
    keep = np.array([int(g) in pts for g in gkey])
    dd_ba = dd[keep].copy()
    dd_ba[:, 2] = [key_of[int(g)] for g in gkey[keep]]
    pts_init = np.stack([pts[k] for k in keep_keys])
    n_dropped = int((~keep).sum())
    if n_dropped:
        logging.info("wand: %d detections dropped (points seen by < 2 "
                     "registered cameras or behind a camera)", n_dropped)

    # rig clone carrying the registered extrinsics (intrinsics untouched)
    import copy
    cams_init = copy.deepcopy(camset)
    for c, name in enumerate(names):
        cams_init[name].extrinsic = exts[c]
        cams_init[name]._update_state()

    opts = {"outliers": "n", "verbosity": 0}
    if options:
        opts.update(options)
    fixed = {}
    for c, name in enumerate(names):
        fixed[name] = {"int": np.asarray(camset[name].intrinsic,
                                         dtype=float),
                       "dst": np.ravel(camset[name].distortion_coefs)}
    fixed[names[0]]["ext"] = np.eye(4)     # camera 0 = the world frame

    handler = FreePointBundleHandler(
        cams_init, FreePointTarget(pts_init.reshape(1, -1, 3)),
        TargetDetection(cam_names=names, data=dd_ba),
        fixed_params=fixed, options=opts)
    # 7th gauge coordinate: with camera 0 at the origin, scaling every
    # point and translation together is reprojection-invariant — pin the
    # single largest point coordinate to remove the exact null mode
    pin = int(np.argmax(np.abs(pts_init.reshape(-1))))
    handler.feat_unfixed[pin] = False
    handler.bundlePrimitive.calc_free_poses()  # refresh free counts
    result, solved = run_bundle_adjustment(handler)
    rms = float(np.sqrt(np.mean(np.asarray(result["fun"]) ** 2)))
    pts_ba = handler.get_updated_points(result["x"]).reshape(-1, 3)

    # metric anchor: wand segment lengths are known — pure gauge, exact
    scale = 1.0
    length_stats = None
    if wand_template is not None and n_markers >= 2:
        ratios = []
        frames = (np.asarray(keep_keys) // n_markers)
        marks = (np.asarray(keep_keys) % n_markers)
        by_frame = {}
        for i, (fr, mk) in enumerate(zip(frames, marks)):
            by_frame.setdefault(int(fr), {})[int(mk)] = pts_ba[i]
        for fr, mkpts in by_frame.items():
            ids = sorted(mkpts)
            for ai in range(len(ids)):
                for bi in range(ai + 1, len(ids)):
                    d_true = np.linalg.norm(wand_template[ids[ai]]
                                            - wand_template[ids[bi]])
                    d_est = np.linalg.norm(mkpts[ids[ai]] - mkpts[ids[bi]])
                    if d_true > 1e-12 and d_est > 1e-12:
                        ratios.append(d_true / d_est)
        if not ratios:
            logging.warning("wand_template given but no frame has two "
                            "reconstructed markers — scale left at the "
                            "seed baseline")
        else:
            scale = float(np.median(ratios))
            pts_ba = pts_ba * scale
            lengths_err = (1.0 - np.asarray(ratios) * (1.0 / scale))
            length_stats = {
                "n_segments": len(ratios),
                "relative_spread_rms": float(
                    np.sqrt(np.mean(lengths_err ** 2))),
            }
    else:
        logging.warning("no wand_template: the reconstruction's scale is "
                        "the seed pair's unit baseline, NOT metric")

    out = copy.deepcopy(solved)
    per_cam = {}
    dd_cam = dd_ba[:, 0].astype(int)
    for c, name in enumerate(names):
        e = np.asarray(solved[name].extrinsic, dtype=float).copy()
        e[:3, 3] *= scale
        out[name].extrinsic = e
        out[name]._update_state()
        # honest per-camera residuals: project the (scaled) solution
        sel = dd_ba[dd_cam == c]
        if len(sel):
            uv = np.asarray(out[name].project_points(
                pts_ba[sel[:, 2].astype(int)]))
            per_cam[name] = {
                "n_detections": int(len(sel)),
                "rms_px": float(np.sqrt(np.mean(
                    np.sum((uv - sel[:, 3:5]) ** 2, axis=1)))),
            }
        else:
            per_cam[name] = {"n_detections": 0, "rms_px": None}

    report = {
        "rms_px": rms,
        "n_points": int(len(pts_ba)),
        "n_frames": int(len(set(int(k) // n_markers for k in keep_keys))),
        "n_detections_used": int(len(dd_ba)),
        "n_detections_dropped": n_dropped,
        "registration_order": [names[c] for c in order],
        "scale_applied": scale,
        "metric": wand_template is not None,
        "cameras": per_cam,
        "wand_points": pts_ba,
    }
    if length_stats:
        report["wand_lengths"] = length_stats
    return out, report
