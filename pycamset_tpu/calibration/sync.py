"""Temporal synchronisation calibration for multi-camera rigs.

Beyond the reference (rlav440/pyCamSet has no temporal calibration; its
pipeline assumes hardware-synchronized captures, e.g.
pyCamSet/calibration/camera_calibrator.py's per-image detection tables).
Rigs without genlock sample the scene at per-camera times

    t_cj = j + d_c + s_c * (j - j_mid)        [frame units]

with an unknown sub-frame offset ``d_c`` and, for free-running clocks, a
frame-rate skew ``s_c``. A MOVING target makes both observable: every
camera samples the same trajectory on a shifted time grid, so a clock
error appears as a reprojection error proportional to the image-plane
velocity.

:func:`calibrate_time_offsets` estimates the clock parameters jointly
with the target trajectory from one moving-target capture against a
calibrated rig:

1. integer frame shifts (optional, ``max_shift > 0``) by normalised
   cross-correlation of per-camera image-plane *speed* signals — no pose
   solving needed;
2. trajectory init from the multi-camera tracker on the integer-aligned
   table (pycamset_tpu/tracking.py), rodrigues-unwrapped and gap-filled;
3. ONE jitted device LM over ``[pose knots X (I,6) | offsets | skews]``:
   the pose at time t linearly interpolates the bracketing knots, so each
   (camera, frame) cell touches exactly two knot blocks plus its camera's
   clock parameters. The normal equations are assembled WITHOUT scatters
   (the repo invariant): per-cell 6x6 grams from a 6-tangent jacfwd over
   the interpolated pose, then one-hot contractions onto the knot axis
   build the block-tridiagonal pose system, the (6I, E) clock coupling
   and the ExE clock block — an arrow-structured system like the mixed
   backend's (optim/structured_mixed.py), assembled dense here because
   sync captures are short (n <= a few thousand params).

Gauge: camera 0 defines the time base (d_0 = s_0 = 0); a common shift or
dilation of every clock is absorbed by the trajectory knots. A weak
second-difference smoothness prior on the knots (relative weight
``prior_lambda``) resolves time bins no camera observes.

The standard tool for this job is Kalibr's continuous-time estimator;
this is the same idea re-designed as one compiled TPU program.
"""
from __future__ import annotations

import logging
from typing import NamedTuple

import numpy as np

from pycamset_tpu.utils.general_utils import ext_4x4_to_rod, make_4x4h_tform


class SyncResult(NamedTuple):
    """Result of :func:`calibrate_time_offsets`.

    offsets/skew/readout are in FRAME units (camera 0's offset and skew
    pinned to 0; readout has no gauge freedom and is estimated for every
    camera); ``info`` carries seconds when ``fps`` was given, plus
    diagnostics.
    """
    offsets: np.ndarray          # (C,) frames; offsets[0] == 0 (gauge)
    offset_sigma: np.ndarray     # (C,) 1-sigma, frames
    skew: np.ndarray | None      # (C,) frames/frame, or None
    skew_sigma: np.ndarray | None
    readout: np.ndarray | None   # (C,) rolling-shutter readout, frames
    readout_sigma: np.ndarray | None
    rms: float                   # reprojection rms (px) at the solution
    info: dict


def _obs_grids(detection, target, n_cams: int, n_ims: int, dtype):
    """Detection table -> dense (C, I, K, 2) uv + (C, I, K) mask grids."""
    flat = detection.return_flattened_keys(target.point_data.shape[:-1])
    dd = flat.get_data()
    k = int(np.prod(target.point_data.shape[:-1]))
    uv = np.zeros((n_cams, n_ims, k, 2), dtype=dtype)
    mask = np.zeros((n_cams, n_ims, k), dtype=dtype)
    if dd is not None and len(dd):
        ci = dd[:, 0].astype(int)
        ji = dd[:, 1].astype(int)
        ki = dd[:, -3].astype(int)
        uv[ci, ji, ki] = dd[:, -2:]
        mask[ci, ji, ki] = 1.0
    return uv, mask, dd


def estimate_integer_shifts(uv: np.ndarray, mask: np.ndarray,
                            max_shift: int, min_overlap: int = 8,
                            ratios: np.ndarray | None = None
                            ) -> np.ndarray:
    """Integer frame shifts from image-plane speed cross-correlation.

    The per-frame centroid of a camera's detections moves with the
    target; its speed profile |d centroid / d frame| is (up to
    projection) the same time signal in every camera. The lag maximising
    the normalised cross-correlation against camera 0's profile is the
    integer part of that camera's offset — no pose estimation needed, so
    this init survives rigs whose clocks are many frames apart.

    :param ratios: per-camera frame-duration ratios (reference frames per
        camera frame, ``fps_ref / fps_c``) for MIXED-RATE rigs: each
        camera's speed profile is resampled onto the reference frame grid
        before correlating (speed per unit time, so a 2x-rate camera's
        halved per-frame motion compares correctly).
    :returns: (C,) integer shifts m (REFERENCE frames) with
        signal_c(t) ~ signal_0(t + m), i.e. m estimates d_c rounded to a
        reference frame.
    """
    n_cams, n_ims = mask.shape[:2]
    cnt = mask.sum(axis=-1)                                   # (C, J)
    cen = (uv * mask[..., None]).sum(axis=2) \
        / np.maximum(cnt, 1.0)[..., None]                     # (C, J, 2)
    has = cnt >= 3
    vel = np.linalg.norm(np.diff(cen, axis=1), axis=-1)       # (C, J-1)
    ok = has[:, 1:] & has[:, :-1]
    if ratios is not None and not np.allclose(ratios, 1.0):
        # mixed rates: interpolate each camera's per-TIME speed samples
        # (at t = (j + 1/2) * ratio) onto the reference half-frame grid
        t_ref = np.arange(n_ims - 1) + 0.5
        vel_r = np.zeros((n_cams, n_ims - 1))
        ok_r = np.zeros((n_cams, n_ims - 1), dtype=bool)
        for c in range(n_cams):
            tv = (np.arange(n_ims - 1) + 0.5) * ratios[c]
            good = ok[c]
            if good.sum() < 2:
                continue
            vel_r[c] = np.interp(t_ref, tv[good],
                                 vel[c][good] / max(ratios[c], 1e-12))
            # valid only inside the camera's sampled span, near a sample
            ok_r[c] = (t_ref >= tv[good][0]) & (t_ref <= tv[good][-1])
        vel, ok = vel_r, ok_r

    def znorm(sig, valid):
        v = sig[valid]
        if v.size < 2 or np.std(v) < 1e-12:
            return None
        out = np.zeros_like(sig)
        out[valid] = (v - v.mean()) / v.std()
        return out

    ref = znorm(vel[0], ok[0])
    if ref is None:
        raise ValueError(
            "camera 0 has no usable motion signal (too few frames with "
            ">= 3 detections, or a static target) — cannot estimate "
            "integer shifts; capture a moving target")
    shifts = np.zeros(n_cams, dtype=int)
    for c in range(1, n_cams):
        sig = znorm(vel[c], ok[c])
        if sig is None:
            logging.warning("camera %d has no motion signal; integer "
                            "shift left at 0", c)
            continue
        best, best_score = 0, -np.inf
        for m in range(-max_shift, max_shift + 1):
            # overlap of cam c's frame j with cam 0's frame j + m
            lo, hi = max(0, -m), min(len(sig), len(ref) - m)
            if hi - lo < min_overlap:
                continue
            both = ok[c][lo:hi] & ok[0][lo + m:hi + m]
            if both.sum() < min_overlap:
                continue
            a = sig[lo:hi][both]
            b = ref[lo + m:hi + m][both]
            sa, sb = np.std(a), np.std(b)
            if sa < 1e-12 or sb < 1e-12:
                continue
            score = float(np.mean((a - a.mean()) * (b - b.mean()))
                          / (sa * sb))
            if score > best_score:
                best, best_score = m, score
        shifts[c] = best
    return shifts


def calibrate_time_offsets(camset, detection, target, *,
                           estimate_skew: bool = False,
                           estimate_rolling_shutter: bool = False,
                           max_shift: int = 0,
                           fps: float | None = None,
                           frame_rates=None,
                           loss: str = "linear", f_scale: float = 1.0,
                           max_nfev: int = 100,
                           prior_lambda: float = 1e-6,
                           min_track_detections: int = 6) -> SyncResult:
    """Estimate per-camera time offsets (and optional rate skew) from a
    moving-target capture against a calibrated rig.

    :param camset: calibrated CameraSet (all camera parameters fixed).
    :param detection: TargetDetection over the capture — frame index
        ``im`` is each camera's OWN frame counter (nominally common rate).
    :param target: the calibration target (template from point_data).
    :param estimate_skew: also estimate a per-camera frame-rate skew
        (frames per frame, centred at mid-capture) — for free-running,
        non-genlocked clocks.
    :param estimate_rolling_shutter: also estimate a per-camera
        rolling-shutter readout duration (frames): a detection on image
        row v is sampled at ``t + readout * (v / height - 1/2)``, so the
        per-camera offset refers to the frame's mid-scan. Readout is NOT
        a gauge freedom (it varies within a frame), so it is estimated
        for every camera including camera 0; a global-shutter sensor
        reports ~0.
    :param max_shift: maximum |integer| frame shift to search by signal
        cross-correlation before the joint solve (0 = assume offsets are
        sub-frame).
    :param fps: nominal frame rate (of CAMERA 0, the time base); when
        given, ``info`` also reports offsets/sigmas in seconds.
    :param frame_rates: per-camera frame rates (C,) in Hz for MIXED-RATE
        rigs (e.g. ``[30, 60, 60]``): every camera's frame counter maps
        onto camera 0's frame timeline (offsets/skew/readout are still
        reported in camera-0 frame units). Trajectory knots cover the
        longest camera's span.
    :param prior_lambda: relative weight of the knot smoothness prior
        (resolves time bins no camera observes; keep tiny).
    :returns: :class:`SyncResult` — offsets in frames, camera 0 == 0.

    Observability: a static target makes clock parameters unobservable
    (the reprojection sensitivity to time is the image-plane velocity);
    the reported sigmas blow up accordingly — check them.
    """
    import jax
    import jax.numpy as jnp

    from pycamset_tpu.config import default_device_dtype
    from pycamset_tpu.models.detections import TargetDetection
    from pycamset_tpu.ops.projection import pack_rig_intrinsics
    from pycamset_tpu.ops.transforms import pose_apply
    from pycamset_tpu.optim.lm import lm_solve
    from pycamset_tpu.optim.losses import make_loss
    from pycamset_tpu.smoothing import unwrap_rvecs
    from pycamset_tpu.tracking import TargetTracker

    names = camset.get_names()
    n_cams = len(names)
    if n_cams < 2:
        raise ValueError("temporal calibration needs >= 2 cameras (one "
                         "camera defines the time base)")
    n_ims = int(detection.max_ims)
    if n_ims < 4:
        raise ValueError("temporal calibration needs a capture of >= 4 "
                         f"frames; got {n_ims}")
    dtype = default_device_dtype()
    uv_g, mask_g, dd = _obs_grids(detection, target, n_cams, n_ims, dtype)
    if dd is None or not len(dd):
        raise ValueError("detection table is empty")

    # mixed-rate rigs: camera c's frame j sits at j * ratio_c on camera
    # 0's frame timeline; trajectory knots cover the longest span
    if frame_rates is not None:
        rates = np.broadcast_to(
            np.asarray(frame_rates, dtype=float), (n_cams,))
        if np.any(rates <= 0):
            raise ValueError(f"frame_rates must be positive; got {rates}")
        ratios = rates[0] / rates
    else:
        ratios = np.ones(n_cams)
    # per-camera frame counts set the knot span (a 2x-rate camera's J
    # frames only cover J/2 reference frames)
    cam_col = dd[:, 0].astype(int)
    spans = np.zeros(n_cams)
    for c in range(n_cams):
        sel = dd[cam_col == c]
        if len(sel):
            spans[c] = sel[:, 1].max() * ratios[c]
    n_knots = max(int(np.ceil(spans.max())) + 1, 2)

    # -- step 1: integer shifts
    shifts = np.zeros(n_cams, dtype=int)
    if max_shift > 0:
        shifts = estimate_integer_shifts(uv_g, mask_g, max_shift,
                                         ratios=ratios)

    # -- step 2: trajectory init from the tracker on the aligned table
    # (frames bin to the nearest reference-timeline knot)
    im_new = (np.rint(dd[:, 1] * ratios[cam_col]).astype(int)
              + shifts[cam_col])
    keep = (im_new >= 0) & (im_new < n_knots)
    dd2 = dd[keep].copy()
    dd2[:, 1] = im_new[keep]
    tracker = TargetTracker(camset, target, loss=loss, f_scale=f_scale)
    poses, tinfo = tracker.track_batch(
        TargetDetection(cam_names=names, data=dd2))
    n_tracked = poses.shape[0]
    x0 = np.zeros((n_knots, 6))
    valid = np.zeros(n_knots, dtype=bool)
    lim = min(n_knots, n_tracked)
    finite = np.isfinite(poses[:lim].reshape(lim, -1)).all(axis=1)
    valid[:lim] = (np.asarray(tinfo["n_used"][:lim])
                   >= min_track_detections) & finite
    for i in np.flatnonzero(valid):
        x0[i] = np.concatenate(ext_4x4_to_rod(poses[i]))
    if valid.sum() < 2:
        raise ValueError(
            f"target tracked in only {int(valid.sum())} frames — not "
            "enough to anchor a trajectory (check the rig calibration "
            "and detection coverage)")
    x0[:, :3] = unwrap_rvecs(x0[:, :3], valid=valid)
    anchors = np.flatnonzero(valid)
    holes = np.flatnonzero(~valid)
    for a in range(6):  # linear gap fill keeps untracked bins plausible
        x0[holes, a] = np.interp(holes, anchors, x0[anchors, a])

    # -- step 3: joint device LM
    dists = [np.reshape(camset[n].distortion_coefs, -1) for n in names]
    # jit-captured constants stay HOST numpy (CLAUDE.md invariant:
    # captured device arrays force the tunnel's first d2h at lowering);
    # het rigs pack the selector layout (mixed fisheye+Brown sync like
    # uniform rigs)
    intr_rows, project_fn = pack_rig_intrinsics(
        [camset[n].intrinsic for n in names], dists)
    intr_h = intr_rows.astype(dtype)
    extr_h = np.stack([
        np.concatenate(ext_4x4_to_rod(camset[n].extrinsic))
        for n in names]).astype(dtype)
    tpl_h = np.asarray(target.point_data.reshape(-1, 3), dtype=dtype)

    rho_fn, weight_fn = make_loss(loss, f_scale)
    robust = loss != "linear"
    n_off = n_cams - 1
    n_e = n_off * (2 if estimate_skew else 1) \
        + (n_cams if estimate_rolling_shutter else 0)
    n_pose = 6 * n_knots
    jmid = (n_knots - 1) / 2.0
    ratios_h = ratios.astype(dtype)
    # per-detection row phase: a detection on row v is sampled
    # readout * rho later than mid-scan (rho from the OBSERVED row — the
    # standard linearisation; it is data, not a parameter)
    heights = np.array([float(camset[n].res[1]) for n in names])
    rho_g = (uv_g[..., 1] / heights[:, None, None] - 0.5).astype(dtype)

    def cell_grams(xf, xf1, w_base, rs_c, uv_k, mask_k, rho_k, intr_c,
                   extr_c):
        """One (camera, frame) cell: masked gram/gradient/cost over the
        local 14-vector q = [X_f (6) | X_f1 (6) | tau | readout] via one
        14-tangent jacfwd. tau is the cell's clock shift evaluated at 0 —
        its column maps to d_c (weight 1) and s_c (weight jrel) in the
        assembly, so the offset/skew chain rule is exact by construction.
        """
        tpl_j = jnp.asarray(tpl_h)

        def res_fn(q):
            xf_q, xf1_q = q[:6], q[6:12]
            wk = w_base + q[12] + q[13] * rho_k              # (K,)
            p6 = xf_q[None, :] + wk[:, None] * (xf1_q - xf_q)[None, :]
            world = jax.vmap(pose_apply)(p6, tpl_j)          # (K, 3)
            xc = pose_apply(extr_c, world)
            z = xc[..., 2]
            # masked keys can sit behind the camera: keep 1/z finite so
            # mask * inf never makes a NaN (pad-row invariant)
            z_safe = jnp.where(jnp.abs(z) > 1e-6, z,
                               jnp.asarray(1e-6, z.dtype))
            xc = jnp.concatenate([xc[..., :2], z_safe[..., None]], -1)
            return project_fn(intr_c, xc) - uv_k              # (K, 2)

        q0 = jnp.concatenate([xf, xf1, jnp.zeros(1, xf.dtype),
                              rs_c[None]])
        r = res_fn(q0)
        jp = jax.jacfwd(res_fn)(q0)                          # (K, 2, 14)
        if robust:
            ssq = jnp.sum(r * r, axis=-1)
            cost = jnp.sum(rho_fn(ssq) * mask_k)
            mw = mask_k * jnp.sqrt(weight_fn(ssq))
        else:
            cost = jnp.sum(r * r * mask_k[:, None])
            mw = mask_k
        jm = jp * mw[:, None, None]
        rm = r * mw[:, None]
        a = jnp.einsum("kta,ktb->ab", jm, jm)                # (14, 14)
        g = jnp.einsum("kta,kt->a", jm, rm)                  # (14,)
        return a, g, cost

    cells = jax.vmap(                                        # over cameras
        jax.vmap(cell_grams,                                 # over frames
                 in_axes=(0, 0, 0, None, 0, 0, 0, None, None)),
        in_axes=(0, 0, 0, 0, 0, 0, 0, 0, 0))

    def split_params(p):
        x = p[:n_pose].reshape(n_knots, 6)
        pos = n_pose
        d = jnp.concatenate([jnp.zeros(1, p.dtype), p[pos:pos + n_off]])
        pos += n_off
        if estimate_skew:
            s = jnp.concatenate([jnp.zeros(1, p.dtype),
                                 p[pos:pos + n_off]])
            pos += n_off
        else:
            s = jnp.zeros(n_cams, p.dtype)
        if estimate_rolling_shutter:
            rs = p[pos:pos + n_cams]
        else:
            rs = jnp.zeros(n_cams, p.dtype)
        return x, d, s, rs

    def interp_cells(p, mask):
        """Clock params -> per-cell bracketing knots, base weight and
        effective mask (+ the pieces the assembly reuses)."""
        x, d, s, rs = split_params(p)
        j_idx = jnp.arange(n_ims, dtype=p.dtype)
        # camera c's own frame counter mapped onto the reference (cam 0)
        # frame timeline; mixed-rate rigs scale by fps_ref / fps_c
        t_nom = jnp.asarray(ratios_h)[:, None] * j_idx[None, :]  # (C, J)
        trel = t_nom - jmid                  # skew lever, mid-capture 0
        t = t_nom + d[:, None] + s[:, None] * trel
        in_range = ((t >= 0.0) & (t <= n_knots - 1.0)).astype(p.dtype)
        f = jnp.clip(jnp.floor(t), 0, n_knots - 2).astype(jnp.int32)
        w = jnp.clip(t - f.astype(p.dtype), 0.0, 1.0)        # (C, J)
        xf, xf1 = x[f], x[f + 1]                             # (C, J, 6)
        mask_eff = mask * in_range[..., None]
        return x, rs, xf, xf1, mask_eff, f, w, trel

    def run_cells(p, uv, mask, rho):
        x, rs, xf, xf1, mask_eff, f, w, trel = interp_cells(p, mask)
        a, g, costs = cells(xf, xf1, w, rs, uv, mask_eff, rho,
                            jnp.asarray(intr_h), jnp.asarray(extr_h))
        return x, a, g, costs, f, trel

    def neq(p, uv, mask, rho):
        x, a, g, costs, f, trel = run_cells(p, uv, mask, rho)
        # knot memberships (one-hot contractions replace scatter-adds)
        of = jax.nn.one_hot(f, n_knots, dtype=p.dtype)       # (C, J, I)
        of1 = jax.nn.one_hot(f + 1, n_knots, dtype=p.dtype)
        # pose blocks: the per-detection interpolation weights already
        # live inside the per-cell grams, so assembly is membership-only
        dblk = (jnp.einsum("cji,cjab->iab", of, a[..., :6, :6])
                + jnp.einsum("cji,cjab->iab", of1, a[..., 6:12, 6:12]))
        oblk = jnp.einsum("cji,cjab->iab", of, a[..., :6, 6:12])  # (i,i+1)
        gx = (jnp.einsum("cji,cja->ia", of, g[..., :6])
              + jnp.einsum("cji,cja->ia", of1, g[..., 6:12]))

        # weak first-difference smoothness prior: resolves unobserved bins
        lam = prior_lambda * jnp.maximum(
            jnp.max(jnp.abs(dblk)), jnp.asarray(1.0, p.dtype))
        eye6 = jnp.eye(6, dtype=p.dtype)
        ends = jnp.concatenate([jnp.ones(1, p.dtype),
                                jnp.full((n_knots - 2,), 2.0, p.dtype),
                                jnp.ones(1, p.dtype)])
        dblk = dblk + lam * ends[:, None, None] * eye6
        not_last = (jnp.arange(n_knots) < n_knots - 1).astype(p.dtype)
        oblk = oblk - lam * not_last[:, None, None] * eye6
        diff = x[1:] - x[:-1]
        gp = lam * (jnp.pad(diff, ((1, 0), (0, 0)))
                    - jnp.pad(diff, ((0, 1), (0, 0))))
        cost_prior = lam * jnp.sum(diff * diff)

        # clock couplings from the tau/readout gram columns
        ctau = a[..., :12, 12]                               # (C, J, 12)
        htt = a[..., 12, 12]                                 # (C, J)
        gtau = g[..., 12]

        def pose_clock(col):                                 # -> (I, C, 6)
            return (jnp.einsum("cji,cja->ica", of, col[..., :6])
                    + jnp.einsum("cji,cja->ica", of1, col[..., 6:12]))

        wd = pose_clock(ctau)
        w_cols = [wd[:, 1:, :]]
        ge_parts = [jnp.sum(gtau, axis=1)[1:]]
        hee_rows = [[jnp.diag(jnp.sum(htt, axis=1)[1:])]]
        if estimate_skew:
            ws = pose_clock(ctau * trel[:, :, None])
            w_cols.append(ws[:, 1:, :])
            hds = jnp.diag(jnp.sum(htt * trel, axis=1)[1:])
            hss = jnp.diag(jnp.sum(htt * trel ** 2, axis=1)[1:])
            hee_rows[0].append(hds)
            hee_rows.append([hds, hss])
            ge_parts.append(jnp.sum(gtau * trel, axis=1)[1:])
        if estimate_rolling_shutter:
            crs = a[..., :12, 13]
            wr = pose_clock(crs)
            w_cols.append(wr)                                # all C cams
            htr = jnp.diag(jnp.sum(a[..., 12, 13], axis=1))  # (C, C)
            hrr = jnp.diag(jnp.sum(a[..., 13, 13], axis=1))
            hee_rows[0].append(htr[1:, :])
            if estimate_skew:
                hsr = jnp.diag(jnp.sum(a[..., 12, 13] * trel, axis=1))
                hee_rows[1].append(hsr[1:, :])
                hee_rows.append([htr[:, 1:], hsr[:, 1:], hrr])
            else:
                hee_rows.append([htr[:, 1:], hrr])
            ge_parts.append(jnp.sum(g[..., 13], axis=1))
        hee = jnp.concatenate(
            [jnp.concatenate(row, axis=1) for row in hee_rows], axis=0)

        # dense assembly: block tridiagonal pose system + clock arrow
        eye_i = jnp.eye(n_knots, dtype=p.dtype)
        up_i = jnp.eye(n_knots, n_knots, 1, dtype=p.dtype)
        mo = jnp.einsum("iab,ij->iajb", oblk, up_i).reshape(n_pose, n_pose)
        mp = (jnp.einsum("iab,ij->iajb", dblk, eye_i)
              .reshape(n_pose, n_pose) + mo + mo.T)
        w_all = jnp.concatenate(
            [wc.transpose(0, 2, 1).reshape(n_pose, -1) for wc in w_cols],
            axis=1)                                           # (6I, E)
        jtj = jnp.concatenate([
            jnp.concatenate([mp, w_all], axis=1),
            jnp.concatenate([w_all.T, hee], axis=1)], axis=0)
        grad = jnp.concatenate([(gx + gp).reshape(-1),
                                jnp.concatenate(ge_parts)])
        return jtj, grad, jnp.sum(costs) + cost_prior

    def data_cost(p, uv, mask, rho):
        """Pure reprojection cost at p — the prior term is part of the
        objective but must not contaminate the reported pixel rms."""
        return jnp.sum(run_cells(p, uv, mask, rho)[3])

    def solve_packed(p0, uv, mask, rho):
        res = lm_solve(lambda q: neq(q, uv, mask, rho), p0,
                       max_nfev=max_nfev)
        jtj, _, _ = neq(res.x, uv, mask, rho)
        # clock covariance by Schur elimination of the pose knots
        mp = jtj[:n_pose, :n_pose]
        wp = jtj[:n_pose, n_pose:]
        hee = jtj[n_pose:, n_pose:]
        ridge_m = 1e-12 * jnp.maximum(jnp.max(jnp.diag(mp)), 1.0)
        sol = jnp.linalg.solve(
            mp + ridge_m * jnp.eye(n_pose, dtype=p0.dtype), wp)
        s_e = hee - wp.T @ sol
        ridge_e = 1e-12 * jnp.maximum(jnp.max(jnp.abs(jnp.diag(s_e))), 1.0)
        cov_e = jnp.linalg.inv(s_e + ridge_e * jnp.eye(n_e, dtype=p0.dtype))
        # ONE packed leaf (the tunnel charges per fetched array)
        return jnp.concatenate([
            res.x, jnp.diag(cov_e), data_cost(res.x, uv, mask, rho)[None],
            res.nit.astype(p0.dtype)[None],
            res.status.astype(p0.dtype)[None]])

    p0 = np.concatenate([
        x0.reshape(-1), shifts[1:].astype(float),
        np.zeros(n_off if estimate_skew else 0),
        np.zeros(n_cams if estimate_rolling_shutter else 0)]).astype(dtype)
    packed = np.asarray(jax.device_get(jax.jit(solve_packed)(
        jnp.asarray(p0), jnp.asarray(uv_g), jnp.asarray(mask_g),
        jnp.asarray(rho_g))))

    x = packed[:n_pose].reshape(n_knots, 6)
    e = packed[n_pose:n_pose + n_e]
    diag_cov = packed[n_pose + n_e:n_pose + 2 * n_e]
    cost = float(packed[-3])
    nit, status = int(packed[-2]), int(packed[-1])

    offsets = np.zeros(n_cams)
    offsets[1:] = e[:n_off]
    skew = None
    pos = n_off
    if estimate_skew:
        skew = np.zeros(n_cams)
        skew[1:] = e[pos:pos + n_off]
        pos += n_off
    readout = None
    if estimate_rolling_shutter:
        readout = np.asarray(e[pos:pos + n_cams])
    # effective detections: within the valid time window at the solution
    j_idx = np.arange(n_ims, dtype=float)
    t_nom = ratios[:, None] * j_idx[None, :]
    t = t_nom + offsets[:, None]
    if skew is not None:
        t = t + skew[:, None] * (t_nom - jmid)
    in_range = (t >= 0.0) & (t <= n_knots - 1.0)
    n_det_eff = int((mask_g * in_range[..., None]).sum())
    dof = max(2 * n_det_eff - (n_pose + n_e), 1)
    sigma2 = cost / dof
    e_sigma = np.sqrt(np.clip(diag_cov, 0.0, None) * sigma2)
    offset_sigma = np.zeros(n_cams)
    offset_sigma[1:] = e_sigma[:n_off]
    skew_sigma = None
    pos = n_off
    if estimate_skew:
        skew_sigma = np.zeros(n_cams)
        skew_sigma[1:] = e_sigma[pos:pos + n_off]
        pos += n_off
    readout_sigma = None
    if estimate_rolling_shutter:
        readout_sigma = np.asarray(e_sigma[pos:pos + n_cams])
    rms = float(np.sqrt(cost / max(2 * n_det_eff, 1)))

    # observability diagnostic: median knot-to-knot motion
    dx = np.diff(x, axis=0)
    motion = {"rot_rad_per_frame": float(np.median(
        np.linalg.norm(dx[:, :3], axis=1))),
        "trans_per_frame": float(np.median(
            np.linalg.norm(dx[:, 3:], axis=1)))}
    if np.any(offset_sigma[1:] > 0.05):
        logging.warning(
            "temporal calibration is weakly observable (offset sigma up "
            "to %.2f frames) — the capture's motion is too slow or too "
            "short", float(np.max(offset_sigma[1:])))

    info = {
        "nit": nit, "status": status, "cost": cost,
        "n_detections": n_det_eff, "integer_shifts": shifts,
        "trajectory": np.stack([make_4x4h_tform(r[:3], r[3:]) for r in x]),
        "tracker_rms": tinfo["rms"], "motion": motion,
        "camera_names": list(names), "frame_rate_ratios": ratios,
        "n_knots": n_knots,
    }
    if fps is not None and fps > 0:
        info["offsets_s"] = offsets / fps
        info["offset_sigma_s"] = offset_sigma / fps
        if skew is not None:
            info["clock_rate_ppm"] = skew * 1e6  # frames/frame = s/s
        if readout is not None:
            info["readout_s"] = readout / fps
    return SyncResult(offsets, offset_sigma, skew, skew_sigma,
                      readout, readout_sigma, rms, info)


def format_sync_report(result: SyncResult, fps: float | None = None) -> str:
    """Human-readable rendering of a :class:`SyncResult`."""
    lines = [
        f"temporal calibration over {result.info['n_detections']} "
        f"detections: rms {result.rms:.3f} px, {result.info['nit']} "
        "iterations",
        " camera        offset(frames)     sigma"
        + ("      skew(ppm)" if result.skew is not None else "")
        + ("  readout(frames)" if result.readout is not None else ""),
    ]
    for i, n in enumerate(result.info["camera_names"]):
        row = (f" {n:<12} {result.offsets[i]:>+14.4f} "
               f"{result.offset_sigma[i]:>9.4f}")
        if result.skew is not None:
            row += f" {result.skew[i] * 1e6:>+14.2f}"
        if result.readout is not None:
            row += f" {result.readout[i]:>16.4f}"
        if i == 0:
            row += "   (time base)"
        lines.append(row)
    if fps is not None and fps > 0:
        ms = result.offsets / fps * 1e3
        lines.append(" offsets at {:.6g} fps: ".format(fps) + ", ".join(
            f"{n}={v:+.3f} ms" for n, v in
            zip(result.info["camera_names"], ms)))
    m = result.info["motion"]
    lines.append(
        f" capture motion: {m['rot_rad_per_frame'] * 1e3:.2f} mrad + "
        f"{m['trans_per_frame'] * 1e3:.3f} mm per frame (median)")
    return "\n".join(lines)
