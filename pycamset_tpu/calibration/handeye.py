"""Hand-eye / robot-world calibration for multi-camera rigs.

Beyond-reference capability (the reference stops at rig calibration;
rlav440/pyCamSet has no hand-eye module): registers a calibrated camera
rig to a robot from synchronized robot poses and target detections.

Two mountings, one residual form. With ``G_i = base_T_gripper[i]`` (the
robot's forward kinematics: gripper coords -> base coords) and
``P_i = rig_T_target[i]`` (the target pose in the rig's world frame, from
the calibrated rig via :class:`pycamset_tpu.tracking.TargetTracker`):

- ``eye_in_hand``: the rig rides the gripper, the target is fixed in the
  robot base. Unknowns ``X = gripper_T_rig`` and ``Z = base_T_target``
  satisfy ``G_i @ X @ P_i = Z`` for every image.
- ``eye_to_hand``: the rig is fixed in the base, the target rides the
  gripper. Unknowns ``X = base_T_rig`` and ``Z = gripper_T_target``
  satisfy ``X @ P_i = G_i @ Z``.

Both reduce to the classical ``A X = X B`` over relative motions, seeded
by the Park-Martin rotation-log least squares (or Tsai-Lenz), then
refined on the device: a 12-parameter Levenberg-Marquardt over
``[x(6) | z(6)]`` minimizing the full multi-camera PIXEL reprojection
error of every detection through every camera of the rig — one jitted
``lax.while_loop`` dispatch (optim/lm.py), masked static shapes, any
camera model the rig carries (standard/rational/thin-prism/tilted/
fisheye). OpenCV's calibrateHandEye refines pose residuals of a single
camera; refining in pixels against the whole rig is what makes the
estimate consistent with the calibration itself.

No reference analogue (capability audit: rlav440/pyCamSet has no
hand-eye surface; closest prior is cv2.calibrateHandEye /
cv2.calibrateRobotWorldHandEye, absent from this cv2 5.0 build).
"""
from __future__ import annotations

import logging
from typing import NamedTuple

import numpy as np

logger = logging.getLogger(__name__)

# minimum angular spread (radians) between relative-motion rotation axes
# before the AX=XB rotation system is considered solvable
_MIN_AXIS_SPREAD = 1e-3


# ---------------------------------------------------------------- host SE(3)

def _inv_h(t: np.ndarray) -> np.ndarray:
    """Invert a rigid 4x4 (host)."""
    out = np.eye(4)
    rt = t[:3, :3].T
    out[:3, :3] = rt
    out[:3, 3] = -rt @ t[:3, 3]
    return out


def _log_so3(r: np.ndarray) -> np.ndarray:
    """Rotation matrix -> rotation vector (host, via cv2)."""
    import cv2
    return cv2.Rodrigues(np.asarray(r, dtype=float))[0].ravel()


def _exp_so3(v: np.ndarray) -> np.ndarray:
    import cv2
    return cv2.Rodrigues(np.asarray(v, dtype=float))[0]


def _skew(v: np.ndarray) -> np.ndarray:
    return np.array([[0.0, -v[2], v[1]],
                     [v[2], 0.0, -v[0]],
                     [-v[1], v[0], 0.0]])


def _mean_rigid(ts: np.ndarray) -> np.ndarray:
    """Chordal-mean rotation (SVD projection) + mean translation."""
    m = np.mean(ts[:, :3, :3], axis=0)
    u, _, vt = np.linalg.svd(m)
    r = u @ vt
    if np.linalg.det(r) < 0:
        r = u @ np.diag([1.0, 1.0, -1.0]) @ vt
    out = np.eye(4)
    out[:3, :3] = r
    out[:3, 3] = np.mean(ts[:, :3, 3], axis=0)
    return out


def _pairs(n: int, max_pairs: int = 6000):
    """All index pairs (i, j), i < j, thinned evenly past max_pairs."""
    ii, jj = np.triu_indices(n, k=1)
    if ii.size > max_pairs:
        sel = np.linspace(0, ii.size - 1, max_pairs).round().astype(int)
        ii, jj = ii[sel], jj[sel]
    return ii, jj


# ------------------------------------------------------------------- AX = XB

def solve_ax_xb(a_tforms: np.ndarray, b_tforms: np.ndarray,
                method: str = "park") -> np.ndarray:
    """Solve ``A_i X = X B_i`` for rigid X over a set of motion pairs.

    :param a_tforms: (N, 4, 4) rigid transforms.
    :param b_tforms: (N, 4, 4) rigid transforms.
    :param method: "park" (rotation-log least squares, Park & Martin 1994)
        or "tsai" (modified-Rodrigues linear system, Tsai & Lenz 1989).
    :return: (4, 4) rigid X.
    :raises ValueError: when the motions carry insufficient rotation to
        determine X (all rotation axes parallel or near-zero).
    """
    a_tforms = np.asarray(a_tforms, dtype=float)
    b_tforms = np.asarray(b_tforms, dtype=float)
    if a_tforms.shape != b_tforms.shape or a_tforms.shape[1:] != (4, 4):
        raise ValueError("a_tforms and b_tforms must both be (N, 4, 4)")
    alphas = np.stack([_log_so3(a[:3, :3]) for a in a_tforms])
    betas = np.stack([_log_so3(b[:3, :3]) for b in b_tforms])

    # solvability: rotation axes must span >= 2 directions
    norms = np.linalg.norm(alphas, axis=1)
    keep = norms > 1e-8
    if keep.sum() >= 2:
        axes = alphas[keep] / norms[keep][:, None]
        spread = np.linalg.svd(axes, compute_uv=False)
    else:
        spread = np.zeros(2)
    if spread[1] < _MIN_AXIS_SPREAD:
        raise ValueError(
            "hand-eye motions are rotationally degenerate (all relative "
            "rotations share one axis, or there is no rotation at all): "
            "X is unobservable — add robot poses that rotate about a "
            "second axis")

    if method == "park":
        m = np.einsum("ni,nj->ij", betas, alphas)
        # Rx = (M^T M)^(-1/2) M^T via SVD (also the chordal projection)
        u, s, vt = np.linalg.svd(m.T)
        rx = u @ vt
        if np.linalg.det(rx) < 0:
            rx = u @ np.diag([1.0, 1.0, -1.0]) @ vt
    elif method == "tsai":
        # modified Rodrigues p = 2 sin(theta/2) * axis
        def _p(v):
            th = np.linalg.norm(v)
            if th < 1e-12:
                return np.zeros(3)
            return 2.0 * np.sin(th / 2.0) * (v / th)
        lhs = np.concatenate([_skew(_p(al) + _p(be))
                              for al, be in zip(alphas, betas)])
        rhs = np.concatenate([_p(be) - _p(al)
                              for al, be in zip(alphas, betas)])
        pxp, *_ = np.linalg.lstsq(lhs, rhs, rcond=None)
        px = 2.0 * pxp / np.sqrt(1.0 + pxp @ pxp)
        n2 = px @ px
        rx = ((1.0 - n2 / 2.0) * np.eye(3)
              + 0.5 * (np.outer(px, px)
                       + np.sqrt(max(4.0 - n2, 0.0)) * _skew(px)))
    else:
        raise ValueError(f"unknown AX=XB method {method!r}")

    # (R_A - I) t_x = R_x t_B - t_A, stacked least squares
    lhs = np.concatenate([a[:3, :3] - np.eye(3) for a in a_tforms])
    rhs = np.concatenate([rx @ b[:3, 3] - a[:3, 3]
                          for a, b in zip(a_tforms, b_tforms)])
    tx, *_ = np.linalg.lstsq(lhs, rhs, rcond=None)
    x = np.eye(4)
    x[:3, :3] = rx
    x[:3, 3] = tx
    return x


def solve_hand_eye(base_T_gripper: np.ndarray, rig_T_target: np.ndarray,
                   mode: str = "eye_in_hand",
                   method: str = "park") -> tuple[np.ndarray, np.ndarray]:
    """Closed-form (X, Z) from synchronized robot and target poses.

    :param base_T_gripper: (N, 4, 4) forward kinematics per image.
    :param rig_T_target: (N, 4, 4) target pose in the rig frame per image
        (e.g. from TargetTracker.track_batch).
    :param mode: "eye_in_hand" (rig on the gripper, target fixed) or
        "eye_to_hand" (rig fixed, target on the gripper).
    :return: (X, Z) rigid 4x4s — see the module docstring for frames.
    """
    g = np.asarray(base_T_gripper, dtype=float)
    p = np.asarray(rig_T_target, dtype=float)
    if g.shape != p.shape or g.ndim != 3 or g.shape[1:] != (4, 4):
        raise ValueError("pose arrays must both be (N, 4, 4)")
    if g.shape[0] < 3:
        raise ValueError("need at least 3 pose pairs")
    ginv = np.stack([_inv_h(t) for t in g])
    pinv = np.stack([_inv_h(t) for t in p])
    ii, jj = _pairs(g.shape[0])
    if mode == "eye_in_hand":
        # G_i X P_i = Z  =>  (G_j^-1 G_i) X = X (P_j P_i^-1)
        a = np.einsum("nij,njk->nik", ginv[jj], g[ii])
        b = np.einsum("nij,njk->nik", p[jj], pinv[ii])
        x = solve_ax_xb(a, b, method=method)
        z = _mean_rigid(np.einsum("nij,njk,nkl->nil", g, x[None].repeat(
            g.shape[0], 0), p))
    elif mode == "eye_to_hand":
        # X P_i = G_i Z  =>  (G_j G_i^-1) X = X (P_j P_i^-1)
        a = np.einsum("nij,njk->nik", g[jj], ginv[ii])
        b = np.einsum("nij,njk->nik", p[jj], pinv[ii])
        x = solve_ax_xb(a, b, method=method)
        z = _mean_rigid(np.einsum("nij,njk,nkl->nil", ginv, x[None].repeat(
            g.shape[0], 0), p))
    else:
        raise ValueError(f"unknown hand-eye mode {mode!r}")
    return x, z


# ------------------------------------------------- device LM refinement

class HandEyeResult(NamedTuple):
    """Hand-eye calibration output.

    x / z: the two rigid 4x4s (frames per the module docstring).
    rms: refined reprojection rms in px (NaN when refine=False).
    info: dict with the closed-form seeds, LM diagnostics, per-parameter
        sigmas (unit pixel noise scaled by the residual variance), and
        the per-image usage mask.
    """
    x: np.ndarray
    z: np.ndarray
    rms: float
    info: dict


def _pose6_of(t: np.ndarray) -> np.ndarray:
    from pycamset_tpu.utils.general_utils import ext_4x4_to_rod
    r, tv = ext_4x4_to_rod(t)
    return np.concatenate([r, tv])


def calibrate_hand_eye(camset, detection, base_T_gripper: np.ndarray,
                       target, mode: str = "eye_in_hand",
                       method: str = "park", refine: bool = True,
                       loss: str = "linear", f_scale: float = 1.0,
                       min_detections: int = 8,
                       max_nfev: int = 60) -> HandEyeResult:
    """Full hand-eye pipeline against a calibrated rig.

    1. Per-image target poses from the rig (TargetTracker.track_batch —
       one batched device dispatch).
    2. Closed-form (X, Z) seed over the usable images (solve_hand_eye).
    3. Joint 12-parameter LM refinement of [X | Z] on the PIXEL
       reprojection residuals of every detection in every camera, as one
       jitted device solve.

    :param camset: calibrated CameraSet (parameters held fixed).
    :param detection: TargetDetection with im_num indexing
        ``base_T_gripper`` rows.
    :param base_T_gripper: (I, 4, 4) robot forward kinematics per image.
    :param target: the calibration target (template from point_data).
    :param mode: "eye_in_hand" or "eye_to_hand" (module docstring).
    :param refine: skip step 3 when False (closed form only).
    :param loss: robust loss for the refinement residuals (optim.losses).
    :param min_detections: images with fewer detections are excluded from
        the closed-form seed (they still contribute to the refinement,
        where the mask weighs them naturally).
    """
    import jax
    import jax.numpy as jnp

    from pycamset_tpu.config import default_device_dtype
    from pycamset_tpu.ops.projection import pack_rig_intrinsics
    from pycamset_tpu.ops.transforms import pose_apply, pose_inv
    from pycamset_tpu.optim.lm import lm_solve
    from pycamset_tpu.optim.losses import make_loss
    from pycamset_tpu.tracking import TargetTracker
    from pycamset_tpu.utils.general_utils import ext_4x4_to_rod

    g = np.asarray(base_T_gripper, dtype=float)
    if g.ndim != 3 or g.shape[1:] != (4, 4):
        raise ValueError("base_T_gripper must be (I, 4, 4)")

    # -- step 1: target poses in the rig frame
    tracker = TargetTracker(camset, target, loss=loss, f_scale=f_scale)
    rig_T_target, tinfo = tracker.track_batch(detection)
    n_ims = rig_T_target.shape[0]
    if n_ims != g.shape[0]:
        raise ValueError(
            f"detection covers {n_ims} images but base_T_gripper has "
            f"{g.shape[0]} poses — they must be synchronized 1:1")
    usable = (np.asarray(tinfo["n_used"]) >= min_detections) \
        & np.isfinite(rig_T_target.reshape(n_ims, -1)).all(axis=1)
    if usable.sum() < 3:
        raise ValueError(
            f"only {int(usable.sum())} of {n_ims} images have >= "
            f"{min_detections} detections and a finite pose — not enough "
            "to calibrate")

    # -- step 2: closed form on the usable subset
    x0, z0 = solve_hand_eye(g[usable], rig_T_target[usable], mode=mode,
                            method=method)
    info = {"x_seed": x0, "z_seed": z0, "usable": usable,
            "tracker_rms": tinfo["rms"], "mode": mode, "method": method}
    if not refine:
        return HandEyeResult(x0, z0, float("nan"), info)

    # -- step 3: device refinement on pixel residuals
    dtype = default_device_dtype()
    names = camset.get_names()
    dists = [np.reshape(camset[n].distortion_coefs, -1) for n in names]
    # jit-captured constants stay HOST numpy (CLAUDE.md invariant: captured
    # device arrays force the tunnel's multi-minute first d2h at lowering);
    # het rigs pack the selector layout (mixed fisheye+Brown refine like
    # uniform rigs)
    intr_rows, project_fn = pack_rig_intrinsics(
        [camset[n].intrinsic for n in names], dists)
    intr_h = intr_rows.astype(dtype)
    extr_h = np.stack([
        np.concatenate(ext_4x4_to_rod(camset[n].extrinsic))
        for n in names]).astype(dtype)
    tpl_h = np.asarray(target.point_data.reshape(-1, 3), dtype=dtype)
    # M_i as (I, 3, 4): eye_in_hand folds inv(G_i), eye_to_hand G_i
    m_h = np.stack([(_inv_h(t) if mode == "eye_in_hand" else t)[:3]
                    for t in g]).astype(dtype)

    dd = detection.get_data()
    cam_i = dd[:, 0].astype(np.int32)
    im_i = dd[:, 1].astype(np.int32)
    key_i = dd[:, 2].astype(np.int32)
    uv_h = dd[:, 3:5].astype(dtype)
    mask_h = np.ones(dd.shape[0], dtype=dtype)
    rho_fn, weight_fn = make_loss(loss, f_scale)
    robust = loss != "linear"

    def residuals(xz, cam_idx, im_idx, key_idx, uv, mask):
        intr_j, extr_j, tpl_j, m_j = map(jnp.asarray,
                                         (intr_h, extr_h, tpl_h, m_h))
        x6, z6 = xz[:6], xz[6:]
        pt_t = tpl_j[key_idx]                                    # (N,3)
        pt_m = pose_apply(z6, pt_t)                              # Z
        m_n = m_j[im_idx]                                        # (N,3,4)
        pt_g = jnp.einsum("nij,nj->ni", m_n[:, :, :3], pt_m) + m_n[:, :, 3]
        pt_w = pose_apply(pose_inv(x6), pt_g)                    # inv(X)
        xc = jax.vmap(pose_apply)(extr_j[cam_idx], pt_w)
        pred = jax.vmap(project_fn)(intr_j[cam_idx], xc)
        return (pred - uv) * mask[:, None]

    def neq(xz, *args):
        r = residuals(xz, *args)
        j = jax.jacfwd(residuals)(xz, *args)
        if robust:
            s = jnp.sum(r * r, axis=-1)
            cost = jnp.sum(rho_fn(s) * args[-1])
            sw = jnp.sqrt(weight_fn(s))[:, None]
            r = r * sw
            j = j * sw[..., None]
        else:
            cost = jnp.sum(r * r)
        jtj = jnp.einsum("nti,ntj->ij", j, j)
        grad = jnp.einsum("nti,nt->i", j, r)
        return jtj, grad, cost

    def solve_packed(xz0, cam_idx, im_idx, key_idx, uv, mask):
        args = (cam_idx, im_idx, key_idx, uv, mask)
        res = lm_solve(lambda p: neq(p, *args), xz0, max_nfev=max_nfev)
        jtj, _, _ = neq(res.x, *args)
        ridge = 1e-12 * jnp.maximum(jnp.max(jnp.diag(jtj)), 1.0)
        cov = jnp.linalg.inv(jtj + ridge * jnp.eye(12, dtype=jtj.dtype))
        # one packed row, ONE fetched leaf (tunnel charges per leaf):
        # [xz(12) | cost | nit | status | diag_cov(12)]
        return jnp.concatenate([
            res.x, res.cost[None], res.nit.astype(res.x.dtype)[None],
            res.status.astype(res.x.dtype)[None], jnp.diag(cov)])

    xz0 = np.concatenate([_pose6_of(x0), _pose6_of(z0)]).astype(dtype)
    packed = np.asarray(jax.device_get(jax.jit(solve_packed)(
        jnp.asarray(xz0), jnp.asarray(cam_i), jnp.asarray(im_i),
        jnp.asarray(key_i), jnp.asarray(uv_h), jnp.asarray(mask_h))))
    xz = packed[:12]
    cost, nit, status = packed[12], int(packed[13]), int(packed[14])
    n_res = 2 * dd.shape[0]
    dof = max(n_res - 12, 1)
    rms = float(np.sqrt(cost / max(n_res, 1)))
    sigma2 = cost / dof
    from pycamset_tpu.utils.general_utils import make_4x4h_tform
    x = make_4x4h_tform(xz[:3], xz[3:6])
    z = make_4x4h_tform(xz[6:9], xz[9:12])
    info.update({
        "nit": nit, "status": status, "cost": float(cost),
        "xz_sigma": np.sqrt(np.maximum(packed[15:], 0.0) * sigma2),
        "n_detections": int(dd.shape[0]),
    })
    return HandEyeResult(x, z, rms, info)
