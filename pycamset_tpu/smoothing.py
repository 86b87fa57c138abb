"""Trajectory smoothing for tracked target poses (beyond the reference).

The tracker (pycamset_tpu/tracking.py) estimates each frame's pose
independently (or warm-started); production serving usually wants the
*trajectory*: temporally coherent poses, gap fill-in through occlusions,
and velocity estimates. ``smooth_pose_trajectory`` runs a fixed-interval
RTS (Rauch–Tung–Striebel) smoother with a constant-velocity prior over
the 12-dim state [rvec(3), t(3), rvec_dot(3), t_dot(3)]:

* forward Kalman filter and backward RTS pass are each ONE ``lax.scan``
  — the whole smoother is a single jitted device program over static
  (I, 12) shapes, the TPU-native shape of a sequential recursion;
* per-frame measurement noise comes from the tracker's own 6x6 pose
  covariances (``info["pose_cov"]``); frames the tracker lost (inf
  sigma, < 3 points) coast on the motion prior and are interpolated;
* rotation vectors are unwrapped on the host first (the Rodrigues chart
  has a 2*pi*axis ambiguity; the smoother needs one continuous branch).

The linearisation treats the rodrigues chart as locally Euclidean —
exact for translation, and accurate for rotations at video rates where
inter-frame rotation is small; this is the standard production choice
(vs. a full IEKF on SE(3)) and is validated against a from-scratch
numpy RTS in tests/test_smoothing.py.
"""
from __future__ import annotations

import numpy as np

from pycamset_tpu.utils.general_utils import ext_4x4_to_rod, make_4x4h_tform

# measurement variance used for "no information" channels (inf/NaN sigma,
# lost frames): large against pixel-scale pose covariances but far from
# overflowing f32 when inverted
_HUGE_VAR = 1e12


def unwrap_rvecs(rvecs: np.ndarray,
                 valid: np.ndarray | None = None) -> np.ndarray:
    """One continuous branch of the Rodrigues chart along a trajectory.

    A rotation by theta about axis a equals a rotation by theta - 2*pi*k
    about the same axis; per frame, pick the representative
    ``r * (1 - 2*pi*k/|r|)`` (k in {-1, 0, 1}) closest to the previous
    VALID unwrapped frame so finite differences see the true angular
    velocity. Frames marked invalid (lost tracking — their rows may hold
    garbage) pass through untouched and never anchor the branch choice.
    """
    out = np.array(rvecs, dtype=float, copy=True)
    prev = None
    for i in range(len(out)):
        if valid is not None and not valid[i]:
            continue
        if prev is not None:
            r = out[i]
            th = np.linalg.norm(r)
            cands = [r]
            if th > 1e-12:
                cands += [r * (1.0 - 2.0 * np.pi / th),
                          r * (1.0 + 2.0 * np.pi / th)]
            d = [np.linalg.norm(c - prev) for c in cands]
            out[i] = cands[int(np.argmin(d))]
        prev = out[i]
    return out


def _build_cv_model(dt: float, q_rot: float, q_trans: float, dtype):
    """Constant-velocity transition F (12x12) and process noise Q for a
    white-noise-acceleration prior with spectral densities q_rot/q_trans
    ((rad|m)^2 / s^3)."""
    f = np.eye(12)
    f[:6, 6:] = dt * np.eye(6)
    q3, q2, q1 = dt ** 3 / 3.0, dt ** 2 / 2.0, dt
    q = np.zeros((12, 12))
    dens = np.array([q_rot] * 3 + [q_trans] * 3)
    for i in range(6):
        q[i, i] = q3 * dens[i]
        q[i, i + 6] = q[i + 6, i] = q2 * dens[i]
        q[i + 6, i + 6] = q1 * dens[i]
    return np.asarray(f, dtype), np.asarray(q, dtype)


def _rts_device(z, r_cov, f, q, p0):
    """Jitted forward-Kalman + backward-RTS over (I, 6) measurements.

    Returns (xs, ps): smoothed states (I, 12) and covariances (I, 12, 12).
    Measurement model: z = x[:6] + noise(r_cov per frame).
    """
    import jax
    import jax.numpy as jnp

    h = jnp.zeros((6, 12), z.dtype).at[:, :6].set(jnp.eye(6, dtype=z.dtype))

    def predict(x, p):
        return f @ x, f @ p @ f.T + q

    def fwd_step(carry, inp):
        x, p = carry
        zk, rk = inp
        s = h @ p @ h.T + rk                       # innovation (6, 6)
        k = jax.scipy.linalg.solve(s, h @ p, assume_a="pos").T  # (12, 6)
        x_f = x + k @ (zk - h @ x)
        kh = jnp.eye(12, dtype=z.dtype) - k @ h
        p_f = kh @ p @ kh.T + k @ rk @ k.T         # Joseph form (stable)
        x_p, p_p = predict(x_f, p_f)
        return (x_p, p_p), (x_f, p_f, x_p, p_p)

    def run(x0, p0_, zs, rs):
        (_, _), (xf, pf, xp, pp) = jax.lax.scan(fwd_step, (x0, p0_),
                                                (zs, rs))
        # backward RTS: x_s[k] = x_f[k] + G (x_s[k+1] - x_p[k]) with
        # G = P_f F^T P_p^{-1}
        def bwd_step(carry, inp):
            xs_next, ps_next = carry
            xf_k, pf_k, xp_k, pp_k = inp
            g = jax.scipy.linalg.solve(pp_k, f @ pf_k, assume_a="pos").T
            xs_k = xf_k + g @ (xs_next - xp_k)
            ps_k = pf_k + g @ (ps_next - pp_k) @ g.T
            return (xs_k, ps_k), (xs_k, ps_k)

        last = (xf[-1], pf[-1])
        (_, _), (xs, ps) = jax.lax.scan(
            bwd_step, last,
            (xf[:-1], pf[:-1], xp[:-1], pp[:-1]), reverse=True)
        xs = jnp.concatenate([xs, xf[-1:][...]], axis=0)
        ps = jnp.concatenate([ps, pf[-1:][...]], axis=0)
        return xs, ps

    x0 = jnp.concatenate([z[0], jnp.zeros(6, z.dtype)])
    return jax.jit(run)(x0, p0, z, r_cov)


def smooth_pose_trajectory(poses: np.ndarray,
                           pose_cov: np.ndarray | None = None,
                           pose_sigma: np.ndarray | None = None,
                           dt: float = 1.0,
                           q_rot: float = 1e-3,
                           q_trans: float = 1e-3,
                           return_velocity: bool = False):
    """RTS-smooth a tracked pose trajectory with a constant-velocity prior.

    :param poses: (I, 4, 4) target->world transforms (tracker output), or
        (I, 6) rodrigues+translation rows.
    :param pose_cov: optional (I, 6, 6) per-frame pose covariances
        (``info["pose_cov"]`` from the tracker batch paths). Non-finite
        entries mark lost/degenerate frames, which coast on the prior.
    :param pose_sigma: optional (I, 6) per-frame standard errors, used
        (diagonally) when ``pose_cov`` is not given.
    :param dt: inter-frame time step (s); with the default 1.0 the
        process densities are per-frame.
    :param q_rot: white-noise angular-acceleration spectral density
        (rad^2/s^3) — smaller = stiffer trajectory.
    :param q_trans: translation counterpart (m^2/s^3).
    :param return_velocity: also return (I, 6) [rvec_dot | t_dot].
    :returns: smoothed (I, 4, 4) poses (+ velocities, + smoothed (I, 6)
        pose sigmas) — always a 3-tuple when ``return_velocity`` else
        (poses, sigmas).
    """
    import jax.numpy as jnp
    poses = np.asarray(poses, dtype=float)
    if poses.ndim == 3 and poses.shape[1:] == (4, 4):
        z6 = np.stack([np.concatenate(ext_4x4_to_rod(t)) for t in poses])
    elif poses.ndim == 2 and poses.shape[1] == 6:
        z6 = poses.copy()
    else:
        raise ValueError("poses must be (I, 4, 4) or (I, 6); got "
                         f"{poses.shape}")
    n = len(z6)
    if n < 2:
        raise ValueError("need at least 2 frames to smooth")

    if pose_cov is not None:
        r = np.array(pose_cov, dtype=float, copy=True).reshape(n, 6, 6)
    elif pose_sigma is not None:
        sg = np.asarray(pose_sigma, dtype=float).reshape(n, 6)
        r = np.stack([np.diag(s ** 2) for s in sg])
    else:
        r = np.tile(np.eye(6) * 1e-6, (n, 1, 1))
    # lost/degenerate frames: no information, coast on the prior. A huge
    # diagonal (not inf: the innovation solve must stay finite) makes the
    # Kalman gain ~0 for those channels.
    bad = ~np.all(np.isfinite(r), axis=(1, 2))
    r[bad] = np.eye(6) * _HUGE_VAR
    # unwrap AFTER identifying lost frames: their rows may hold garbage
    # and must not anchor the branch choice for the frames that follow
    z6[:, :3] = unwrap_rvecs(z6[:, :3], valid=~bad)
    if bad.all():
        raise ValueError("every frame is marked lost (non-finite "
                         "pose_cov); nothing to smooth")
    if bad[0]:
        # the filter seeds its state from frame 0: use the first tracked
        # frame instead of garbage
        z6[0] = z6[np.flatnonzero(~bad)[0]]
    # clip degenerate (rank-deficient) covariances away from singular
    for i in range(n):
        d = np.diag(r[i])
        np.fill_diagonal(r[i], np.where(np.isfinite(d) & (d > 0),
                                        d, _HUGE_VAR))

    dtype = np.float64
    f, q = _build_cv_model(dt, q_rot, q_trans, dtype)
    p0 = np.eye(12, dtype=dtype)
    p0[:6, :6] = r[0]
    p0[6:, 6:] *= 1e2 * max(q_rot, q_trans) / max(dt, 1e-9)

    xs, ps = _rts_device(jnp.asarray(z6, dtype), jnp.asarray(r, dtype),
                         jnp.asarray(f, dtype), jnp.asarray(q, dtype),
                         jnp.asarray(p0, dtype))
    xs = np.asarray(xs)
    ps = np.asarray(ps)
    out_poses = np.stack([make_4x4h_tform(x[:3], x[3:6]) for x in xs])
    out_sigma = np.sqrt(np.clip(
        np.einsum("fii->fi", ps[:, :6, :6]), 0.0, None))
    if return_velocity:
        return out_poses, xs[:, 6:], out_sigma
    return out_poses, out_sigma
