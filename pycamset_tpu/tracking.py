"""Streaming target-pose tracking against a fixed, calibrated rig.

The production serving path: a rig is calibrated once, then a stream of
frames needs the target's 6-dof pose at high rate. The reference's closest
capability is its bit-rotted find_target module (pyCamSet/optimisation/
find_target.py:6-7; redesigned batch version in optim/find_target.py). This
module goes further for serving:

- the whole solve (residuals, 6x6 normal equations, damped LM loop) is
  compiled ONCE for a fixed detection capacity; every frame after that is a
  single device dispatch with static shapes;
- `track_batch` vmaps the solver over many frames in one dispatch — the
  throughput path (the per-call latency floor is the host->device round
  trip, so batching frames amortises it away).

Works with every camera model (the packed intrinsic width follows the rig).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from pycamset_tpu.config import default_device_dtype
from pycamset_tpu.models.camera_set import CameraSet
from pycamset_tpu.models.detections import TargetDetection
from pycamset_tpu.ops.rotations import matrix_to_rodrigues
from pycamset_tpu.ops.transforms import pose_apply, rigid_fit
from pycamset_tpu.ops.triangulation import triangulate_observations
from pycamset_tpu.optim.lm import lm_solve
from pycamset_tpu.optim.losses import make_loss
from pycamset_tpu.utils.general_utils import ext_4x4_to_rod, make_4x4h_tform


class TargetTracker:
    """Precompiled 6-dof target pose solver for a fixed rig.

    :param camset: the calibrated rig (all camera parameters held fixed).
    :param target: the target (template geometry from target.point_data).
    :param max_detections: static per-frame detection capacity (default:
        every camera sees every feature). Frames with more detections are
        truncated with a warning; fewer are masked padding.
    :param loss: robust loss for outlier observations (optim.losses).
    :param max_nfev: LM residual-evaluation budget per frame.
    :param rolling_shutter: per-camera readout duration in FRAME units
        ((C,) array or scalar; e.g. from
        ``calibrate_time_offsets(..., estimate_rolling_shutter=True)``).
        When given, each frame solves a 12-dof [pose | velocity] state:
        a detection on image row v is modelled at
        ``pose + velocity * readout * (v/height - 1/2)``, correcting the
        rolling-shutter skew a moving target paints into the frame and
        reporting the per-frame velocity.
    :param time_offsets: per-camera clock offsets in frames ((C,) array,
        from :func:`~pycamset_tpu.calibration.sync.calibrate_time_offsets`)
        — detections of camera c are modelled ``offset_c`` later along
        the same velocity model (implies the 12-dof state).
    """

    def __init__(self, camset: CameraSet, target, max_detections: int | None = None,
                 loss: str = "linear", f_scale: float = 1.0,
                 max_nfev: int = 25, rolling_shutter=None,
                 time_offsets=None):
        self.camset = camset
        self.target = target
        names = camset.get_names()
        # CPU = f64, TPU = f32 (+highest matmul precision), like the solver
        self._dtype = default_device_dtype()
        from pycamset_tpu.ops.projection import pack_rig_intrinsics
        dists = [np.reshape(camset[n].distortion_coefs, -1) for n in names]
        # jit-captured constants stay HOST numpy (lowering embeds them as
        # MLIR constants from the host; captured DEVICE arrays would force
        # the tunnel's multi-minute first d2h during lowering — the round-3
        # cold-start regression). Heterogeneous rigs pack the selector
        # layout and project through the het kernel — mixed fisheye+Brown
        # rigs track like uniform ones.
        intr_rows, project_fn = pack_rig_intrinsics(
            [camset[n].intrinsic for n in names], dists)
        self._intr = intr_rows.astype(self._dtype)
        self._project_fn = project_fn
        self._extr = np.stack([
            np.concatenate(ext_4x4_to_rod(camset[n].extrinsic))
            for n in names]).astype(self._dtype)
        self._tpl = np.asarray(target.point_data.reshape(-1, 3),
                               dtype=self._dtype)
        self.n_keys = int(self._tpl.shape[0])
        self.n_cams = len(names)
        self.max_detections = int(max_detections or self.n_cams * self.n_keys)
        self._max_nfev = int(max_nfev)
        rho_fn, weight_fn = make_loss(loss, f_scale)
        self._rho, self._weight = rho_fn, weight_fn
        self._robust = loss != "linear"
        self._last_pose: np.ndarray | None = None

        # temporal model: rolling shutter and/or inter-camera clock
        # offsets promote the per-frame state to 12-dof [pose | velocity]
        self._timed = rolling_shutter is not None or time_offsets is not None
        self._n_state = 12 if self._timed else 6
        rs_h = np.broadcast_to(
            np.asarray(0.0 if rolling_shutter is None else rolling_shutter,
                       dtype=self._dtype), (self.n_cams,)).copy()
        toff_h = np.broadcast_to(
            np.asarray(0.0 if time_offsets is None else time_offsets,
                       dtype=self._dtype), (self.n_cams,)).copy()
        heights_h = np.array([float(camset[n].res[1]) for n in names],
                             dtype=self._dtype)
        self._rs, self._toff = rs_h, toff_h
        n_state = self._n_state
        timed = self._timed

        intr, extr, tpl = self._intr, self._extr, self._tpl
        robust, rho, weight = self._robust, self._rho, self._weight

        def residuals(state, cam_i, key_i, uv, mask):
            tpl_j, extr_j, intr_j = map(jnp.asarray, (tpl, extr, intr))
            if timed:
                rs_j, toff_j, h_j = map(jnp.asarray,
                                        (rs_h, toff_h, heights_h))
                # per-detection sample time from the OBSERVED row (the
                # standard linearisation; rho is data, not a parameter)
                rho_k = uv[:, 1] / h_j[cam_i] - 0.5
                dt = rs_j[cam_i] * rho_k + toff_j[cam_i]      # (N,)
                p6 = state[None, :6] + dt[:, None] * state[None, 6:]
                world = jax.vmap(pose_apply)(p6, tpl_j[key_i])
            else:
                world = pose_apply(state, tpl_j[key_i])       # (N,3)
            xc = jax.vmap(pose_apply)(extr_j[cam_i], world)   # (N,3)
            pred = jax.vmap(project_fn)(intr_j[cam_i], xc)
            return (pred - uv) * mask[:, None]

        def neq(state, cam_i, key_i, uv, mask):
            r = residuals(state, cam_i, key_i, uv, mask)      # (N,2)
            j = jax.jacfwd(residuals)(state, cam_i, key_i, uv, mask)
            if robust:
                s = jnp.sum(r * r, axis=-1)
                cost = jnp.sum(rho(s) * mask)
                sw = jnp.sqrt(weight(s))[:, None]
                r = r * sw
                j = j * sw[..., None]
            else:
                cost = jnp.sum(r * r)
            jtj = jnp.einsum("nti,ntj->ij", j, j)
            grad = jnp.einsum("nti,nt->i", j, r)
            if timed:
                # weak zero-velocity prior: a static (or single-row) frame
                # leaves velocity unobservable — bias it to 0 instead of
                # letting LM wander a flat direction. 1e-8: the rotation-
                # rate information after eliminating the (near-degenerate
                # for small targets) translation rate is itself only
                # ~1e-6 of the pose information, and a stronger prior
                # visibly shrinks true rotation rates
                lam = 1e-8 * jnp.maximum(
                    jnp.max(jnp.diag(jtj[:6, :6])), 1.0)
                vel_eye = jnp.concatenate(
                    [jnp.zeros(6, jtj.dtype), jnp.ones(6, jtj.dtype)])
                jtj = jtj + lam * jnp.diag(vel_eye)
                grad = grad + lam * vel_eye * state
                cost = cost + lam * jnp.sum(state[6:] ** 2)
            return jtj, grad, cost

        def solve(pose0, cam_i, key_i, uv, mask):
            res = lm_solve(
                lambda p: neq(p, cam_i, key_i, uv, mask), pose0,
                max_nfev=self._max_nfev)
            # unit-noise pose covariance at the solution: inv(JtJ) (the
            # host scales by the residual variance); tiny ridge keeps
            # degenerate frames finite instead of inf
            jtj, _, _ = neq(res.x, cam_i, key_i, uv, mask)
            eye = jnp.eye(n_state, dtype=jtj.dtype)
            # ridge RELATIVE to the diagonal scale: JtJ entries sit near
            # 1e6 for px-scale residuals, so an absolute 1e-12 would be
            # invisible and a collinear frame could emit NaN instead of
            # the documented inf sentinel
            ridge = 1e-12 * jnp.maximum(jnp.max(jnp.diag(jtj)), 1.0)
            cov_unit = jnp.linalg.inv(jtj + ridge * eye)
            return res, cov_unit

        # packed output row [x(S) | cost | nit | status | cov(S*S)]: every
        # host path fetches ONE device array — the tunnel charges a fixed
        # ~0.1 s per fetched leaf, so an 8-leaf LMResult pytree costs more
        # in transport than the 1024-frame solve itself (S = 6, or 12
        # with the [pose | velocity] temporal model)
        PACK_W = n_state + 3 + n_state * n_state

        def pack_out(res, cov):
            return jnp.concatenate([
                res.x,
                res.cost[..., None],
                res.nit.astype(res.x.dtype)[..., None],
                res.status.astype(res.x.dtype)[..., None],
                cov.reshape(cov.shape[:-2] + (n_state * n_state,))],
                axis=-1)

        def solve_packed(pose0, cam_i, key_i, uv, mask):
            return pack_out(*solve(pose0, cam_i, key_i, uv, mask))

        self._pack_w = PACK_W
        self._solve = jax.jit(solve)
        self._solve_p = jax.jit(solve_packed)
        self._solve_batch = jax.jit(jax.vmap(solve))
        self._solve_batch_p = jax.jit(jax.vmap(solve_packed))
        self._residuals = jax.jit(residuals)

        # ---- device seeding: triangulate every key seen by >= 2 cameras,
        # rigid-fit the template onto the triangulated cloud per frame
        # (rigid_fit's rank-2 completion covers planar targets), and
        # forward-fill frames with too little data. Host PnP becomes a
        # rescue path instead of a per-frame cost (it was O(frames x
        # table) host time that dominated track_batch at 1k frames).
        from pycamset_tpu.models.camera_set import stack_cam_dists
        kmats_h = np.stack([np.asarray(camset[n].intrinsic, dtype=float)
                            for n in names]).astype(self._dtype)
        # het rigs: [sel | coefs] rows through the *_het undistortion
        dists_h, dists_het = stack_cam_dists(dists)
        dists_h = dists_h.astype(self._dtype)
        exts_h = np.stack([np.asarray(camset[n].extrinsic, dtype=float)
                           for n in names])
        proj_h = np.einsum("cij,cjk->cik",
                           kmats_h.astype(float),
                           exts_h[:, :3, :]).astype(self._dtype)

        def seed_batch(uv_grid, mask_grid):
            n_i, n_k, n_c = mask_grid.shape
            cam_rows = jnp.broadcast_to(jnp.arange(n_c), (n_i * n_k, n_c))
            # seeding-grade inhomogeneous DLT: the batched 4x4 eigh of the
            # homogeneous path costs ~3x the whole batch LM solve at 1k
            # frames; the 3x3 closed form is pure VPU arithmetic and the
            # seeds feed an LM refinement anyway
            pts = triangulate_observations(
                jnp.asarray(proj_h), jnp.asarray(kmats_h),
                jnp.asarray(dists_h), cam_rows,
                uv_grid.reshape(n_i * n_k, n_c, 2),
                mask_grid.reshape(n_i * n_k, n_c),
                method="inhomogeneous",
                het=dists_het).reshape(n_i, n_k, 3)
            seen = jnp.sum(mask_grid, axis=-1) >= 2.0          # (I,K)
            # unseen keys triangulate to garbage (possibly inf from a
            # zero homogeneous w); zero them before the weighted fit
            pts = jnp.where(seen[..., None],
                            jnp.nan_to_num(pts, nan=0.0, posinf=0.0,
                                           neginf=0.0), 0.0)
            w = seen.astype(uv_grid.dtype)
            frame_ok = jnp.sum(w, axis=-1) >= 3.0              # (I,)
            w_safe = jnp.where(frame_ok[:, None], w, jnp.ones_like(w))
            tpl_b = jnp.broadcast_to(jnp.asarray(tpl), (n_i,) + tpl.shape)
            rmat, t = jax.vmap(rigid_fit)(tpl_b, pts, w_safe)
            rod = jax.vmap(matrix_to_rodrigues)(rmat)
            seeds = jnp.nan_to_num(jnp.concatenate([rod, t], axis=-1))
            if timed:  # velocity seeds at 0; the LM recovers it
                seeds = jnp.concatenate([seeds, jnp.zeros_like(seeds)], -1)
            # forward-fill unseedable frames; leading ones take the first
            # valid seed (argmax finds the first True)
            init = jnp.where(jnp.any(frame_ok),
                             seeds[jnp.argmax(frame_ok)],
                             jnp.zeros((n_state,), seeds.dtype))

            def step(carry, sv):
                s, v = sv
                out = jnp.where(v, s, carry)
                return out, out

            _, filled = lax.scan(step, init, (seeds, frame_ok))
            return filled

        def solve_batch_seeded(uv_grid, mask_grid, cam_i, key_i, uv, mask):
            seeds = seed_batch(uv_grid, mask_grid)
            out = jax.vmap(solve_packed)(seeds, cam_i, key_i, uv, mask)
            return out, seeds

        def solve_stream(pose0, cam_i, key_i, uv, mask):
            # ordered video: each frame warm-starts from the previous
            # frame's solution; frames that lose the target (< 3 points
            # cannot pin 6 dof) carry the pose forward unchanged
            def step(carry, frame):
                ci, ki, uvf, mf = frame
                res, cov = solve(carry, ci, ki, uvf, mf)
                # enough detections to pin the state (6 dof needs 3
                # points; the 12-dof temporal state needs 6)
                tracked = jnp.sum(mf) >= n_state / 2.0
                nxt = jnp.where(tracked, res.x, carry)
                # an underdetermined solve may wander; report the carried
                # pose for lost frames, not wherever LM drifted — and an
                # inf cost, so the published rms never describes residuals
                # of a pose that was not actually evaluated
                cost = jnp.where(tracked, res.cost,
                                 jnp.asarray(jnp.inf, res.cost.dtype))
                return nxt, pack_out(res._replace(x=nxt, cost=cost), cov)

            _, out = lax.scan(step, pose0, (cam_i, key_i, uv, mask))
            return out

        self._seed_batch = jax.jit(seed_batch)
        self._solve_batch_seeded = jax.jit(solve_batch_seeded)
        self._solve_stream = jax.jit(solve_stream)

    # ---------------------------------------------------------------- frames

    def _obs_grids(self, dd_all: np.ndarray, n_frames: int):
        """(I, K, C, 2) uv grid + (I, K, C) mask from flattened rows —
        the device seeder's input layout. Shared with ServingTracker
        (one copy of the packing keeps artifact results bit-identical)."""
        im_c = dd_all[:, 1].astype(int)
        key_c = dd_all[:, -3].astype(int)
        cam_c = dd_all[:, 0].astype(int)
        uv_grid = np.zeros((n_frames, self.n_keys, self.n_cams, 2),
                           dtype=self._dtype)
        mask_grid = np.zeros((n_frames, self.n_keys, self.n_cams),
                             dtype=self._dtype)
        uv_grid[im_c, key_c, cam_c] = dd_all[:, -2:]
        mask_grid[im_c, key_c, cam_c] = 1.0
        return uv_grid, mask_grid

    def _pack_frame(self, dd: np.ndarray):
        """One frame's detection rows [cam, (im,) key..., u, v] -> padded
        static-shape arrays (cam_i, key_i, uv, mask)."""
        n_max = self.max_detections
        if dd is None or not len(dd):
            return (np.zeros(n_max, np.int64), np.zeros(n_max, np.int64),
                    np.zeros((n_max, 2)), np.zeros(n_max))
        cam_i = dd[:, 0].astype(np.int64)
        key_i = dd[:, -3].astype(np.int64)
        uv = dd[:, -2:].astype(np.float64)
        if len(dd) > n_max:
            import logging
            logging.warning(
                f"frame has {len(dd)} detections > capacity {n_max}; "
                "truncating (raise max_detections)")
            cam_i, key_i, uv = cam_i[:n_max], key_i[:n_max], uv[:n_max]
        n = len(cam_i)
        pad = n_max - n
        return (np.concatenate([cam_i, np.zeros(pad, np.int64)]),
                np.concatenate([key_i, np.zeros(pad, np.int64)]),
                np.concatenate([uv, np.zeros((pad, 2))]),
                np.concatenate([np.ones(n), np.zeros(pad)]))

    def _pnp_seed(self, det: TargetDetection) -> np.ndarray | None:
        """Host PnP seed (target->world pose6) from the first camera that
        localises the target; None when no camera does."""
        dd = det.return_flattened_keys(
            self.target.point_data.shape[:-1]).get_data()
        return self._pnp_seed_rows(dd)

    def _pnp_seed_rows(self, rows: np.ndarray | None) -> np.ndarray | None:
        """PnP seed from one frame's flattened-key rows [cam, im, key, u, v].

        Works directly on the row slice (track_batch slices the sorted
        table once; routing each frame through TargetDetection.get would
        rescan the whole table per frame — O(frames x table) host time
        that dominated the batch at 1k frames).
        """
        import cv2
        if rows is None or not len(rows):
            return None
        tpl = np.asarray(self._tpl, dtype=np.float64)
        cams_col = rows[:, 0].astype(int)
        for ci, name in enumerate(self.camset.get_names()):
            sel = rows[cams_col == ci]
            if len(sel) < 6:
                continue
            cam = self.camset[name]
            obj = tpl[sel[:, -3].astype(int)]
            obs = sel[:, -2:].astype(np.float64)
            dist = np.ravel(np.asarray(cam.distortion_coefs, dtype=float))
            if dist.size == 4:  # the fisheye marker width
                obs = cv2.fisheye.undistortPoints(
                    obs.reshape(1, -1, 2),
                    np.asarray(cam.intrinsic, dtype=float),
                    dist).reshape(-1, 2)
                kmat, dist = np.eye(3), np.zeros(5)
            else:
                kmat = np.asarray(cam.intrinsic, dtype=float)
            n_sols, rvecs, tvecs, errs = cv2.solvePnPGeneric(
                obj.astype(np.float32), obs.astype(np.float32), kmat, dist)
            if not n_sols:
                continue
            best = int(np.argmin(errs))
            pose_c = make_4x4h_tform(rvecs[best], tvecs[best])
            if np.any(np.isnan(pose_c)):
                continue
            rvec, tvec = ext_4x4_to_rod(cam.cam_to_world @ pose_c)
            return np.concatenate([rvec, tvec])
        return None

    def _widen_state(self, init) -> np.ndarray:
        """User seed (4x4, 6-vec or full state) -> (n_state,) row
        (velocity seeds at 0 under the temporal model)."""
        init = np.asarray(init, dtype=float)
        if init.shape == (4, 4):
            init = np.concatenate(ext_4x4_to_rod(init))
        init = np.ravel(init)
        if init.size == 6 and self._n_state == 12:
            init = np.concatenate([init, np.zeros(6)])
        if init.size != self._n_state:
            raise ValueError(f"seed must be a 4x4, a 6-vector or a "
                             f"{self._n_state}-state; got {init.shape}")
        return init

    def _pnp_rescue(self, out, seeds_d, dd_all, bounds, mask, dev_args):
        """Re-seed frames whose rms signals a failed solve with host PnP
        and re-dispatch; keep whichever solve is cheaper per frame.

        Device triangulate+rigid-fit seeds are excellent when >= 3 keys
        stereo-triangulate, but a frame seen well by only ONE camera can
        seed badly; PnP handles exactly that case, so it runs as a
        targeted rescue instead of a per-frame cost.

        ``out`` is the packed host-side (I, PACK_W) result matrix.
        """
        s = self._n_state
        n_used = np.asarray(mask).sum(axis=1)
        rms = np.sqrt(out[:, s] / np.maximum(2 * n_used, 1))
        med = float(np.median(rms[n_used >= 4])) if np.any(n_used >= 4) else 0.0
        bad = (rms > max(10.0 * med, 2.0)) & (n_used >= 4)
        if not np.any(bad):
            return out
        seeds = np.array(jax.device_get(seeds_d))
        n_fixed = 0
        for i in np.nonzero(bad)[0]:
            sv = self._pnp_seed_rows(dd_all[bounds[i]:bounds[i + 1]])
            if sv is not None:
                seeds[i] = self._widen_state(sv)
                n_fixed += 1
        if not n_fixed:
            return out
        out2 = np.asarray(jax.device_get(self._solve_batch_p(
            jnp.asarray(seeds, dtype=self._dtype), *dev_args)))
        pick = bad & (out2[:, s] < out[:, s])
        return np.where(pick[:, None], out2, out)

    # ----------------------------------------------------------------- API

    def track(self, detection: TargetDetection, init=None):
        """Pose of the target in ONE frame's detections.

        :param init: 6-vector or 4x4 seed; defaults to the previous frame's
            result (warm start), falling back to host PnP.
        :return: (pose 4x4 target->world, info dict with rms/nit/n_used).
        """
        if not detection.has_data():
            raise ValueError("frame has no detections")
        dd = detection.return_flattened_keys(
            self.target.point_data.shape[:-1]).get_data()
        if dd is None or not len(dd):
            raise ValueError("frame has no detections")
        if init is None:
            init = self._last_pose
        if init is None:
            init = self._pnp_seed(detection)
        if init is None:
            raise ValueError(
                "no PnP seed found and no init given for the first frame")
        init = self._widen_state(np.asarray(init, dtype=float))

        s = self._n_state
        cam_i, key_i, uv, mask = self._pack_frame(dd)
        out = np.asarray(jax.device_get(self._solve_p(
            jnp.asarray(init, dtype=self._dtype),
            jnp.asarray(cam_i), jnp.asarray(key_i),
            jnp.asarray(uv, dtype=self._dtype),
            jnp.asarray(mask, dtype=self._dtype))))  # ONE transfer
        pose6, cost = out[:6], float(out[s])
        cov_unit = out[s + 3:s + 3 + s * s].reshape(s, s)
        self._last_pose = out[:s]
        n_used = int(mask.sum())
        dof = 2 * n_used - s
        if dof >= 1:
            sigma2 = cost / dof
            pose_sigma = np.sqrt(np.clip(np.diag(cov_unit)[:6] * sigma2,
                                         0.0, None))
            # degenerate-but-overdetermined geometry (e.g. collinear
            # points) can still blow through the ridge: keep the inf
            # sentinel contract instead of leaking NaN
            pose_sigma[~np.isfinite(pose_sigma)] = np.inf
        else:
            # 6 dof from <= 3 points: the pose interpolates the data and
            # the residuals say nothing about its error — report inf, not
            # a confident 0
            pose_sigma = np.full(6, np.inf)
        info = {"rms": float(np.sqrt(cost / (2 * n_used))),
                "nit": int(out[s + 1]), "n_used": n_used,
                "status": int(out[s + 2]), "pose_sigma": pose_sigma}
        if self._timed:
            info["velocity"] = out[6:12]  # [rvec_dot | t_dot] per frame
        return make_4x4h_tform(pose6[:3], pose6[3:]), info

    def track_batch(self, detection: TargetDetection, inits=None,
                    seed_mode: str = "auto"):
        """Poses for EVERY image in the detection table, in one dispatch.

        :param inits: (I,6)/(I,4,4) seeds; default device seeding (below).
        :param seed_mode: how to seed when ``inits`` is None. ``'auto'``
            (default) computes seeds ON DEVICE inside the solve dispatch —
            triangulate + rigid-fit per frame — then host-PnP-rescues any
            frame whose rms signals a failed solve; ``'device'`` skips the
            rescue; ``'pnp'`` is the per-frame host PnP path (the previous
            behaviour, ~20x slower end-to-end at 1k frames).
        :return: (poses (I,4,4), info dict of per-frame rms/nit arrays).
        """
        if not detection.has_data():
            raise ValueError("detection table has no images")
        if seed_mode not in ("auto", "device", "pnp"):
            # an unknown mode must not silently fall through to the
            # ~20x-slower per-frame host PnP branch
            raise ValueError(f"unknown seed_mode {seed_mode!r}; expected "
                             "'auto', 'device' or 'pnp'")
        # one pass over the whole table (per-frame .get() would be O(I*N))
        dd_all, bounds, n_frames, mask, dev_args = self._pack_table(detection)

        use_device_seed = inits is None and seed_mode in ("auto", "device")
        if use_device_seed:
            uv_grid, mask_grid = self._obs_grids(dd_all, n_frames)
            out_d, seeds_d = self._solve_batch_seeded(
                jnp.asarray(uv_grid), jnp.asarray(mask_grid), *dev_args)
            out = np.asarray(jax.device_get(out_d))  # ONE transfer
            if seed_mode == "auto":
                out = self._pnp_rescue(
                    out, seeds_d, dd_all, bounds, mask, dev_args)
        else:
            if inits is not None:
                inits = np.asarray(inits, dtype=float)
                if inits.ndim == 3:  # (I,4,4)
                    inits = np.stack([np.concatenate(ext_4x4_to_rod(t))
                                      for t in inits])
                seeds = [self._widen_state(t) for t in inits]
            else:  # seed_mode == 'pnp'
                seeds, last = [], None
                for i in range(n_frames):
                    seed = self._pnp_seed_rows(dd_all[bounds[i]:bounds[i + 1]])
                    if seed is None:
                        seed = last if last is not None else np.zeros(6)
                    last = seed
                    seeds.append(self._widen_state(seed))
            out = np.asarray(jax.device_get(self._solve_batch_p(
                jnp.asarray(np.stack(seeds), dtype=self._dtype),
                *dev_args)))  # ONE transfer
        return self._finalize_batch(out, mask)

    def track_stream(self, detection: TargetDetection, init=None):
        """Sequential warm-start tracking over a video sequence, in ONE
        dispatch: each frame's LM solve is seeded by the previous frame's
        solution (`lax.scan`), so temporal coherence replaces per-frame
        seeding. Frames that lose the target (< 3 detections) carry the
        previous pose forward (and report inf ``pose_sigma``).

        Use this for ordered video; `track_batch` for unordered frames
        (it triangulate-seeds each frame independently, in parallel).

        :param init: 6-vector or 4x4 seed for the FIRST frame; default
            host PnP on the first frame that any camera localises.
        :return: (poses (I,4,4), info dict of per-frame rms/nit arrays).
        """
        if not detection.has_data():
            raise ValueError("detection table has no images")
        dd_all, bounds, n_frames, mask, dev_args = self._pack_table(detection)
        if init is None:
            for i in range(n_frames):
                init = self._pnp_seed_rows(dd_all[bounds[i]:bounds[i + 1]])
                if init is not None:
                    break
        if init is None:
            raise ValueError("no PnP seed found in any frame and no init "
                             "given for track_stream")
        init = self._widen_state(init)
        out = np.asarray(jax.device_get(self._solve_stream(
            jnp.asarray(init, dtype=self._dtype), *dev_args)))
        # recover frames the warm start lost (target jumped, occlusion
        # ended on a different pose): PnP-reseed and keep the better solve
        out = self._pnp_rescue(out, out[:, :self._n_state], dd_all, bounds,
                               mask, dev_args)
        return self._finalize_batch(out, mask)

    def _pack_table(self, detection: TargetDetection):
        """Whole-table packing shared by the batch paths: flatten + sort
        once, then ONE vectorised scatter into static (I, N) device args
        (a per-frame Python pack loop costs O(frames) host time — it was
        a visible slice of the 1k-frame batch budget on a one-core host)."""
        flat = detection.return_flattened_keys(
            self.target.point_data.shape[:-1])
        dd_all = flat.get_data()
        n_frames = int(detection.max_ims)
        n_max = self.max_detections
        if dd_all is None or not len(dd_all):
            dd_all = np.zeros((0, 5))
        elif np.any(np.diff(dd_all[:, 1]) < 0):
            # frame-sort only when needed (detection tables usually arrive
            # im-ordered; the TargetDetection.sort path costs a defensive
            # copy per call — a visible slice of the 1k-frame budget)
            dd_all = dd_all[np.argsort(dd_all[:, 1], kind="stable")]
        bounds = np.searchsorted(dd_all[:, 1], np.arange(n_frames + 1))
        im_col = dd_all[:, 1].astype(np.int64)
        pos = np.arange(len(dd_all)) - bounds[im_col]  # slot within frame
        keep = pos < n_max
        if not np.all(keep):
            import logging
            logging.warning(
                f"{int((~keep).sum())} detections beyond the per-frame "
                f"capacity {n_max} truncated (raise max_detections)")
        cam_i = np.zeros((n_frames, n_max), np.int64)
        key_i = np.zeros((n_frames, n_max), np.int64)
        uv = np.zeros((n_frames, n_max, 2))
        mask = np.zeros((n_frames, n_max))
        r, c = im_col[keep], pos[keep]
        cam_i[r, c] = dd_all[keep, 0].astype(np.int64)
        key_i[r, c] = dd_all[keep, -3].astype(np.int64)
        uv[r, c] = dd_all[keep, -2:]
        mask[r, c] = 1.0
        dev_args = (jnp.asarray(cam_i), jnp.asarray(key_i),
                    jnp.asarray(uv, dtype=self._dtype),
                    jnp.asarray(mask, dtype=self._dtype))
        return dd_all, bounds, n_frames, mask, dev_args

    def _finalize_batch(self, out, mask):
        """Packed (I, PACK_W) result rows [x|cost|nit|status|cov] -> API
        (state width 6, or 12 under the temporal [pose|velocity] model —
        ServingTracker reuses this unbound with its own ``_n_state``)."""
        s = getattr(self, "_n_state", 6)
        pose6, cost = out[:, :6], out[:, s]
        cov_unit = out[:, s + 3:s + 3 + s * s].reshape(-1, s, s)
        self._last_pose = out[-1, :s]
        n_used = mask.sum(axis=1)
        rms = np.sqrt(cost / np.maximum(2 * n_used, 1))
        dof = 2 * n_used - s
        sigma2 = cost / np.maximum(dof, 1)
        sigma_all = np.sqrt(np.clip(
            np.einsum("fii->fi", cov_unit) * sigma2[:, None], 0.0, None))
        pose_sigma = sigma_all[:, :6]
        # underdetermined frames (<= 3 points) are unconstrained, not
        # perfectly certain; degenerate geometry keeps the inf sentinel
        # instead of leaking NaN through the ridged inverse
        pose_sigma[dof < 1] = np.inf
        pose_sigma[~np.isfinite(pose_sigma)] = np.inf
        # full 6x6 covariances feed the trajectory smoother
        # (pycamset_tpu/smoothing.py); frames the solver lost are marked
        # non-finite so the smoother coasts them on its motion prior
        pose_cov = cov_unit[:, :6, :6] * sigma2[:, None, None]
        pose_cov[dof < 1] = np.inf
        poses = np.stack([make_4x4h_tform(p[:3], p[3:]) for p in pose6])
        info = {"rms": rms, "nit": out[:, s + 1].astype(int),
                "n_used": n_used, "pose_sigma": pose_sigma,
                "pose_cov": pose_cov}
        if s == 12:
            info["velocity"] = out[:, 6:12]      # [rvec_dot | t_dot]/frame
            vel_sigma = sigma_all[:, 6:12]
            vel_sigma[dof < 1] = np.inf
            info["velocity_sigma"] = vel_sigma
        return poses, info
