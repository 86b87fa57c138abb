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

from pycamset_tpu.config import default_device_dtype
from pycamset_tpu.models.camera_set import CameraSet
from pycamset_tpu.models.detections import TargetDetection
from pycamset_tpu.ops.projection import intr9_from_k_dist, project_cam_points
from pycamset_tpu.ops.transforms import pose_apply
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
    """

    def __init__(self, camset: CameraSet, target, max_detections: int | None = None,
                 loss: str = "linear", f_scale: float = 1.0,
                 max_nfev: int = 25):
        self.camset = camset
        self.target = target
        names = camset.get_names()
        # CPU = f64, TPU = f32 (+highest matmul precision), like the solver
        self._dtype = default_device_dtype()
        from pycamset_tpu.optim.handlers import infer_shared_n_dist
        dists = [np.reshape(camset[n].distortion_coefs, -1) for n in names]
        n_dist = infer_shared_n_dist(dists)
        self._intr = jnp.asarray(np.stack([
            np.asarray(intr9_from_k_dist(camset[n].intrinsic, d, n_dist=n_dist))
            for n, d in zip(names, dists)]), dtype=self._dtype)
        self._extr = jnp.asarray(np.stack([
            np.concatenate(ext_4x4_to_rod(camset[n].extrinsic))
            for n in names]), dtype=self._dtype)
        self._tpl = jnp.asarray(target.point_data.reshape(-1, 3),
                                dtype=self._dtype)
        self.n_keys = int(self._tpl.shape[0])
        self.n_cams = len(names)
        self.max_detections = int(max_detections or self.n_cams * self.n_keys)
        self._max_nfev = int(max_nfev)
        rho_fn, weight_fn = make_loss(loss, f_scale)
        self._rho, self._weight = rho_fn, weight_fn
        self._robust = loss != "linear"
        self._last_pose: np.ndarray | None = None

        intr, extr, tpl = self._intr, self._extr, self._tpl
        robust, rho, weight = self._robust, self._rho, self._weight

        def residuals(pose6, cam_i, key_i, uv, mask):
            world = pose_apply(pose6, tpl[key_i])             # (N,3)
            xc = jax.vmap(pose_apply)(extr[cam_i], world)     # (N,3)
            pred = jax.vmap(project_cam_points)(intr[cam_i], xc)
            return (pred - uv) * mask[:, None]

        def neq(pose6, cam_i, key_i, uv, mask):
            r = residuals(pose6, cam_i, key_i, uv, mask)      # (N,2)
            j = jax.jacfwd(residuals)(pose6, cam_i, key_i, uv, mask)
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
            return jtj, grad, cost

        def solve(pose0, cam_i, key_i, uv, mask):
            res = lm_solve(
                lambda p: neq(p, cam_i, key_i, uv, mask), pose0,
                max_nfev=self._max_nfev)
            # unit-noise pose covariance at the solution: inv(JtJ) (the
            # host scales by the residual variance); tiny ridge keeps
            # degenerate frames finite instead of inf
            jtj, _, _ = neq(res.x, cam_i, key_i, uv, mask)
            eye = jnp.eye(6, dtype=jtj.dtype)
            # ridge RELATIVE to the diagonal scale: JtJ entries sit near
            # 1e6 for px-scale residuals, so an absolute 1e-12 would be
            # invisible and a collinear frame could emit NaN instead of
            # the documented inf sentinel
            ridge = 1e-12 * jnp.maximum(jnp.max(jnp.diag(jtj)), 1.0)
            cov_unit = jnp.linalg.inv(jtj + ridge * eye)
            return res, cov_unit

        self._solve = jax.jit(solve)
        self._solve_batch = jax.jit(jax.vmap(solve))
        self._residuals = jax.jit(residuals)

    # ---------------------------------------------------------------- frames

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
        for cam in self.camset:
            pose_c = self.target.target_pose_in_cam_image(det, cam, mode="nan")
            if not np.any(np.isnan(pose_c)):
                rvec, tvec = ext_4x4_to_rod(cam.cam_to_world @ pose_c)
                return np.concatenate([rvec, tvec])
        return None

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
        init = np.asarray(init, dtype=float)
        if init.shape == (4, 4):
            init = np.concatenate(ext_4x4_to_rod(init))

        cam_i, key_i, uv, mask = self._pack_frame(dd)
        res, cov_unit = self._solve(
            jnp.asarray(init, dtype=self._dtype),
            jnp.asarray(cam_i), jnp.asarray(key_i),
            jnp.asarray(uv, dtype=self._dtype),
            jnp.asarray(mask, dtype=self._dtype))
        res, cov_unit = jax.device_get((res, cov_unit))  # ONE transfer
        pose6 = np.asarray(res.x)
        self._last_pose = pose6
        n_used = int(mask.sum())
        dof = 2 * n_used - 6
        if dof >= 1:
            sigma2 = float(res.cost) / dof
            pose_sigma = np.sqrt(np.clip(np.diag(cov_unit) * sigma2,
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
        info = {"rms": float(np.sqrt(float(res.cost) / (2 * n_used))),
                "nit": int(res.nit), "n_used": n_used,
                "status": int(res.status), "pose_sigma": pose_sigma}
        return make_4x4h_tform(pose6[:3], pose6[3:]), info

    def track_batch(self, detection: TargetDetection, inits=None):
        """Poses for EVERY image in the detection table, in one dispatch.

        :param inits: (I,6)/(I,4,4) seeds; default host PnP with
            forward-fill for frames no camera localised.
        :return: (poses (I,4,4), info dict of per-frame rms/nit arrays).
        """
        if not detection.has_data():
            raise ValueError("detection table has no images")
        # one pass over the whole table (per-frame .get() would be O(I*N))
        flat = detection.return_flattened_keys(
            self.target.point_data.shape[:-1]).sort(["im_num"])
        dd_all = flat.get_data()
        n_frames = int(detection.max_ims)
        bounds = np.searchsorted(dd_all[:, 1], np.arange(n_frames + 1))
        packs, seeds = [], []
        last = None
        for i in range(n_frames):
            dd = dd_all[bounds[i]:bounds[i + 1]]
            packs.append(self._pack_frame(dd))
            if inits is None:
                seed = self._pnp_seed(detection.get(im_num=i))
                if seed is None:
                    seed = last if last is not None else np.zeros(6)
                last = seed
                seeds.append(seed)
        if inits is not None:
            inits = np.asarray(inits, dtype=float)
            if inits.ndim == 3:  # (I,4,4)
                inits = np.stack([np.concatenate(ext_4x4_to_rod(t))
                                  for t in inits])
            seeds = list(inits)

        cam_i, key_i, uv, mask = (np.stack([p[i] for p in packs])
                                  for i in range(4))
        res, cov_unit = self._solve_batch(
            jnp.asarray(np.stack(seeds), dtype=self._dtype),
            jnp.asarray(cam_i), jnp.asarray(key_i),
            jnp.asarray(uv, dtype=self._dtype),
            jnp.asarray(mask, dtype=self._dtype))
        res, cov_unit = jax.device_get((res, cov_unit))  # ONE transfer
        pose6 = np.asarray(res.x)
        self._last_pose = pose6[-1]
        n_used = mask.sum(axis=1)
        rms = np.sqrt(np.asarray(res.cost) / np.maximum(2 * n_used, 1))
        dof = 2 * n_used - 6
        sigma2 = np.asarray(res.cost) / np.maximum(dof, 1)
        pose_sigma = np.sqrt(np.clip(
            np.einsum("fii->fi", np.asarray(cov_unit))
            * sigma2[:, None], 0.0, None))
        # underdetermined frames (<= 3 points) are unconstrained, not
        # perfectly certain; degenerate geometry keeps the inf sentinel
        # instead of leaking NaN through the ridged inverse
        pose_sigma[dof < 1] = np.inf
        pose_sigma[~np.isfinite(pose_sigma)] = np.inf
        poses = np.stack([make_4x4h_tform(p[:3], p[3:]) for p in pose6])
        return poses, {"rms": rms, "nit": np.asarray(res.nit),
                       "n_used": n_used, "pose_sigma": pose_sigma}
