"""Streaming 3D marker reconstruction against a calibrated rig.

The MoCap serving path for NON-rigid marker sets: where
:class:`~pycamset_tpu.tracking.TargetTracker` assumes a rigid known
target, :class:`MarkerTriangulator` answers "where are the M markers in
each frame" — per-frame, per-marker 3D positions with honest sigmas,
for wands, actors, tools or any labelled point set.

TPU-native shape: the whole batch solves in ONE jitted dispatch over a
static (frames, markers, cams) observation grid —

1. accuracy-grade homogeneous DLT seed per (frame, marker)
   (ops/triangulation.py);
2. a fixed-iteration 3-dof Gauss-Newton polish on the TRUE distorted
   pixel reprojection (the DLT minimises an algebraic error on
   undistorted rays; the polish minimises the actual pixel residual
   through the full lens model — the gold-standard triangulation);
3. first-order position covariance from the reprojection Jacobian at
   the solution (sigma^2 (J^T J)^-1, dof-scaled; markers seen by < 2
   cameras report NaN positions and inf sigmas).

Results pack into one fetched array (the tunnel charges per leaf).

Beyond the reference: its triangulation (`multi_cam_triangulate`) is a
host-loop DLT without refinement or uncertainty
(pyCamSet/cameras/camera_set.py:343-402).
"""
from __future__ import annotations

import numpy as np

from pycamset_tpu.config import default_device_dtype
from pycamset_tpu.models.detections import TargetDetection
from pycamset_tpu.utils.general_utils import ext_4x4_to_rod


class MarkerTriangulator:
    """Precompiled per-frame marker-cloud reconstruction.

    :param camset: the calibrated rig.
    :param n_markers: static marker count per frame (marker ids in the
        detection tables must be < n_markers).
    :param refine_iters: Gauss-Newton polish iterations on the pixel
        reprojection (0 = raw DLT).
    """

    def __init__(self, camset, n_markers: int, refine_iters: int = 3):
        import jax
        import jax.numpy as jnp

        from pycamset_tpu.ops.projection import pack_rig_intrinsics
        from pycamset_tpu.ops.transforms import pose_apply
        from pycamset_tpu.ops.triangulation import triangulate_nviews

        self.camset = camset
        self.n_markers = int(n_markers)
        names = camset.get_names()
        self.n_cams = len(names)
        self._dtype = default_device_dtype()
        dists = [np.reshape(camset[n].distortion_coefs, -1) for n in names]
        # jit-captured constants stay HOST numpy (CLAUDE.md invariant);
        # het rigs pack the selector layout (mixed fisheye+Brown serve
        # like uniform rigs)
        intr_rows, project_fn = pack_rig_intrinsics(
            [camset[n].intrinsic for n in names], dists)
        intr_h = intr_rows.astype(self._dtype)
        extr_h = np.stack([
            np.concatenate(ext_4x4_to_rod(camset[n].extrinsic))
            for n in names]).astype(self._dtype)
        kmats_h = np.stack([np.asarray(camset[n].intrinsic, dtype=float)
                            for n in names]).astype(self._dtype)
        exts4 = np.stack([np.asarray(camset[n].extrinsic, dtype=float)
                          for n in names])
        proj_h = np.einsum("cij,cjk->cik", kmats_h.astype(float),
                           exts4[:, :3, :]).astype(self._dtype)
        self._und = {n: camset[n] for n in names}

        def solve_one(und_uv, uv, mask):
            """One (frame, marker): (C,2) undistorted + raw obs -> packed
            [x y z | cost | n_views | sx sy sz]."""
            intr_j, extr_j, proj_j = map(jnp.asarray,
                                         (intr_h, extr_h, proj_h))
            n_views = jnp.sum(mask)
            x0 = triangulate_nviews(proj_j, und_uv, mask)
            x0 = jnp.nan_to_num(x0, nan=0.0, posinf=0.0, neginf=0.0)

            def residuals(x):
                xc = jax.vmap(pose_apply, in_axes=(0, None))(extr_j, x)
                z = xc[..., 2]
                z_safe = jnp.where(jnp.abs(z) > 1e-6, z,
                                   jnp.asarray(1e-6, z.dtype))
                xc = jnp.concatenate([xc[..., :2], z_safe[..., None]], -1)
                pred = jax.vmap(project_fn)(intr_j, xc)
                return (pred - uv) * mask[:, None]          # (C, 2)

            def gn_step(x, _):
                r = residuals(x)
                j = jax.jacfwd(residuals)(x)                # (C, 2, 3)
                jtj = jnp.einsum("cta,ctb->ab", j, j)
                g = jnp.einsum("cta,ct->a", j, r)
                ridge = 1e-9 * jnp.maximum(jnp.max(jnp.diag(jtj)), 1.0)
                dx = jnp.linalg.solve(
                    jtj + ridge * jnp.eye(3, dtype=x.dtype), g)
                # a polish step must not explode an ill-seeded point
                ok = jnp.isfinite(dx).all() & (n_views >= 2.0)
                return jnp.where(ok, x - dx, x), None

            x, _ = jax.lax.scan(gn_step, x0, None, length=refine_iters)
            r = residuals(x)
            cost = jnp.sum(r * r)
            j = jax.jacfwd(residuals)(x)
            jtj = jnp.einsum("cta,ctb->ab", j, j)
            ridge = 1e-12 * jnp.maximum(jnp.max(jnp.diag(jtj)), 1.0)
            cov = jnp.linalg.inv(jtj + ridge * jnp.eye(3, dtype=x.dtype))
            return jnp.concatenate([
                x, cost[None], n_views[None], jnp.diag(cov)])

        def solve_grid(und_grid, uv_grid, mask_grid):
            return jax.vmap(jax.vmap(solve_one))(und_grid, uv_grid,
                                                 mask_grid)

        self._solve = jax.jit(solve_grid)

    # ----------------------------------------------------------------- API

    def _grids(self, dd, n_frames):
        m, c = self.n_markers, self.n_cams
        uv = np.zeros((n_frames, m, c, 2), dtype=self._dtype)
        und = np.zeros((n_frames, m, c, 2), dtype=self._dtype)
        mask = np.zeros((n_frames, m, c), dtype=self._dtype)
        ci = dd[:, 0].astype(int)
        ji = dd[:, 1].astype(int)
        ki = dd[:, 2].astype(int)
        uv[ji, ki, ci] = dd[:, 3:5]
        mask[ji, ki, ci] = 1.0
        # undistort per camera in bulk (host, vectorised)
        names = self.camset.get_names()
        for c_i, name in enumerate(names):
            sel = np.flatnonzero(ci == c_i)
            if sel.size:
                und[ji[sel], ki[sel], c_i] = np.asarray(
                    self._und[name].undistort_points(dd[sel, 3:5]))
        return und, uv, mask

    def reconstruct(self, detections):
        """Per-frame marker positions for a whole capture, one dispatch.

        :param detections: TargetDetection or raw rows
            ``[cam, frame, marker, u, v]``.
        :returns: (points (I, M, 3) — NaN where < 2 cameras saw the
            marker, info dict with ``rms`` (I, M), ``n_views`` (I, M),
            ``sigma`` (I, M, 3) 1-sigma per axis).
        """
        import jax
        import jax.numpy as jnp

        if isinstance(detections, TargetDetection):
            dd = detections.get_data()
        else:
            dd = np.asarray(detections, dtype=float)
        if dd is None or dd.ndim != 2 or dd.shape[1] != 5 or not len(dd):
            raise ValueError("detections must be non-empty rows "
                             "[cam, frame, marker, u, v]")
        if dd[:, 2].max() >= self.n_markers:
            raise ValueError(
                f"marker id {int(dd[:, 2].max())} >= n_markers "
                f"{self.n_markers}")
        n_frames = int(dd[:, 1].max()) + 1
        und, uv, mask = self._grids(dd, n_frames)
        out = np.asarray(jax.device_get(self._solve(
            jnp.asarray(und), jnp.asarray(uv),
            jnp.asarray(mask))))                        # ONE transfer
        pts = out[..., :3].astype(float)
        cost = out[..., 3]
        n_views = out[..., 4].astype(int)
        dof = np.maximum(2 * n_views - 3, 0)
        sigma2 = np.where(dof >= 1, cost / np.maximum(dof, 1), np.inf)
        sigma = np.sqrt(np.clip(out[..., 5:8], 0.0, None)
                        * sigma2[..., None])
        sigma[~np.isfinite(sigma)] = np.inf
        unseen = n_views < 2
        pts[unseen] = np.nan
        sigma[unseen] = np.inf
        rms = np.sqrt(cost / np.maximum(2 * n_views, 1))
        rms[unseen] = np.nan
        return pts, {"rms": rms, "n_views": n_views, "sigma": sigma}
