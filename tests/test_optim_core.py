"""Synthetic bundle-adjustment tests for the optimisation core.

Generates a known rig + target, perturbs the parameters, and checks the
device-resident LM recovers the ground truth (zero-noise => ~zero cost).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pycamset_tpu.optim.blocks import (
    Extrinsic3D, FreePoint, Projection, TemplatePoints)
from pycamset_tpu.optim.chain import OptimFunction
from pycamset_tpu.optim.lm import lm_solve, lm_solve_masked
from pycamset_tpu.optim.residuals import (
    build_detection_arrays, make_neq_fn, make_residual_fn)
from pycamset_tpu.ops.projection import project_target_points

RNG = np.random.default_rng(3)


def make_synthetic(n_cams=3, n_ims=8, grid=6, noise=0.0):
    """Ground-truth rig: cams around origin, target grid moved through poses."""
    tpl = np.stack(np.meshgrid(np.arange(grid), np.arange(grid)), -1)
    tpl = np.concatenate([tpl.reshape(-1, 2) * 0.04, np.zeros((grid * grid, 1))], 1)
    n_keys = tpl.shape[0]

    intr = np.tile([1000.0, 500, 1000, 500, 0, 0, 0, 0, 0], (n_cams, 1))
    intr[:, 4] = RNG.uniform(-0.2, -0.05, n_cams)   # k1
    intr[:, 5] = RNG.uniform(0.0, 0.05, n_cams)     # k2

    extr = np.zeros((n_cams, 6))
    for c in range(n_cams):
        extr[c, :3] = RNG.normal(size=3) * 0.1
        extr[c, 3:] = [0.1 * c - 0.1, 0.05 * c, 1.0]

    poses = np.zeros((n_ims, 6))
    for i in range(n_ims):
        poses[i, :3] = RNG.normal(size=3) * 0.2
        poses[i, 3:] = RNG.normal(size=3) * 0.05 + [0.0, 0.0, 0.3]

    # observations: every cam sees every point in every image
    rows = []
    for c in range(n_cams):
        for i in range(n_ims):
            uv = np.array(jax.vmap(
                lambda p: project_target_points(
                    jnp.array(intr[c]), jnp.array(extr[c]),
                    jnp.array(poses[i]), p))(jnp.array(tpl)))
            uv = uv + RNG.normal(size=uv.shape) * noise
            for k in range(n_keys):
                rows.append([c, i, k, uv[k, 0], uv[k, 1]])
    dd = np.array(rows)
    return intr, extr, poses, tpl, dd


class TestTemplateBA:
    def test_lm_recovers_truth(self):
        intr, extr, poses, tpl, dd = make_synthetic()
        op_fun = OptimFunction([Projection(), Extrinsic3D(), TemplatePoints()])
        struct = op_fun.param_struct(intr.shape[0], poses.shape[0], tpl.shape[0])
        det = build_detection_arrays(op_fun, struct, dd, tpl, pad_multiple=256)

        true_full = np.concatenate([intr.ravel(), extr.ravel(), poses.ravel()])
        assert struct.total == true_full.size

        # residuals at truth are ~0
        residual = jax.jit(make_residual_fn(op_fun))
        darrs = det.as_device(jnp.float64)
        r0 = np.array(residual(jnp.array(true_full), *darrs))
        assert np.abs(r0[:det.n_real]).max() < 1e-9

        # gauge: fix pose 0 (reference fixes fixed_pose=0)
        unfixed = np.ones(struct.total, dtype=bool)
        pose_sl = struct.group_slice(2)
        unfixed[pose_sl.start:pose_sl.start + 6] = False

        # perturb the free params
        x_full = true_full.copy()
        x_full[unfixed] += RNG.normal(size=unfixed.sum()) * np.concatenate([
            np.tile([2.0, 2, 2, 2, 1e-3, 1e-4, 1e-4, 1e-4, 1e-5], intr.shape[0]),
            np.tile([5e-3] * 6, extr.shape[0]),
            np.tile([5e-3] * 6, poses.shape[0] - 1),
        ])

        neq = make_neq_fn(op_fun)
        neq_full = jax.jit(lambda p: neq(p, *darrs))
        free_idx = np.where(unfixed)[0]
        res = lm_solve_masked(neq_full, jnp.array(true_full * 0 + x_full),
                              free_idx, jnp.array(x_full[free_idx]),
                              max_nfev=60)
        final_rms = float(np.sqrt(res.cost / (2 * det.n_real)))
        assert final_rms < 1e-6, f"LM failed to converge: rms {final_rms}"
        # parameters recovered (zero-noise => exact up to solver tolerance)
        np.testing.assert_allclose(np.array(res.x), true_full[free_idx],
                                   atol=1e-5, rtol=1e-5)

    def test_lm_with_noise_reaches_noise_floor(self):
        intr, extr, poses, tpl, dd = make_synthetic(noise=0.3)
        op_fun = OptimFunction([Projection(), Extrinsic3D(), TemplatePoints()])
        struct = op_fun.param_struct(intr.shape[0], poses.shape[0], tpl.shape[0])
        det = build_detection_arrays(op_fun, struct, dd, tpl, pad_multiple=256)
        darrs = det.as_device(jnp.float64)

        true_full = np.concatenate([intr.ravel(), extr.ravel(), poses.ravel()])
        unfixed = np.ones(struct.total, dtype=bool)
        pose_sl = struct.group_slice(2)
        unfixed[pose_sl.start:pose_sl.start + 6] = False
        x_full = true_full.copy()
        x_full[unfixed] += RNG.normal(size=unfixed.sum()) * 1e-3

        neq = make_neq_fn(op_fun)
        neq_full = jax.jit(lambda p: neq(p, *darrs))
        free_idx = np.where(unfixed)[0]
        res = lm_solve_masked(neq_full, jnp.array(x_full), free_idx,
                              jnp.array(x_full[free_idx]), max_nfev=60)
        rms = float(np.sqrt(res.cost / (2 * det.n_real)))
        assert rms < 0.35  # at the injected noise floor


class TestSelfCalChain:
    def test_free_point_chain_gauge_fixed(self):
        intr, extr, poses, tpl, dd = make_synthetic(n_cams=2, n_ims=5, grid=5)
        from pycamset_tpu.optim.blocks import RigidTform3d
        op_fun = OptimFunction(
            [Projection(), Extrinsic3D(), RigidTform3d(), FreePoint()])
        struct = op_fun.param_struct(intr.shape[0], poses.shape[0], tpl.shape[0])
        det = build_detection_arrays(op_fun, struct, dd, None, pad_multiple=256)
        darrs = det.as_device(jnp.float64)

        true_full = np.concatenate(
            [intr.ravel(), extr.ravel(), poses.ravel(), tpl.ravel()])
        assert struct.total == true_full.size

        residual = jax.jit(make_residual_fn(op_fun))
        r0 = np.array(residual(jnp.array(true_full), *darrs))
        assert np.abs(r0[:det.n_real]).max() < 1e-9

        # gauge: fix 7 coords of 3 non-colinear points + pose 0
        unfixed = np.ones(struct.total, dtype=bool)
        pose_sl = struct.group_slice(2)
        unfixed[pose_sl.start:pose_sl.start + 6] = False
        pt_sl = struct.group_slice(3)
        unfixed[pt_sl.start:pt_sl.start + 3] = False           # point 0 (origin)
        unfixed[pt_sl.start + 3:pt_sl.start + 6] = False       # point 1
        unfixed[pt_sl.start + 3 * 5] = False                   # 1 coord of point 5

        x_full = true_full.copy()
        x_full[unfixed] += RNG.normal(size=unfixed.sum()) * 1e-4

        neq = make_neq_fn(op_fun)
        neq_full = jax.jit(lambda p: neq(p, *darrs))
        free_idx = np.where(unfixed)[0]
        res = lm_solve_masked(neq_full, jnp.array(x_full), free_idx,
                              jnp.array(x_full[free_idx]), max_nfev=80)
        rms = float(np.sqrt(res.cost / (2 * det.n_real)))
        assert rms < 1e-6, f"self-cal chain failed to converge: {rms}"


class TestBlockSelfChecks:
    def test_all_blocks(self):
        from pycamset_tpu.optim.blocks import (
            Extrinsic3D, FreePoint, Projection, RigidTform3d, TemplatePoints)
        for b in [Projection(), RigidTform3d(), Extrinsic3D(), FreePoint()]:
            assert b.test_self(), f"{type(b).__name__} jac check failed"


if __name__ == "__main__":
    pytest.main([__file__, "-v"])


class TestGroupedGenericAssembly:
    """The fast generic fallback: detections grouped by identical gather
    rows assemble the normal equations as batched matmuls + one small
    scatter (50x the per-detection scatter-add on TPU)."""

    def _problem(self):
        from pycamset_tpu.optim.blocks import (
            Extrinsic3D, Projection, TemplatePoints)
        from pycamset_tpu.optim.chain import OptimFunction
        from pycamset_tpu.utils.synthetic import make_synthetic_rig

        rig = make_synthetic_rig(n_cams=3, n_ims=6, grid=5, visibility=0.8,
                                 noise_px=0.5, seed=3)
        op_fun = OptimFunction(
            [Projection(), Extrinsic3D(), TemplatePoints()])
        struct = op_fun.param_struct(3, 6, rig["n_keys"])
        full = np.concatenate([rig["intr"].ravel(), rig["extr"].ravel(),
                               rig["poses"].ravel()])
        return rig, op_fun, struct, full

    @pytest.mark.parametrize("loss", ["linear", "huber"])
    def test_matches_scatter_assembly(self, loss):
        import jax.numpy as jnp
        from pycamset_tpu.optim.residuals import (
            build_detection_arrays, build_grouped_detection_arrays,
            make_grouped_neq_fn, make_neq_fn)

        rig, op_fun, struct, full = self._problem()
        det = build_detection_arrays(op_fun, struct, rig["dd"],
                                     rig["template"])
        g = build_grouped_detection_arrays(op_fun, struct, rig["dd"],
                                           rig["template"])
        assert g is not None
        assert int(g.mask.sum()) == g.n_real == det.n_real
        fullj = jnp.asarray(full)
        ref = make_neq_fn(op_fun, loss=loss, f_scale=1.5)(
            fullj, *det.as_device(jnp.float64))
        got = make_grouped_neq_fn(op_fun, loss=loss, f_scale=1.5)(
            fullj, *g.as_device(jnp.float64))
        for name, r, gg in zip(["jtj", "grad", "cost"], ref, got):
            r, gg = np.asarray(r), np.asarray(gg)
            scale = np.abs(r).max() + 1e-12
            assert np.abs(r - gg).max() / scale < 1e-12, name

    def test_blowup_guard_returns_none(self):
        """Chains whose gather rows are per-detection unique (here: a
        free-point chain, each detection touching its own key params) must
        decline the grouping."""
        from pycamset_tpu.optim.blocks import (
            Extrinsic3D, FreePoint, Projection, RigidTform3d)
        from pycamset_tpu.optim.chain import OptimFunction
        from pycamset_tpu.optim.residuals import (
            build_grouped_detection_arrays)
        from pycamset_tpu.utils.synthetic import make_synthetic_rig

        rig = make_synthetic_rig(n_cams=3, n_ims=6, grid=5, visibility=0.8,
                                 noise_px=0.5, seed=3)
        op_fun = OptimFunction(
            [Projection(), Extrinsic3D(), RigidTform3d(), FreePoint()])
        struct = op_fun.param_struct(3, 6, rig["n_keys"])
        g = build_grouped_detection_arrays(op_fun, struct, rig["dd"], None)
        assert g is None
