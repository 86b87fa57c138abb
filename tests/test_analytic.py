"""Closed-form Jacobians vs jacfwd (the reference's analytic-vs-autodiff
cross-check, inverted: autodiff is now the oracle)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pycamset_tpu.optim.analytic import (
    analytic_block_rj_for_chain, block_rj_freepoint, block_rj_selfcal,
    block_rj_template)
from pycamset_tpu.optim.blocks import (
    Extrinsic3D, FreePoint, Projection, ProjectionRational,
    ProjectionThinPrism, ProjectionTilted, RigidTform3d, TemplatePoints)
from pycamset_tpu.optim.chain import OptimFunction

RNG = np.random.default_rng(21)

PROJ = {"standard": Projection, "rational": ProjectionRational,
        "thin_prism": ProjectionThinPrism, "tilted": ProjectionTilted}
INTR_W = {"standard": 9, "rational": 12, "thin_prism": 16, "tilted": 18}


def rand_problem(k=7, model="standard"):
    intr = np.array([1200.0, 800, 1190, 600, -0.2, 0.05, 1e-3, -2e-3, 0.01,
                     0.03, -0.01, 0.004,           # k4..k6
                     5e-4, -3e-4, 2e-4, 4e-4,      # s1..s4
                     0.02, -0.015])[:INTR_W[model]]  # taux, tauy
    extr6 = np.concatenate([RNG.normal(size=3) * 0.3, [0.05, -0.02, 1.1]])
    pose6 = np.concatenate([RNG.normal(size=3) * 0.4, RNG.normal(size=3) * 0.1])
    pts = RNG.normal(size=(k, 3)) * 0.15
    uv = RNG.uniform(0, 1500, size=(k, 2))
    return (jnp.array(np.concatenate([intr, extr6])), jnp.array(pose6),
            jnp.array(pts), jnp.array(uv))


def jacfwd_reference(op_fun, cam15, pose6, keyp, tpl, uv, widths_c):
    point_fn = op_fun.make_point_fn()

    def slot(cp, ip, kp, t, u):
        f = lambda c_, i_, k_: point_fn(jnp.concatenate([c_, i_, k_]), t) - u
        r = f(cp, ip, kp)
        jc, ji, jk = jax.jacfwd(f, argnums=(0, 1, 2))(cp, ip, kp)
        return r, jc, ji, jk

    b = pose6 if pose6.size else jnp.zeros(0)
    per_key = jax.vmap(slot, in_axes=(None, None, 0, 0, 0))
    return per_key(cam15, b, keyp, tpl, uv)


class TestAnalyticParity:
    def test_template_chain(self):
        op_fun = OptimFunction([Projection(), Extrinsic3D(), TemplatePoints()])
        cam15, pose6, tpl, uv = rand_problem()
        keyp = jnp.zeros((tpl.shape[0], 0))
        r_a, jc_a, ji_a, jk_a = block_rj_template(cam15, pose6, tpl, uv)
        r_f, jc_f, ji_f, jk_f = jacfwd_reference(
            op_fun, cam15, pose6, keyp, tpl, uv, 0)
        np.testing.assert_allclose(np.asarray(r_a), np.asarray(r_f), atol=1e-9)
        np.testing.assert_allclose(np.asarray(jc_a), np.asarray(jc_f),
                                   rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(np.asarray(ji_a), np.asarray(ji_f),
                                   rtol=1e-9, atol=1e-9)

    def test_selfcal_chain(self):
        op_fun = OptimFunction(
            [Projection(), Extrinsic3D(), RigidTform3d(), FreePoint()])
        cam15, pose6, pts, uv = rand_problem()
        r_a, jc_a, ji_a, jk_a = block_rj_selfcal(cam15, pose6, pts, uv)
        r_f, jc_f, ji_f, jk_f = jacfwd_reference(
            op_fun, cam15, pose6, pts, jnp.zeros_like(pts), uv, 3)
        np.testing.assert_allclose(np.asarray(r_a), np.asarray(r_f), atol=1e-9)
        np.testing.assert_allclose(np.asarray(jc_a), np.asarray(jc_f),
                                   rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(np.asarray(ji_a), np.asarray(ji_f),
                                   rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(np.asarray(jk_a), np.asarray(jk_f),
                                   rtol=1e-9, atol=1e-9)

    def test_freepoint_chain(self):
        op_fun = OptimFunction([Projection(), Extrinsic3D(), FreePoint()])
        cam15, _, pts, uv = rand_problem()
        r_a, jc_a, ji_a, jk_a = block_rj_freepoint(cam15, None, pts, uv)
        point_fn = op_fun.make_point_fn()

        def slot(cp, kp, t, u):
            f = lambda c_, k_: point_fn(jnp.concatenate([c_, k_]), t) - u
            r = f(cp, kp)
            jc, jk = jax.jacfwd(f, argnums=(0, 1))(cp, kp)
            return r, jc, jk

        r_f, jc_f, jk_f = jax.vmap(slot, in_axes=(None, 0, 0, 0))(
            cam15, pts, jnp.zeros_like(pts), uv)
        np.testing.assert_allclose(np.asarray(r_a), np.asarray(r_f), atol=1e-9)
        np.testing.assert_allclose(np.asarray(jc_a), np.asarray(jc_f),
                                   rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(np.asarray(jk_a), np.asarray(jk_f),
                                   rtol=1e-9, atol=1e-9)

    @pytest.mark.parametrize("model", ["rational", "thin_prism", "tilted"])
    def test_extended_template_chain(self, model):
        op_fun = OptimFunction(
            [PROJ[model](), Extrinsic3D(), TemplatePoints()])
        cam_a, pose6, tpl, uv = rand_problem(model=model)
        keyp = jnp.zeros((tpl.shape[0], 0))
        r_a, jc_a, ji_a, jk_a = block_rj_template(cam_a, pose6, tpl, uv)
        r_f, jc_f, ji_f, jk_f = jacfwd_reference(
            op_fun, cam_a, pose6, keyp, tpl, uv, 0)
        np.testing.assert_allclose(np.asarray(r_a), np.asarray(r_f), atol=1e-9)
        np.testing.assert_allclose(np.asarray(jc_a), np.asarray(jc_f),
                                   rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(np.asarray(ji_a), np.asarray(ji_f),
                                   rtol=1e-9, atol=1e-9)

    @pytest.mark.parametrize("model", ["rational", "tilted"])
    def test_extended_selfcal_chain(self, model):
        op_fun = OptimFunction(
            [PROJ[model](), Extrinsic3D(), RigidTform3d(), FreePoint()])
        cam_a, pose6, pts, uv = rand_problem(model=model)
        r_a, jc_a, ji_a, jk_a = block_rj_selfcal(cam_a, pose6, pts, uv)
        r_f, jc_f, ji_f, jk_f = jacfwd_reference(
            op_fun, cam_a, pose6, pts, jnp.zeros_like(pts), uv, 3)
        np.testing.assert_allclose(np.asarray(r_a), np.asarray(r_f), atol=1e-9)
        np.testing.assert_allclose(np.asarray(jc_a), np.asarray(jc_f),
                                   rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(np.asarray(ji_a), np.asarray(ji_f),
                                   rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(np.asarray(jk_a), np.asarray(jk_f),
                                   rtol=1e-9, atol=1e-9)

    def test_grouped_template_chain(self):
        """The multi-target chain's closed form (per-key group SE(3) before
        the image pose) matches jacfwd, including the 6 group columns."""
        from pycamset_tpu.optim.analytic import block_rj_grouped_template
        from pycamset_tpu.optim.blocks import GroupTemplatePoints

        op_fun = OptimFunction(
            [Projection(), Extrinsic3D(), RigidTform3d(),
             GroupTemplatePoints()])
        cam_a, pose6, tpl, uv = rand_problem()
        keyp6 = jnp.array(np.concatenate(
            [RNG.normal(size=(tpl.shape[0], 3)) * 0.2,
             RNG.normal(size=(tpl.shape[0], 3)) * 0.05], axis=1))
        r_a, jc_a, ji_a, jk_a = block_rj_grouped_template(
            cam_a, pose6, keyp6, tpl, uv)
        r_f, jc_f, ji_f, jk_f = jacfwd_reference(
            op_fun, cam_a, pose6, keyp6, tpl, uv, 6)
        np.testing.assert_allclose(np.asarray(r_a), np.asarray(r_f),
                                   atol=1e-9)
        np.testing.assert_allclose(np.asarray(jc_a), np.asarray(jc_f),
                                   rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(np.asarray(ji_a), np.asarray(ji_f),
                                   rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(np.asarray(jk_a), np.asarray(jk_f),
                                   rtol=1e-9, atol=1e-9)

    def test_mixed_selfcal_chain(self):
        """The mixed multi-target self-cal chain's closed form matches
        jacfwd for all of [grp pose | point] key-axis columns."""
        from pycamset_tpu.optim.analytic import block_rj_mixed_selfcal
        from pycamset_tpu.optim.blocks import GroupRigidTform3d

        op_fun = OptimFunction(
            [Projection(), Extrinsic3D(), RigidTform3d(),
             GroupRigidTform3d(), FreePoint()])
        cam_a, pose6, pts, uv = rand_problem()
        keyp = jnp.array(np.concatenate(
            [RNG.normal(size=(pts.shape[0], 3)) * 0.2,
             RNG.normal(size=(pts.shape[0], 3)) * 0.05,
             np.asarray(pts)], axis=1))           # [grp6 | pt3]
        r_a, jc_a, ji_a, jk_a = block_rj_mixed_selfcal(
            cam_a, pose6, keyp, uv)
        r_f, jc_f, ji_f, jk_f = jacfwd_reference(
            op_fun, cam_a, pose6, keyp, jnp.zeros_like(pts), uv, 9)
        np.testing.assert_allclose(np.asarray(r_a), np.asarray(r_f),
                                   atol=1e-9)
        for got, want in [(jc_a, jc_f), (ji_a, ji_f), (jk_a, jk_f)]:
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=1e-9, atol=1e-9)

    def test_dispatch(self):
        assert analytic_block_rj_for_chain(OptimFunction(
            [Projection(), Extrinsic3D(), TemplatePoints()])) is not None
        assert analytic_block_rj_for_chain(OptimFunction(
            [Projection(), Extrinsic3D(), RigidTform3d(), FreePoint()])) is not None
        assert analytic_block_rj_for_chain(OptimFunction(
            [Projection(), Extrinsic3D(), FreePoint()])) is not None
        assert analytic_block_rj_for_chain(OptimFunction(
            [ProjectionTilted(), Extrinsic3D(), TemplatePoints()])) is not None
        assert analytic_block_rj_for_chain(OptimFunction(
            [Projection(), TemplatePoints()])) is None


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
