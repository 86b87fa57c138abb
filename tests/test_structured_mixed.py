"""Mixed PER_KEY + PER_GROUP structured backend vs the dense generic oracle.

The multi-target self-calibration chain (free per-key geometry + free
per-group relative poses) previously fell to the generic scatter backend;
these tests pin the arrow-structured normal equations, matvec, and Schur
solve against the dense JtJ the generic path assembles.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pycamset_tpu.optim.blocks import (
    Extrinsic3D, FreePoint, GroupRigidTform3d, Projection, RigidTform3d)
from pycamset_tpu.optim.chain import OptimFunction
from pycamset_tpu.optim.residuals import build_detection_arrays, make_neq_fn
from pycamset_tpu.optim.structured import build_block_arrays
from pycamset_tpu.optim.structured_mixed import (
    MixedPieces, make_mixed_ops, make_mixed_structured_neq,
    mixed_chain_widths, mixed_grad)
from pycamset_tpu.utils.synthetic import make_synthetic_rig

N_CAMS, N_IMS, N_GROUPS = 3, 6, 2


def _mixed_problem(seed=3, noise=0.4):
    rig = make_synthetic_rig(n_cams=N_CAMS, n_ims=N_IMS, grid=5,
                             visibility=0.85, noise_px=noise, seed=seed)
    n_keys = rig["n_keys"]
    op_fun = OptimFunction(
        [Projection(), Extrinsic3D(), RigidTform3d(), GroupRigidTform3d(),
         FreePoint()])
    widths = mixed_chain_widths(op_fun)
    assert (widths.a, widths.b, widths.ck, widths.cg) == (15, 6, 3, 6)
    struct = op_fun.param_struct(N_CAMS, N_IMS, n_keys, n_groups=N_GROUPS)
    gok = (np.arange(n_keys) >= n_keys // 2).astype(np.int64)

    # data generated with identity group poses; non-identity values enter
    # through the parameter vector below (parity needs no physical scene)
    grp = np.array([[0.0] * 6,
                    [0.04, -0.02, 0.06, 0.01, -0.02, 0.03]])
    full = np.concatenate([rig["intr"].ravel(), rig["extr"].ravel(),
                           rig["poses"].ravel(), grp.ravel(),
                           rig["template"].ravel()])
    assert full.size == struct.total
    return rig, op_fun, widths, struct, gok, grp, full


def _full_to_pieces(full, struct, widths, n_keys, k_pad):
    sl = [struct.group_slice(i) for i in range(5)]
    cam = np.concatenate([
        full[sl[0].start:sl[0].stop].reshape(N_CAMS, 9),
        full[sl[1].start:sl[1].stop].reshape(N_CAMS, 6)], axis=1)
    im = full[sl[2].start:sl[2].stop].reshape(N_IMS, 6)
    grp = full[sl[3].start:sl[3].stop].reshape(N_GROUPS, 6)
    key = full[sl[4].start:sl[4].stop].reshape(n_keys, 3)
    key_pad = np.concatenate(
        [key, np.repeat(key[:1], k_pad - n_keys, axis=0)])
    return MixedPieces(jnp.asarray(cam), jnp.asarray(im),
                       jnp.asarray(key_pad), jnp.asarray(grp))


def _pieces_to_full(p, struct, n_keys):
    return np.concatenate([
        np.asarray(p.cam[:, :9]).ravel(), np.asarray(p.cam[:, 9:]).ravel(),
        np.asarray(p.im).ravel(), np.asarray(p.grp).ravel(),
        np.asarray(p.key[:n_keys]).ravel()])


class TestMixedStructured:
    def setup_method(self):
        (self.rig, self.op_fun, self.widths, self.struct, self.gok,
         self.grp, self.full) = _mixed_problem()
        n_keys = self.rig["n_keys"]
        blocks = build_block_arrays(self.rig["dd"], N_CAMS, N_IMS, n_keys,
                                    k_pad_multiple=8)
        self.k_pad = blocks.uv.shape[1]
        self.uv, self.mask = blocks.as_device(jnp.float64)
        self.gok_pad = np.concatenate(
            [self.gok, np.zeros(self.k_pad - n_keys, np.int64)])
        self.tpl = jnp.zeros((self.k_pad, 3))
        self.pieces = _full_to_pieces(self.full, self.struct, self.widths,
                                      n_keys, self.k_pad)
        kmask = jnp.ones((self.k_pad, 3)).at[n_keys:].set(0.0)
        kmask = kmask.at[0].set(0.0).at[1].set(0.0).at[2, 0].set(0.0)
        self.colmask = MixedPieces(
            jnp.ones((N_CAMS, 15)).at[:, 2].set(0.0),
            jnp.ones((N_IMS, 6)).at[0].set(0.0),
            kmask,
            jnp.ones((N_GROUPS, 6)).at[0].set(0.0))
        self.neq_fn = make_mixed_structured_neq(
            self.op_fun, self.widths, N_CAMS, N_IMS,
            group_of_key=self.gok_pad, n_groups=N_GROUPS)
        self.neq = jax.jit(self.neq_fn)(
            self.pieces, self.uv, self.mask, self.tpl, self.colmask)
        self.ops = make_mixed_ops(self.neq_fn.onehot)

        # dense oracle over the same (masked) problem
        dense_det = build_detection_arrays(
            self.op_fun, self.struct, self.rig["dd"], None,
            pad_multiple=1, group_of_key=self.gok)
        dense_neq = make_neq_fn(self.op_fun)
        full_mask = np.concatenate([
            np.repeat(np.asarray(self.colmask.cam[:, :9]).ravel(), 1),
            np.asarray(self.colmask.cam[:, 9:]).ravel(),
            np.asarray(self.colmask.im).ravel(),
            np.asarray(self.colmask.grp).ravel(),
            np.asarray(self.colmask.key[:self.rig["n_keys"]]).ravel()])
        jtj, grad, cost = jax.jit(dense_neq)(
            jnp.asarray(self.full), *dense_det.as_device(jnp.float64))
        cm = jnp.asarray(full_mask)
        self.jtj = np.asarray(jtj * cm[:, None] * cm[None, :])
        self.grad = np.asarray(grad * cm)
        self.cost = float(cost)

    def test_cost_and_gradient_match_dense(self):
        assert abs(float(self.neq.cost) - self.cost) < 1e-9 * (1 + self.cost)
        g = mixed_grad(self.neq)
        g_full = _pieces_to_full(
            MixedPieces(g.cam, g.im, g.key, g.grp), self.struct,
            self.rig["n_keys"])
        np.testing.assert_allclose(g_full, self.grad, rtol=1e-9, atol=1e-9)

    def test_matvec_matches_dense(self):
        rng = np.random.default_rng(0)
        dx_full = rng.normal(size=self.struct.total)
        dxp = _full_to_pieces(dx_full, self.struct, self.widths,
                              self.rig["n_keys"], self.k_pad)
        # pad keys must not contribute
        dxp = dxp._replace(
            key=dxp.key.at[self.rig["n_keys"]:].set(0.0))
        _, matvec, _, _ = self.ops
        out = matvec(self.neq, dxp)
        out_full = _pieces_to_full(out, self.struct, self.rig["n_keys"])
        want = self.jtj @ dx_full
        scale = np.abs(want).max()
        np.testing.assert_allclose(out_full, want, rtol=1e-9,
                                   atol=1e-9 * scale)

    def test_schur_solve_matches_dense(self):
        _, _, solve, _ = self.ops
        diag, _, _, _ = self.ops[0], None, None, None
        d = self.ops[0](self.neq)
        damp = jax.tree_util.tree_map(lambda x: 1e-3 * x + 1e-8, d)
        dx = solve(self.neq, damp)
        dx_full = _pieces_to_full(dx, self.struct, self.rig["n_keys"])

        damp_full = _pieces_to_full(
            MixedPieces(damp.cam, damp.im, damp.key, damp.grp),
            self.struct, self.rig["n_keys"])
        h = self.jtj + np.diag(damp_full)
        want = np.linalg.solve(h, -self.grad)
        scale = np.abs(want).max() + 1e-12
        np.testing.assert_allclose(dx_full, want, rtol=5e-6,
                                   atol=5e-6 * scale)

    def test_lm_solve_converges(self):
        """Full mixed LM: perturb cameras + group pose, recover to the
        injected noise floor with the grouped pose pulled back to truth."""
        from pycamset_tpu.optim.structured_lm import structured_lm_solve

        rng = np.random.default_rng(1)
        pert = self.pieces._replace(
            cam=self.pieces.cam + rng.normal(
                size=self.pieces.cam.shape) * 1e-4,
            grp=self.pieces.grp.at[1].add(
                jnp.asarray(rng.normal(size=6) * 1e-3)))

        @jax.jit
        def solve(p):
            return structured_lm_solve(
                lambda pp: self.neq_fn(pp, self.uv, self.mask, self.tpl,
                                       self.colmask),
                p, max_nfev=40, ops=self.ops)

        res = solve(pert)
        n_obs = float(np.asarray(self.mask).sum())
        rms = float(np.sqrt(float(res.cost) / (2 * n_obs)))
        assert rms < 0.45, rms  # 0.4 px injected noise


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
