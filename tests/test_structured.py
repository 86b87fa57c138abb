"""Parity tests: structured (Schur) backend vs the generic dense backend."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pycamset_tpu.optim.blocks import (
    Extrinsic3D, FreePoint, Projection, RigidTform3d, TemplatePoints)
from pycamset_tpu.optim.chain import OptimFunction
from pycamset_tpu.optim.residuals import build_detection_arrays, make_neq_fn
from pycamset_tpu.optim.structured import (
    ParamPieces, build_block_arrays, chain_widths, make_structured_neq,
    neq_matvec, schur_solve, split_full_params)
from pycamset_tpu.optim.structured_lm import structured_lm_solve
from pycamset_tpu.utils.synthetic import make_synthetic_rig

RNG = np.random.default_rng(5)


def setup_problem(chain, rig, with_points):
    op_fun = OptimFunction(chain)
    widths = chain_widths(op_fun)
    n_cams, n_ims, n_keys = rig["n_cams"], rig["n_ims"], rig["n_keys"]
    struct = op_fun.param_struct(n_cams, n_ims, n_keys)
    parts = [rig["intr"].ravel(), rig["extr"].ravel(), rig["poses"].ravel()]
    if with_points:
        parts.append(rig["template"].ravel())
    full = np.concatenate(parts)
    assert full.size == struct.total
    return op_fun, widths, struct, full


def index_map(n_cams, n_ims, n_keys, widths):
    """(piece, row, col) -> index in the group-major full vector."""
    def cam_idx(c, j):
        return 9 * c + j if j < 9 else 9 * n_cams + 6 * c + (j - 9)

    def im_idx(i, j):
        return 15 * n_cams + 6 * i + j

    def key_idx(k, j):
        return 15 * n_cams + 6 * n_ims + 3 * k + j

    return cam_idx, im_idx, key_idx


def dense_from_structured(neq, n_cams, n_ims, n_keys, widths, p_total):
    cam_idx, im_idx, key_idx = index_map(n_cams, n_ims, n_keys, widths)
    jtj = np.zeros((p_total, p_total))
    grad = np.zeros(p_total)
    a, b, c = widths.a, widths.b, widths.c
    for cc in range(n_cams):
        rows = [cam_idx(cc, j) for j in range(a)]
        jtj[np.ix_(rows, rows)] += np.asarray(neq.hcc)[cc]
        grad[rows] += np.asarray(neq.gc)[cc]
    for ii in range(n_ims):
        rows = [im_idx(ii, j) for j in range(b)]
        jtj[np.ix_(rows, rows)] += np.asarray(neq.hii)[ii]
        grad[rows] += np.asarray(neq.gi)[ii]
    for kk in range(n_keys):
        rows = [key_idx(kk, j) for j in range(c)]
        jtj[np.ix_(rows, rows)] += np.asarray(neq.hkk)[kk]
        grad[rows] += np.asarray(neq.gk)[kk]
    for cc in range(n_cams):
        crows = [cam_idx(cc, j) for j in range(a)]
        for ii in range(n_ims):
            irows = [im_idx(ii, j) for j in range(b)]
            w = np.asarray(neq.wci)[cc, ii]
            jtj[np.ix_(crows, irows)] += w
            jtj[np.ix_(irows, crows)] += w.T
        for kk in range(n_keys):
            krows = [key_idx(kk, j) for j in range(c)]
            w = np.asarray(neq.wck)[cc, kk]
            jtj[np.ix_(crows, krows)] += w
            jtj[np.ix_(krows, crows)] += w.T
    for ii in range(n_ims):
        irows = [im_idx(ii, j) for j in range(b)]
        for kk in range(n_keys):
            krows = [key_idx(kk, j) for j in range(c)]
            w = np.asarray(neq.wik)[ii, kk]
            jtj[np.ix_(irows, krows)] += w
            jtj[np.ix_(krows, irows)] += w.T
    return jtj, grad


@pytest.mark.parametrize("chain_name", ["template", "selfcal"])
def test_structured_neq_matches_dense(chain_name):
    rig = make_synthetic_rig(n_cams=3, n_ims=5, grid=4, visibility=0.8,
                             noise_px=0.5, seed=2)
    if chain_name == "template":
        chain = [Projection(), Extrinsic3D(), TemplatePoints()]
        with_points = False
    else:
        chain = [Projection(), Extrinsic3D(), RigidTform3d(), FreePoint()]
        with_points = True
    op_fun, widths, struct, full = setup_problem(chain, rig, with_points)
    n_cams, n_ims, n_keys = rig["n_cams"], rig["n_ims"], rig["n_keys"]

    # generic dense path
    det = build_detection_arrays(op_fun, struct, rig["dd"],
                                 rig["template"] if not with_points else None,
                                 pad_multiple=64)
    darrs = det.as_device(jnp.float64)
    jtj_d, grad_d, cost_d = jax.jit(make_neq_fn(op_fun))(
        jnp.asarray(full), *darrs)

    # structured path
    blocks = build_block_arrays(rig["dd"], n_cams, n_ims, n_keys,
                                k_pad_multiple=8)
    k_pad = blocks.uv.shape[1]
    uv, mask = blocks.as_device(jnp.float64)
    tpl_pad = np.zeros((k_pad, 3))
    if not with_points:
        tpl_pad[:n_keys] = rig["template"]
    pieces = split_full_params(jnp.asarray(full), op_fun, struct,
                               n_cams, n_ims, n_keys, widths)
    key = jnp.zeros((k_pad, widths.c)).at[:n_keys].set(pieces.key)
    pieces = ParamPieces(pieces.cam, pieces.im, key)
    colmask = ParamPieces(jnp.ones_like(pieces.cam), jnp.ones_like(pieces.im),
                          jnp.ones((k_pad, widths.c)).at[n_keys:].set(0.0))
    neq_s = jax.jit(make_structured_neq(op_fun, widths, n_cams, n_ims))(
        pieces, uv, mask, jnp.asarray(tpl_pad), colmask)

    assert np.isclose(float(neq_s.cost), float(cost_d), rtol=1e-12)
    jtj_s, grad_s = dense_from_structured(
        neq_s, n_cams, n_ims, n_keys, widths, struct.total)
    np.testing.assert_allclose(grad_s, np.asarray(grad_d), rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(jtj_s, np.asarray(jtj_d), rtol=1e-9, atol=1e-8)

    # schur solve == dense damped solve
    diag = np.maximum(np.diag(jtj_s), 1e-8)
    lam = 1e-3
    damp = ParamPieces(
        lam * jnp.maximum(jnp.diagonal(neq_s.hcc, axis1=1, axis2=2), 1e-8),
        lam * jnp.maximum(jnp.diagonal(neq_s.hii, axis1=1, axis2=2), 1e-8),
        lam * jnp.maximum(jnp.diagonal(neq_s.hkk, axis1=1, axis2=2), 1e-8))
    dx = schur_solve(neq_s, damp)
    dx_dense = np.linalg.solve(jtj_s + np.diag(lam * diag), -grad_s)

    cam_idx, im_idx, key_idx = index_map(n_cams, n_ims, n_keys, widths)
    dx_flat = np.zeros(struct.total)
    for cc in range(n_cams):
        for j in range(widths.a):
            dx_flat[cam_idx(cc, j)] = np.asarray(dx.cam)[cc, j]
    for ii in range(n_ims):
        for j in range(widths.b):
            dx_flat[im_idx(ii, j)] = np.asarray(dx.im)[ii, j]
    for kk in range(n_keys):
        for j in range(widths.c):
            dx_flat[key_idx(kk, j)] = np.asarray(dx.key)[kk, j]
    np.testing.assert_allclose(dx_flat, dx_dense, rtol=1e-6, atol=1e-10)

    # H @ dx parity
    hdx = neq_matvec(neq_s, dx)
    hdx_dense = jtj_s @ dx_flat
    hdx_flat = np.zeros(struct.total)
    for cc in range(n_cams):
        for j in range(widths.a):
            hdx_flat[cam_idx(cc, j)] = np.asarray(hdx.cam)[cc, j]
    for ii in range(n_ims):
        for j in range(widths.b):
            hdx_flat[im_idx(ii, j)] = np.asarray(hdx.im)[ii, j]
    for kk in range(n_keys):
        for j in range(widths.c):
            hdx_flat[key_idx(kk, j)] = np.asarray(hdx.key)[kk, j]
    np.testing.assert_allclose(hdx_flat, hdx_dense, rtol=1e-8, atol=1e-9)


def test_structured_lm_converges():
    rig = make_synthetic_rig(n_cams=4, n_ims=8, grid=6, visibility=0.9,
                             noise_px=0.0, seed=4)
    chain = [Projection(), Extrinsic3D(), TemplatePoints()]
    op_fun, widths, struct, full = setup_problem(chain, rig, False)
    n_cams, n_ims, n_keys = rig["n_cams"], rig["n_ims"], rig["n_keys"]
    blocks = build_block_arrays(rig["dd"], n_cams, n_ims, n_keys,
                                k_pad_multiple=8)
    k_pad = blocks.uv.shape[1]
    uv, mask = blocks.as_device(jnp.float64)
    tpl_pad = np.zeros((k_pad, 3))
    tpl_pad[:n_keys] = rig["template"]

    # perturb, gauge-fix pose 0 by column masking
    x = full.copy()
    rng = np.random.default_rng(0)
    x += rng.normal(size=x.size) * 1e-3
    pose_sl = struct.group_slice(2)
    x[pose_sl.start:pose_sl.start + 6] = full[pose_sl.start:pose_sl.start + 6]

    pieces = split_full_params(jnp.asarray(x), op_fun, struct,
                               n_cams, n_ims, n_keys, widths)
    pieces = ParamPieces(pieces.cam, pieces.im,
                         jnp.zeros((k_pad, 0)))
    colmask = ParamPieces(jnp.ones((n_cams, widths.a)),
                          jnp.ones((n_ims, widths.b)).at[0].set(0.0),
                          jnp.ones((k_pad, 0)))
    neq_raw = make_structured_neq(op_fun, widths, n_cams, n_ims)
    tpl_j = jnp.asarray(tpl_pad)

    @jax.jit
    def solve(p):
        return structured_lm_solve(
            lambda pp: neq_raw(pp, uv, mask, tpl_j, colmask), p, max_nfev=50)

    res = solve(pieces)
    rms = float(np.sqrt(float(res.cost) / (2 * blocks.n_real)))
    assert rms < 1e-6, f"structured LM failed to converge: {rms}"
    # pose 0 stayed fixed
    np.testing.assert_allclose(
        np.asarray(res.x.im)[0],
        x[pose_sl.start:pose_sl.start + 6], atol=0)


if __name__ == "__main__":
    pytest.main([__file__, "-v"])


def test_cg_reduced_solver_matches_dense():
    """Matrix-free CG reduced solve agrees with the dense Cholesky path."""
    rig = make_synthetic_rig(n_cams=3, n_ims=6, grid=4, visibility=0.85,
                             noise_px=0.4, seed=8)
    chain = [Projection(), Extrinsic3D(), RigidTform3d(), FreePoint()]
    op_fun, widths, struct, full = setup_problem(chain, rig, True)
    n_cams, n_ims, n_keys = rig["n_cams"], rig["n_ims"], rig["n_keys"]
    blocks = build_block_arrays(rig["dd"], n_cams, n_ims, n_keys,
                                k_pad_multiple=8)
    k_pad = blocks.uv.shape[1]
    uv, mask = blocks.as_device(jnp.float64)
    pieces = split_full_params(jnp.asarray(full), op_fun, struct,
                               n_cams, n_ims, n_keys, widths)
    key = jnp.tile(pieces.key[:1], (k_pad, 1)).at[:n_keys].set(pieces.key)
    pieces = ParamPieces(pieces.cam, pieces.im, key)
    colmask = ParamPieces(
        jnp.ones((n_cams, widths.a)),
        jnp.ones((n_ims, widths.b)).at[0].set(0.0),
        jnp.ones((k_pad, 3)).at[n_keys:].set(0.0))
    neq = make_structured_neq(op_fun, widths, n_cams, n_ims)(
        pieces, uv, mask, jnp.zeros((k_pad, 3)), colmask)
    from pycamset_tpu.optim.structured import neq_diag
    d = neq_diag(neq)
    damp = ParamPieces(*[1e-3 * jnp.maximum(x, 1e-8) for x in d])
    dx_dense = schur_solve(neq, damp, method="dense")
    dx_cg = schur_solve(neq, damp, method="cg", cg_tol=1e-12, cg_maxiter=2000)
    for name, a, b in zip(["cam", "im", "key"], dx_dense, dx_cg):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-12
        assert np.abs(a - b).max() / scale < 1e-6, name


def test_structured_lm_with_cg_converges():
    rig = make_synthetic_rig(n_cams=4, n_ims=8, grid=6, visibility=0.9,
                             noise_px=0.0, seed=4)
    chain = [Projection(), Extrinsic3D(), TemplatePoints()]
    op_fun, widths, struct, full = setup_problem(chain, rig, False)
    n_cams, n_ims, n_keys = rig["n_cams"], rig["n_ims"], rig["n_keys"]
    blocks = build_block_arrays(rig["dd"], n_cams, n_ims, n_keys,
                                k_pad_multiple=8)
    k_pad = blocks.uv.shape[1]
    uv, mask = blocks.as_device(jnp.float64)
    tpl_pad = np.zeros((k_pad, 3))
    tpl_pad[:n_keys] = rig["template"]
    tpl_pad[n_keys:] = rig["template"][0]

    x = full.copy()
    x += np.random.default_rng(0).normal(size=x.size) * 1e-3
    pose_sl = struct.group_slice(2)
    x[pose_sl.start:pose_sl.start + 6] = full[pose_sl.start:pose_sl.start + 6]
    pieces = split_full_params(jnp.asarray(x), op_fun, struct,
                               n_cams, n_ims, n_keys, widths)
    pieces = ParamPieces(pieces.cam, pieces.im, jnp.zeros((k_pad, 0)))
    colmask = ParamPieces(jnp.ones((n_cams, widths.a)),
                          jnp.ones((n_ims, widths.b)).at[0].set(0.0),
                          jnp.ones((k_pad, 0)))
    neq_raw = make_structured_neq(op_fun, widths, n_cams, n_ims)
    tpl_j = jnp.asarray(tpl_pad)

    @jax.jit
    def solve(p):
        return structured_lm_solve(
            lambda pp: neq_raw(pp, uv, mask, tpl_j, colmask), p,
            max_nfev=50, reduced_solver="cg")

    res = solve(pieces)
    rms = float(np.sqrt(float(res.cost) / (2 * blocks.n_real)))
    assert rms < 1e-6, f"CG-based LM failed to converge: {rms}"


def test_pose_elimination_with_padded_and_fixed_poses():
    """The c==0 dense fast path (batched pose elimination) matches the
    densified damped solve, returns exact-zero steps for fully-masked
    (padded) pose slots and the gauge-fixed pose, and agrees with CG."""
    rig = make_synthetic_rig(n_cams=4, n_ims=6, grid=5, visibility=0.9,
                             noise_px=0.4, seed=11)
    chain = [Projection(), Extrinsic3D(), TemplatePoints()]
    op_fun, widths, struct, full = setup_problem(chain, rig, False)
    n_cams, n_keys = rig["n_cams"], rig["n_keys"]
    n_ims = rig["n_ims"] + 2  # two padded pose slots (mask 0 everywhere)
    blocks = build_block_arrays(rig["dd"], n_cams, n_ims, n_keys,
                                k_pad_multiple=8)
    k_pad = blocks.uv.shape[1]
    uv, mask = blocks.as_device(jnp.float64)
    tpl_pad = np.zeros((k_pad, 3))
    tpl_pad[:n_keys] = rig["template"]

    pieces0 = split_full_params(jnp.asarray(full), op_fun, struct,
                                n_cams, rig["n_ims"], n_keys, widths)
    im = jnp.concatenate([pieces0.im, jnp.tile(pieces0.im[:1], (2, 1))])
    pieces = ParamPieces(pieces0.cam, im, jnp.zeros((k_pad, 0)))
    cm_im = jnp.ones((n_ims, widths.b)).at[0].set(0.0)
    cm_im = cm_im.at[rig["n_ims"]:].set(0.0)  # padded slots are fixed
    colmask = ParamPieces(jnp.ones((n_cams, widths.a)), cm_im,
                          jnp.ones((k_pad, 0)))
    neq = make_structured_neq(op_fun, widths, n_cams, n_ims)(
        pieces, uv, mask, jnp.asarray(tpl_pad), colmask)

    from pycamset_tpu.optim.structured import neq_diag
    lam = 1e-3
    damp = ParamPieces(*[lam * jnp.maximum(x, 1e-8) for x in neq_diag(neq)])
    dx = schur_solve(neq, damp, method="dense")

    # padded + gauge-fixed pose rows take exact zero steps
    dx_im = np.asarray(dx.im)
    np.testing.assert_array_equal(dx_im[0], 0.0)
    np.testing.assert_array_equal(dx_im[rig["n_ims"]:], 0.0)

    # parity with the densified damped normal equations
    jtj, grad = dense_from_structured(neq, n_cams, n_ims, n_keys, widths,
                                      n_cams * widths.a + n_ims * widths.b)
    diag = np.maximum(np.diag(jtj), 1e-8)
    dx_dense = np.linalg.solve(jtj + np.diag(lam * diag), -grad)
    cam_idx, im_idx, _ = index_map(n_cams, n_ims, n_keys, widths)
    flat = np.zeros(jtj.shape[0])
    for cc in range(n_cams):
        for j in range(widths.a):
            flat[cam_idx(cc, j)] = np.asarray(dx.cam)[cc, j]
    for ii in range(n_ims):
        for j in range(widths.b):
            flat[im_idx(ii, j)] = dx_im[ii, j]
    np.testing.assert_allclose(flat, dx_dense, rtol=1e-6, atol=1e-10)

    # matrix-free CG agrees with the eliminated dense path
    dx_cg = schur_solve(neq, damp, method="cg", cg_tol=1e-12,
                        cg_maxiter=2000)
    for name, a_, b_ in zip(["cam", "im"], [dx.cam, dx.im],
                            [dx_cg.cam, dx_cg.im]):
        a_, b_ = np.asarray(a_), np.asarray(b_)
        scale = np.abs(a_).max() + 1e-12
        assert np.abs(a_ - b_).max() / scale < 1e-6, name


def test_pred_red_identity_matches_exact_matvec():
    """The dense-path model reduction uses (dx'D dx - dx'g)/2 instead of
    the H matvec (structured_lm.py); with the refined dense solve the two
    agree to solver precision on a real self-cal system."""
    rig = make_synthetic_rig(n_cams=3, n_ims=6, grid=5, visibility=0.9,
                             noise_px=0.4, seed=7)
    chain = [Projection(), Extrinsic3D(), RigidTform3d(), FreePoint()]
    op_fun, widths, struct, full = setup_problem(chain, rig, True)
    n_cams, n_ims, n_keys = rig["n_cams"], rig["n_ims"], rig["n_keys"]
    blocks = build_block_arrays(rig["dd"], n_cams, n_ims, n_keys,
                                k_pad_multiple=8)
    k_pad = blocks.uv.shape[1]
    uv, mask = blocks.as_device(jnp.float64)
    pieces = split_full_params(jnp.asarray(full), op_fun, struct,
                               n_cams, n_ims, n_keys, widths)
    key = jnp.zeros((k_pad, widths.c)).at[:n_keys].set(pieces.key)
    pieces = ParamPieces(pieces.cam, pieces.im, key)
    colmask = ParamPieces(jnp.ones_like(pieces.cam),
                          jnp.ones_like(pieces.im),
                          jnp.ones((k_pad, widths.c)).at[n_keys:].set(0.0))
    neq = make_structured_neq(op_fun, widths, n_cams, n_ims)(
        pieces, uv, mask, jnp.zeros((k_pad, 3)), colmask)

    from pycamset_tpu.optim.structured import neq_diag
    lam = 1e-3
    damp = ParamPieces(*[lam * jnp.maximum(x, 1e-8) for x in neq_diag(neq)])
    dx = schur_solve(neq, damp, method="dense")

    g = ParamPieces(neq.gc, neq.gi, neq.gk)

    def pdot(p1, p2):
        return sum(float(jnp.sum(a * b)) for a, b in
                   zip(jax.tree_util.tree_leaves(p1),
                       jax.tree_util.tree_leaves(p2)))

    pred_exact = -(pdot(dx, g) + 0.5 * pdot(dx, neq_matvec(neq, dx)))
    ddx = jax.tree_util.tree_map(lambda d_, x_: d_ * x_, damp, dx)
    pred_ident = 0.5 * (pdot(dx, ddx) - pdot(dx, g))
    assert pred_exact > 0 and pred_ident > 0
    assert abs(pred_ident - pred_exact) / pred_exact < 1e-6
