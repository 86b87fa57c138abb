"""Shared-intrinsics bundle adjustment: one lens model, many cameras.

Production rigs are frequently built from identical cameras and lenses;
constraining every camera to ONE intrinsic vector (focal, principal
point, distortion) cuts the parameter count from C*(s+6) to s + 6C,
conditions the problem far better when per-camera coverage is thin, and
is the physically-correct model for matched lens batches. The reference
has no parameter-tying surface (pyCamSet handlers are strictly
per-camera).

TPU-native design: the tied system is ANOTHER arrow structure, this time
on the camera axis. The untied structured normal equations (the existing
fused Pallas gram kernels — nothing new on the device hot path) are
folded exactly into tied space through the tying map p_c = [shared | e_c]:

    H_ss     = sum_c Hcc[c][:s,:s]         (the shared block)
    H_se[c]  =       Hcc[c][:s,s:]         (shared x per-cam extrinsic)
    H_ee[c]  =       Hcc[c][s:,s:]
    W_si     = sum_c Wci[c][:, :s, :]      (shared x pose)
    W_ei[c]  =       Wci[c][:, s:, :]

and the damped solve eliminates the block-diagonal POSE system first
(mirroring schur_solve's template branch), leaving a small dense
(s + 6C) system:

    [ S_ss  S_se ] [dx_s]   [r_s]
    [ S_se' S_ee ] [dx_e] = [r_e]     S_ee couples cameras densely
                                      (every pose is seen by many cams).

The whole tied LM runs as one jitted lax.while_loop via
structured_lm_solve's ops= injection (the same mechanism as the mixed
PER_KEY+PER_GROUP backend). Template chains only: self-cal tying would
additionally thread the key axis and is not needed for the lens-batch
use case.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from pycamset_tpu.optim.chain import OptimFunction
from pycamset_tpu.optim.structured import (
    ParamPieces, UnsupportedChain, _block_diag_add, _normalized_inv,
    _psd_solve, build_block_arrays, chain_widths, make_structured_neq,
    merge_pieces_to_full, pad_pieces_to_grid, pad_template_table,
    split_full_params)
from pycamset_tpu.optim.structured_driver import build_colmask_pieces
from pycamset_tpu.optim.structured_lm import SLMResult, structured_lm_solve


class TiedPieces(NamedTuple):
    """Parameters of the tied system."""
    shared: jnp.ndarray   # (s,)    one intrinsic vector for every camera
    cam: jnp.ndarray      # (C, 6)  per-camera extrinsics
    im: jnp.ndarray       # (I, b)  per-image target poses


class TiedNormalEq(NamedTuple):
    hss: jnp.ndarray      # (s, s)
    hse: jnp.ndarray      # (C, s, 6)
    hee: jnp.ndarray      # (C, 6, 6)
    hii: jnp.ndarray      # (I, b, b)
    wsi: jnp.ndarray      # (I, s, b)
    wei: jnp.ndarray      # (C, I, 6, b)
    gs: jnp.ndarray       # (s,)
    ge: jnp.ndarray       # (C, 6)
    gi: jnp.ndarray       # (I, b)
    cost: jnp.ndarray


def fold_tied(n, s: int) -> TiedNormalEq:
    """Exact fold of an untied NormalEq through the tying map."""
    return TiedNormalEq(
        hss=n.hcc[:, :s, :s].sum(axis=0),
        hse=n.hcc[:, :s, s:],
        hee=n.hcc[:, s:, s:],
        hii=n.hii,
        wsi=n.wci[:, :, :s, :].sum(axis=0),
        wei=n.wci[:, :, s:, :],
        gs=n.gc[:, :s].sum(axis=0),
        ge=n.gc[:, s:],
        gi=n.gi,
        cost=n.cost)


def tied_diag(n: TiedNormalEq) -> TiedPieces:
    return TiedPieces(
        jnp.diagonal(n.hss),
        jnp.diagonal(n.hee, axis1=1, axis2=2),
        jnp.diagonal(n.hii, axis1=1, axis2=2))


def tied_grad(n: TiedNormalEq) -> TiedPieces:
    return TiedPieces(n.gs, n.ge, n.gi)


def tied_matvec(n: TiedNormalEq, dx: TiedPieces) -> TiedPieces:
    os_ = n.hss @ dx.shared
    os_ = os_ + jnp.einsum("csu,cu->s", n.hse, dx.cam)
    os_ = os_ + jnp.einsum("isb,ib->s", n.wsi, dx.im)
    oe = jnp.einsum("csu,s->cu", n.hse, dx.shared)
    oe = oe + jnp.einsum("cuv,cv->cu", n.hee, dx.cam)
    oe = oe + jnp.einsum("ciub,ib->cu", n.wei, dx.im)
    oi = jnp.einsum("isb,s->ib", n.wsi, dx.shared)
    oi = oi + jnp.einsum("ciub,cu->ib", n.wei, dx.cam)
    oi = oi + jnp.einsum("ibq,iq->ib", n.hii, dx.im)
    return TiedPieces(os_, oe, oi)


def tied_solve(n: TiedNormalEq, damp: TiedPieces, method: str = "dense",
               cg_tol: float = 1e-6, cg_maxiter: int = 250) -> TiedPieces:
    """(H + diag(damp)) dx = -g: eliminate the block-diagonal poses, dense
    Cholesky on the (s + 6C) reduced system, back-substitute. The reduced
    system is tiny for any realistic rig (s <= 14, 6 per camera), so the
    dense path always applies (cg accepted for signature parity)."""
    s = n.hss.shape[0]
    c_, i_ = n.hee.shape[0], n.hii.shape[0]
    ne = c_ * 6

    hss = n.hss + jnp.diag(damp.shared)
    hee = n.hee + jax.vmap(jnp.diag)(damp.cam)
    hii = n.hii + jax.vmap(jnp.diag)(damp.im)

    iinv = _normalized_inv(hii)                                # (I,b,b)
    t_si = jnp.einsum("isb,ibq->isq", n.wsi, iinv)             # (I,s,b)
    t_ei = jnp.einsum("ciub,ibq->ciuq", n.wei, iinv)           # (C,I,6,b)

    a_ss = hss - jnp.einsum("isq,iuq->su", t_si, n.wsi)
    a_se = n.hse - jnp.einsum("isq,ciuq->csu", t_si, n.wei)    # (C,s,6)
    a_ee = -jnp.einsum("ciuq,divq->cduv", t_ei, n.wei)         # (C,C,6,6)
    a_ee = _block_diag_add(a_ee, hee)
    r_s = n.gs - jnp.einsum("isq,iq->s", t_si, n.gi)
    r_e = n.ge - jnp.einsum("ciuq,iq->cu", t_ei, n.gi)

    se_flat = a_se.transpose(1, 0, 2).reshape(s, ne)
    top = jnp.concatenate([a_ss, se_flat], axis=1)
    bot = jnp.concatenate(
        [se_flat.T, a_ee.transpose(0, 2, 1, 3).reshape(ne, ne)], axis=1)
    amat = jnp.concatenate([top, bot], axis=0)
    rhs = -jnp.concatenate([r_s, r_e.reshape(-1)])
    sol = _psd_solve(amat, rhs)
    dxs = sol[:s]
    dxe = sol[s:].reshape(c_, 6)

    ri = -n.gi - jnp.einsum("isb,s->ib", n.wsi, dxs) \
        - jnp.einsum("ciub,cu->ib", n.wei, dxe)
    dxi = jnp.einsum("ibq,iq->ib", iinv, ri)
    return TiedPieces(dxs, dxe, dxi)


TIED_OPS = (tied_diag, tied_matvec, tied_solve, tied_grad)


def build_shared_structured_problem(param_handler, dtype,
                                    k_pad_multiple: int = 128):
    """Compile a handler's problem onto the tied (shared-intrinsics)
    structured backend.

    Same contract as build_structured_problem: returns
    (solve_fn(x0_free) -> (x_free, SLMResult), residual_fn, x0). The
    returned free vector broadcasts the solved shared intrinsics into
    every camera's slots, so every downstream consumer (get_camset,
    uncertainty, persistence) sees a standard per-camera layout whose
    rows happen to be identical.

    Raises UnsupportedChain for non-template chains or when any camera's
    intrinsic columns are individually fixed (pin all or none — a
    per-camera pin contradicts the tying).
    """
    op_fun: OptimFunction = param_handler.op_fun
    widths = chain_widths(op_fun)
    if widths.c != 0 or not op_fun.templated or widths.b != 6:
        raise UnsupportedChain(
            "shared_intrinsics supports template chains only "
            "(projection + extrinsic + template points)")
    s = widths.a - 6
    if s <= 0:
        raise UnsupportedChain("chain has no intrinsic columns to tie")

    x0 = np.asarray(param_handler.get_initial_params(), dtype=np.float64)
    n_cams = len(param_handler.cam_names)
    n_ims = int(param_handler.bundlePrimitive.poses.shape[0])
    n_keys = param_handler.n_keys()
    im_bucket = param_handler.problem_opts.get("im_bucket", 8)
    n_ims_grid = (((n_ims + im_bucket - 1) // im_bucket) * im_bucket
                  if im_bucket else n_ims)

    dd = param_handler.get_detection_data(flatten=True)
    blocks = build_block_arrays(dd, n_cams, n_ims_grid, n_keys,
                                k_pad_multiple=k_pad_multiple)
    k_pad = blocks.uv.shape[1]

    struct = op_fun.param_struct(n_cams, n_ims, n_keys)
    base_full = param_handler.bundlePrimitive.base_full()
    unfixed = param_handler.bundlePrimitive.unfixed_full()
    base_full[unfixed] = x0
    free_idx = np.where(unfixed)[0]

    tpl_pad = pad_template_table(param_handler.template_table(), True,
                                 n_keys, k_pad)
    colmask = build_colmask_pieces(base_full, unfixed, op_fun, struct,
                                   widths, False, dtype, n_cams, n_ims,
                                   n_keys, k_pad, n_ims_grid)
    if not np.all(colmask.cam[:, :s] == 1.0):
        raise UnsupportedChain(
            "shared_intrinsics cannot honour per-camera fixed intrinsics "
            "(fix none; a fully-pinned shared lens needs no tying — pin "
            "every camera's int/dst instead and solve untied)")

    neq_raw = make_structured_neq(
        op_fun, widths, n_cams, n_ims_grid,
        loss=param_handler.problem_opts.get("loss", "linear"),
        f_scale=float(param_handler.problem_opts.get("f_scale", 1.0)),
        loss_semantics=param_handler.problem_opts.get(
            "loss_semantics", "component"))
    uv_d, mask_d = blocks.as_device(dtype)
    tpl_d = jnp.asarray(tpl_pad, dtype=dtype)
    max_nfev = int(param_handler.problem_opts.get("max_nfev", 100))

    def to_tied(full_np: np.ndarray) -> TiedPieces:
        p = split_full_params(jnp.asarray(full_np, dtype=dtype), op_fun,
                              struct, n_cams, n_ims, n_keys, widths)
        p = pad_pieces_to_grid(p, widths, False, n_keys, k_pad, n_ims,
                               n_ims_grid)
        return TiedPieces(p.cam[:, :s].mean(axis=0), p.cam[:, s:], p.im)

    def expand(tp: TiedPieces) -> ParamPieces:
        cam_full = jnp.concatenate(
            [jnp.tile(tp.shared[None], (n_cams, 1)), tp.cam], axis=1)
        return ParamPieces(cam_full, tp.im,
                           jnp.zeros((k_pad, 0), dtype=tp.cam.dtype))

    @jax.jit
    def solve_impl(x_tied, uv, mask, tpl):
        def neq_fn(tp):
            p = expand(tp)
            return fold_tied(neq_raw(p, uv, mask, tpl, colmask), s)
        return structured_lm_solve(neq_fn, x_tied, max_nfev=max_nfev,
                                   reduced_solver="dense", ops=TIED_OPS)

    point_fn = op_fun.make_point_fn()
    blk_cam = np.repeat(np.arange(n_cams), n_ims_grid)
    blk_im = np.tile(np.arange(n_ims_grid), n_cams)

    @jax.jit
    def block_residual_impl(x_tied, uv, mask, tpl):
        p = expand(x_tied)
        cam_b = p.cam[blk_cam]
        im_b = p.im[blk_im]

        def slot(cp, ip, t, u):
            return point_fn(jnp.concatenate([cp, ip]), t) - u

        per_key = jax.vmap(slot, in_axes=(None, None, 0, 0))
        per_blk = jax.vmap(per_key, in_axes=(0, 0, None, 0))
        return per_blk(cam_b, im_b, tpl, uv) * mask[..., None]

    cam_i = dd[:, 0].astype(int)
    im_i = dd[:, 1].astype(int)
    key_i = dd[:, 2].astype(int)
    blk_i = cam_i * n_ims_grid + im_i

    def apply_free(x_free: np.ndarray) -> TiedPieces:
        full = base_full.copy()
        full[free_idx] = np.asarray(x_free, dtype=np.float64)
        return to_tied(full)

    def from_tied(tp: TiedPieces) -> np.ndarray:
        cam_full = jnp.concatenate(
            [jnp.tile(jnp.asarray(tp.shared, dtype=jnp.float64)[None],
                      (n_cams, 1)),
             jnp.asarray(tp.cam, dtype=jnp.float64)], axis=1)
        return np.asarray(merge_pieces_to_full(
            ParamPieces(cam_full,
                        jnp.asarray(tp.im[:n_ims], dtype=jnp.float64),
                        jnp.zeros((n_keys, 0))),
            op_fun, struct, n_cams, n_ims, n_keys))

    def solve_fn(x_free: np.ndarray):
        res: SLMResult = solve_impl(apply_free(x_free), uv_d, mask_d, tpl_d)
        x_tied = jax.tree_util.tree_map(np.asarray, res.x)
        full = from_tied(x_tied)
        return full[free_idx], res

    def residual_fn(x_free: np.ndarray) -> np.ndarray:
        r = np.asarray(block_residual_impl(apply_free(x_free), uv_d,
                                           mask_d, tpl_d))
        return r[blk_i, key_i]

    return solve_fn, residual_fn, x0
