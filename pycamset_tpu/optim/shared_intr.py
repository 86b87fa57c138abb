"""Shared-intrinsics bundle adjustment: one lens model per LENS GROUP.

Production rigs are frequently built from identical cameras and lenses;
constraining cameras to shared intrinsic vectors (focal, principal
point, distortion) cuts the parameter count, conditions the problem far
better when per-camera coverage is thin, and is the physically-correct
model for matched lens batches. ``shared_intrinsics=True`` ties EVERY
camera to one lens; a per-camera label list (e.g. ``["a","a","b","b"]``)
ties each labelled group to its own lens — the mixed-batch rig. The
reference has no parameter-tying surface (pyCamSet handlers are strictly
per-camera).

TPU-native design: the tied system is ANOTHER arrow structure, this time
on the camera axis. The untied structured normal equations (the existing
fused Pallas gram kernels — nothing new on the device hot path) are
folded exactly into tied space through the tying map
p_c = [shared[g(c)] | e_c]:

    H_ss[g]  = sum_{c in g} Hcc[c][:s,:s]   (per-group shared blocks)
    H_se[c]  =              Hcc[c][:s,s:]   (group g(c) x extrinsic c)
    H_ee[c]  =              Hcc[c][s:,s:]
    W_si[g]  = sum_{c in g} Wci[c][:, :s, :]
    W_ei[c]  =              Wci[c][:, s:, :]

and the damped solve eliminates the block-diagonal POSE system first
(mirroring schur_solve's template branch), leaving a small dense
(G*s + 6C) system — pose elimination couples lens groups to each other
and to every extrinsic, so the reduced system is dense but tiny.

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
    shared: jnp.ndarray   # (G, s)  one intrinsic vector per lens group
    cam: jnp.ndarray      # (C, 6)  per-camera extrinsics
    im: jnp.ndarray       # (I, b)  per-image target poses


class TiedNormalEq(NamedTuple):
    hss: jnp.ndarray      # (G, s, s)
    hse: jnp.ndarray      # (C, s, 6)   row group g(c), column extr c
    hee: jnp.ndarray      # (C, 6, 6)
    hii: jnp.ndarray      # (I, b, b)
    wsi: jnp.ndarray      # (G, I, s, b)
    wei: jnp.ndarray      # (C, I, 6, b)
    gs: jnp.ndarray       # (G, s)
    ge: jnp.ndarray       # (C, 6)
    gi: jnp.ndarray       # (I, b)
    cost: jnp.ndarray


def resolve_lens_groups(opt, cam_names) -> np.ndarray:
    """The ``shared_intrinsics`` option -> per-camera group ids (C,).

    True ties every camera to one lens; a list/tuple of per-camera labels
    (length C, any hashables) ties each label to its own lens; a dict
    {camera name: label} does the same by name.
    """
    if opt is True:
        return np.zeros(len(cam_names), dtype=np.int64)
    if isinstance(opt, dict):
        missing = [n for n in cam_names if n not in opt]
        if missing:
            raise ValueError(
                f"shared_intrinsics dict misses cameras {missing}")
        labels = [opt[n] for n in cam_names]
    else:
        labels = list(opt)
        if len(labels) != len(cam_names):
            raise ValueError(
                f"shared_intrinsics needs one label per camera "
                f"({len(cam_names)}); got {len(labels)}")
    uniq = sorted(set(labels), key=str)
    lut = {lb: i for i, lb in enumerate(uniq)}
    return np.asarray([lut[lb] for lb in labels], dtype=np.int64)


def fold_tied(n, s: int, oh: jnp.ndarray) -> TiedNormalEq:
    """Exact fold of an untied NormalEq through the tying map.

    :param oh: (C, G) one-hot camera -> lens-group matrix.
    """
    return TiedNormalEq(
        hss=jnp.einsum("cg,cst->gst", oh, n.hcc[:, :s, :s]),
        hse=n.hcc[:, :s, s:],
        hee=n.hcc[:, s:, s:],
        hii=n.hii,
        wsi=jnp.einsum("cg,cisb->gisb", oh, n.wci[:, :, :s, :]),
        wei=n.wci[:, :, s:, :],
        gs=jnp.einsum("cg,cs->gs", oh, n.gc[:, :s]),
        ge=n.gc[:, s:],
        gi=n.gi,
        cost=n.cost)


def make_tied_ops(oh_np: np.ndarray):
    """(diag, matvec, solve, grad) over TiedPieces for structured_lm_solve.

    ``oh_np`` stays host numpy: the ops close over it and lowering a
    captured device array forces the tunnel's first d2h (CLAUDE.md
    invariant)."""

    def tied_diag(n: TiedNormalEq) -> TiedPieces:
        return TiedPieces(
            jnp.diagonal(n.hss, axis1=1, axis2=2),
            jnp.diagonal(n.hee, axis1=1, axis2=2),
            jnp.diagonal(n.hii, axis1=1, axis2=2))

    def tied_grad(n: TiedNormalEq) -> TiedPieces:
        return TiedPieces(n.gs, n.ge, n.gi)

    def tied_matvec(n: TiedNormalEq, dx: TiedPieces) -> TiedPieces:
        oh = jnp.asarray(oh_np, dtype=dx.cam.dtype)
        sh_c = oh @ dx.shared                                   # (C, s)
        os_ = jnp.einsum("gst,gt->gs", n.hss, dx.shared)
        os_ = os_ + jnp.einsum("cg,csu,cu->gs", oh, n.hse, dx.cam)
        os_ = os_ + jnp.einsum("gisb,ib->gs", n.wsi, dx.im)
        oe = jnp.einsum("csu,cs->cu", n.hse, sh_c)
        oe = oe + jnp.einsum("cuv,cv->cu", n.hee, dx.cam)
        oe = oe + jnp.einsum("ciub,ib->cu", n.wei, dx.im)
        oi = jnp.einsum("gisb,gs->ib", n.wsi, dx.shared)
        oi = oi + jnp.einsum("ciub,cu->ib", n.wei, dx.cam)
        oi = oi + jnp.einsum("ibq,iq->ib", n.hii, dx.im)
        return TiedPieces(os_, oe, oi)

    def tied_solve(n: TiedNormalEq, damp: TiedPieces,
                   method: str = "dense", cg_tol: float = 1e-6,
                   cg_maxiter: int = 250) -> TiedPieces:
        """(H + diag(damp)) dx = -g: eliminate the block-diagonal poses,
        dense Cholesky on the (G*s + 6C) reduced system, back-substitute.
        The reduced system is tiny for any realistic rig, so the dense
        path always applies (cg accepted for signature parity)."""
        g_, s = n.hss.shape[0], n.hss.shape[2]
        c_, i_ = n.hee.shape[0], n.hii.shape[0]
        ns, ne = g_ * s, c_ * 6
        oh = jnp.asarray(oh_np, dtype=n.gs.dtype)

        hss = n.hss + jax.vmap(jnp.diag)(damp.shared)
        hee = n.hee + jax.vmap(jnp.diag)(damp.cam)
        hii = n.hii + jax.vmap(jnp.diag)(damp.im)

        iinv = _normalized_inv(hii)                            # (I,b,b)
        t_si = jnp.einsum("gisb,ibq->gisq", n.wsi, iinv)       # (G,I,s,b)
        t_ei = jnp.einsum("ciub,ibq->ciuq", n.wei, iinv)       # (C,I,6,b)

        a_ss = -jnp.einsum("gisq,hiuq->ghsu", t_si, n.wsi)     # (G,G,s,s)
        a_ss = _block_diag_add(a_ss, hss)
        a_se = (jnp.einsum("cg,csu->gcsu", oh, n.hse)
                - jnp.einsum("gisq,ciuq->gcsu", t_si, n.wei))  # (G,C,s,6)
        a_ee = -jnp.einsum("ciuq,divq->cduv", t_ei, n.wei)     # (C,C,6,6)
        a_ee = _block_diag_add(a_ee, hee)
        r_s = n.gs - jnp.einsum("gisq,iq->gs", t_si, n.gi)
        r_e = n.ge - jnp.einsum("ciuq,iq->cu", t_ei, n.gi)

        se_flat = a_se.transpose(0, 2, 1, 3).reshape(ns, ne)
        top = jnp.concatenate(
            [a_ss.transpose(0, 2, 1, 3).reshape(ns, ns), se_flat], axis=1)
        bot = jnp.concatenate(
            [se_flat.T, a_ee.transpose(0, 2, 1, 3).reshape(ne, ne)],
            axis=1)
        amat = jnp.concatenate([top, bot], axis=0)
        rhs = -jnp.concatenate([r_s.reshape(-1), r_e.reshape(-1)])
        sol = _psd_solve(amat, rhs)
        dxs = sol[:ns].reshape(g_, s)
        dxe = sol[ns:].reshape(c_, 6)

        ri = -n.gi - jnp.einsum("gisb,gs->ib", n.wsi, dxs) \
            - jnp.einsum("ciub,cu->ib", n.wei, dxe)
        dxi = jnp.einsum("ibq,iq->ib", iinv, ri)
        return TiedPieces(dxs, dxe, dxi)

    return (tied_diag, tied_matvec, tied_solve, tied_grad)


def build_shared_structured_problem(param_handler, dtype,
                                    k_pad_multiple: int = 128):
    """Compile a handler's problem onto the tied (shared-intrinsics)
    structured backend.

    Same contract as build_structured_problem: returns
    (solve_fn(x0_free) -> (x_free, SLMResult), residual_fn, x0). The
    returned free vector broadcasts each solved lens into every camera of
    its group, so every downstream consumer (get_camset, uncertainty,
    persistence) sees a standard per-camera layout whose grouped rows are
    identical.

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

    gid = resolve_lens_groups(
        param_handler.problem_opts.get("shared_intrinsics"),
        param_handler.cam_names)
    n_groups = int(gid.max()) + 1
    oh_np = np.zeros((gid.size, n_groups))
    oh_np[np.arange(gid.size), gid] = 1.0

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
    ops = make_tied_ops(oh_np)

    def to_tied(full_np: np.ndarray) -> TiedPieces:
        p = split_full_params(jnp.asarray(full_np, dtype=dtype), op_fun,
                              struct, n_cams, n_ims, n_keys, widths)
        p = pad_pieces_to_grid(p, widths, False, n_keys, k_pad, n_ims,
                               n_ims_grid)
        oh = jnp.asarray(oh_np, dtype=p.cam.dtype)
        counts = jnp.asarray(oh_np.sum(axis=0), dtype=p.cam.dtype)
        shared = (oh.T @ p.cam[:, :s]) / counts[:, None]  # group means
        return TiedPieces(shared, p.cam[:, s:], p.im)

    def expand(tp: TiedPieces) -> ParamPieces:
        cam_full = jnp.concatenate([tp.shared[gid], tp.cam], axis=1)
        return ParamPieces(cam_full, tp.im,
                           jnp.zeros((k_pad, 0), dtype=tp.cam.dtype))

    @jax.jit
    def solve_impl(x_tied, uv, mask, tpl):
        def neq_fn(tp):
            p = expand(tp)
            oh = jnp.asarray(oh_np, dtype=p.cam.dtype)
            return fold_tied(neq_raw(p, uv, mask, tpl, colmask), s, oh)
        return structured_lm_solve(neq_fn, x_tied, max_nfev=max_nfev,
                                   reduced_solver="dense", ops=ops)

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
        sh = jnp.asarray(tp.shared, dtype=jnp.float64)
        cam_full = jnp.concatenate(
            [sh[gid], jnp.asarray(tp.cam, dtype=jnp.float64)], axis=1)
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
