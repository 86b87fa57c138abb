"""Mesh-sharded normal equations for the MIXED PER_KEY+PER_GROUP chain.

Completes the parallelism matrix: multi-target SELF-calibration
(optim/structured_mixed.py arrow structure) sharded over the camera or the
pose axis of the detection grid — the same slab placement + one-psum
pattern as parallel/sharded_structured.py, with the c-axis split into
per-key and (one-hot-reduced) per-group pieces happening on the LOCAL
partial tensors before the reduction (the group one-hot commutes with the
block sum).

On TPU the local gram call is served by the fused mixed Pallas kernel
(optim/pallas_grams.py); on the CPU validation mesh it runs the XLA closed
form — either way the body is identical SPMD code, so the multi-host
runtime (parallel/multihost.py) runs it unchanged.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from pycamset_tpu.optim.chain import OptimFunction
from pycamset_tpu.optim.structured_mixed import (
    MixedNormalEq, MixedPieces, MixedWidths, make_mixed_ops,
    resolve_mixed_grams, resolve_mixed_grams_fused)
from pycamset_tpu.parallel.mesh import DETECTION_AXIS


def _group_onehot(group_of_key, n_groups: int) -> np.ndarray:
    """(K, G) one-hot expansion of the key -> group map."""
    gok = np.asarray(group_of_key, dtype=np.int64)
    onehot = np.zeros((gok.size, n_groups), dtype=np.float32)
    onehot[np.arange(gok.size), gok] = 1.0
    return onehot


def _c_axis_contig(widths: MixedWidths) -> bool:
    """True when key/grp columns are contiguous partitions of the c-axis
    (every shipped chain) — pack/split with static slices and one
    concatenate; advanced indexing would lower to gather/scatter on the
    TPU hot path (same rule as optim/structured_mixed.py)."""
    def contig(cols):
        return (len(cols) > 0
                and tuple(cols) == tuple(range(cols[0],
                                               cols[0] + len(cols))))
    return (contig(widths.key_cols) and contig(widths.grp_cols)
            and sorted(widths.key_cols + widths.grp_cols)
            == list(range(widths.c)))


def _chain_key_rows(widths: MixedWidths, key, grp, key_mask, grp_mask, oh):
    """Assemble the chain-ordered c-axis rows for the gram kernel:
    [group pose expanded per key | per-key points], for both the
    parameter values and the column mask. `oh` may be the full one-hot or
    this device's key slice — the layout is per-row either way."""
    dtype = key.dtype
    if _c_axis_contig(widths):
        grp_first = widths.grp_cols[0] == 0

        def pack(key_part, grp_part):
            parts = ([grp_part, key_part] if grp_first
                     else [key_part, grp_part])
            return jnp.concatenate(
                [jnp.asarray(p, dtype) for p in parts], axis=1)

        return (pack(key, oh @ jnp.asarray(grp, dtype)),
                pack(key_mask, oh @ jnp.asarray(grp_mask, dtype)))
    kk = np.asarray(widths.key_cols)
    gg_ = np.asarray(widths.grp_cols)
    keyp = jnp.zeros((key.shape[0], widths.c), dtype)
    keyp = keyp.at[:, kk].set(key)
    keyp = keyp.at[:, gg_].set(oh @ grp)
    kmask = jnp.zeros((key.shape[0], widths.c), dtype)
    kmask = kmask.at[:, kk].set(key_mask)
    kmask = kmask.at[:, gg_].set(oh @ grp_mask)
    return keyp, kmask


def make_sharded_mixed_neq(op_fun: OptimFunction, widths: MixedWidths,
                           n_cams: int, n_ims: int, mesh: Mesh,
                           group_of_key, n_groups: int,
                           loss: str = "linear", f_scale: float = 1.0,
                           shard_axis: str = "cam",
                           loss_semantics: str = "component"):
    """Mixed neq with the camera ('cam') or image ('pose') axis of the
    (C, I, K[, 2]) detection tensors sharded over the mesh.

    :return: neq(pieces: MixedPieces, uv, mask, tpl, colmask) ->
        replicated MixedNormalEq; carries .onehot for make_mixed_ops.
    """
    a, b, cw = widths.a, widths.b, widths.c
    kk = np.asarray(widths.key_cols)
    gg_ = np.asarray(widths.grp_cols)
    if _c_axis_contig(widths):
        kk = slice(widths.key_cols[0], widths.key_cols[0] + widths.ck)
        gg_ = slice(widths.grp_cols[0], widths.grp_cols[0] + widths.cg)
    onehot_np = _group_onehot(group_of_key, n_groups)

    n_dev = mesh.devices.size
    if shard_axis == "cam":
        if n_cams % n_dev != 0:
            raise ValueError(
                f"{n_cams} cameras not divisible by {n_dev} devices")
        c_loc, i_loc = n_cams // n_dev, n_ims
        data_spec = P(DETECTION_AXIS)
    elif shard_axis == "pose":
        if n_ims % n_dev != 0:
            raise ValueError(
                f"{n_ims} images not divisible by {n_dev} devices "
                "(pad_pose_axis pads non-divisible rigs)")
        c_loc, i_loc = n_cams, n_ims // n_dev
        data_spec = P(None, DETECTION_AXIS)
    else:
        raise ValueError(f"unknown shard_axis {shard_axis!r}")

    # fused-reduction kernel built for the per-device slab dims: its
    # in-kernel cam-axis accumulation is shard-local by construction and
    # returns exactly the locally-reduced pieces; the psum completes them
    fused = resolve_mixed_grams_fused(op_fun, widths, c_loc, i_loc,
                                      loss=loss, f_scale=f_scale,
                                      loss_semantics=loss_semantics)
    grams = None if fused is not None else resolve_mixed_grams(
        op_fun, widths, loss=loss, f_scale=f_scale,
        loss_semantics=loss_semantics)

    piece_spec = MixedPieces(P(), P(), P(), P())

    @partial(shard_map, mesh=mesh,
             in_specs=(piece_spec, data_spec, data_spec, P(), piece_spec),
             out_specs=MixedNormalEq(*([P()] * 15)),
             check_vma=False)  # Pallas grams inside: no vma on out-shapes
    def neq(pieces: MixedPieces, uv, mask, tpl, colmask: MixedPieces):
        dtype = uv.dtype
        d = jax.lax.axis_index(DETECTION_AXIS)
        k_pad = mask.shape[-1]
        oh = jnp.asarray(onehot_np, dtype=dtype)

        if shard_axis == "cam":
            cam_off, im_off = d * c_loc, 0 * d
        else:
            cam_off, im_off = 0 * d, d * i_loc
        cam_loc = jax.lax.dynamic_slice_in_dim(pieces.cam, cam_off, c_loc)
        cmask_loc = jax.lax.dynamic_slice_in_dim(colmask.cam, cam_off, c_loc)
        im_loc = jax.lax.dynamic_slice_in_dim(pieces.im, im_off, i_loc)
        imask_loc = jax.lax.dynamic_slice_in_dim(colmask.im, im_off, i_loc)

        bb = c_loc * i_loc
        cam_b = jnp.repeat(cam_loc, i_loc, axis=0)
        im_b = jnp.tile(im_loc, (c_loc, 1))
        cmask_b = jnp.repeat(cmask_loc, i_loc, axis=0)
        imask_b = jnp.tile(imask_loc, (c_loc, 1))

        keyp, kmask = _chain_key_rows(widths, pieces.key, pieces.grp,
                                      colmask.key, colmask.grp, oh)

        uv_l = uv.reshape(bb, k_pad, 2)
        mask_l = mask.reshape(bb, k_pad)

        if fused is not None:
            (hcc_loc, hii_loc, hkk_f, wci_loc, wck_f, wik_f, gc_loc,
             gi_loc, gk_f, cost) = fused(cam_b, im_b, keyp, tpl, uv_l,
                                         mask_l, cmask_b, imask_b, kmask)
        else:
            (gcc_b, gii_b, wci_b, hkk_f, wck_b, wik_b, gc_b, gi_b, gk_f,
             cost) = grams(cam_b, im_b, keyp, tpl, uv_l, mask_l,
                           cmask_b, imask_b, kmask)

            # local reductions over this device's slab
            hcc_loc = gcc_b.reshape(c_loc, i_loc, a, a).sum(axis=1)
            gc_loc = gc_b.reshape(c_loc, i_loc, a).sum(axis=1)
            wck_f = wck_b.reshape(c_loc, i_loc, k_pad, a, cw).sum(axis=1)
            hii_loc = gii_b.reshape(c_loc, i_loc, b, b).sum(axis=0)
            gi_loc = gi_b.reshape(c_loc, i_loc, b).sum(axis=0)
            wik_f = wik_b.reshape(c_loc, i_loc, k_pad, b, cw).sum(axis=0)
            wci_loc = wci_b.reshape(c_loc, i_loc, a, b)

        # split the c-axis into per-key and (one-hot-reduced) per-group
        # pieces; every term is a partial sum the psum completes
        hkk = hkk_f[:, kk][:, :, kk]
        wkg = hkk_f[:, kk][:, :, gg_]
        hgg = jnp.einsum("kg,kpq->gpq", oh, hkk_f[:, gg_][:, :, gg_])
        wck_loc = wck_f[:, :, :, kk]
        wcg_loc = jnp.einsum("kg,ckap->cgap", oh, wck_f[:, :, :, gg_])
        wik_loc = wik_f[:, :, :, kk]
        wig_loc = jnp.einsum("kg,ikbp->igbp", oh, wik_f[:, :, :, gg_])
        gk = gk_f[:, kk]
        gg = jnp.einsum("kg,kp->gp", oh, gk_f[:, gg_])

        # place the slabs into the global tensors; one psum replicates
        def place_cam(loc, shape):
            return jax.lax.dynamic_update_slice_in_dim(
                jnp.zeros(shape, dtype), loc, cam_off, 0)

        def place_im(loc, shape):
            return jax.lax.dynamic_update_slice_in_dim(
                jnp.zeros(shape, dtype), loc, im_off, 0)

        hcc = place_cam(hcc_loc, (n_cams, a, a))
        gc = place_cam(gc_loc, (n_cams, a))
        wck = place_cam(wck_loc, (n_cams, k_pad, a, widths.ck))
        wcg = place_cam(wcg_loc, (n_cams, n_groups, a, widths.cg))
        hii = place_im(hii_loc, (n_ims, b, b))
        gi = place_im(gi_loc, (n_ims, b))
        wik = place_im(wik_loc, (n_ims, k_pad, b, widths.ck))
        wig = place_im(wig_loc, (n_ims, n_groups, b, widths.cg))
        wci = jax.lax.dynamic_update_slice(
            jnp.zeros((n_cams, n_ims, a, b), dtype), wci_loc,
            (cam_off, im_off, 0 * d, 0 * d))

        out = MixedNormalEq(hcc, hii, hkk, hgg, wci, wck, wik, wcg, wig,
                            wkg, gc, gi, gk, gg, cost)
        return jax.tree_util.tree_map(
            lambda x: jax.lax.psum(x, DETECTION_AXIS), out)

    neq.onehot = onehot_np
    return neq


def make_key_sharded_mixed_neq(op_fun: OptimFunction, widths: MixedWidths,
                               n_cams: int, n_ims: int, mesh: Mesh,
                               group_of_key, n_groups: int,
                               loss: str = "linear", f_scale: float = 1.0,
                               loss_semantics: str = "component"):
    """Mixed neq with the KEY (structure) axis sharded over the mesh —
    the scaling mode for multi-target self-calibration with 100k+ free
    points: the per-key pieces (hkk, wkg, gk, wck, wik) stay sharded and
    never cross ICI; only the small per-cam/per-im/per-group partial sums
    psum. The group one-hot reduction commutes with the key sharding
    (every key lives on exactly one device).

    uv/mask enter as (C, I, K[, 2]) tensors sharded on axis 2; pieces.key,
    colmask.key and tpl are sharded on axis 0; everything else replicated.

    :return: neq(pieces, uv, mask, tpl, colmask) -> MixedNormalEq with
        hkk/wkg/gk sharded on axis 0, wck/wik sharded on axis 1, the rest
        replicated; carries .onehot for make_mixed_ops.
    """
    a, b, cw = widths.a, widths.b, widths.c
    kk = np.asarray(widths.key_cols)
    gg_ = np.asarray(widths.grp_cols)
    if _c_axis_contig(widths):
        kk = slice(widths.key_cols[0], widths.key_cols[0] + widths.ck)
        gg_ = slice(widths.grp_cols[0], widths.grp_cols[0] + widths.cg)
    # fused kernel: every block is local under key sharding, so the
    # in-kernel accumulations are complete for the local key slice; the
    # per-key pieces stay sharded and the small partial sums psum
    fused = resolve_mixed_grams_fused(op_fun, widths, n_cams, n_ims,
                                      loss=loss, f_scale=f_scale,
                                      loss_semantics=loss_semantics)
    grams = None if fused is not None else resolve_mixed_grams(
        op_fun, widths, loss=loss, f_scale=f_scale,
        loss_semantics=loss_semantics)
    onehot_np = _group_onehot(group_of_key, n_groups)
    n_keys = onehot_np.shape[0]
    n_dev = mesh.devices.size
    if n_keys % n_dev != 0:
        raise ValueError(
            f"{n_keys} key slots not divisible by {n_dev} devices; pad "
            "the key axis (k_pad_multiple) to a mesh multiple")
    k_loc = n_keys // n_dev

    piece_spec = MixedPieces(P(), P(), P(DETECTION_AXIS), P())
    out_spec = MixedNormalEq(
        hcc=P(), hii=P(), hkk=P(DETECTION_AXIS), hgg=P(), wci=P(),
        wck=P(None, DETECTION_AXIS), wik=P(None, DETECTION_AXIS),
        wcg=P(), wig=P(), wkg=P(DETECTION_AXIS),
        gc=P(), gi=P(), gk=P(DETECTION_AXIS), gg=P(), cost=P())

    @partial(shard_map, mesh=mesh,
             in_specs=(piece_spec, P(None, None, DETECTION_AXIS),
                       P(None, None, DETECTION_AXIS), P(DETECTION_AXIS),
                       piece_spec),
             out_specs=out_spec,
             check_vma=False)  # Pallas grams inside: no vma on out-shapes
    def neq(pieces: MixedPieces, uv, mask, tpl, colmask: MixedPieces):
        dtype = uv.dtype
        d = jax.lax.axis_index(DETECTION_AXIS)
        bb = n_cams * n_ims
        cam_b = jnp.repeat(pieces.cam, n_ims, axis=0)
        im_b = jnp.tile(pieces.im, (n_cams, 1))
        cmask_b = jnp.repeat(colmask.cam, n_ims, axis=0)
        imask_b = jnp.tile(colmask.im, (n_cams, 1))

        # this device's key slice of the group one-hot
        oh = jax.lax.dynamic_slice_in_dim(
            jnp.asarray(onehot_np, dtype=dtype), d * k_loc, k_loc)
        keyp, kmask = _chain_key_rows(widths, pieces.key, pieces.grp,
                                      colmask.key, colmask.grp, oh)

        uv_l = uv.reshape(bb, k_loc, 2)
        mask_l = mask.reshape(bb, k_loc)

        if fused is not None:
            (hcc_p, hii_p, hkk_f, wci_p, wck_f, wik_f, gc_p, gi_p, gk_f,
             cost) = fused(cam_b, im_b, keyp, tpl, uv_l, mask_l,
                           cmask_b, imask_b, kmask)
        else:
            (gcc_b, gii_b, wci_b, hkk_f, wck_b, wik_b, gc_b, gi_b, gk_f,
             cost) = grams(cam_b, im_b, keyp, tpl, uv_l, mask_l,
                           cmask_b, imask_b, kmask)
            hcc_p = gcc_b.reshape(n_cams, n_ims, a, a).sum(axis=1)
            hii_p = gii_b.reshape(n_cams, n_ims, b, b).sum(axis=0)
            wci_p = wci_b.reshape(n_cams, n_ims, a, b)
            gc_p = gc_b.reshape(n_cams, n_ims, a).sum(axis=1)
            gi_p = gi_b.reshape(n_cams, n_ims, b).sum(axis=0)
            wck_f = wck_b.reshape(n_cams, n_ims, k_loc, a, cw).sum(axis=1)
            wik_f = wik_b.reshape(n_cams, n_ims, k_loc, b, cw).sum(axis=0)

        # per-key pieces: stay local/sharded
        hkk = hkk_f[:, kk][:, :, kk]
        wkg = hkk_f[:, kk][:, :, gg_]
        wck = wck_f[:, :, :, kk]
        wik = wik_f[:, :, :, kk]
        gk = gk_f[:, kk]

        # per-group and per-cam/per-im pieces: partial sums over this
        # device's keys, completed by one psum of SMALL tensors
        small = (
            hcc_p,
            hii_p,
            wci_p,
            jnp.einsum("kg,kpq->gpq", oh, hkk_f[:, gg_][:, :, gg_]),
            jnp.einsum("kg,ckap->cgap", oh, wck_f[:, :, :, gg_]),
            jnp.einsum("kg,ikbp->igbp", oh, wik_f[:, :, :, gg_]),
            gc_p,
            gi_p,
            jnp.einsum("kg,kp->gp", oh, gk_f[:, gg_]),
            cost,
        )
        (hcc, hii, wci, hgg, wcg, wig, gc, gi, gg,
         cost) = jax.tree_util.tree_map(
            lambda x: jax.lax.psum(x, DETECTION_AXIS), small)
        return MixedNormalEq(hcc, hii, hkk, hgg, wci, wck, wik, wcg, wig,
                             wkg, gc, gi, gk, gg, cost)

    neq.onehot = onehot_np
    return neq


def make_sharded_mixed_solver(op_fun: OptimFunction, widths: MixedWidths,
                              n_cams: int, n_ims: int, mesh: Mesh,
                              colmask: MixedPieces, group_of_key,
                              n_groups: int, max_nfev: int = 100,
                              loss: str = "linear", f_scale: float = 1.0,
                              shard_axis: str = "cam",
                              loss_semantics: str = "component"):
    """A jitted multi-device LM solve of the mixed multi-target system.

    :return: solve(pieces: MixedPieces, uv, mask, tpl) -> SLMResult, with
        uv/mask camera-major tensors sharded on the chosen axis (cam /
        pose via parallel.sharded_structured.shard_block_arrays; "key"
        shards the structure axis instead — place uv/mask on axis 2 and
        pieces.key / colmask.key / tpl on axis 0, as
        parallel.sharded_structured.shard_key_arrays does for the pure
        self-cal chain).
    """
    from pycamset_tpu.optim.structured_lm import structured_lm_solve

    if shard_axis == "key":
        neq = make_key_sharded_mixed_neq(
            op_fun, widths, n_cams, n_ims, mesh, group_of_key, n_groups,
            loss=loss, f_scale=f_scale, loss_semantics=loss_semantics)
    else:
        neq = make_sharded_mixed_neq(
            op_fun, widths, n_cams, n_ims, mesh, group_of_key, n_groups,
            loss=loss, f_scale=f_scale, shard_axis=shard_axis,
            loss_semantics=loss_semantics)
    ops = make_mixed_ops(neq.onehot)

    @jax.jit
    def solve(pieces: MixedPieces, uv, mask, tpl):
        return structured_lm_solve(
            lambda p: neq(p, uv, mask, tpl, colmask), pieces,
            max_nfev=max_nfev, ops=ops)

    return solve
