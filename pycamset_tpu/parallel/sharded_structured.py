"""Multi-device structured BA: shard the block grid, psum the normal eqs.

Two shardings of the (cam × im, key) block grid:

- CAMERA axis (make_sharded_structured_neq): each device gets a contiguous
  slab of whole cameras; per-cam reductions are local reshaped sums,
  per-image/per-key reductions are local partial sums + one psum over ICI,
  and per-(cam, image) coupling blocks are placed at the device's camera
  offset before the same psum.
- POSE axis (make_pose_sharded_structured_neq): the mirror image — each
  device gets a slab of whole images; right for rigs with few cameras but
  very many poses (n_cams < n_devices, or n_ims >> n_cams).

choose_shard_axis picks between them; rigs where neither axis divides the
mesh shard on the pose axis after pad_pose_axis adds fully-masked images.
PER_GROUP-keyed (multi-target) chains ride both shardings: the per-group
parameter rows expand onto the key grid on-device and the gram pieces
reduce back to per-group blocks before the psum. No gather tables and no
block one-hot constants (which embed O(C*I^2) bytes in the executable; the
(K, G) group one-hot is tiny and G-bounded). The Schur solve and LM control
flow run replicated on every device — they are tiny relative to the
residual work.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pycamset_tpu.optim.blocks import key_type
from pycamset_tpu.optim.chain import OptimFunction
from pycamset_tpu.optim.structured import (
    GroupWidths, NormalEq, ParamPieces, resolve_block_grams,
    resolve_fused_grams)
from pycamset_tpu.optim.structured_lm import SLMResult, structured_lm_solve
from pycamset_tpu.parallel.mesh import DETECTION_AXIS


def _group_onehot(widths: GroupWidths, group_of_key, n_groups):
    """(K, G) one-hot for PER_GROUP chains (None for PER_KEY chains).

    The one-hot is tiny (K x G) and replicated on every device; per-group
    parameter rows expand onto the key grid before the grams and the
    per-key gram pieces reduce back to per-group blocks BEFORE the psum,
    so ICI traffic shrinks from K-sized to G-sized tensors.
    """
    if widths.key_link != key_type.PER_GROUP:
        return None
    if group_of_key is None:
        raise ValueError("group_of_key is required for PER_GROUP-keyed chains")
    gok = np.asarray(group_of_key, dtype=np.int64)
    if n_groups is None:
        n_groups = int(gok.max()) + 1
    onehot = np.zeros((gok.size, n_groups), dtype=np.float32)
    onehot[np.arange(gok.size), gok] = 1.0
    return onehot


def make_sharded_structured_neq(op_fun: OptimFunction, widths: GroupWidths,
                                n_cams: int, n_ims: int, mesh: Mesh,
                                loss: str = "linear", f_scale: float = 1.0,
                                group_of_key=None, n_groups=None,
                                loss_semantics: str = "component"):
    """neq with the camera axis of (uv, mask) sharded over the mesh.

    uv/mask enter as (C, I, K[, 2]) camera-major tensors sharded on axis 0;
    parameters are replicated. n_cams must be divisible by the mesh size.

    PER_GROUP-keyed chains pass group_of_key ((k_pad,) key->group map) and
    n_groups, exactly as make_structured_neq.

    :return: neq(pieces, uv, mask, tpl, colmask) -> replicated NormalEq.
    """
    a, b, c = widths.a, widths.b, widths.c
    onehot_kg = _group_onehot(widths, group_of_key, n_groups)
    n_dev = mesh.devices.size
    if n_cams % n_dev != 0:
        raise ValueError(f"{n_cams} cameras not divisible by {n_dev} devices")
    c_loc = n_cams // n_dev

    # fused-reduction kernels built for the per-device slab dims: their
    # in-kernel cam-axis accumulation is shard-local by construction, and
    # the psum below completes the cross-shard reductions
    fused = resolve_fused_grams(op_fun, widths, c_loc, n_ims, loss=loss,
                                f_scale=f_scale,
                                loss_semantics=loss_semantics)
    grams = None if fused is not None else resolve_block_grams(
        op_fun, widths, loss=loss, f_scale=f_scale,
        loss_semantics=loss_semantics)

    piece_spec = ParamPieces(P(), P(), P())

    @partial(shard_map, mesh=mesh,
             in_specs=(piece_spec, P(DETECTION_AXIS), P(DETECTION_AXIS), P(),
                       piece_spec),
             out_specs=NormalEq(*([P()] * 10)),
             check_vma=False)  # Pallas grams inside on TPU: no vma
    def neq(pieces: ParamPieces, uv, mask, tpl, colmask: ParamPieces):
        dtype = uv.dtype
        d = jax.lax.axis_index(DETECTION_AXIS)
        cam_off = d * c_loc
        k_pad = mask.shape[-1]

        cam_loc = jax.lax.dynamic_slice_in_dim(pieces.cam, cam_off, c_loc)
        cmask_loc = jax.lax.dynamic_slice_in_dim(colmask.cam, cam_off, c_loc)

        # local block grid: this device's cameras x all images
        bb = c_loc * n_ims
        cam_b = jnp.repeat(cam_loc, n_ims, axis=0)
        im_b = jnp.tile(pieces.im, (c_loc, 1))
        cmask_b = jnp.repeat(cmask_loc, n_ims, axis=0)
        imask_b = jnp.tile(colmask.im, (c_loc, 1))

        if onehot_kg is not None:  # expand per-group rows onto the key grid
            kg = jnp.asarray(onehot_kg, dtype=dtype)
            keyp = kg @ pieces.key
            kmask = kg @ colmask.key
        else:
            keyp, kmask = pieces.key, colmask.key

        uv_l = uv.reshape(bb, k_pad, 2)
        mask_l = mask.reshape(bb, k_pad)

        if fused is not None:
            family, fused_fn = fused
            if family == "template":
                hcc_loc, hii, wci_loc, gc_loc, gi, cost = fused_fn(
                    cam_b, im_b, tpl, uv_l, mask_l, cmask_b, imask_b)
                hkk = jnp.zeros((k_pad, 0, 0), dtype)
                wck_loc = jnp.zeros((c_loc, k_pad, a, 0), dtype)
                wik = jnp.zeros((n_ims, k_pad, b, 0), dtype)
                gk = jnp.zeros((k_pad, 0), dtype)
            elif family == "selfcal":
                (hcc_loc, hii, hkk, wci_loc, wck_loc, wik, gc_loc, gi, gk,
                 cost) = fused_fn(cam_b, im_b, keyp, uv_l, mask_l, cmask_b,
                                  imask_b, kmask)
            elif family == "freepoint":
                hcc_loc, hkk, wck_loc, gc_loc, gk, cost = fused_fn(
                    cam_b, None, keyp, uv_l, mask_l, cmask_b, None, kmask)
                hii = jnp.zeros((n_ims, 0, 0), dtype)
                wci_loc = jnp.zeros((c_loc, n_ims, a, 0), dtype)
                wik = jnp.zeros((n_ims, k_pad, 0, c), dtype)
                gi = jnp.zeros((n_ims, 0), dtype)
            else:  # "grouped": per-KEY pieces, group-reduced below
                (hcc_loc, hii, hkk, wci_loc, wck_loc, wik, gc_loc, gi, gk,
                 cost) = fused_fn(cam_b, im_b, keyp, tpl, uv_l, mask_l,
                                  cmask_b, imask_b, kmask)
        else:
            (gcc_b, gii_b, wci_b, hkk, wck_b, wik_b, gc_b, gi_b, gk,
             cost) = grams(cam_b, im_b, keyp, tpl, uv_l, mask_l,
                           cmask_b, imask_b, kmask)

            # local reductions (cam-major slab)
            hcc_loc = gcc_b.reshape(c_loc, n_ims, a, a).sum(axis=1)
            gc_loc = gc_b.reshape(c_loc, n_ims, a).sum(axis=1)
            wck_loc = wck_b.reshape(c_loc, n_ims, k_pad, a, c).sum(axis=1)
            hii = gii_b.reshape(c_loc, n_ims, b, b).sum(axis=0)
            gi = gi_b.reshape(c_loc, n_ims, b).sum(axis=0)
            wik = wik_b.reshape(c_loc, n_ims, k_pad, b, c).sum(axis=0)
            wci_loc = wci_b.reshape(c_loc, n_ims, a, b)

        if onehot_kg is not None:  # reduce key-axis pieces to per-group
            kg = jnp.asarray(onehot_kg, dtype=dtype)
            hkk = jnp.einsum("kg,kij->gij", kg, hkk)
            gk = jnp.einsum("kg,ki->gi", kg, gk)
            wck_loc = jnp.einsum("kg,ckap->cgap", kg, wck_loc)
            wik = jnp.einsum("kg,ikbp->igbp", kg, wik)
        k_out = wck_loc.shape[1]

        # place this device's camera slab into the global tensors, then one
        # psum over the mesh replicates the full system everywhere
        zeros = jnp.zeros
        hcc = jax.lax.dynamic_update_slice_in_dim(
            zeros((n_cams, a, a), dtype), hcc_loc, cam_off, 0)
        gc = jax.lax.dynamic_update_slice_in_dim(
            zeros((n_cams, a), dtype), gc_loc, cam_off, 0)
        wck = jax.lax.dynamic_update_slice_in_dim(
            zeros((n_cams, k_out, a, c), dtype), wck_loc, cam_off, 0)
        wci = jax.lax.dynamic_update_slice_in_dim(
            zeros((n_cams, n_ims, a, b), dtype), wci_loc, cam_off, 0)

        out = NormalEq(hcc, hii, hkk, wci, wck, wik, gc, gi, gk, cost)
        return jax.tree_util.tree_map(
            lambda x: jax.lax.psum(x, DETECTION_AXIS), out)

    return neq


def make_pose_sharded_structured_neq(op_fun: OptimFunction,
                                     widths: GroupWidths, n_cams: int,
                                     n_ims: int, mesh: Mesh,
                                     loss: str = "linear",
                                     f_scale: float = 1.0,
                                     group_of_key=None, n_groups=None,
                                     loss_semantics: str = "component"):
    """neq with the POSE (image) axis of (uv, mask) sharded over the mesh.

    uv/mask enter as (C, I, K[, 2]) camera-major tensors sharded on AXIS 1;
    parameters are replicated. n_ims must be divisible by the mesh size
    (pad_pose_axis pads a non-divisible rig with fully-masked images).

    PER_GROUP-keyed chains pass group_of_key/n_groups as in
    make_structured_neq.

    :return: neq(pieces, uv, mask, tpl, colmask) -> replicated NormalEq.
    """
    a, b, c = widths.a, widths.b, widths.c
    onehot_kg = _group_onehot(widths, group_of_key, n_groups)
    n_dev = mesh.devices.size
    if n_ims % n_dev != 0:
        raise ValueError(f"{n_ims} images not divisible by {n_dev} devices")
    i_loc = n_ims // n_dev

    # fused-reduction kernels built for the per-device image slab: the
    # in-kernel cam-axis sums cover only local images, so they are partial
    # and the psum below completes them
    fused = resolve_fused_grams(op_fun, widths, n_cams, i_loc, loss=loss,
                                f_scale=f_scale,
                                loss_semantics=loss_semantics)
    grams = None if fused is not None else resolve_block_grams(
        op_fun, widths, loss=loss, f_scale=f_scale,
        loss_semantics=loss_semantics)

    piece_spec = ParamPieces(P(), P(), P())

    @partial(shard_map, mesh=mesh,
             in_specs=(piece_spec, P(None, DETECTION_AXIS),
                       P(None, DETECTION_AXIS), P(), piece_spec),
             out_specs=NormalEq(*([P()] * 10)),
             check_vma=False)  # Pallas grams inside on TPU: no vma
    def neq(pieces: ParamPieces, uv, mask, tpl, colmask: ParamPieces):
        dtype = uv.dtype
        d = jax.lax.axis_index(DETECTION_AXIS)
        im_off = d * i_loc
        k_pad = mask.shape[-1]

        im_loc = jax.lax.dynamic_slice_in_dim(pieces.im, im_off, i_loc)
        imask_loc = jax.lax.dynamic_slice_in_dim(colmask.im, im_off, i_loc)

        # local block grid: all cameras x this device's images (cam-major)
        bb = n_cams * i_loc
        cam_b = jnp.repeat(pieces.cam, i_loc, axis=0)
        im_b = jnp.tile(im_loc, (n_cams, 1))
        cmask_b = jnp.repeat(colmask.cam, i_loc, axis=0)
        imask_b = jnp.tile(imask_loc, (n_cams, 1))

        if onehot_kg is not None:  # expand per-group rows onto the key grid
            kg = jnp.asarray(onehot_kg, dtype=dtype)
            keyp = kg @ pieces.key
            kmask = kg @ colmask.key
        else:
            keyp, kmask = pieces.key, colmask.key

        uv_l = uv.reshape(bb, k_pad, 2)
        mask_l = mask.reshape(bb, k_pad)

        if fused is not None:
            # per-cam pieces come out as partial sums over this device's
            # images (completed by the psum); per-image pieces are local
            family, fused_fn = fused
            if family == "template":
                hcc, hii_loc, wci_loc, gc, gi_loc, cost = fused_fn(
                    cam_b, im_b, tpl, uv_l, mask_l, cmask_b, imask_b)
                hkk = jnp.zeros((k_pad, 0, 0), dtype)
                wck = jnp.zeros((n_cams, k_pad, a, 0), dtype)
                wik_loc = jnp.zeros((i_loc, k_pad, b, 0), dtype)
                gk = jnp.zeros((k_pad, 0), dtype)
            elif family == "selfcal":
                (hcc, hii_loc, hkk, wci_loc, wck, wik_loc, gc, gi_loc, gk,
                 cost) = fused_fn(cam_b, im_b, keyp, uv_l, mask_l, cmask_b,
                                  imask_b, kmask)
            elif family == "freepoint":
                hcc, hkk, wck, gc, gk, cost = fused_fn(
                    cam_b, None, keyp, uv_l, mask_l, cmask_b, None, kmask)
                hii_loc = jnp.zeros((i_loc, 0, 0), dtype)
                wci_loc = jnp.zeros((n_cams, i_loc, a, 0), dtype)
                wik_loc = jnp.zeros((i_loc, k_pad, 0, c), dtype)
                gi_loc = jnp.zeros((i_loc, 0), dtype)
            else:  # "grouped": per-KEY pieces, group-reduced below
                (hcc, hii_loc, hkk, wci_loc, wck, wik_loc, gc, gi_loc, gk,
                 cost) = fused_fn(cam_b, im_b, keyp, tpl, uv_l, mask_l,
                                  cmask_b, imask_b, kmask)
        else:
            (gcc_b, gii_b, wci_b, hkk, wck_b, wik_b, gc_b, gi_b, gk,
             cost) = grams(cam_b, im_b, keyp, tpl, uv_l, mask_l,
                           cmask_b, imask_b, kmask)

            # local reductions (image-slab): per-cam pieces are partial
            # sums (completed by the psum), per-image pieces are placed at
            # the device's image offset
            hcc = gcc_b.reshape(n_cams, i_loc, a, a).sum(axis=1)
            gc = gc_b.reshape(n_cams, i_loc, a).sum(axis=1)
            wck = wck_b.reshape(n_cams, i_loc, k_pad, a, c).sum(axis=1)
            hii_loc = gii_b.reshape(n_cams, i_loc, b, b).sum(axis=0)
            gi_loc = gi_b.reshape(n_cams, i_loc, b).sum(axis=0)
            wik_loc = wik_b.reshape(n_cams, i_loc, k_pad, b, c).sum(axis=0)
            wci_loc = wci_b.reshape(n_cams, i_loc, a, b)

        if onehot_kg is not None:  # reduce key-axis pieces to per-group
            kg = jnp.asarray(onehot_kg, dtype=dtype)
            hkk = jnp.einsum("kg,kij->gij", kg, hkk)
            gk = jnp.einsum("kg,ki->gi", kg, gk)
            wck = jnp.einsum("kg,ckap->cgap", kg, wck)
            wik_loc = jnp.einsum("kg,ikbp->igbp", kg, wik_loc)
        k_out = wik_loc.shape[1]

        zeros = jnp.zeros
        hii = jax.lax.dynamic_update_slice_in_dim(
            zeros((n_ims, b, b), dtype), hii_loc, im_off, 0)
        gi = jax.lax.dynamic_update_slice_in_dim(
            zeros((n_ims, b), dtype), gi_loc, im_off, 0)
        wik = jax.lax.dynamic_update_slice_in_dim(
            zeros((n_ims, k_out, b, c), dtype), wik_loc, im_off, 0)
        wci = jax.lax.dynamic_update_slice(
            zeros((n_cams, n_ims, a, b), dtype), wci_loc,
            (0 * im_off, im_off, 0 * im_off, 0 * im_off))

        out = NormalEq(hcc, hii, hkk, wci, wck, wik, gc, gi, gk, cost)
        return jax.tree_util.tree_map(
            lambda x: jax.lax.psum(x, DETECTION_AXIS), out)

    return neq


def make_key_sharded_structured_neq(op_fun: OptimFunction,
                                    widths: GroupWidths, n_cams: int,
                                    n_ims: int, mesh: Mesh,
                                    loss: str = "linear",
                                    f_scale: float = 1.0,
                                    loss_semantics: str = "component"):
    """neq with the KEY (structure) axis sharded over the mesh.

    The scaling axis for SfM-like problems: at >=100k free points the
    per-key coupling tensors wck (C, K, a, c) / wik (I, K, b, c) are the
    memory and ICI wall if replicated. Here every device holds all (cam,
    image) blocks but only a K/n_dev slice of the keys: the per-key normal
    equation pieces (hkk, gk, wck, wik) are RETURNED SHARDED and never
    cross ICI — only the small per-cam/per-im partial sums psum. The Schur
    solve downstream contracts over K with sharded operands, so XLA's SPMD
    partitioner reduces those contractions with one (C*a)^2-sized
    all-reduce per solve rather than moving the W tensors.

    uv/mask enter as (C, I, K[, 2]) tensors sharded on axis 2; the key
    pieces of params/colmask and the template table are sharded on axis 0;
    everything else is replicated. k_pad must divide the mesh (always true
    for the default 128-multiple padding on an 8-device mesh). PER_GROUP
    chains have G ~ O(10) key rows — key sharding is meaningless there and
    unsupported.

    :return: neq(pieces, uv, mask, tpl, colmask) -> NormalEq with
        hcc/hii/wci/gc/gi/cost replicated and hkk/gk/wck/wik key-sharded.
    """
    a, b, c = widths.a, widths.b, widths.c
    if widths.key_link == key_type.PER_GROUP:
        raise ValueError("key-axis sharding does not apply to PER_GROUP "
                         "chains (use cam/pose sharding)")
    if c == 0:
        raise ValueError("key-axis sharding needs key-linked parameters")
    # fused kernels: every block is local under key sharding (the devices
    # split the lane/key axis), so the in-kernel accumulations are complete
    # for the local key slice — the per-key pieces stay sharded and only
    # the small per-cam/per-im partial sums psum, exactly as per-block
    fused = resolve_fused_grams(op_fun, widths, n_cams, n_ims, loss=loss,
                                f_scale=f_scale,
                                loss_semantics=loss_semantics)
    grams = None if fused is not None else resolve_block_grams(
        op_fun, widths, loss=loss, f_scale=f_scale,
        loss_semantics=loss_semantics)
    n_dev = mesh.devices.size

    def _check_divisible(k_pad: int):
        if k_pad % n_dev != 0:
            raise ValueError(
                f"{k_pad} key slots not divisible by {n_dev} devices; "
                "pad the key axis (k_pad_multiple) to a mesh multiple")

    piece_spec = ParamPieces(P(), P(), P(DETECTION_AXIS))
    out_spec = NormalEq(
        hcc=P(), hii=P(), hkk=P(DETECTION_AXIS), wci=P(),
        wck=P(None, DETECTION_AXIS), wik=P(None, DETECTION_AXIS),
        gc=P(), gi=P(), gk=P(DETECTION_AXIS), cost=P())

    @partial(shard_map, mesh=mesh,
             in_specs=(piece_spec, P(None, None, DETECTION_AXIS),
                       P(None, None, DETECTION_AXIS), P(DETECTION_AXIS),
                       piece_spec),
             out_specs=out_spec,
             check_vma=False)  # Pallas grams inside on TPU: no vma
    def _neq(pieces: ParamPieces, uv, mask, tpl, colmask: ParamPieces):
        dtype = uv.dtype
        k_loc = mask.shape[-1]
        bb = n_cams * n_ims
        cam_b = jnp.repeat(pieces.cam, n_ims, axis=0)
        im_b = jnp.tile(pieces.im, (n_cams, 1))
        cmask_b = jnp.repeat(colmask.cam, n_ims, axis=0)
        imask_b = jnp.tile(colmask.im, (n_cams, 1))

        uv_l = uv.reshape(bb, k_loc, 2)
        mask_l = mask.reshape(bb, k_loc)

        if fused is not None:
            family, fused_fn = fused
            if family == "selfcal":
                (hcc, hii, hkk, wci, wck, wik, gc, gi, gk,
                 cost) = fused_fn(cam_b, im_b, pieces.key, uv_l, mask_l,
                                  cmask_b, imask_b, colmask.key)
            else:  # freepoint (template/grouped rejected above: c > 0)
                hcc, hkk, wck, gc, gk, cost = fused_fn(
                    cam_b, None, pieces.key, uv_l, mask_l, cmask_b, None,
                    colmask.key)
                hii = jnp.zeros((n_ims, 0, 0), dtype)
                wci = jnp.zeros((n_cams, n_ims, a, 0), dtype)
                wik = jnp.zeros((n_ims, k_loc, 0, c), dtype)
                gi = jnp.zeros((n_ims, 0), dtype)
        else:
            (gcc_b, gii_b, wci_b, hkk, wck_b, wik_b, gc_b, gi_b, gk,
             cost) = grams(cam_b, im_b, pieces.key, tpl, uv_l, mask_l,
                           cmask_b, imask_b, colmask.key)

            # per-cam/per-im pieces: partial sums over this device's keys,
            # completed by a psum of SMALL tensors; per-key pieces local
            hcc = gcc_b.reshape(n_cams, n_ims, a, a).sum(axis=1)
            hii = gii_b.reshape(n_cams, n_ims, b, b).sum(axis=0)
            gc = gc_b.reshape(n_cams, n_ims, a).sum(axis=1)
            gi = gi_b.reshape(n_cams, n_ims, b).sum(axis=0)
            wci = wci_b.reshape(n_cams, n_ims, a, b)
            wck = wck_b.reshape(n_cams, n_ims, k_loc, a, c).sum(axis=1)
            wik = wik_b.reshape(n_cams, n_ims, k_loc, b, c).sum(axis=0)

        small = (hcc, hii, wci, gc, gi, cost)
        hcc, hii, wci, gc, gi, cost = jax.tree_util.tree_map(
            lambda x: jax.lax.psum(x, DETECTION_AXIS), small)
        return NormalEq(hcc, hii, hkk, wci, wck, wik, gc, gi, gk, cost)

    def neq(pieces, uv, mask, tpl, colmask):
        _check_divisible(mask.shape[-1])   # clear error, like cam/pose modes
        return _neq(pieces, uv, mask, tpl, colmask)

    return neq


def shard_key_data(mesh: Mesh, uv, mask, tpl, n_cams: int):
    """Place (B, K[,2]) block DATA camera-major with the key axis sharded
    over the mesh — the layout make_key_sharded_* expects. Shared by
    shard_key_arrays and the driver (backend="sharded", shard_axis="key";
    parameters there are rebuilt per solve and resharded by the shard_map
    in_specs)."""
    b, k = np.shape(mask)
    n_ims = b // n_cams
    uv_c = jax.device_put(jnp.reshape(uv, (n_cams, n_ims, k, 2)),
                          NamedSharding(mesh, P(None, None, DETECTION_AXIS,
                                                None)))
    mask_c = jax.device_put(jnp.reshape(mask, (n_cams, n_ims, k)),
                            NamedSharding(mesh, P(None, None,
                                                  DETECTION_AXIS)))
    tpl_s = jax.device_put(tpl, NamedSharding(mesh, P(DETECTION_AXIS)))
    return uv_c, mask_c, tpl_s


def shard_key_arrays(mesh: Mesh, uv, mask, tpl, pieces: ParamPieces,
                     colmask: ParamPieces, n_cams: int):
    """Place a block-grid problem with the KEY axis sharded over the mesh.

    :param uv: (B, K, 2) block observations. :param mask: (B, K).
    :return: (uv (C,I,K,2), mask (C,I,K), tpl, pieces, colmask) with the
        key axes sharded and everything else replicated.
    """
    uv_c, mask_c, tpl_s = shard_key_data(mesh, uv, mask, tpl, n_cams)
    row_sh = NamedSharding(mesh, P(DETECTION_AXIS))
    rep = NamedSharding(mesh, P())
    pieces_s = ParamPieces(jax.device_put(pieces.cam, rep),
                           jax.device_put(pieces.im, rep),
                           jax.device_put(pieces.key, row_sh))
    colmask_s = ParamPieces(jax.device_put(colmask.cam, rep),
                            jax.device_put(colmask.im, rep),
                            jax.device_put(colmask.key, row_sh))
    return uv_c, mask_c, tpl_s, pieces_s, colmask_s


def choose_shard_axis(n_cams: int, n_ims: int, n_dev: int) -> str:
    """'cam' or 'pose': prefer the axis that divides the mesh evenly, and
    among valid choices the one with more slabs per device (better balance;
    pose wins for few-camera many-pose rigs). When neither axis divides,
    'pose' is returned: the pose axis pads with fully-masked images
    (pad_pose_axis), so any rig shards."""
    cam_ok = n_cams % n_dev == 0
    pose_ok = n_ims % n_dev == 0
    if cam_ok and pose_ok:
        return "pose" if n_ims > n_cams else "cam"
    if cam_ok:
        return "cam"
    return "pose"


def pad_pose_axis(uv, mask, pieces: ParamPieces, colmask: ParamPieces,
                  n_cams: int, n_dev: int):
    """Pad the image axis of a block-grid problem to a multiple of n_dev.

    Pad images replicate image 0's pose under an all-zero detection mask and
    an all-zero parameter column mask: their residual rows contribute
    nothing (row mask), their pose columns take exact zero steps (column
    mask + the LM damping floor), and replicating a REAL pose keeps every
    projected point finite (NaN-safety — pad blocks still evaluate the
    projection chain before masking).

    :param uv: (B, K, 2) block observations, B = n_cams * n_ims row-major.
    :param mask: (B, K) block row masks.
    :return: (uv_pad, mask_pad, pieces_pad, colmask_pad, n_ims_pad).
    """
    b, k = np.shape(mask)
    n_ims = b // n_cams
    n_ims_pad = -(-n_ims // n_dev) * n_dev
    if n_ims_pad == n_ims:
        return uv, mask, pieces, colmask, n_ims
    reps = n_ims_pad - n_ims
    uv_c = np.reshape(np.asarray(uv), (n_cams, n_ims, k, 2))
    mask_c = np.reshape(np.asarray(mask), (n_cams, n_ims, k))
    uv_c = np.concatenate(
        [uv_c, np.repeat(uv_c[:, :1], reps, axis=1)], axis=1)
    mask_c = np.concatenate(
        [mask_c, np.zeros((n_cams, reps, k), mask_c.dtype)], axis=1)
    im_pad = jnp.concatenate(
        [pieces.im, jnp.repeat(pieces.im[:1], reps, axis=0)])
    imask_pad = jnp.concatenate(
        [colmask.im, jnp.zeros((reps, colmask.im.shape[1]),
                               colmask.im.dtype)])
    return (jnp.asarray(uv_c.reshape(n_cams * n_ims_pad, k, 2), uv.dtype),
            jnp.asarray(mask_c.reshape(n_cams * n_ims_pad, k), mask.dtype),
            ParamPieces(pieces.cam, im_pad, pieces.key),
            ParamPieces(colmask.cam, imask_pad, colmask.key), n_ims_pad)


def make_sharded_structured_solver(op_fun: OptimFunction, widths: GroupWidths,
                                   n_cams: int, n_ims: int, mesh: Mesh,
                                   colmask: ParamPieces, max_nfev: int = 100,
                                   loss: str = "linear", f_scale: float = 1.0,
                                   reduced_solver: str = "dense",
                                   shard_axis: str = "cam",
                                   group_of_key=None, n_groups=None,
                                   loss_semantics: str = "component"):
    """A jitted multi-device LM solve on the structured backend.

    :return: solve(pieces, uv, mask, tpl) -> SLMResult; uv/mask are
        camera-major (C, I, K[, 2]) tensors sharded on axis 0 ('cam') or
        axis 1 ('pose').
    """
    if shard_axis == "key":
        neq = make_key_sharded_structured_neq(
            op_fun, widths, n_cams, n_ims, mesh, loss=loss, f_scale=f_scale,
            loss_semantics=loss_semantics)
    elif shard_axis in ("cam", "pose"):
        make = (make_pose_sharded_structured_neq if shard_axis == "pose"
                else make_sharded_structured_neq)
        neq = make(op_fun, widths, n_cams, n_ims, mesh, loss=loss,
                   f_scale=f_scale, group_of_key=group_of_key,
                   n_groups=n_groups, loss_semantics=loss_semantics)
    else:  # same contract as the mixed backend: typos fail loudly
        raise ValueError(f"unknown shard_axis {shard_axis!r} "
                         "(expected 'cam', 'pose' or 'key')")

    @jax.jit
    def solve(pieces: ParamPieces, uv, mask, tpl) -> SLMResult:
        return structured_lm_solve(
            lambda p: neq(p, uv, mask, tpl, colmask), pieces,
            max_nfev=max_nfev, reduced_solver=reduced_solver)

    return solve


def shard_block_arrays(mesh: Mesh, uv, mask, n_cams: int,
                       shard_axis: str = "cam"):
    """(B, K, 2)/(B, K) block arrays -> camera-major (C, I, K, 2)/(C, I, K)
    placed with the camera ('cam') or image ('pose') axis sharded."""
    b, k = np.shape(mask)
    n_ims = b // n_cams
    uv_c = jnp.reshape(uv, (n_cams, n_ims, k, 2))
    mask_c = jnp.reshape(mask, (n_cams, n_ims, k))
    spec = P(DETECTION_AXIS) if shard_axis == "cam" else P(None, DETECTION_AXIS)
    sh = NamedSharding(mesh, spec)
    return jax.device_put(uv_c, sh), jax.device_put(mask_c, sh)
