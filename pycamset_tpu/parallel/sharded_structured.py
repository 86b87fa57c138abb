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

choose_shard_axis picks between them. No gather tables and no one-hot
constants (which embed O(C*I^2) bytes in the executable). The Schur solve
and LM control flow run replicated on every device — they are tiny relative
to the residual work.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pycamset_tpu.optim.blocks import key_type
from pycamset_tpu.optim.chain import OptimFunction
from pycamset_tpu.optim.structured import (
    GroupWidths, NormalEq, ParamPieces, make_block_grams)
from pycamset_tpu.optim.structured_lm import SLMResult, structured_lm_solve
from pycamset_tpu.parallel.mesh import DETECTION_AXIS


def _reject_grouped(widths: GroupWidths):
    if widths.key_link == key_type.PER_GROUP:
        from pycamset_tpu.optim.structured import UnsupportedChain
        raise UnsupportedChain(
            "PER_GROUP-keyed chains are single-device only for now "
            "(use make_structured_neq)")


def make_sharded_structured_neq(op_fun: OptimFunction, widths: GroupWidths,
                                n_cams: int, n_ims: int, mesh: Mesh,
                                loss: str = "linear", f_scale: float = 1.0):
    """neq with the camera axis of (uv, mask) sharded over the mesh.

    uv/mask enter as (C, I, K[, 2]) camera-major tensors sharded on axis 0;
    parameters are replicated. n_cams must be divisible by the mesh size.

    :return: neq(pieces, uv, mask, tpl, colmask) -> replicated NormalEq.
    """
    a, b, c = widths.a, widths.b, widths.c
    _reject_grouped(widths)
    grams = make_block_grams(op_fun, widths, loss=loss, f_scale=f_scale)
    n_dev = mesh.devices.size
    if n_cams % n_dev != 0:
        raise ValueError(f"{n_cams} cameras not divisible by {n_dev} devices")
    c_loc = n_cams // n_dev

    piece_spec = ParamPieces(P(), P(), P())

    @partial(shard_map, mesh=mesh,
             in_specs=(piece_spec, P(DETECTION_AXIS), P(DETECTION_AXIS), P(),
                       piece_spec),
             out_specs=NormalEq(*([P()] * 10)))
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

        (gcc_b, gii_b, wci_b, hkk, wck_b, wik_b, gc_b, gi_b, gk,
         cost) = grams(cam_b, im_b, pieces.key, tpl,
                       uv.reshape(bb, k_pad, 2), mask.reshape(bb, k_pad),
                       cmask_b, imask_b, colmask.key)

        # local reductions (cam-major slab)
        hcc_loc = gcc_b.reshape(c_loc, n_ims, a, a).sum(axis=1)
        gc_loc = gc_b.reshape(c_loc, n_ims, a).sum(axis=1)
        wck_loc = wck_b.reshape(c_loc, n_ims, k_pad, a, c).sum(axis=1)
        hii = gii_b.reshape(c_loc, n_ims, b, b).sum(axis=0)
        gi = gi_b.reshape(c_loc, n_ims, b).sum(axis=0)
        wik = wik_b.reshape(c_loc, n_ims, k_pad, b, c).sum(axis=0)
        wci_loc = wci_b.reshape(c_loc, n_ims, a, b)

        # place this device's camera slab into the global tensors, then one
        # psum over the mesh replicates the full system everywhere
        zeros = jnp.zeros
        hcc = jax.lax.dynamic_update_slice_in_dim(
            zeros((n_cams, a, a), dtype), hcc_loc, cam_off, 0)
        gc = jax.lax.dynamic_update_slice_in_dim(
            zeros((n_cams, a), dtype), gc_loc, cam_off, 0)
        wck = jax.lax.dynamic_update_slice_in_dim(
            zeros((n_cams, k_pad, a, c), dtype), wck_loc, cam_off, 0)
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
                                     f_scale: float = 1.0):
    """neq with the POSE (image) axis of (uv, mask) sharded over the mesh.

    uv/mask enter as (C, I, K[, 2]) camera-major tensors sharded on AXIS 1;
    parameters are replicated. n_ims must be divisible by the mesh size.

    :return: neq(pieces, uv, mask, tpl, colmask) -> replicated NormalEq.
    """
    a, b, c = widths.a, widths.b, widths.c
    _reject_grouped(widths)
    grams = make_block_grams(op_fun, widths, loss=loss, f_scale=f_scale)
    n_dev = mesh.devices.size
    if n_ims % n_dev != 0:
        raise ValueError(f"{n_ims} images not divisible by {n_dev} devices")
    i_loc = n_ims // n_dev

    piece_spec = ParamPieces(P(), P(), P())

    @partial(shard_map, mesh=mesh,
             in_specs=(piece_spec, P(None, DETECTION_AXIS),
                       P(None, DETECTION_AXIS), P(), piece_spec),
             out_specs=NormalEq(*([P()] * 10)))
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

        (gcc_b, gii_b, wci_b, hkk, wck_b, wik_b, gc_b, gi_b, gk,
         cost) = grams(cam_b, im_b, pieces.key, tpl,
                       uv.reshape(bb, k_pad, 2), mask.reshape(bb, k_pad),
                       cmask_b, imask_b, colmask.key)

        # local reductions (image-slab): per-cam pieces are partial sums
        # (completed by the psum), per-image pieces are placed at the
        # device's image offset
        hcc = gcc_b.reshape(n_cams, i_loc, a, a).sum(axis=1)
        gc = gc_b.reshape(n_cams, i_loc, a).sum(axis=1)
        wck = wck_b.reshape(n_cams, i_loc, k_pad, a, c).sum(axis=1)
        hii_loc = gii_b.reshape(n_cams, i_loc, b, b).sum(axis=0)
        gi_loc = gi_b.reshape(n_cams, i_loc, b).sum(axis=0)
        wik_loc = wik_b.reshape(n_cams, i_loc, k_pad, b, c).sum(axis=0)
        wci_loc = wci_b.reshape(n_cams, i_loc, a, b)

        zeros = jnp.zeros
        hii = jax.lax.dynamic_update_slice_in_dim(
            zeros((n_ims, b, b), dtype), hii_loc, im_off, 0)
        gi = jax.lax.dynamic_update_slice_in_dim(
            zeros((n_ims, b), dtype), gi_loc, im_off, 0)
        wik = jax.lax.dynamic_update_slice_in_dim(
            zeros((n_ims, k_pad, b, c), dtype), wik_loc, im_off, 0)
        wci = jax.lax.dynamic_update_slice(
            zeros((n_cams, n_ims, a, b), dtype), wci_loc,
            (0 * im_off, im_off, 0 * im_off, 0 * im_off))

        out = NormalEq(hcc, hii, hkk, wci, wck, wik, gc, gi, gk, cost)
        return jax.tree_util.tree_map(
            lambda x: jax.lax.psum(x, DETECTION_AXIS), out)

    return neq


def choose_shard_axis(n_cams: int, n_ims: int, n_dev: int) -> str:
    """'cam' or 'pose': prefer the axis that divides the mesh evenly, and
    among valid choices the one with more slabs per device (better balance;
    pose wins for few-camera many-pose rigs)."""
    cam_ok = n_cams % n_dev == 0
    pose_ok = n_ims % n_dev == 0
    if cam_ok and pose_ok:
        return "pose" if n_ims > n_cams else "cam"
    if cam_ok:
        return "cam"
    if pose_ok:
        return "pose"
    raise ValueError(
        f"Neither {n_cams} cameras nor {n_ims} images divide evenly over "
        f"{n_dev} devices; pad the rig (im_bucket) or change the mesh.")


def make_sharded_structured_solver(op_fun: OptimFunction, widths: GroupWidths,
                                   n_cams: int, n_ims: int, mesh: Mesh,
                                   colmask: ParamPieces, max_nfev: int = 100,
                                   loss: str = "linear", f_scale: float = 1.0,
                                   reduced_solver: str = "dense",
                                   shard_axis: str = "cam"):
    """A jitted multi-device LM solve on the structured backend.

    :return: solve(pieces, uv, mask, tpl) -> SLMResult; uv/mask are
        camera-major (C, I, K[, 2]) tensors sharded on axis 0 ('cam') or
        axis 1 ('pose').
    """
    make = (make_pose_sharded_structured_neq if shard_axis == "pose"
            else make_sharded_structured_neq)
    neq = make(op_fun, widths, n_cams, n_ims, mesh, loss=loss,
               f_scale=f_scale)

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
