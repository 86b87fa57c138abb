"""Multi-device structured BA: shard the block axis, psum the normal equations.

The (cam x im, key) block grid shards on its block axis across a 1-D mesh:
each device computes per-block grams for its contiguous slab of blocks
(make_block_grams), contracts them against its slice of the block->cam /
block->im one-hot matrices, places its wci blocks into the global (C,I,a,b)
tensor at its slab offset, and a single psum over ICI produces the replicated
NormalEq. The Schur solve and LM control flow run replicated on every device.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pycamset_tpu.optim.chain import OptimFunction
from pycamset_tpu.optim.structured import (
    GroupWidths, NormalEq, ParamPieces, block_onehots, make_block_grams)
from pycamset_tpu.optim.structured_lm import SLMResult, structured_lm_solve
from pycamset_tpu.parallel.mesh import DETECTION_AXIS


def make_sharded_structured_neq(op_fun: OptimFunction, widths: GroupWidths,
                                n_cams: int, n_ims: int, mesh: Mesh,
                                loss: str = "linear", f_scale: float = 1.0):
    """neq with the block axis of (uv, mask) sharded over the mesh.

    :return: neq(pieces, uv, mask, tpl, colmask) -> replicated NormalEq.
        n_cams * n_ims must be divisible by the mesh size.
    """
    import os

    import jax as _jax

    a, b, c = widths.a, widths.b, widths.c
    grams = make_block_grams(op_fun, widths, loss=loss, f_scale=f_scale)
    # per-shard fused Pallas grams on TPU meshes (same dispatch rule as the
    # single-device path; each device runs the kernel over its block slab)
    if ((a, b, c) == (15, 6, 0) and loss == "linear"
            and _jax.default_backend() == "tpu"
            and not os.environ.get("PYCAMSET_NO_PALLAS")):
        names = tuple(type(bk).__name__ for bk in op_fun.blocks)
        if names == ("Projection", "Extrinsic3D", "TemplatePoints"):
            from pycamset_tpu.optim.pallas_grams import (
                make_pallas_template_grams)
            grams = make_pallas_template_grams(widths)
    blk_cam, blk_im, onehot_cam_np, onehot_im_np = block_onehots(n_cams, n_ims)
    n_blocks = n_cams * n_ims
    n_dev = mesh.devices.size
    if n_blocks % n_dev != 0:
        raise ValueError(f"{n_blocks} blocks not divisible by {n_dev} devices")
    b_loc = n_blocks // n_dev

    piece_spec = ParamPieces(P(), P(), P())

    @partial(shard_map, mesh=mesh,
             in_specs=(piece_spec, P(DETECTION_AXIS), P(DETECTION_AXIS), P(),
                       piece_spec),
             out_specs=NormalEq(*([P()] * 10)))
    def neq(pieces: ParamPieces, uv, mask, tpl, colmask: ParamPieces):
        dtype = uv.dtype
        d = jax.lax.axis_index(DETECTION_AXIS)
        off = d * b_loc

        blk_cam_loc = jax.lax.dynamic_slice_in_dim(
            jnp.asarray(blk_cam), off, b_loc)
        blk_im_loc = jax.lax.dynamic_slice_in_dim(
            jnp.asarray(blk_im), off, b_loc)
        oh_cam = jax.lax.dynamic_slice_in_dim(
            jnp.asarray(onehot_cam_np, dtype=dtype), off, b_loc, axis=1)
        oh_im = jax.lax.dynamic_slice_in_dim(
            jnp.asarray(onehot_im_np, dtype=dtype), off, b_loc, axis=1)

        (gcc_b, gii_b, wci_b, hkk, wck_b, wik_b, gc_b, gi_b, gk,
         cost) = grams(pieces.cam[blk_cam_loc], pieces.im[blk_im_loc],
                       pieces.key, tpl, uv, mask, colmask.cam[blk_cam_loc],
                       colmask.im[blk_im_loc], colmask.key)

        k_pad = wck_b.shape[1]
        hcc = (oh_cam @ gcc_b.reshape(b_loc, -1)).reshape(n_cams, a, a)
        hii = (oh_im @ gii_b.reshape(b_loc, -1)).reshape(n_ims, b, b)
        gc = oh_cam @ gc_b
        gi = oh_im @ gi_b
        wck = (oh_cam @ wck_b.reshape(b_loc, -1)).reshape(n_cams, k_pad, a, c)
        wik = (oh_im @ wik_b.reshape(b_loc, -1)).reshape(n_ims, k_pad, b, c)
        # local slab of wci blocks into the global (B,a,b), then reshape
        wci_full = jnp.zeros((n_blocks, a, b), dtype=dtype)
        wci_full = jax.lax.dynamic_update_slice_in_dim(wci_full, wci_b, off, 0)
        wci = wci_full.reshape(n_cams, n_ims, a, b)

        out = NormalEq(hcc, hii, hkk, wci, wck, wik, gc, gi, gk, cost)
        return jax.tree_util.tree_map(
            lambda x: jax.lax.psum(x, DETECTION_AXIS), out)

    return neq


def make_sharded_structured_solver(op_fun: OptimFunction, widths: GroupWidths,
                                   n_cams: int, n_ims: int, mesh: Mesh,
                                   colmask: ParamPieces, max_nfev: int = 100,
                                   loss: str = "linear", f_scale: float = 1.0):
    """A jitted multi-device LM solve on the structured backend.

    :return: solve(pieces, uv, mask, tpl) -> SLMResult; uv/mask must be
        placed with their block axis sharded over the mesh.
    """
    neq = make_sharded_structured_neq(op_fun, widths, n_cams, n_ims, mesh,
                                      loss=loss, f_scale=f_scale)

    @jax.jit
    def solve(pieces: ParamPieces, uv, mask, tpl) -> SLMResult:
        return structured_lm_solve(
            lambda p: neq(p, uv, mask, tpl, colmask), pieces,
            max_nfev=max_nfev)

    return solve


def shard_block_arrays(mesh: Mesh, uv, mask):
    """Place (uv, mask) with the block axis sharded over the mesh."""
    sh = NamedSharding(mesh, P(DETECTION_AXIS))
    return jax.device_put(uv, sh), jax.device_put(mask, sh)
