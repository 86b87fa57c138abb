"""Structured normal equations for MIXED PER_KEY + PER_GROUP chains.

The flagship mixed formulation is multi-target SELF-calibration: free
per-key target geometry AND a free per-group relative pose for each of
several rigidly-coupled targets,

    Xc = Re (Rp (Rg Xk + tg) + tp) + te
         cam   image  group  free point

(chain Projection + Extrinsic3D + RigidTform3d + GroupRigidTform3d +
FreePoint). Neither the pure-keyed nor the pure-grouped structured layout
covers this: the key-axis now carries TWO couplings — per-key blocks and
per-group blocks tied across every key of the group — so the damped system
has arrow structure

    [ Hcc  Wci  Wcg | Wck ]
    [  .   Hii  Wig | Wik ]
    [  .    .   Hgg | Wkg']      (Hkk block-diag per key; Wkg per key,
    [  .    .    .  | Hkk ]       each key couples to exactly ONE group)

Eliminating the per-key blocks first (classic reduced camera system) folds
Wkg into the group rows, leaving a small dense [cam | pose | group] system;
groups are O(10), so they ride the dense reduced solve. Everything
assembles from ONE gram computation over the (B, K) block grid with the
c-axis = [group cols | key cols] in chain order — the group columns hold
the group pose EXPANDED per key by the (K, G) one-hot, and the per-group
blocks reduce back through it (each key belongs to exactly one group, so
cross-group couplings vanish identically).

Previously these chains fell to the generic scatter backend
(~2 s/iteration at 500k detections on TPU); this path keeps them on
batched matmuls end to end.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from pycamset_tpu.optim.blocks import key_type
from pycamset_tpu.optim.chain import OptimFunction
from pycamset_tpu.optim.structured import (
    GroupWidths, UnsupportedChain, _normalized_inv, _psd_solve,
    make_block_grams)


class MixedWidths(NamedTuple):
    """Column widths and c-axis layout of a mixed chain.

    key_cols / grp_cols index the PER_KEY / PER_GROUP columns within the
    chain-ordered c-axis (c = ck + cg).
    """
    a: int
    b: int
    ck: int
    cg: int
    key_cols: tuple
    grp_cols: tuple

    @property
    def c(self):
        return self.ck + self.cg


def mixed_chain_widths(op_fun: OptimFunction) -> MixedWidths:
    """Widths/layout for a chain mixing PER_KEY and PER_GROUP params.

    Requires group order cam*, im*, then any mix of key/group-linked
    groups; raises UnsupportedChain otherwise (or if the chain is not
    actually mixed — pure chains belong on make_structured_neq).
    """
    a = b = 0
    c_links = []
    phase = 0  # 0 = cams, 1 = images, 2 = key axis
    for g in op_fun.groups:
        if g.link == key_type.PER_CAM:
            if phase > 0:
                raise UnsupportedChain("cam groups must come first")
            a += g.n
        elif g.link == key_type.PER_IMG:
            if phase > 1:
                raise UnsupportedChain("image groups must precede key axis")
            phase = 1
            b += g.n
        elif g.link in (key_type.PER_KEY, key_type.PER_GROUP):
            phase = 2
            c_links.append((g.link, g.n))
        else:
            raise UnsupportedChain(
                f"{g.link.name} groups unsupported on the structured path")
    kinds = {lk for lk, _ in c_links}
    if kinds != {key_type.PER_KEY, key_type.PER_GROUP}:
        raise UnsupportedChain(
            "mixed path needs BOTH PER_KEY and PER_GROUP groups")
    key_cols, grp_cols = [], []
    off = 0
    for lk, n in c_links:
        cols = list(range(off, off + n))
        (key_cols if lk == key_type.PER_KEY else grp_cols).extend(cols)
        off += n
    return MixedWidths(a, b, len(key_cols), len(grp_cols),
                       tuple(key_cols), tuple(grp_cols))


class MixedPieces(NamedTuple):
    cam: jnp.ndarray   # (C, a)
    im: jnp.ndarray    # (I, b)
    key: jnp.ndarray   # (K, ck)
    grp: jnp.ndarray   # (G, cg)


class MixedNormalEq(NamedTuple):
    hcc: jnp.ndarray   # (C, a, a)
    hii: jnp.ndarray   # (I, b, b)
    hkk: jnp.ndarray   # (K, ck, ck)
    hgg: jnp.ndarray   # (G, cg, cg)
    wci: jnp.ndarray   # (C, I, a, b)
    wck: jnp.ndarray   # (C, K, a, ck)
    wik: jnp.ndarray   # (I, K, b, ck)
    wcg: jnp.ndarray   # (C, G, a, cg)
    wig: jnp.ndarray   # (I, G, b, cg)
    wkg: jnp.ndarray   # (K, ck, cg)  — key vs ITS OWN group only
    gc: jnp.ndarray
    gi: jnp.ndarray
    gk: jnp.ndarray
    gg: jnp.ndarray
    cost: jnp.ndarray


def split_full_mixed(full, op_fun: OptimFunction, struct, n_cams: int,
                     n_ims: int, n_keys: int, n_groups: int,
                     xp=jnp) -> MixedPieces:
    """Full [group-major] parameter vector -> unpadded MixedPieces.

    ``xp=np`` keeps the pieces on the host (captured closure constants
    must never be device arrays — see structured.split_full_params).
    Shared by the single-rig mixed builder (structured_driver.py) and the
    mixed fleet path (fleet.py)."""
    cam_parts, im_parts, key_parts, grp_parts = [], [], [], []
    for gi_, g in enumerate(op_fun.groups):
        sl = struct.group_slice(gi_)
        chunk = full[sl.start:sl.stop]
        if g.link == key_type.PER_CAM:
            cam_parts.append(chunk.reshape(n_cams, g.n))
        elif g.link == key_type.PER_IMG:
            im_parts.append(chunk.reshape(n_ims, g.n))
        elif g.link == key_type.PER_KEY:
            key_parts.append(chunk.reshape(n_keys, g.n))
        else:
            grp_parts.append(chunk.reshape(n_groups, g.n))
    return MixedPieces(xp.concatenate(cam_parts, axis=1),
                       xp.concatenate(im_parts, axis=1),
                       xp.concatenate(key_parts, axis=1),
                       xp.concatenate(grp_parts, axis=1))


def pad_mixed_pieces(p: MixedPieces, n_keys: int, k_pad: int, n_ims: int,
                     n_ims_grid: int, xp=jnp) -> MixedPieces:
    """Pad key rows (replicating key 0 — NaN-safety, masks kill them) and
    image rows (replicating row 0) onto the device grid."""
    if xp is jnp:
        key = jnp.tile(p.key[:1], (k_pad, 1)).at[:n_keys].set(p.key)
        im = jnp.tile(p.im[:1], (n_ims_grid, 1)).at[:n_ims].set(p.im)
    else:
        key = np.tile(p.key[:1], (k_pad, 1))
        key[:n_keys] = p.key
        im = np.tile(p.im[:1], (n_ims_grid, 1))
        im[:n_ims] = p.im
    return MixedPieces(p.cam, im, key, p.grp)


def merge_mixed_to_full(p: MixedPieces, op_fun: OptimFunction, struct,
                        n_cams: int, n_ims: int, n_keys: int,
                        n_groups: int) -> np.ndarray:
    """Inverse of split_full_mixed (padding rows ignored)."""
    out = np.zeros(struct.total)
    cam_off = im_off = key_off = grp_off = 0
    for gi_, g in enumerate(op_fun.groups):
        sl = struct.group_slice(gi_)
        if g.link == key_type.PER_CAM:
            out[sl.start:sl.stop] = np.asarray(
                p.cam[:, cam_off:cam_off + g.n]).ravel()
            cam_off += g.n
        elif g.link == key_type.PER_IMG:
            out[sl.start:sl.stop] = np.asarray(
                p.im[:n_ims, im_off:im_off + g.n]).ravel()
            im_off += g.n
        elif g.link == key_type.PER_KEY:
            out[sl.start:sl.stop] = np.asarray(
                p.key[:n_keys, key_off:key_off + g.n]).ravel()
            key_off += g.n
        else:
            out[sl.start:sl.stop] = np.asarray(
                p.grp[:, grp_off:grp_off + g.n]).ravel()
            grp_off += g.n
    return out


def resolve_mixed_grams(op_fun: OptimFunction, widths: MixedWidths,
                        loss: str = "linear", f_scale: float = 1.0,
                        loss_semantics: str = "component"):
    """The per-block gram builder for a mixed chain: the fused Pallas
    kernel on TPU when the canonical multi-target self-cal chain matches
    (same speed class as the pure-keyed kernels), else the XLA closed
    form. The single dispatch point for both the single-device and the
    sharded backends."""
    import os

    names = tuple(type(bk).__name__ for bk in op_fun.blocks)
    if (jax.default_backend() == "tpu"
            and not os.environ.get("PYCAMSET_NO_PALLAS")
            and widths.a in (14, 15, 18, 22, 24) and widths.b == 6
            and (widths.ck, widths.cg) == (3, 6)
            and widths.grp_cols == (0, 1, 2, 3, 4, 5)
            and widths.key_cols == (6, 7, 8)
            and names[1:] == ("Extrinsic3D", "RigidTform3d",
                              "GroupRigidTform3d", "FreePoint")
            and names[0] in ("Projection", "ProjectionRational",
                             "ProjectionThinPrism", "ProjectionTilted",
                             "ProjectionFisheye")):
        from pycamset_tpu.optim.pallas_grams import make_pallas_mixed_grams
        return make_pallas_mixed_grams(
            GroupWidths(widths.a, widths.b, widths.c), loss=loss,
            f_scale=f_scale, loss_semantics=loss_semantics)
    return make_block_grams(
        op_fun, GroupWidths(widths.a, widths.b, widths.c), loss=loss,
        f_scale=f_scale, loss_semantics=loss_semantics)


def resolve_mixed_grams_fused(op_fun: OptimFunction, widths: MixedWidths,
                              n_cams: int, n_ims: int, loss: str = "linear",
                              f_scale: float = 1.0,
                              loss_semantics: str = "component"):
    """The FUSED-reduction mixed gram builder, or None when it does not
    apply. Dispatch companion to resolve_mixed_grams; the sharded backend
    passes its per-device slab dims as (n_cams, n_ims), so the in-kernel
    accumulation stays shard-local and the cross-shard psum completes it.
    Applies on TPU for the canonical chain when the image-axis padding to
    the tile of 8 stays under 25%; PYCAMSET_FUSED_MIXED=0/1 forces."""
    import os

    names = tuple(type(bk).__name__ for bk in op_fun.blocks)
    if not (jax.default_backend() == "tpu"
            and not os.environ.get("PYCAMSET_NO_PALLAS")
            and widths.a in (14, 15, 18, 22, 24) and widths.b == 6
            and (widths.ck, widths.cg) == (3, 6)
            and widths.grp_cols == (0, 1, 2, 3, 4, 5)
            and widths.key_cols == (6, 7, 8)
            and names[1:] == ("Extrinsic3D", "RigidTform3d",
                              "GroupRigidTform3d", "FreePoint")
            and names[0] in ("Projection", "ProjectionRational",
                             "ProjectionThinPrism", "ProjectionTilted",
                             "ProjectionFisheye")):
        return None
    from pycamset_tpu.optim.structured import fused_tile_pad_ok
    tile = 8
    if not fused_tile_pad_ok(n_ims, tile, 0.25, "PYCAMSET_FUSED_MIXED"):
        return None
    from pycamset_tpu.optim.pallas_grams import make_pallas_mixed_grams_fused
    return make_pallas_mixed_grams_fused(
        GroupWidths(widths.a, widths.b, widths.c), n_cams, n_ims, loss=loss,
        f_scale=f_scale, loss_semantics=loss_semantics, tile=tile)


def make_mixed_structured_neq(op_fun: OptimFunction, widths: MixedWidths,
                              n_cams: int, n_ims: int,
                              group_of_key: np.ndarray,
                              n_groups: int, loss: str = "linear",
                              f_scale: float = 1.0,
                              loss_semantics: str = "component"):
    """Mixed normal-equation builder over the (B, K) grid.

    :param group_of_key: (k_pad,) key -> group map (pad keys may map to any
        valid group; their masks are zero).
    :return: neq(pieces: MixedPieces, uv, mask, tpl, colmask) ->
        MixedNormalEq.
    """
    a, b = widths.a, widths.b
    kk = np.asarray(widths.key_cols)
    gg_ = np.asarray(widths.grp_cols)

    def _contig(cols):
        return (len(cols) > 0
                and tuple(cols) == tuple(range(cols[0],
                                               cols[0] + len(cols))))

    # contiguous c-axis layouts (every shipped chain) pack/split with
    # static slices and ONE concatenate — advanced array indexing lowers
    # to gather/scatter, which costs real time on the TPU hot path
    contig = (_contig(widths.key_cols) and _contig(widths.grp_cols)
              and sorted(widths.key_cols + widths.grp_cols)
              == list(range(widths.c)))
    grp_first = contig and widths.grp_cols[0] == 0
    fused = resolve_mixed_grams_fused(op_fun, widths, n_cams, n_ims,
                                      loss=loss, f_scale=f_scale,
                                      loss_semantics=loss_semantics)
    grams = None if fused is not None else resolve_mixed_grams(
        op_fun, widths, loss=loss, f_scale=f_scale,
        loss_semantics=loss_semantics)
    gok = np.asarray(group_of_key, dtype=np.int64)
    onehot_np = np.zeros((gok.size, n_groups), dtype=np.float32)
    onehot_np[np.arange(gok.size), gok] = 1.0

    if contig:
        sl_k = slice(widths.key_cols[0], widths.key_cols[0] + widths.ck)
        sl_g = slice(widths.grp_cols[0], widths.grp_cols[0] + widths.cg)

    def scatter_c_axis(pieces, colmask, oh, dtype):
        # c-axis = [chain-ordered grp | key columns]: pack the two pieces
        # into their chain positions
        if contig:
            def pack(key_part, grp_part):
                parts = ([grp_part, key_part] if grp_first
                         else [key_part, grp_part])
                return jnp.concatenate(
                    [jnp.asarray(p, dtype) for p in parts], axis=1)
            return (pack(pieces.key, oh @ jnp.asarray(pieces.grp, dtype)),
                    pack(colmask.key, oh @ jnp.asarray(colmask.grp, dtype)))
        k_pad = pieces.key.shape[0]
        keyp = jnp.zeros((k_pad, widths.c), dtype)
        keyp = keyp.at[:, kk].set(pieces.key)
        keyp = keyp.at[:, gg_].set(oh @ pieces.grp)
        kmask = jnp.zeros((k_pad, widths.c), dtype)
        kmask = kmask.at[:, kk].set(colmask.key)
        kmask = kmask.at[:, gg_].set(oh @ colmask.grp)
        return keyp, kmask

    def split_c_axis(oh, hcc, hii, hkk_f, wci, wck_f, wik_f, gc, gi, gk_f,
                     cost):
        # split the c-axis into per-key and (one-hot-reduced) per-group;
        # contiguous layouts slice statically (gathers cost real time on
        # the TPU hot path)
        if contig:
            hkk = hkk_f[:, sl_k, sl_k]
            wkg = hkk_f[:, sl_k, sl_g]
            hgg = jnp.einsum("kg,kpq->gpq", oh, hkk_f[:, sl_g, sl_g])
            wck = wck_f[:, :, :, sl_k]
            wcg = jnp.einsum("kg,ckap->cgap", oh, wck_f[:, :, :, sl_g])
            wik = wik_f[:, :, :, sl_k]
            wig = jnp.einsum("kg,ikbp->igbp", oh, wik_f[:, :, :, sl_g])
            gk = gk_f[:, sl_k]
            gg = jnp.einsum("kg,kp->gp", oh, gk_f[:, sl_g])
        else:
            hkk = hkk_f[:, kk][:, :, kk]
            wkg = hkk_f[:, kk][:, :, gg_]
            hgg = jnp.einsum("kg,kpq->gpq", oh, hkk_f[:, gg_][:, :, gg_])
            wck = wck_f[:, :, :, kk]
            wcg = jnp.einsum("kg,ckap->cgap", oh, wck_f[:, :, :, gg_])
            wik = wik_f[:, :, :, kk]
            wig = jnp.einsum("kg,ikbp->igbp", oh, wik_f[:, :, :, gg_])
            gk = gk_f[:, kk]
            gg = jnp.einsum("kg,kp->gp", oh, gk_f[:, gg_])
        return MixedNormalEq(hcc, hii, hkk, hgg, wci, wck, wik, wcg, wig,
                             wkg, gc, gi, gk, gg, cost)

    def neq(pieces: MixedPieces, uv, mask, tpl, colmask: MixedPieces):
        cam_b = jnp.repeat(pieces.cam, n_ims, axis=0)
        im_b = jnp.tile(pieces.im, (n_cams, 1))
        cmask_b = jnp.repeat(colmask.cam, n_ims, axis=0)
        imask_b = jnp.tile(colmask.im, (n_cams, 1))
        oh = jnp.asarray(onehot_np, dtype=uv.dtype)
        keyp, kmask = scatter_c_axis(pieces, colmask, oh, uv.dtype)

        if fused is not None:
            return split_c_axis(oh, *fused(cam_b, im_b, keyp, tpl, uv,
                                           mask, cmask_b, imask_b, kmask))

        (gcc_b, gii_b, wci_b, hkk_f, wck_b, wik_b, gc_b, gi_b, gk_f,
         cost) = grams(cam_b, im_b, keyp, tpl, uv, mask,
                       cmask_b, imask_b, kmask)

        k_pad = pieces.key.shape[0]
        hcc = gcc_b.reshape(n_cams, n_ims, a, a).sum(axis=1)
        hii = gii_b.reshape(n_cams, n_ims, b, b).sum(axis=0)
        gc = gc_b.reshape(n_cams, n_ims, a).sum(axis=1)
        gi = gi_b.reshape(n_cams, n_ims, b).sum(axis=0)
        wci = wci_b.reshape(n_cams, n_ims, a, b)
        wck_f = wck_b.reshape(n_cams, n_ims, k_pad, a, widths.c).sum(axis=1)
        wik_f = wik_b.reshape(n_cams, n_ims, k_pad, b, widths.c).sum(axis=0)
        return split_c_axis(oh, hcc, hii, hkk_f, wci, wck_f, wik_f, gc, gi,
                            gk_f, cost)

    neq.onehot = onehot_np
    return neq


def mixed_diag(neq: MixedNormalEq) -> MixedPieces:
    return MixedPieces(
        jnp.diagonal(neq.hcc, axis1=1, axis2=2),
        jnp.diagonal(neq.hii, axis1=1, axis2=2),
        jnp.diagonal(neq.hkk, axis1=1, axis2=2),
        jnp.diagonal(neq.hgg, axis1=1, axis2=2))


def mixed_grad(neq: MixedNormalEq) -> MixedPieces:
    return MixedPieces(neq.gc, neq.gi, neq.gk, neq.gg)


def make_mixed_ops(onehot_np: np.ndarray):
    """(diag, matvec, solve, grad) ops for structured_lm_solve."""

    def matvec(neq: MixedNormalEq, dx: MixedPieces) -> MixedPieces:
        oh = jnp.asarray(onehot_np, dtype=dx.cam.dtype)
        dg_k = oh @ dx.grp                                     # (K, cg)
        oc = jnp.einsum("cij,cj->ci", neq.hcc, dx.cam)
        oc += jnp.einsum("ciab,ib->ca", neq.wci, dx.im)
        oc += jnp.einsum("ckap,kp->ca", neq.wck, dx.key)
        oc += jnp.einsum("cgaq,gq->ca", neq.wcg, dx.grp)
        oi = jnp.einsum("iab,ib->ia", neq.hii, dx.im)
        oi += jnp.einsum("ciab,ca->ib", neq.wci, dx.cam)
        oi += jnp.einsum("ikbp,kp->ib", neq.wik, dx.key)
        oi += jnp.einsum("igbq,gq->ib", neq.wig, dx.grp)
        ok = jnp.einsum("kpq,kq->kp", neq.hkk, dx.key)
        ok += jnp.einsum("ckap,ca->kp", neq.wck, dx.cam)
        ok += jnp.einsum("ikbp,ib->kp", neq.wik, dx.im)
        ok += jnp.einsum("kpq,kq->kp", neq.wkg, dg_k)
        og = jnp.einsum("gpq,gq->gp", neq.hgg, dx.grp)
        og += jnp.einsum("cgaq,ca->gq", neq.wcg, dx.cam)
        og += jnp.einsum("igbq,ib->gq", neq.wig, dx.im)
        og += jnp.einsum("kg,kpq,kp->gq", oh, neq.wkg, dx.key)
        return MixedPieces(oc, oi, ok, og)

    def solve(neq: MixedNormalEq, damp: MixedPieces, method: str = "dense",
              cg_tol: float = 1e-6, cg_maxiter: int = 250) -> MixedPieces:
        """(H + diag(damp)) dx = -g: eliminate keys, dense-solve
        [cam | pose | group], back-substitute. Group counts are tiny, so
        the dense reduced solve always applies (the cg option is accepted
        for signature parity and currently solves dense).

        The key-elimination corrections are ONE stacked contraction: per
        key, V(k) (ck, R) gathers every reduced column the key couples to
        (cam blocks, pose blocks, its group's block via the one-hot), and
        the whole correction matrix is sum_k V(k)^T Hkk(k)^-1 V(k) — a
        single (K*ck, R)x(K*ck, R) MXU matmul instead of six separately
        shaped einsums (measured: the non-eval share of a mixed LM
        iteration drops with the fused assembly; benchmarks/anatomy.py).
        """
        from pycamset_tpu.optim.structured import block_diag_dense

        oh = jnp.asarray(onehot_np, dtype=neq.gc.dtype)
        c_, i_, g_ = neq.hcc.shape[0], neq.hii.shape[0], neq.hgg.shape[0]
        a, b = neq.hcc.shape[2], neq.hii.shape[2]
        cg = neq.hgg.shape[2]
        k_, ck = neq.hkk.shape[0], neq.hkk.shape[2]
        dtype = neq.gc.dtype
        na, nb, ng = c_ * a, i_ * b, g_ * cg

        hcc = neq.hcc + jax.vmap(jnp.diag)(damp.cam)
        hii = neq.hii + jax.vmap(jnp.diag)(damp.im)
        hkk = neq.hkk + jax.vmap(jnp.diag)(damp.key)
        hgg = neq.hgg + jax.vmap(jnp.diag)(damp.grp)

        kinv = _normalized_inv(hkk)                            # (K,ck,ck)

        # V: (K, ck, R) — every reduced-system column each key couples to
        vc = neq.wck.transpose(1, 3, 0, 2).reshape(k_, ck, na)
        vi = neq.wik.transpose(1, 3, 0, 2).reshape(k_, ck, nb)
        vg = (oh[:, None, :, None]
              * neq.wkg[:, :, None, :]).reshape(k_, ck, ng)
        v = jnp.concatenate([vc, vi, vg], axis=2)
        t = jnp.einsum("kpq,kqr->kpr", kinv, v)
        s_corr = jnp.einsum("kpr,kps->rs", v, t)               # one matmul

        # direct (non-key) couplings of the reduced system
        wci_f = neq.wci.transpose(0, 2, 1, 3).reshape(na, nb)
        wcg_f = neq.wcg.transpose(0, 2, 1, 3).reshape(na, ng)
        wig_f = neq.wig.transpose(0, 2, 1, 3).reshape(nb, ng)
        top = jnp.concatenate([block_diag_dense(hcc), wci_f, wcg_f],
                              axis=1)
        mid = jnp.concatenate([wci_f.T, block_diag_dense(hii), wig_f],
                              axis=1)
        bot = jnp.concatenate([wcg_f.T, wig_f.T, block_diag_dense(hgg)],
                              axis=1)
        amat = jnp.concatenate([top, mid, bot], axis=0) - s_corr

        tk = jnp.einsum("kpq,kq->kp", kinv, neq.gk)
        g_base = jnp.concatenate([neq.gc.reshape(-1), neq.gi.reshape(-1),
                                  neq.gg.reshape(-1)])
        rhs = -(g_base - jnp.einsum("kpr,kp->r", v, tk))
        sol = _psd_solve(amat, rhs)
        dxc = sol[:na].reshape(c_, a)
        dxi = sol[na:na + nb].reshape(i_, b)
        dxg = sol[na + nb:].reshape(g_, cg)

        rk = -neq.gk - jnp.einsum("kpr,r->kp", v, sol)
        dxk = jnp.einsum("kpq,kq->kp", kinv, rk)
        return MixedPieces(dxc, dxi, dxk, dxg)

    return (mixed_diag, matvec, solve, mixed_grad)
