"""Structured (block) normal equations + Schur-complement LM — the TPU fast path.

The generic path (optim/residuals.py) assembles JtJ by scatter-add, which is
correct everywhere but slow on TPU (~2 s/iteration at 500k detections: TPU
scatters serialise). This module is the speed-of-light path:

Layout: detections are arranged on a dense (B, K) grid where B = n_cams *
n_ims blocks (one per camera-image pair, row-major) and K = padded feature
count. Every slot in a block shares the SAME camera and pose parameters, so
the residual needs no per-detection parameter gathers at all, and the
Jacobian splits by parameter link into Jc (cam columns), Ji (image columns),
Jk (key columns). All normal-equation blocks then assemble as batched
matmuls and one-hot contractions — MXU work, zero scatters:

    Hcc (C,a,a)   = onehot_cam  @ sum_k Jc^T Jc        (block-diag per cam)
    Hii (I,b,b)   = onehot_im   @ sum_k Ji^T Ji        (block-diag per image)
    Hkk (K,3,3)   = sum_B       Jk^T Jk                (block-diag per point)
    Wci (C,I,a,b) = per-block   Jc^T Ji  (a block IS one (c,i) pair)
    Wck (C,K,a,3) = onehot_cam  @ Jc^T Jk
    Wik (I,K,b,3) = onehot_im   @ Ji^T Jk

The damped system is solved by Schur elimination of the big diagonal groups
(points first, then poses), leaving a small dense camera system — the
standard reduced-camera-system BA solve, but fully batched and jit-resident.

Fixed parameters (gauge fixes, user-fixed intr/extr, frozen points) are
handled by zeroing the corresponding Jacobian COLUMNS (the TPU analogue of
the reference's CSR column masking, abstract_function_blocks.py:465-489);
a damping floor keeps the eliminated blocks invertible and yields exact
zero steps for fixed coordinates.

This path covers the three shipped chains (template / self-cal / free-point);
anything else falls back to the generic scatter path.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from pycamset_tpu.optim.chain import OptimFunction
from pycamset_tpu.optim.blocks import key_type


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclass(frozen=True)
class GroupWidths:
    """Per-link local Jacobian column widths for a chain.

    key_link records what the c-axis binds to: PER_KEY (one parameter row
    per point) or PER_GROUP (one row per feature group — e.g. the relative
    pose of each of several rigidly-coupled targets; rows are expanded onto
    the key grid and the gram pieces reduced back, see make_structured_neq).
    """
    a: int  # cam-linked params per camera (e.g. 9 intr + 6 extr = 15)
    b: int  # image-linked params per image (6, or 0 for free-point)
    c: int  # key-linked params per point (3, or 0 for template)
    key_link: key_type = key_type.PER_KEY

    @property
    def local(self):
        return self.a + self.b + self.c


class UnsupportedChain(ValueError):
    """The chain does not fit the structured block layout (generic path)."""


def chain_widths(op_fun: OptimFunction) -> GroupWidths:
    """Column widths by link; requires groups ordered cam*, im*, key*.

    PER_GROUP parameters ride the key axis (one parameter row per feature
    group, expanded onto the key grid by the group_of_key mapping); a chain
    may use PER_KEY or PER_GROUP but not both.
    """
    a = b = c = 0
    seen = []
    key_link = key_type.PER_KEY
    for g in op_fun.groups:
        seen.append(g.link)
        if g.link == key_type.PER_CAM:
            a += g.n
        elif g.link == key_type.PER_IMG:
            b += g.n
        elif g.link in (key_type.PER_KEY, key_type.PER_GROUP):
            c += g.n
            if g.link == key_type.PER_GROUP:
                key_link = key_type.PER_GROUP
        else:
            raise UnsupportedChain(
                f"{g.link.name} groups unsupported on the structured path")
    if (key_link == key_type.PER_GROUP
            and any(g.link == key_type.PER_KEY for g in op_fun.groups)):
        raise UnsupportedChain(
            "chains mixing PER_KEY and PER_GROUP use the generic path")
    # group order may be arbitrary (e.g. the rolling-shutter chain's
    # per-camera readout group follows the per-image pose group): the
    # gram builders assemble the chain-ordered local vector from the
    # per-link pieces through op_fun.make_local_assembler()
    del seen
    return GroupWidths(a, b, c, key_link)


@dataclass
class BlockArrays:
    """Dense (B, K) observation grid. B = n_cams * n_ims row-major blocks."""
    uv: np.ndarray        # (B, K, 2)
    mask: np.ndarray      # (B, K)
    n_cams: int
    n_ims: int
    n_keys: int           # true key count (K may be padded)
    n_real: int           # real observation count

    def as_device(self, dtype):
        return jnp.asarray(self.uv, dtype=dtype), jnp.asarray(self.mask, dtype=dtype)


def build_block_arrays(dd: np.ndarray, n_cams: int, n_ims: int,
                       n_keys: int, k_pad_multiple: int = 128,
                       aux: np.ndarray | None = None) -> BlockArrays:
    """Pack a flat detection table [cam, im, key, u, v] onto the block grid.

    :param aux: optional (N, A) per-detection auxiliary channels (e.g. the
        rolling-shutter normalized row) — stored as extra trailing columns
        of the uv tensor ((B, K, 2+A)); the gram builders split them off.
    """
    k_pad = _round_up(max(n_keys, 1), k_pad_multiple)
    b = n_cams * n_ims
    width = 2 + (aux.shape[1] if aux is not None else 0)
    uv = np.zeros((b, k_pad, width))
    mask = np.zeros((b, k_pad))
    cam = dd[:, 0].astype(int)
    im = dd[:, 1].astype(int)
    key = dd[:, 2].astype(int)
    blk = cam * n_ims + im
    uv[blk, key, :2] = dd[:, 3:5]
    if aux is not None:
        uv[blk, key, 2:] = aux
    mask[blk, key] = 1.0
    return BlockArrays(uv=uv, mask=mask, n_cams=n_cams, n_ims=n_ims,
                       n_keys=n_keys, n_real=dd.shape[0])


class ParamPieces(NamedTuple):
    """Parameters grouped by link. Absent groups are zero-width arrays."""
    cam: jnp.ndarray   # (C, a)
    im: jnp.ndarray    # (I, b)
    key: jnp.ndarray   # (K, c)


class NormalEq(NamedTuple):
    """Structured damped-Newton system pieces (see module docstring)."""
    hcc: jnp.ndarray   # (C, a, a)
    hii: jnp.ndarray   # (I, b, b)
    hkk: jnp.ndarray   # (K, c, c)
    wci: jnp.ndarray   # (C, I, a, b)
    wck: jnp.ndarray   # (C, K, a, c)
    wik: jnp.ndarray   # (I, K, b, c)
    gc: jnp.ndarray    # (C, a)
    gi: jnp.ndarray    # (I, b)
    gk: jnp.ndarray    # (K, c)
    cost: jnp.ndarray  # scalar


def split_full_params(full: jnp.ndarray, op_fun: OptimFunction,
                      struct, n_cams: int, n_ims: int, n_keys: int,
                      widths: GroupWidths, xp=jnp) -> ParamPieces:
    """Full [group-major] parameter vector -> per-link (count, width) pieces.

    ``xp=np`` keeps the pieces on the host: REQUIRED for arrays that a jit
    will capture as closure constants — lowering a captured *device* array
    fetches its bytes back to the host, and the axon tunnel's first
    device->host transfer in a process can take minutes (round-3 'cold
    start regression', diagnosed round 4)."""
    cam_parts, im_parts, key_parts = [], [], []
    for gi_, g in enumerate(op_fun.groups):
        sl = struct.group_slice(gi_)
        chunk = full[sl.start:sl.stop]
        if g.link == key_type.PER_CAM:
            cam_parts.append(chunk.reshape(n_cams, g.n))
        elif g.link == key_type.PER_IMG:
            im_parts.append(chunk.reshape(n_ims, g.n))
        elif g.link in (key_type.PER_KEY, key_type.PER_GROUP):
            # PER_GROUP rows ride the key piece (count from the struct)
            key_parts.append(chunk.reshape(struct.counts[gi_], g.n))
    z = full[:0]
    cam = (xp.concatenate(cam_parts, axis=1) if cam_parts
           else z.reshape(n_cams, 0))
    im = (xp.concatenate(im_parts, axis=1) if im_parts
          else z.reshape(max(n_ims, 1), 0)[:n_ims])
    key = (xp.concatenate(key_parts, axis=1) if key_parts
           else z.reshape(max(n_keys, 1), 0)[:n_keys])
    return ParamPieces(cam, im, key)


def merge_pieces_to_full(pieces: ParamPieces, op_fun: OptimFunction, struct,
                         n_cams: int, n_ims: int, n_keys: int) -> jnp.ndarray:
    """Inverse of split_full_params."""
    chunks = []
    cam_off = im_off = key_off = 0
    for g in op_fun.groups:
        if g.link == key_type.PER_CAM:
            chunks.append(pieces.cam[:, cam_off:cam_off + g.n].reshape(-1))
            cam_off += g.n
        elif g.link == key_type.PER_IMG:
            chunks.append(pieces.im[:, im_off:im_off + g.n].reshape(-1))
            im_off += g.n
        elif g.link in (key_type.PER_KEY, key_type.PER_GROUP):
            chunks.append(pieces.key[:, key_off:key_off + g.n].reshape(-1))
            key_off += g.n
    return jnp.concatenate(chunks)


def pad_pieces_to_grid(p: ParamPieces, widths: GroupWidths, grouped: bool,
                       n_keys: int, k_pad: int, n_ims: int,
                       n_ims_grid: int, xp=jnp) -> ParamPieces:
    """Pad a rig's pieces onto the (k_pad, n_ims_grid) device grid.

    Pad key rows replicate key 0 and pad image rows replicate image 0 —
    their masks are zero, but NaN-safety demands real values (jacfwd
    through where() propagates NaNs from a z=0 projection). PER_GROUP key
    pieces stay at their true (G, c) shape — the neq expands them onto
    the key grid itself. Shared by the single-rig builder
    (structured_driver.py) and the fleet builder (fleet.py); ``xp=np``
    builds host pieces (see split_full_params)."""
    dtype = p.cam.dtype
    if widths.c and not grouped:
        if xp is jnp:
            key = jnp.tile(p.key[:1], (k_pad, 1)).at[:n_keys].set(p.key)
        else:
            key = np.tile(p.key[:1], (k_pad, 1))
            key[:n_keys] = p.key
    elif widths.c:
        key = p.key
    else:
        key = xp.zeros((k_pad, 0), dtype=dtype)
    if widths.b:
        if xp is jnp:
            im = jnp.tile(p.im[:1], (n_ims_grid, 1)).at[:n_ims].set(p.im)
        else:
            im = np.tile(p.im[:1], (n_ims_grid, 1))
            im[:n_ims] = p.im
    else:
        im = xp.zeros((n_ims_grid, 0), dtype=dtype)
    return ParamPieces(p.cam, im, key)


def pad_template_table(tpl_tab, templated: bool, n_keys: int,
                       k_pad: int) -> np.ndarray:
    """(k_pad, 3) host template table; pad rows REPLICATE a real point (a
    zero pad point can project at z=0 -> inf*0 = NaN poisons the grams;
    replicated rows stay finite and are killed by the slot mask)."""
    tpl_pad = np.zeros((k_pad, 3))
    if tpl_tab is not None and templated:
        flat = np.asarray(tpl_tab).reshape(-1, 3)
        tpl_pad[:n_keys] = flat
        tpl_pad[n_keys:] = flat[0]
    return tpl_pad


def auto_reduced_solver(widths: GroupWidths, n_cams: int,
                        n_ims_grid: int) -> str:
    """The reduced_solver='auto' rule: dense Cholesky below 4096 reduced
    dims, matrix-free CG above. Chains without point blocks count only
    the camera system — schur_solve eliminates their exactly
    block-diagonal pose system batched, so the dense path never factors
    the (6I) part."""
    dim = n_cams * widths.a + n_ims_grid * widths.b
    if widths.c == 0 and widths.b:
        dim = n_cams * widths.a
    return "cg" if dim > 4096 else "dense"


def make_block_point_fn(op_fun: OptimFunction, widths: GroupWidths):
    """fn(local (a+b+c,), template_pt (3,)) -> predicted uv (2,).

    The local vector is ordered [cam cols | im cols | key cols], matching the
    chain's group order (validated in chain_widths).
    """
    return op_fun.make_point_fn()


def make_block_grams(op_fun: OptimFunction, widths: GroupWidths,
                     loss: str = "linear", f_scale: float = 1.0,
                     loss_semantics: str = "component"):
    """Per-block gram builder — the shardable inner kernel.

    :param loss: robust loss name (optim.losses); IRLS weights fold into the
        normal equations, the returned cost is the robust cost.
    :param loss_semantics: "component" (default) applies rho per residual
        component — bitwise scipy.least_squares objective semantics, i.e.
        reference parity; "observation" applies it per 2-D observation
        (||r_i||^2, the Ceres/BA convention).
    :return: grams(cam_b, im_b, keyp, tpl, uv, mask, cmask_b, imask_b, kmask)
        over a (possibly local shard of the) block axis, returning
        (r-derived) per-block tensors plus key-axis partial sums:
        gcc_b (B,a,a), gii_b (B,b,b), wci_b (B,a,b), hkk (K,c,c),
        wck_b (B,K,a,c), wik_b (B,K,b,c), gc_b (B,a), gi_b (B,b),
        gk (K,c), cost.
    """
    point_fn = op_fun.make_point_fn()
    assemble = op_fun.make_local_assembler()
    aux_w = op_fun.aux_width
    from pycamset_tpu.optim.analytic import analytic_block_rj_for_chain
    from pycamset_tpu.optim.losses import check_loss_semantics, make_loss
    check_loss_semantics(loss_semantics)
    analytic_rj = analytic_block_rj_for_chain(op_fun)
    rho_fn, weight_fn = make_loss(loss, f_scale)
    robust = loss != "linear"

    def grams(cam_b, im_b, keyp, tpl, uv, mask, cmask_b, imask_b, kmask):
        if analytic_rj is not None:
            # closed-form residual+jacobian: shared subexpressions instead of
            # a 21-wide jacfwd tangent batch (the reference's sympy-kernel
            # economy, vectorised)
            per_block = jax.vmap(analytic_rj, in_axes=(0, 0, None, None, 0))
            r, jc, ji, jk = per_block(cam_b, im_b, keyp, tpl, uv)
        else:
            def slot_fn(cam_p, im_p, key_p, t, u):
                # u carries [measurement (2) | aux channels] for chains
                # with per-detection aux inputs (rolling shutter)
                local = assemble(cam_p, im_p, key_p)
                if aux_w:
                    return point_fn(local, t, u[2:]) - u[:2]
                return point_fn(local, t) - u

            def slot_rj(cam_p, im_p, key_p, t, u):
                f = lambda cp, ip, kp: slot_fn(cp, ip, kp, t, u)
                r = f(cam_p, im_p, key_p)
                jc, ji, jk = jax.jacfwd(f, argnums=(0, 1, 2))(
                    cam_p, im_p, key_p)
                return r, jc, ji, jk

            # vmap over keys (inner) then blocks (outer)
            per_key = jax.vmap(slot_rj, in_axes=(None, None, 0, 0, 0))
            per_block = jax.vmap(per_key, in_axes=(0, 0, None, None, 0))
            r, jc, ji, jk = per_block(cam_b, im_b, keyp, tpl, uv)
        # r (B,K,2); jc (B,K,2,a); ji (B,K,2,b); jk (B,K,2,c)

        m = mask[..., None]
        r = r * m
        if robust and loss_semantics == "component":
            s = r * r                                      # (B,K,2) per comp
            cost = jnp.sum(rho_fn(s) * m)
            sw = jnp.sqrt(weight_fn(s)) * m
            r = r * sw
        elif robust:
            s = jnp.sum(r * r, axis=-1)                    # (B,K) ||r_i||^2
            cost = jnp.sum(rho_fn(s) * mask)
            sw = jnp.sqrt(weight_fn(s))[..., None] * m     # sqrt IRLS weight
            r = r * sw
        else:
            cost = jnp.sum(r * r)
            sw = m
        jc = jc * sw[..., None] * cmask_b[:, None, None, :]
        ji = ji * sw[..., None] * imask_b[:, None, None, :]
        jk = jk * sw[..., None] * kmask[None, :, None, :]

        # per-block grams (batched matmuls on the MXU)
        gcc_b = jnp.einsum("bkti,bktj->bij", jc, jc)
        gii_b = jnp.einsum("bkti,bktj->bij", ji, ji)
        wci_b = jnp.einsum("bkti,bktj->bij", jc, ji)
        hkk = jnp.einsum("bkti,bktj->kij", jk, jk)
        wck_b = jnp.einsum("bkti,bktj->bkij", jc, jk)
        wik_b = jnp.einsum("bkti,bktj->bkij", ji, jk)
        gc_b = jnp.einsum("bkti,bkt->bi", jc, r)
        gi_b = jnp.einsum("bkti,bkt->bi", ji, r)
        gk = jnp.einsum("bkti,bkt->ki", jk, r)

        return gcc_b, gii_b, wci_b, hkk, wck_b, wik_b, gc_b, gi_b, gk, cost

    return grams


_PROJS = ("Projection", "ProjectionRational", "ProjectionThinPrism",
          "ProjectionTilted", "ProjectionFisheye")


def fused_tile_pad_ok(n_ims: int, tile: int, frac: float, env: str) -> bool:
    """Shared fused-kernel acceptance rule (all families, incl. mixed):
    pad the image axis to the block tile only when the padding stays
    under ``frac`` of the real images; the env var (=0/1) forces."""
    import os

    i_pad = -(-n_ims // tile) * tile
    force = os.environ.get(env)
    return ((i_pad - n_ims) <= frac * n_ims if force is None
            else force != "0")


def resolve_block_grams(op_fun: OptimFunction, widths: GroupWidths,
                        loss: str = "linear", f_scale: float = 1.0,
                        loss_semantics: str = "component"):
    """Per-BLOCK gram builder (the make_block_grams 10-tuple contract):
    the served Pallas kernel on TPU when the chain matches a kernel
    family, else the XLA closed form. Shared by make_structured_neq (as
    the non-fused fallback) and the sharded backends (as the fallback for
    rigs the fused padding policy declines)."""
    import os

    a, b, c = widths.a, widths.b, widths.c
    names = tuple(type(bk).__name__ for bk in op_fun.blocks)
    projs = _PROJS
    if (jax.default_backend() == "tpu"
            and not os.environ.get("PYCAMSET_NO_PALLAS")
            and a in (14, 15, 18, 22, 24) and names[0] in projs):
        from pycamset_tpu.optim import pallas_grams as pg
        kw = dict(loss=loss, f_scale=f_scale, loss_semantics=loss_semantics)
        if (b, c) == (6, 0) and names[1:] == ("Extrinsic3D",
                                              "TemplatePoints"):
            return pg.make_pallas_template_grams(widths, **kw)
        if (b, c) == (6, 3) and names[1:] == ("Extrinsic3D", "RigidTform3d",
                                              "FreePoint"):
            return pg.make_pallas_selfcal_grams(widths, **kw)
        if (b, c) == (0, 3) and names[1:] == ("Extrinsic3D", "FreePoint"):
            return pg.make_pallas_freepoint_grams(widths, **kw)
        if (b, c) == (6, 6) and names[1:] == ("Extrinsic3D", "RigidTform3d",
                                              "GroupTemplatePoints"):
            return pg.make_pallas_grouped_grams(widths, **kw)
    return make_block_grams(op_fun, widths, loss=loss, f_scale=f_scale,
                            loss_semantics=loss_semantics)


def resolve_fused_grams(op_fun: OptimFunction, widths: GroupWidths,
                        n_cams: int, n_ims: int, loss: str = "linear",
                        f_scale: float = 1.0,
                        loss_semantics: str = "component"):
    """The FUSED-reduction Pallas gram builder for a pure structured chain,
    or None when none applies (not on TPU, chain outside the kernel
    families, or the image axis would pad past the family's threshold).

    Fused kernels accumulate the cam-axis sums in-kernel, so the large
    per-block coupling tensors (e.g. the (B, K, a, 3) point coupling,
    106 MB at 16x100) never reach HBM. Their per-cam accumulators need
    the image axis padded to the block tile — the padding policy per
    family is encoded here, overridable by PYCAMSET_FUSED_TEMPLATE /
    PYCAMSET_FUSED_SELFCAL / PYCAMSET_FUSED_MIXED (=0/1 forces).

    n_cams/n_ims are the dims the builder will be CALLED with — the
    sharded backends pass their per-device slab dims, so the in-kernel
    accumulation stays shard-local and the cross-shard psum completes it.

    :return: (family, grams) or None. family names the contract:
        "template":  grams(cam_b, im_b, tpl, uv, mask, cmask_b, imask_b)
                     -> (hcc, hii, wci, gc, gi, cost)
        "selfcal":   grams(cam_b, im_b, keyp, uv, mask, cmask_b, imask_b,
                     kmask) -> the 10 NormalEq fields
        "freepoint": same signature as selfcal (im_b/imask_b ignored)
                     -> (hcc, hkk, wck, gc, gk, cost)
        "grouped":   grams(cam_b, im_b, keyp, tpl, uv, mask, cmask_b,
                     imask_b, kmask) -> per-KEY-grid 10-tuple (the caller
                     reduces the key-axis pieces with the group one-hot)
    """
    import os

    a, b, c = widths.a, widths.b, widths.c
    if (jax.default_backend() != "tpu"
            or os.environ.get("PYCAMSET_NO_PALLAS")
            or a not in (14, 15, 18, 22, 24)):
        return None
    names = tuple(type(bk).__name__ for bk in op_fun.blocks)
    if names[0] not in _PROJS:
        return None
    from pycamset_tpu.optim import pallas_grams as pg
    kw = dict(loss=loss, f_scale=f_scale, loss_semantics=loss_semantics)

    def pad_ok(tile, frac, env):
        return fused_tile_pad_ok(n_ims, tile, frac, env)

    if (b, c) == (6, 0) and names[1:] == ("Extrinsic3D", "TemplatePoints"):
        # measured +17% at 64x400 where the solve is compute-bound, and
        # within tunnel noise at the dispatch-bound 16x100, so the simpler
        # per-block kernel keeps rigs that pad >5%
        from pycamset_tpu.optim.pallas_grams import BLOCK_TILE
        if pad_ok(BLOCK_TILE, 0.05, "PYCAMSET_FUSED_TEMPLATE"):
            return "template", pg.make_pallas_template_grams_fused(
                widths, n_cams, n_ims, **kw)
        return None
    if (b, c) == (6, 3) and names[1:] == ("Extrinsic3D", "RigidTform3d",
                                          "FreePoint"):
        # structural win (the point-coupling tensor never reaches HBM):
        # default-on up to 25% padding; tile prefers 16, drops to 8 when
        # that pads less (e.g. 100 -> 104 instead of 112)
        t = min((16, 8), key=lambda tt: -(-n_ims // tt) * tt)
        if pad_ok(t, 0.25, "PYCAMSET_FUSED_SELFCAL"):
            return "selfcal", pg.make_pallas_selfcal_grams_fused(
                widths, n_cams, n_ims, tile=t, **kw)
        return None
    if (b, c) == (0, 3) and names[1:] == ("Extrinsic3D", "FreePoint"):
        # fused-reduction delegation under the self-cal policy
        t = min((16, 8), key=lambda tt: -(-n_ims // tt) * tt)
        if pad_ok(t, 0.25, "PYCAMSET_FUSED_SELFCAL"):
            return "freepoint", pg.make_pallas_freepoint_grams_fused(
                widths, n_cams, n_ims, tile=t, **kw)
        return None
    if (b, c) == (6, 6) and names[1:] == ("Extrinsic3D", "RigidTform3d",
                                          "GroupTemplatePoints"):
        # grouped multi-target template chain under the mixed-family
        # policy (tile capped at 8 — BLOCK_TILE=16 OOMs scoped VMEM)
        if pad_ok(8, 0.25, "PYCAMSET_FUSED_MIXED"):
            return "grouped", pg.make_pallas_mixed_grams_fused(
                widths, n_cams, n_ims, with_key_cols=False, tile=8, **kw)
        return None
    return None


def make_structured_neq(op_fun: OptimFunction, widths: GroupWidths,
                        n_cams: int, n_ims: int, loss: str = "linear",
                        f_scale: float = 1.0,
                        group_of_key: np.ndarray | None = None,
                        n_groups: int | None = None,
                        loss_semantics: str = "component"):
    """Structured normal-equation builder over the (B, K) grid.

    :param group_of_key: (k_pad,) int key->group map, required iff the chain
        binds its c-axis PER_GROUP. The per-group parameter rows expand onto
        the key grid through a small (K, G) one-hot, and the per-key gram
        pieces reduce back to per-group blocks with its transpose — every
        residual touches exactly one key (hence one group), so the group
        normal-equation blocks are plain sums of the per-key ones.
    :return: neq(pieces, uv, mask, tpl, colmask) -> NormalEq, where
        tpl is the (K,3) template table (zeros when the chain has key params)
        and colmask is a ParamPieces of 0/1 unfixed masks.
    """
    a, b, c = widths.a, widths.b, widths.c
    # fused-reduction Pallas kernels (cam-axis sums in-kernel) supersede
    # the per-block builder when the padding policy allows
    # (see resolve_fused_grams; PYCAMSET_NO_PALLAS=1 disables all Pallas)
    fused = resolve_fused_grams(op_fun, widths, n_cams, n_ims, loss=loss,
                                f_scale=f_scale,
                                loss_semantics=loss_semantics)
    grams = None if fused is not None else resolve_block_grams(
        op_fun, widths, loss=loss, f_scale=f_scale,
        loss_semantics=loss_semantics)
    fused_grouped = None
    if fused is not None:
        family, fused_fn = fused
        if family == "template":

            def neq_fused(pieces: ParamPieces, uv, mask, tpl,
                          colmask: ParamPieces):
                cam_b = jnp.repeat(pieces.cam, n_ims, axis=0)
                im_b = jnp.tile(pieces.im, (n_cams, 1))
                cmask_b = jnp.repeat(colmask.cam, n_ims, axis=0)
                imask_b = jnp.tile(colmask.im, (n_cams, 1))
                hcc, hii, wci, gc, gi, cost = fused_fn(
                    cam_b, im_b, tpl, uv, mask, cmask_b, imask_b)
                k_pad = mask.shape[1]
                dtype = uv.dtype
                return NormalEq(
                    hcc, hii, jnp.zeros((k_pad, 0, 0), dtype), wci,
                    jnp.zeros((n_cams, k_pad, a, 0), dtype),
                    jnp.zeros((n_ims, k_pad, b, 0), dtype),
                    gc, gi, jnp.zeros((k_pad, 0), dtype), cost)

            return neq_fused
        if family == "selfcal":

            def neq_fused_sc(pieces: ParamPieces, uv, mask, tpl,
                             colmask: ParamPieces):
                cam_b = jnp.repeat(pieces.cam, n_ims, axis=0)
                im_b = jnp.tile(pieces.im, (n_cams, 1))
                cmask_b = jnp.repeat(colmask.cam, n_ims, axis=0)
                imask_b = jnp.tile(colmask.im, (n_cams, 1))
                return NormalEq(*fused_fn(
                    cam_b, im_b, pieces.key, uv, mask, cmask_b,
                    imask_b, colmask.key))

            return neq_fused_sc
        if family == "freepoint":

            def neq_fused_fp(pieces: ParamPieces, uv, mask, tpl,
                             colmask: ParamPieces):
                cam_b = jnp.repeat(pieces.cam, n_ims, axis=0)
                cmask_b = jnp.repeat(colmask.cam, n_ims, axis=0)
                hcc, hkk, wck, gc, gk, cost = fused_fn(
                    cam_b, None, pieces.key, uv, mask, cmask_b, None,
                    colmask.key)
                k_pad = mask.shape[1]
                dtype = uv.dtype
                return NormalEq(
                    hcc, jnp.zeros((n_ims, 0, 0), dtype), hkk,
                    jnp.zeros((n_cams, n_ims, a, 0), dtype), wck,
                    jnp.zeros((n_ims, k_pad, 0, c), dtype),
                    gc, jnp.zeros((n_ims, 0), dtype), gk, cost)

            return neq_fused_fp
        # "grouped": the group pose columns ride the key grid, the 3D
        # point comes from the template; the one-hot group reductions act
        # on the already-reduced (C,K,...)/(I,K,...) pieces below
        fused_grouped = fused_fn

    grouped = widths.key_link == key_type.PER_GROUP
    if grouped:
        if group_of_key is None:
            raise ValueError(
                "group_of_key is required for PER_GROUP-keyed chains")
        gok = np.asarray(group_of_key, dtype=np.int64)
        # n_groups is passed explicitly so a group with no observed keys
        # (all-zero one-hot column) still gets its parameter rows
        if n_groups is None:
            n_groups = int(gok.max()) + 1
        onehot_kg = np.zeros((gok.size, n_groups), dtype=np.float32)
        onehot_kg[np.arange(gok.size), gok] = 1.0  # tiny: K x G

    if fused_grouped is not None:

        def neq_fused_grp(pieces: ParamPieces, uv, mask, tpl,
                          colmask: ParamPieces):
            cam_b = jnp.repeat(pieces.cam, n_ims, axis=0)
            im_b = jnp.tile(pieces.im, (n_cams, 1))
            cmask_b = jnp.repeat(colmask.cam, n_ims, axis=0)
            imask_b = jnp.tile(colmask.im, (n_cams, 1))
            kg = jnp.asarray(onehot_kg, dtype=uv.dtype)
            keyp = kg @ pieces.key
            kmask = kg @ colmask.key
            (hcc, hii, hkk_f, wci, wck_f, wik_f, gc, gi, gk_f,
             cost) = fused_grouped(cam_b, im_b, keyp, tpl, uv, mask,
                                   cmask_b, imask_b, kmask)
            hkk = jnp.einsum("kg,kij->gij", kg, hkk_f)
            gk = jnp.einsum("kg,ki->gi", kg, gk_f)
            wck = jnp.einsum("kg,ckap->cgap", kg, wck_f)
            wik = jnp.einsum("kg,ikbp->igbp", kg, wik_f)
            return NormalEq(hcc, hii, hkk, wci, wck, wik, gc, gi, gk, cost)

        return neq_fused_grp

    def neq(pieces: ParamPieces, uv, mask, tpl, colmask: ParamPieces):
        # blocks are (cam-major, image-minor): per-cam / per-im parameter
        # broadcasts are repeats/tiles and the block->cam / block->im
        # reductions are plain reshaped sums — no gather tables, no one-hot
        # constants (which would embed O(C*I^2) bytes in the executable;
        # the (K, G) group one-hot is tiny and G-bounded)
        cam_b = jnp.repeat(pieces.cam, n_ims, axis=0)
        im_b = jnp.tile(pieces.im, (n_cams, 1))
        cmask_b = jnp.repeat(colmask.cam, n_ims, axis=0)
        imask_b = jnp.tile(colmask.im, (n_cams, 1))

        if grouped:  # expand per-group rows onto the key grid
            kg = jnp.asarray(onehot_kg, dtype=uv.dtype)
            keyp = kg @ pieces.key
            kmask = kg @ colmask.key
        else:
            keyp, kmask = pieces.key, colmask.key

        (gcc_b, gii_b, wci_b, hkk, wck_b, wik_b, gc_b, gi_b, gk,
         cost) = grams(cam_b, im_b, keyp, tpl, uv, mask,
                       cmask_b, imask_b, kmask)

        k_pad = wck_b.shape[1]
        hcc = gcc_b.reshape(n_cams, n_ims, a, a).sum(axis=1)
        hii = gii_b.reshape(n_cams, n_ims, b, b).sum(axis=0)
        gc = gc_b.reshape(n_cams, n_ims, a).sum(axis=1)
        gi = gi_b.reshape(n_cams, n_ims, b).sum(axis=0)
        wck = wck_b.reshape(n_cams, n_ims, k_pad, a, c).sum(axis=1)
        wik = wik_b.reshape(n_cams, n_ims, k_pad, b, c).sum(axis=0)
        wci = wci_b.reshape(n_cams, n_ims, a, b)  # a block IS one (c,i) pair

        if grouped:  # reduce key-axis pieces to per-group blocks
            kg = jnp.asarray(onehot_kg, dtype=uv.dtype)
            hkk = jnp.einsum("kg,kij->gij", kg, hkk)
            gk = jnp.einsum("kg,ki->gi", kg, gk)
            wck = jnp.einsum("kg,ckap->cgap", kg, wck)
            wik = jnp.einsum("kg,ikbp->igbp", kg, wik)

        return NormalEq(hcc, hii, hkk, wci, wck, wik, gc, gi, gk, cost)

    return neq


def neq_diag(neq: NormalEq) -> ParamPieces:
    """Diagonals of the H blocks (for Jacobi scaling / damping)."""
    return ParamPieces(
        jnp.diagonal(neq.hcc, axis1=1, axis2=2),
        jnp.diagonal(neq.hii, axis1=1, axis2=2),
        jnp.diagonal(neq.hkk, axis1=1, axis2=2))


def neq_matvec(neq: NormalEq, dx: ParamPieces) -> ParamPieces:
    """H @ dx in structured form (for the LM model-reduction term)."""
    oc = jnp.einsum("cij,cj->ci", neq.hcc, dx.cam)
    oc = oc + jnp.einsum("ciab,ib->ca", neq.wci, dx.im)
    oc = oc + jnp.einsum("ckap,kp->ca", neq.wck, dx.key)
    oi = jnp.einsum("iab,ib->ia", neq.hii, dx.im)
    oi = oi + jnp.einsum("ciab,ca->ib", neq.wci, dx.cam)
    oi = oi + jnp.einsum("ikbp,kp->ib", neq.wik, dx.key)
    ok = jnp.einsum("kpq,kq->kp", neq.hkk, dx.key)
    ok = ok + jnp.einsum("ckap,ca->kp", neq.wck, dx.cam)
    ok = ok + jnp.einsum("ikbp,ib->kp", neq.wik, dx.im)
    return ParamPieces(oc, oi, ok)


def schur_solve(neq: NormalEq, damp: ParamPieces, method: str = "dense",
                cg_tol: float = 1e-6, cg_maxiter: int = 250) -> ParamPieces:
    """Solve (H + diag(damp)) dx = -g by Schur elimination.

    Eliminates the per-point blocks first (classic reduced camera system),
    then solves the (cam+pose) system, then back-substitutes. When a group
    is absent (zero width) its elimination is a no-op.

    :param method: 'dense' materialises the reduced system and Cholesky-solves
        it (exact; memory grows as (15C + 6I)^2). 'cg' runs matrix-free
        preconditioned conjugate gradients — the point-elimination term is
        applied as W (K^-1 (W^T x)) without ever forming the (C,C)/(I,I)
        coupling blocks, so memory stays O(C*K + I*K): the path for rigs
        with thousands of poses.
    """
    c_, i_, k_ = neq.hcc.shape[0], neq.hii.shape[0], neq.hkk.shape[0]
    a, b, c = neq.hcc.shape[2], neq.hii.shape[2], neq.hkk.shape[2]
    dtype = neq.gc.dtype

    hcc = neq.hcc + jax.vmap(jnp.diag)(damp.cam)
    hii = (neq.hii + jax.vmap(jnp.diag)(damp.im)) if b else neq.hii
    hkk = (neq.hkk + jax.vmap(jnp.diag)(damp.key)) if c else neq.hkk

    # --- eliminate points (shared by both solvers) --------------------------
    if c:
        kinv = _normalized_inv(hkk)                               # (K,c,c)
        uck = jnp.einsum("ckap,kpq->ckaq", neq.wck, kinv)         # (C,K,a,c)
        uik = jnp.einsum("ikbp,kpq->ikbq", neq.wik, kinv)         # (I,K,b,c)
        gc = neq.gc - jnp.einsum("ckaq,kq->ca", uck, neq.gk)
        gi = neq.gi - jnp.einsum("ikbq,kq->ib", uik, neq.gk) if b else neq.gi
    else:
        kinv = uck = uik = None
        gc, gi = neq.gc, neq.gi

    if method == "cg":
        dxc, dxi = _reduced_cg(neq, hcc, hii, uck, uik, gc, gi,
                               cg_tol, cg_maxiter)
    elif c == 0 and b:
        # no point blocks -> the pose system is exactly block-diagonal
        # (hii), so eliminate the poses batched and solve only the (C*a)
        # camera system. The general branch below would assemble and
        # Cholesky-factor the full (C*a + I*b) matrix (3360 dims at
        # 64x400; its (I,I,b,b) coupling is identically zero here), which
        # dominates the non-kernel iteration time at scale and rules the
        # dense path out entirely for huge pose counts.
        iinv = _normalized_inv(hii)                            # (I,b,b)
        uci = jnp.einsum("ciab,ibq->ciaq", neq.wci, iinv)      # (C,I,a,b)
        scc = -jnp.einsum("ciaq,dizq->cdaz", uci, neq.wci)     # (C,C,a,a)
        scc = _block_diag_add(scc, hcc)
        rc = gc - jnp.einsum("ciaq,iq->ca", uci, gi)
        amat = scc.transpose(0, 2, 1, 3).reshape(c_ * a, c_ * a)
        dxc = _psd_solve(amat, -rc.reshape(-1)).reshape(c_, a)
        ri = -gi - jnp.einsum("ciab,ca->ib", neq.wci, dxc)
        dxi = jnp.einsum("ibq,iq->ib", iinv, ri)
        return ParamPieces(dxc, dxi, jnp.zeros((k_, c), dtype))
    else:
        # base: direct couplings + damped block diagonals, flat (R, R)
        na, nb = c_ * a, i_ * b
        if b:
            wci_f = neq.wci.transpose(0, 2, 1, 3).reshape(na, nb)
            top = jnp.concatenate([block_diag_dense(hcc), wci_f], axis=1)
            bot = jnp.concatenate([wci_f.T, block_diag_dense(hii)], axis=1)
            amat = jnp.concatenate([top, bot], axis=0)
            rhs = -jnp.concatenate([gc.reshape(-1), gi.reshape(-1)])
        else:
            amat = block_diag_dense(hcc)
            rhs = -gc.reshape(-1)
        if c:
            # the point-elimination correction is ONE stacked contraction:
            # per point, V(k) (c, R) gathers every reduced column the
            # point couples to, and sum_k V(k)^T Hkk(k)^-1 V(k) is a
            # single (K*c, R)x(K*c, R) MXU matmul instead of the three
            # separately shaped scc/sci/sii einsums + assembly
            vc = neq.wck.transpose(1, 3, 0, 2).reshape(k_, c, na)
            if b:
                vi = neq.wik.transpose(1, 3, 0, 2).reshape(k_, c, nb)
                v = jnp.concatenate([vc, vi], axis=2)
            else:
                v = vc
            t = jnp.einsum("kpq,kqr->kpr", kinv, v)
            amat = amat - jnp.einsum("kpr,kps->rs", v, t)
        sol = _psd_solve(amat, rhs)
        dxc = sol[:na].reshape(c_, a)
        dxi = (sol[na:].reshape(i_, b) if b
               else jnp.zeros((i_, b), dtype))

    # --- back-substitute points -------------------------------------------
    if c:
        rk = -neq.gk - jnp.einsum("ckap,ca->kp", neq.wck, dxc)
        if b:
            rk = rk - jnp.einsum("ikbp,ib->kp", neq.wik, dxi)
        dxk = jnp.einsum("kpq,kq->kp", kinv, rk)
    else:
        dxk = jnp.zeros((k_, c), dtype)

    return ParamPieces(dxc, dxi, dxk)


def _reduced_cg(neq: NormalEq, hcc, hii, uck, uik, gc, gi, tol, maxiter):
    """Matrix-free preconditioned CG on the reduced (cam+pose) system.

    Matvec applies the point-elimination coupling as three O(C*K)/(I*K)
    einsums per iteration; the preconditioner is the block-Jacobi inverse of
    the damped diagonal blocks.
    """
    b = hii.shape[2] if hii.ndim == 3 else 0
    c = neq.hkk.shape[2]
    has_pts = c > 0 and uck is not None

    hcc_inv = _normalized_inv(hcc)
    hii_inv = _normalized_inv(hii) if b else None

    def matvec(x):
        xc, xi = x
        yc = jnp.einsum("cab,cb->ca", hcc, xc)
        yi = (jnp.einsum("iab,ib->ia", hii, xi) if b
              else jnp.zeros_like(xi))
        if b:
            yc = yc + jnp.einsum("ciab,ib->ca", neq.wci, xi)
            yi = yi + jnp.einsum("ciab,ca->ib", neq.wci, xc)
        if has_pts:
            t = jnp.einsum("ckap,ca->kp", neq.wck, xc)
            if b:
                t = t + jnp.einsum("ikbp,ib->kp", neq.wik, xi)
            yc = yc - jnp.einsum("ckaq,kq->ca", uck, t)
            if b:
                yi = yi - jnp.einsum("ikbq,kq->ib", uik, t)
        return (yc, yi)

    def precond(x):
        xc, xi = x
        pc = jnp.einsum("cab,cb->ca", hcc_inv, xc)
        pi = jnp.einsum("iab,ib->ia", hii_inv, xi) if b else xi
        return (pc, pi)

    rhs = (-gc, -gi)
    sol, _ = jax.scipy.sparse.linalg.cg(
        matvec, rhs, M=precond, tol=tol, maxiter=maxiter)
    return sol


def _block_diag_add(full: jnp.ndarray, diag_blocks: jnp.ndarray) -> jnp.ndarray:
    """full (N,N,a,a) += diag_blocks (N,a,a) on its block diagonal."""
    n = diag_blocks.shape[0]
    eye = jnp.eye(n, dtype=diag_blocks.dtype)
    return full + eye[:, :, None, None] * diag_blocks[:, None, :, :]


def block_diag_dense(blocks: jnp.ndarray) -> jnp.ndarray:
    """(N, a, a) -> (N*a, N*a) block diagonal in ONE XLA op.

    jax.scipy.linalg.block_diag(*blocks) unrolls into ~N pad/concat ops —
    at bench pose counts that is ~100 dispatched ops PER LM ITERATION in
    the dense reduced solves (each small op costs ~5-10 us of fixed
    overhead on TPU). The outer-product-with-eye form is one multiply +
    one reshape regardless of N."""
    n, a, _ = blocks.shape
    eye = jnp.eye(n, dtype=blocks.dtype)
    return (eye[:, None, :, None]
            * blocks[:, :, None, :]).reshape(n * a, n * a)


def _cho_refine_solve(a_n: jnp.ndarray, rhs_n: jnp.ndarray) -> jnp.ndarray:
    """XLA Cholesky + two iterative-refinement steps on the (already
    Jacobi-normalized) system — refinement recovers step accuracy lost to
    the finite-precision factorisation (matters for the f32 TPU path)."""
    chol, lower = jax.scipy.linalg.cho_factor(a_n)
    sol = jax.scipy.linalg.cho_solve((chol, lower), rhs_n)
    for _ in range(2):
        resid = rhs_n - a_n @ sol
        sol = sol + jax.scipy.linalg.cho_solve((chol, lower), resid)
    return sol


def _psd_solve(amat: jnp.ndarray, rhs: jnp.ndarray) -> jnp.ndarray:
    """Jacobi-normalized dense SPD solve.

    Symmetric diagonal scaling maps the system to unit diagonal, removing the
    fx^2-vs-rotation scale disparity that makes the raw system cond ~1e10 —
    essential for the float32 TPU path. The ridge is relative to the unit
    diagonal and scaled to the dtype's precision.

    OPT-IN (PYCAMSET_PALLAS_CHOL=1, TPU f32, n <= 1024): the factor+solve
    runs in ONE Pallas launch (ops/pallas_cholesky.py) with a residual
    self-check falling back to the XLA path via lax.cond. Default stays
    on XLA Cholesky: inside the compiled LM loop the runtime pipelines
    its While-step latency to 0.15-0.3 ms, beating the kernel's strictly
    sequential 0.4-0.6 ms (A/B story in docs/performance.md).
    """
    n = amat.shape[0]
    d = jnp.sqrt(jnp.clip(jnp.diag(amat), 1e-30, None))
    a_n = amat / d[:, None] / d[None, :]
    ridge = jnp.asarray(10.0, amat.dtype) * jnp.finfo(amat.dtype).eps
    a_n = a_n + ridge * jnp.eye(n, dtype=amat.dtype)
    rhs_n = rhs / d
    from pycamset_tpu.ops.pallas_cholesky import (pallas_psd_solve,
                                                  use_pallas_psd)
    if use_pallas_psd(n, amat.dtype):
        sol = pallas_psd_solve(a_n, rhs_n, fallback=_cho_refine_solve)
    else:
        sol = _cho_refine_solve(a_n, rhs_n)
    return sol / d


def _sym3_inv(m: jnp.ndarray) -> jnp.ndarray:
    """Closed adjugate inverse of batched SYMMETRIC 3x3 blocks (VPU)."""
    a00, a01, a02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    a11, a12, a22 = m[..., 1, 1], m[..., 1, 2], m[..., 2, 2]
    c00 = a11 * a22 - a12 * a12
    c01 = a02 * a12 - a01 * a22
    c02 = a01 * a12 - a02 * a11
    c11 = a00 * a22 - a02 * a02
    c12 = a01 * a02 - a00 * a12
    c22 = a00 * a11 - a01 * a01
    det = a00 * c00 + a01 * c01 + a02 * c02
    return jnp.stack([
        jnp.stack([c00, c01, c02], -1),
        jnp.stack([c01, c11, c12], -1),
        jnp.stack([c02, c12, c22], -1)], -2) / det[..., None, None]


def _normalized_inv(blocks: jnp.ndarray) -> jnp.ndarray:
    """Batched inverse of small SPD blocks with Jacobi normalization.

    1x1/2x2/3x3 blocks (the free-point / mixed key widths) invert by the
    closed adjugate form, and 6x6 blocks (pose/extrinsic widths — the
    batched pose elimination, fleet rigs, grouped chains) by 2x2-of-3x3
    block inversion built on it: the batched LU that jnp.linalg.inv
    lowers to cost ~0.3 ms per mixed LM iteration at the bench shape
    (benchmarks/mixed_solve_probe.py), and dominated the fleet's
    per-iteration reduced solve."""
    d = jnp.sqrt(jnp.clip(jnp.diagonal(blocks, axis1=-2, axis2=-1), 1e-30, None))
    b_n = blocks / d[..., :, None] / d[..., None, :]
    n = blocks.shape[-1]
    if n == 1:
        inv_n = 1.0 / b_n
    elif n == 2:
        a00, a01 = b_n[..., 0, 0], b_n[..., 0, 1]
        a10, a11 = b_n[..., 1, 0], b_n[..., 1, 1]
        det = a00 * a11 - a01 * a10
        inv_n = jnp.stack([
            jnp.stack([a11, -a01], -1),
            jnp.stack([-a10, a00], -1)], -2) / det[..., None, None]
    elif n == 3:
        inv_n = _sym3_inv(b_n)
    elif n == 6:
        # SPD block inversion: M = [[A B],[B^T D]], S = D - B^T A^-1 B,
        # M^-1 = [[A^-1 + E S^-1 E^T, -E S^-1], [-S^-1 E^T, S^-1]] with
        # E = A^-1 B — two closed 3x3 inverses + four 3x3 matmuls, all
        # batched elementwise on the VPU
        a_ = b_n[..., :3, :3]
        b_ = b_n[..., :3, 3:]
        d_ = b_n[..., 3:, 3:]
        ainv = _sym3_inv(a_)
        e = ainv @ b_
        s = d_ - jnp.swapaxes(b_, -1, -2) @ e
        sinv = _sym3_inv(s)
        es = e @ sinv
        tl = ainv + es @ jnp.swapaxes(e, -1, -2)
        inv_n = jnp.concatenate([
            jnp.concatenate([tl, -es], axis=-1),
            jnp.concatenate([-jnp.swapaxes(es, -1, -2), sinv], axis=-1),
        ], axis=-2)
        # one Newton-Schulz step squares the residual of the nested form
        # (two batched 6x6 matmuls — still far cheaper than batched LU)
        eye6 = jnp.eye(6, dtype=b_n.dtype)
        inv_n = inv_n @ (2.0 * eye6 - b_n @ inv_n)
    else:
        inv_n = jnp.linalg.inv(b_n)
    return inv_n / d[..., :, None] / d[..., None, :]
