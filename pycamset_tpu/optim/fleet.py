"""Fleet bundle adjustment: R same-structure rigs in ONE vmapped LM solve.

Beyond the reference (pyCamSet solves one calibration per process —
pyCamSet/optimisation/optimisation_handling.py:52-117): a production fleet
of identical rigs (same cameras-per-rig, same target, same chain) batches
into a single jitted ``jax.vmap`` of the structured Schur LM solve. One
compile serves the whole fleet and one dispatch solves it; the batched
``lax.while_loop`` steps until the slowest rig converges while finished
rigs' carries are masked by the batching rule, so every rig's solution is
identical to a solo solve of the same problem. Per-rig ``nfev/nit/status``
report individual convergence.

Structural requirements (validated): identical function-block chain,
camera count, key count (same calibration target) and key->group map.
Image counts MAY differ per rig — the pose axis pads to the fleet grid
with fully-masked replicated images, exactly like the single-rig bucket
padding in ``optim/structured_driver.py``. Fixed-parameter patterns MAY
differ per rig — the 0/1 column masks ride the batch axis as a vmapped
argument instead of a captured constant.

Multi-chip: pass ``mesh=`` (a 1-D ``jax.sharding.Mesh``) and the RIG axis
shards over the devices — embarrassingly parallel (no collectives at all:
each device's slab runs its own batched while_loop until ITS rigs
converge, so there is not even a per-iteration convergence all-reduce).
The fleet pads to a device multiple with copies of rig 0; padding results
are dropped on the host.
"""
from __future__ import annotations

import logging
import time
from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from pycamset_tpu.config import default_device_dtype
from pycamset_tpu.optim.blocks import key_type
from pycamset_tpu.optim.structured import (
    ParamPieces, UnsupportedChain, auto_reduced_solver, build_block_arrays,
    chain_widths, make_structured_neq, merge_pieces_to_full,
    pad_pieces_to_grid, pad_template_table, split_full_params)
from pycamset_tpu.optim.structured_driver import build_colmask_pieces
from pycamset_tpu.optim.structured_lm import SLMResult, structured_lm_solve


class FleetMismatch(ValueError):
    """The handlers do not describe one common problem structure."""


class FleetProblem(NamedTuple):
    """A compiled fleet: see build_fleet_problem."""
    solve: Callable          # () -> (list[(x_free, SLMResult_r)], raw
    #                               batched device SLMResult incl. padding)
    residual: Callable       # (r, x_free) -> (n_real_r, 2) residuals
    x0s: list                # per-rig initial free parameters
    residuals_from_pieces: Callable  # (batched device pieces) ->
    #                               list of per-rig (n_real_r, 2) — ONE
    #                               dispatch + ONE fetch for the whole fleet
    x0_pieces: ParamPieces   # stacked device initial pieces


# solver-relevant options that must agree across the fleet (they are baked
# into the ONE compiled program every rig shares)
_SHARED_OPTS = ("loss", "f_scale", "loss_semantics", "max_nfev",
                "reduced_solver", "im_bucket", "shared_intrinsics")
_UNSET = object()  # distinguishes "option not set" from an explicit None


def _opt(opts, key, default):
    v = opts[key]
    return default if v is _UNSET or v is None else v


def _chain_names(handler) -> tuple:
    return tuple(type(bk).__name__ for bk in handler.op_fun.blocks)


def _validate_fleet(handlers):
    """Check every handler shares the structure of handlers[0]; return
    (widths, grouped, gok, n_groups, opts)."""
    if not handlers:
        raise FleetMismatch("empty fleet")
    h0 = handlers[0]
    names = _chain_names(h0)
    widths = chain_widths(h0.op_fun)
    if getattr(h0.op_fun, "aux_width", 0):
        raise UnsupportedChain(
            "chains with per-detection aux inputs (rolling shutter) have "
            "no fleet path — solve the rigs individually")
    links = [g.link for g in h0.op_fun.groups]
    order = [key_type.PER_CAM, key_type.PER_IMG, key_type.PER_KEY,
             key_type.PER_GROUP]
    if links != sorted(links, key=order.index):
        raise UnsupportedChain(
            "fleet residuals assume cam*,im*,key*-ordered parameter "
            "groups; this chain's are interleaved")
    n_cams, n_keys = len(h0.cam_names), h0.n_keys()
    opts = {k: h0.problem_opts.get(k, _UNSET) for k in _SHARED_OPTS}
    grouped = widths.key_link == key_type.PER_GROUP
    gok, n_groups = None, 0
    if grouped:
        gok = np.asarray(h0.group_of_key(), dtype=np.int64)
        n_groups = int(h0.n_groups())
        # same diagnostics as the single-rig builder
        # (structured_driver.py::build_structured_problem)
        if gok.shape != (n_keys,):
            raise ValueError(
                f"group_of_key() must return one group index per key "
                f"({n_keys},); got shape {gok.shape}")
        if gok.min() < 0 or gok.max() >= n_groups:
            raise ValueError(
                f"group_of_key() indices out of range [0, {n_groups})")
    for i, h in enumerate(handlers[1:], start=1):
        if _chain_names(h) != names:
            raise FleetMismatch(
                f"rig {i} chain {_chain_names(h)} != rig 0 chain {names}")
        if chain_widths(h.op_fun) != widths:
            raise FleetMismatch(f"rig {i} chain widths differ from rig 0")
        if len(h.cam_names) != n_cams:
            raise FleetMismatch(
                f"rig {i} has {len(h.cam_names)} cameras, rig 0 {n_cams}")
        if h.n_keys() != n_keys:
            raise FleetMismatch(
                f"rig {i} has {h.n_keys()} keys, rig 0 {n_keys} "
                "(fleet rigs must share one calibration target)")
        if grouped:
            gok_i = np.asarray(h.group_of_key(), dtype=np.int64)
            if int(h.n_groups()) != n_groups or not np.array_equal(gok_i,
                                                                   gok):
                raise FleetMismatch(
                    f"rig {i} key->group map differs from rig 0")
        opts_i = {k: h.problem_opts.get(k, _UNSET) for k in _SHARED_OPTS}
        if opts_i != opts:
            diff = {k: (opts[k], opts_i[k]) for k in _SHARED_OPTS
                    if opts[k] != opts_i[k]}
            raise FleetMismatch(
                f"rig {i} solver options differ from rig 0: {diff} "
                "(the fleet shares one compiled program)")
    return widths, grouped, gok, n_groups, opts


def make_cascade_solve(one_init, one_run, n_rigs: int, cap1: int = 9,
                       cap2: int = 13):
    """Convergence-cohort cascade over a batch of same-structure solves.

    The vmapped lockstep while_loop runs EVERY rig until the slowest
    converges (bench nit distribution at 256x(4x16): median 7, p90 12,
    max 14 — sum(nit)/R*max = 0.54). The cascade instead runs the full
    batch only to ``cap1`` evaluations (~median), compacts the
    least-converged HALF and continues to ``cap2`` (~p90), compacts an
    EIGHTH for the tail, then a full-batch polish pass whose while cond
    is false at entry when everything converged. Each rig executes
    exactly the iteration sequence it would solo (slm_run pauses and
    resumes the identical state march), so results are unchanged.

    :param one_init: fn(x0, *data_i) -> SLMState (per rig).
    :param one_run: fn(state, cap, *data_i) -> SLMState; ``cap=None``
        runs to convergence/budget.
    :return: jitted solve(x0s, *data) -> vmapped SLMResult.
    """
    from pycamset_tpu.optim.structured_lm import slm_result

    @jax.jit
    def solve(x0s, *data):
        tu = jax.tree_util
        st = jax.vmap(one_init)(x0s, *data)
        st = jax.vmap(lambda s, *d: one_run(s, cap1, *d))(st, *data)
        for frac, cap in ((2, cap2), (8, None)):
            r_sub = max(n_rigs // frac, 1)
            # least-converged first, original order preserved among ties
            key = jnp.where(st.status == 0, 0, 1)
            sel = jnp.argsort(key, stable=True)[:r_sub]
            st_sub = tu.tree_map(lambda x: x[sel], st)
            d_sub = tuple(tu.tree_map(lambda x: x[sel], d) for d in data)
            st_sub = jax.vmap(lambda s, *d: one_run(s, cap, *d))(
                st_sub, *d_sub)
            st = tu.tree_map(lambda full, part: full.at[sel].set(part),
                             st, st_sub)
        # safety net: anything still unconverged (more stragglers than a
        # cohort could hold) finishes lockstep; a no-op when all done
        st = jax.vmap(lambda s, *d: one_run(s, None, *d))(st, *data)
        return jax.vmap(slm_result)(st)

    return solve


def _fleet_solve_impl(one, mesh, uv_s, mask_s, tpl_s, cmask_s, x0_s):
    """The jitted (optionally rig-axis-sharded) batched solve around a
    per-rig solve function ``one(xp, uv, mask, tpl, cm)``. Returns the
    impl plus the (possibly padded + device-placed) batched arrays."""
    if mesh is None:

        @jax.jit
        def solve_impl(xps, uvs_, masks_, tpls_, cms):
            return jax.vmap(one)(xps, uvs_, masks_, tpls_, cms)

        return solve_impl, uv_s, mask_s, tpl_s, cmask_s, x0_s

    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec

    axis = mesh.axis_names[0]
    spec = PartitionSpec(axis)
    ndev = int(mesh.devices.size)
    n_rigs = uv_s.shape[0]
    r_pad = -(-n_rigs // ndev) * ndev
    if r_pad != n_rigs:  # pad with copies of rig 0, dropped on host

        def padr(x):
            return jnp.concatenate(
                [x, jnp.repeat(x[:1], r_pad - n_rigs, axis=0)], axis=0)

        uv_s, mask_s, tpl_s = padr(uv_s), padr(mask_s), padr(tpl_s)
        cmask_s = jax.tree_util.tree_map(padr, cmask_s)
        x0_s = jax.tree_util.tree_map(padr, x0_s)
    sh = NamedSharding(mesh, spec)
    put = lambda a: jax.device_put(a, sh)  # noqa: E731
    uv_s, mask_s, tpl_s = put(uv_s), put(mask_s), put(tpl_s)
    cmask_s = jax.tree_util.tree_map(put, cmask_s)
    x0_s = jax.tree_util.tree_map(put, x0_s)

    # zero-collective SPMD: each device's slab iterates independently
    # (check_vma=False as in the other shard_maps over Pallas grams)
    @jax.jit
    @partial(shard_map, mesh=mesh, in_specs=spec, out_specs=spec,
             check_vma=False)
    def solve_impl(xps, uvs_, masks_, tpls_, cms):
        return jax.vmap(one)(xps, uvs_, masks_, tpls_, cms)

    return solve_impl, uv_s, mask_s, tpl_s, cmask_s, x0_s


def build_fleet_problem(handlers, dtype=None, k_pad_multiple: int = 128,
                        mesh=None):
    """Compile R same-structure handlers onto ONE vmapped structured solve.

    Single-rig counterpart (and the canonical version of each prep step):
    ``optim/structured_driver.py::build_structured_problem``.

    :param mesh: optional 1-D ``jax.sharding.Mesh`` — shard the RIG axis
        over its devices (shard_map, zero collectives; see module
        docstring).
    :return: a FleetProblem. ``residuals_from_pieces`` evaluates the WHOLE
        fleet's residuals in one dispatch + one fetch (the tunnel charges
        ~0.1 s per fetched array, so 2R per-rig round-trips would cost more
        transport than the batched solve itself — the same lesson as the
        serving path's single-leaf packing).
    Mixed PER_KEY+PER_GROUP chains (multi-target self-calibration) route
    to their own arrow-structured fleet path. Raises UnsupportedChain for
    chains outside both structured layouts and FleetMismatch when the
    handlers' structures differ.
    """
    dtype = dtype or default_device_dtype()
    if not handlers:
        raise FleetMismatch("empty fleet")
    # pose seeding runs inside get_initial_params — it must precede every
    # primitive read, exactly as in the single-rig builder
    x0s = [np.asarray(h.get_initial_params(), dtype=np.float64)
           for h in handlers]
    try:
        widths, grouped, gok, n_groups, opts = _validate_fleet(handlers)
    except UnsupportedChain:
        # mixed PER_KEY+PER_GROUP chains (multi-target self-cal) have
        # their own arrow-structured fleet path; anything else re-raises
        # from mixed_chain_widths inside
        return _build_mixed_fleet(handlers, x0s, dtype, k_pad_multiple,
                                  mesh)
    if _opt(opts, "shared_intrinsics", None):
        # tied-lens fleets have their own TiedPieces path — the template
        # path would silently solve UNTIED (dropping the constraint)
        return _build_tied_fleet(handlers, x0s, widths, grouped, opts,
                                 dtype, k_pad_multiple, mesh)
    h0 = handlers[0]
    op_fun = h0.op_fun
    n_cams, n_keys = len(h0.cam_names), h0.n_keys()

    def true_ims(h):
        n_ims = int(h.bundlePrimitive.poses.shape[0])
        return n_ims if widths.b else int(h.detection.max_ims)

    # explicit im_bucket=None disables bucketing (single-rig semantics);
    # only an UNSET option falls back to the default bucket of 8
    v = opts["im_bucket"]
    im_bucket = 8 if v is _UNSET else v
    n_ims_fleet = max(true_ims(h) for h in handlers)
    if im_bucket:
        n_ims_grid = ((n_ims_fleet + im_bucket - 1) // im_bucket) * im_bucket
    else:
        n_ims_grid = n_ims_fleet

    gok_pad = None
    if grouped:  # key grid width is set by n_keys alone (build_block_arrays)
        k_pad0 = -(-max(n_keys, 1) // k_pad_multiple) * k_pad_multiple
        gok_pad = np.concatenate(
            [gok, np.full(k_pad0 - n_keys, gok[0], dtype=np.int64)])

    # ---- per-rig data prep (SHARED helpers with the single-rig builder:
    # pad_pieces_to_grid / pad_template_table / build_colmask_pieces) ----
    uvs, masks, tpls, cmasks, pieces0 = [], [], [], [], []
    rig_host = []  # (struct, base_full, free_idx, dd indices, n_ims)
    for h, x0 in zip(handlers, x0s):
        n_ims = int(h.bundlePrimitive.poses.shape[0])
        dd = h.get_detection_data(flatten=True)
        blocks = build_block_arrays(dd, n_cams, n_ims_grid, n_keys,
                                    k_pad_multiple=k_pad_multiple)
        k_pad = blocks.uv.shape[1]
        struct = op_fun.param_struct(n_cams, n_ims, n_keys,
                                     n_groups=n_groups)
        base_full = h.bundlePrimitive.base_full()
        unfixed = h.bundlePrimitive.unfixed_full()
        base_full[unfixed] = x0
        free_idx = np.where(unfixed)[0]

        tpl_pad = pad_template_table(h.template_table(), op_fun.templated,
                                     n_keys, k_pad)

        def to_np_pieces(full_np):
            p = split_full_params(full_np.astype(np.float64), op_fun,
                                  struct, n_cams, n_ims, n_keys, widths,
                                  xp=np)
            return pad_pieces_to_grid(p, widths, grouped, n_keys, k_pad,
                                      n_ims, n_ims_grid, xp=np)

        cmask = build_colmask_pieces(base_full, unfixed, op_fun, struct,
                                     widths, grouped, np.float64, n_cams,
                                     n_ims, n_keys, k_pad, n_ims_grid)

        uvs.append(blocks.uv)
        masks.append(blocks.mask)
        tpls.append(tpl_pad)
        cmasks.append(cmask)
        pieces0.append(to_np_pieces(base_full))
        cam_i = dd[:, 0].astype(int)
        im_i = dd[:, 1].astype(int)
        key_i = dd[:, 2].astype(int)
        rig_host.append((struct, base_full, free_idx,
                         cam_i * n_ims_grid + im_i, key_i, n_ims))

    def stack(ps):
        return ParamPieces(*(jnp.asarray(np.stack(a), dtype=dtype)
                             for a in zip(*ps)))

    uv_s = jnp.asarray(np.stack(uvs), dtype=dtype)
    mask_s = jnp.asarray(np.stack(masks), dtype=dtype)
    tpl_s = jnp.asarray(np.stack(tpls), dtype=dtype)
    cmask_s = stack(cmasks)
    x0_s = stack(pieces0)

    neq_raw = make_structured_neq(
        op_fun, widths, n_cams, n_ims_grid,
        loss=_opt(opts, "loss", "linear"),
        f_scale=float(_opt(opts, "f_scale", 1.0)),
        group_of_key=gok_pad, n_groups=n_groups if grouped else None,
        loss_semantics=_opt(opts, "loss_semantics", "component"))
    max_nfev = int(_opt(opts, "max_nfev", 100))

    reduced_solver = _opt(opts, "reduced_solver", "auto")
    if reduced_solver == "auto":  # same rule as the single-rig builder
        reduced_solver = auto_reduced_solver(widths, n_cams, n_ims_grid)

    def one(xp, uv, mask, tpl, cm):
        def neq_fn(p):
            return neq_raw(p, uv, mask, tpl, cm)
        return structured_lm_solve(neq_fn, xp, max_nfev=max_nfev,
                                   reduced_solver=reduced_solver)

    n_rigs_total = int(uv_s.shape[0])
    if mesh is None and n_rigs_total >= 16:
        # single-chip fleets large enough to pay the lockstep tax run the
        # convergence-cohort cascade (identical per-rig results)
        from pycamset_tpu.optim.structured_lm import slm_init, slm_run

        def one_init(xp, uv, mask, tpl, cm):
            return slm_init(lambda p: neq_raw(p, uv, mask, tpl, cm), xp,
                            max_nfev=max_nfev)

        def one_run(st, cap, uv, mask, tpl, cm):
            return slm_run(lambda p: neq_raw(p, uv, mask, tpl, cm), st,
                           max_nfev=max_nfev, nfev_cap=cap,
                           reduced_solver=reduced_solver)

        solve_impl = make_cascade_solve(one_init, one_run, n_rigs_total)
    else:
        solve_impl, uv_s, mask_s, tpl_s, cmask_s, x0_s = _fleet_solve_impl(
            one, mesh, uv_s, mask_s, tpl_s, cmask_s, x0_s)

    point_fn = op_fun.make_point_fn()
    blk_cam = np.repeat(np.arange(n_cams), n_ims_grid)
    blk_im = np.tile(np.arange(n_ims_grid), n_cams)
    gok_d = np.asarray(gok_pad) if grouped else None

    def _block_residual(x_pieces, uv, mask, tpl):
        cam_b = x_pieces.cam[blk_cam]
        im_b = x_pieces.im[blk_im]
        keyp = x_pieces.key[gok_d] if grouped else x_pieces.key

        def slot(cp, ip, kp, t, u):
            return point_fn(jnp.concatenate([cp, ip, kp]), t) - u

        per_key = jax.vmap(slot, in_axes=(None, None, 0, 0, 0))
        per_blk = jax.vmap(per_key, in_axes=(0, 0, None, None, 0))
        return per_blk(cam_b, im_b, keyp, tpl, uv) * mask[..., None]

    block_residual_impl = jax.jit(_block_residual)
    fleet_residual_impl = jax.jit(jax.vmap(_block_residual))

    n_keyrows = n_groups if grouped else n_keys

    def extract_free(r: int, x_pieces: ParamPieces) -> np.ndarray:
        struct, base_full, free_idx, _, _, n_ims = rig_host[r]
        xp = jax.tree_util.tree_map(np.asarray, x_pieces)
        full = np.asarray(merge_pieces_to_full(
            ParamPieces(jnp.asarray(xp.cam, dtype=jnp.float64),
                        (jnp.asarray(xp.im[:n_ims], dtype=jnp.float64)
                         if widths.b else jnp.zeros((n_ims, 0))),
                        jnp.asarray(xp.key[:n_keyrows],
                                    dtype=jnp.float64)),
            op_fun, struct, n_cams, n_ims, n_keys))
        return full[free_idx]

    def apply_free(r: int, x_free: np.ndarray) -> ParamPieces:
        # rebuild rig r's pieces from updated free params (host, per rig)
        struct, base_full, free_idx, _, _, n_ims = rig_host[r]
        full = base_full.copy()
        full[free_idx] = np.asarray(x_free, dtype=np.float64)
        p = split_full_params(full, op_fun, struct, n_cams, n_ims, n_keys,
                              widths, xp=np)
        k_pad = tpls[r].shape[0]
        return pad_pieces_to_grid(p, widths, grouped, n_keys, k_pad,
                                  n_ims, n_ims_grid, xp=np)

    def solve_fn():
        res: SLMResult = solve_impl(x0_s, uv_s, mask_s, tpl_s, cmask_s)
        res_h = jax.tree_util.tree_map(np.asarray, res)
        out = []
        for r in range(len(handlers)):
            res_r = jax.tree_util.tree_map(lambda a: a[r], res_h)
            out.append((extract_free(r, res_r.x), res_r))
        return out, res

    def residual_fn(r: int, x_free: np.ndarray) -> np.ndarray:
        p = jax.tree_util.tree_map(lambda a: jnp.asarray(a, dtype=dtype),
                                   apply_free(r, x_free))
        rr = np.asarray(block_residual_impl(p, uv_s[r], mask_s[r],
                                            tpl_s[r]))
        _, _, _, blk_i, key_i, _ = rig_host[r]
        return rr[blk_i, key_i]

    def residuals_from_pieces(pieces_b) -> list:
        # whole-fleet residuals: ONE dispatch, ONE fetched array
        rr = np.asarray(fleet_residual_impl(pieces_b, uv_s, mask_s, tpl_s))
        out = []
        for r in range(len(handlers)):
            _, _, _, blk_i, key_i, _ = rig_host[r]
            out.append(rr[r][blk_i, key_i])
        return out

    return FleetProblem(solve_fn, residual_fn, x0s, residuals_from_pieces,
                        x0_s)


def _build_tied_fleet(handlers, x0s, widths, grouped, opts, dtype,
                      k_pad_multiple: int, mesh):
    """Shared-intrinsics (tied-lens) fleet: TiedPieces state, fold_tied
    normal equations, make_tied_ops injection — the fleet counterpart of
    ``optim/shared_intr.py::build_shared_structured_problem``, plugged in
    exactly like the mixed fleet path (ops= into structured_lm_solve)."""
    from pycamset_tpu.optim.shared_intr import (
        TiedPieces, fold_tied, make_tied_ops, resolve_lens_groups)

    h0 = handlers[0]
    op_fun = h0.op_fun
    if widths.c != 0 or not op_fun.templated or widths.b != 6 or grouped:
        raise UnsupportedChain(
            "shared_intrinsics supports template chains only "
            "(projection + extrinsic + template points)")
    s = widths.a - 6
    if s <= 0:
        raise UnsupportedChain("chain has no intrinsic columns to tie")
    n_cams, n_keys = len(h0.cam_names), h0.n_keys()

    gid = resolve_lens_groups(opts["shared_intrinsics"], h0.cam_names)
    for i, h in enumerate(handlers[1:], start=1):
        gid_i = resolve_lens_groups(opts["shared_intrinsics"], h.cam_names)
        if not np.array_equal(gid_i, gid):
            raise FleetMismatch(
                f"rig {i} lens-group layout differs from rig 0 "
                "(the fleet shares one tied structure)")
    n_groups = int(gid.max()) + 1
    oh_np = np.zeros((gid.size, n_groups))
    oh_np[np.arange(gid.size), gid] = 1.0
    counts = oh_np.sum(axis=0)

    v = opts["im_bucket"]
    im_bucket = 8 if v is _UNSET else v
    n_ims_fleet = max(int(h.bundlePrimitive.poses.shape[0])
                      for h in handlers)
    if im_bucket:
        n_ims_grid = ((n_ims_fleet + im_bucket - 1) // im_bucket) * im_bucket
    else:
        n_ims_grid = n_ims_fleet

    # ---- per-rig prep (same SHARED helpers as the template fleet) ----
    uvs, masks, tpls, cmasks, tied0 = [], [], [], [], []
    rig_host = []  # (struct, base_full, free_idx, blk idx, key idx, n_ims)
    k_pad = None

    def to_tied_np(full_np, struct, n_ims, kp):
        p = split_full_params(full_np.astype(np.float64), op_fun, struct,
                              n_cams, n_ims, n_keys, widths, xp=np)
        p = pad_pieces_to_grid(p, widths, False, n_keys, kp, n_ims,
                               n_ims_grid, xp=np)
        shared = (oh_np.T @ p.cam[:, :s]) / counts[:, None]  # group means
        return TiedPieces(shared, p.cam[:, s:], p.im)

    for h, x0 in zip(handlers, x0s):
        n_ims = int(h.bundlePrimitive.poses.shape[0])
        dd = h.get_detection_data(flatten=True)
        blocks = build_block_arrays(dd, n_cams, n_ims_grid, n_keys,
                                    k_pad_multiple=k_pad_multiple)
        k_pad = blocks.uv.shape[1]
        struct = op_fun.param_struct(n_cams, n_ims, n_keys)
        base_full = h.bundlePrimitive.base_full()
        unfixed = h.bundlePrimitive.unfixed_full()
        base_full[unfixed] = x0
        free_idx = np.where(unfixed)[0]

        cmask = build_colmask_pieces(base_full, unfixed, op_fun, struct,
                                     widths, False, np.float64, n_cams,
                                     n_ims, n_keys, k_pad, n_ims_grid)
        if not np.all(np.asarray(cmask.cam)[:, :s] == 1.0):
            raise UnsupportedChain(
                "shared_intrinsics cannot honour per-camera fixed "
                "intrinsics (fix none; a fully-pinned shared lens needs "
                "no tying — pin every camera's int/dst and solve untied)")

        uvs.append(blocks.uv)
        masks.append(blocks.mask)
        tpls.append(pad_template_table(h.template_table(), True, n_keys,
                                       k_pad))
        cmasks.append(cmask)
        tied0.append(to_tied_np(base_full, struct, n_ims, k_pad))
        cam_i = dd[:, 0].astype(int)
        im_i = dd[:, 1].astype(int)
        key_i = dd[:, 2].astype(int)
        rig_host.append((struct, base_full, free_idx,
                         cam_i * n_ims_grid + im_i, key_i, n_ims))

    def stack_tied(ps):
        return TiedPieces(*(jnp.asarray(np.stack(a), dtype=dtype)
                            for a in zip(*ps)))

    def stack_pieces(ps):
        return ParamPieces(*(jnp.asarray(np.stack(a), dtype=dtype)
                             for a in zip(*ps)))

    uv_s = jnp.asarray(np.stack(uvs), dtype=dtype)
    mask_s = jnp.asarray(np.stack(masks), dtype=dtype)
    tpl_s = jnp.asarray(np.stack(tpls), dtype=dtype)
    cmask_s = stack_pieces(cmasks)
    x0_s = stack_tied(tied0)

    neq_raw = make_structured_neq(
        op_fun, widths, n_cams, n_ims_grid,
        loss=_opt(opts, "loss", "linear"),
        f_scale=float(_opt(opts, "f_scale", 1.0)),
        loss_semantics=_opt(opts, "loss_semantics", "component"))
    max_nfev = int(_opt(opts, "max_nfev", 100))
    ops = make_tied_ops(oh_np)

    def expand(tp: TiedPieces) -> ParamPieces:
        cam_full = jnp.concatenate([tp.shared[gid], tp.cam], axis=1)
        return ParamPieces(cam_full, tp.im,
                           jnp.zeros((k_pad, 0), dtype=tp.cam.dtype))

    def one(xtp, uv, mask, tpl, cm):
        def neq_fn(tp):
            oh = jnp.asarray(oh_np, dtype=tp.cam.dtype)
            return fold_tied(neq_raw(expand(tp), uv, mask, tpl, cm), s, oh)
        return structured_lm_solve(neq_fn, xtp, max_nfev=max_nfev,
                                   reduced_solver="dense", ops=ops)

    solve_impl, uv_s, mask_s, tpl_s, cmask_s, x0_s = _fleet_solve_impl(
        one, mesh, uv_s, mask_s, tpl_s, cmask_s, x0_s)

    point_fn = op_fun.make_point_fn()
    blk_cam = np.repeat(np.arange(n_cams), n_ims_grid)
    blk_im = np.tile(np.arange(n_ims_grid), n_cams)

    def _block_residual(x_tied, uv, mask, tpl):
        p = expand(x_tied)
        cam_b = p.cam[blk_cam]
        im_b = p.im[blk_im]

        def slot(cp, ip, t, u):
            return point_fn(jnp.concatenate([cp, ip]), t) - u

        per_key = jax.vmap(slot, in_axes=(None, None, 0, 0))
        per_blk = jax.vmap(per_key, in_axes=(0, 0, None, 0))
        return per_blk(cam_b, im_b, tpl, uv) * mask[..., None]

    block_residual_impl = jax.jit(_block_residual)
    fleet_residual_impl = jax.jit(jax.vmap(_block_residual))

    def extract_free(r: int, x_tied: TiedPieces) -> np.ndarray:
        struct, base_full, free_idx, _, _, n_ims = rig_host[r]
        tp = jax.tree_util.tree_map(np.asarray, x_tied)
        sh = jnp.asarray(tp.shared, dtype=jnp.float64)
        cam_full = jnp.concatenate(
            [sh[gid], jnp.asarray(tp.cam, dtype=jnp.float64)], axis=1)
        full = np.asarray(merge_pieces_to_full(
            ParamPieces(cam_full,
                        jnp.asarray(tp.im[:n_ims], dtype=jnp.float64),
                        jnp.zeros((n_keys, 0))),
            op_fun, struct, n_cams, n_ims, n_keys))
        return full[free_idx]

    def apply_free(r: int, x_free: np.ndarray) -> TiedPieces:
        struct, base_full, free_idx, _, _, n_ims = rig_host[r]
        full = base_full.copy()
        full[free_idx] = np.asarray(x_free, dtype=np.float64)
        return to_tied_np(full, struct, n_ims, k_pad)

    def solve_fn():
        res: SLMResult = solve_impl(x0_s, uv_s, mask_s, tpl_s, cmask_s)
        res_h = jax.tree_util.tree_map(np.asarray, res)
        out = []
        for r in range(len(handlers)):
            res_r = jax.tree_util.tree_map(lambda a: a[r], res_h)
            out.append((extract_free(r, res_r.x), res_r))
        return out, res

    def residual_fn(r: int, x_free: np.ndarray) -> np.ndarray:
        tp = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, dtype=dtype), apply_free(r, x_free))
        rr = np.asarray(block_residual_impl(tp, uv_s[r], mask_s[r],
                                            tpl_s[r]))
        _, _, _, blk_i, key_i, _ = rig_host[r]
        return rr[blk_i, key_i]

    def residuals_from_pieces(pieces_b) -> list:
        rr = np.asarray(fleet_residual_impl(pieces_b, uv_s, mask_s, tpl_s))
        out = []
        for r in range(len(handlers)):
            _, _, _, blk_i, key_i, _ = rig_host[r]
            out.append(rr[r][blk_i, key_i])
        return out

    return FleetProblem(solve_fn, residual_fn, x0s, residuals_from_pieces,
                        x0_s)


def _validate_mixed_fleet(handlers):
    """Mixed-chain (PER_KEY+PER_GROUP) counterpart of _validate_fleet."""
    from pycamset_tpu.optim.structured_mixed import mixed_chain_widths

    h0 = handlers[0]
    names = _chain_names(h0)
    widths = mixed_chain_widths(h0.op_fun)  # raises UnsupportedChain
    n_cams, n_keys = len(h0.cam_names), h0.n_keys()
    opts = {k: h0.problem_opts.get(k, _UNSET) for k in _SHARED_OPTS}
    raw_gok = getattr(h0, "group_of_key", lambda: None)()
    n_groups = int(getattr(h0, "n_groups", lambda: 0)() or 0)
    if raw_gok is None or n_groups <= 0:
        raise UnsupportedChain(
            "mixed PER_KEY + PER_GROUP fleet needs the handlers to "
            "implement group_of_key() and n_groups() (see "
            "structured_driver.build_mixed_structured_problem)")
    gok = np.asarray(raw_gok, dtype=np.int64)
    if gok.shape != (n_keys,) or gok.min() < 0 or gok.max() >= n_groups:
        raise ValueError("group_of_key() must map every key into "
                         f"[0, {n_groups})")
    for i, h in enumerate(handlers[1:], start=1):
        if _chain_names(h) != names:
            raise FleetMismatch(
                f"rig {i} chain {_chain_names(h)} != rig 0 chain {names}")
        if mixed_chain_widths(h.op_fun) != widths:
            raise FleetMismatch(f"rig {i} chain widths differ from rig 0")
        if len(h.cam_names) != n_cams:
            raise FleetMismatch(
                f"rig {i} has {len(h.cam_names)} cameras, rig 0 {n_cams}")
        if h.n_keys() != n_keys:
            raise FleetMismatch(
                f"rig {i} has {h.n_keys()} keys, rig 0 {n_keys}")
        gok_i = np.asarray(h.group_of_key(), dtype=np.int64)
        if int(h.n_groups()) != n_groups or not np.array_equal(gok_i, gok):
            raise FleetMismatch(
                f"rig {i} key->group map differs from rig 0")
        opts_i = {k: h.problem_opts.get(k, _UNSET) for k in _SHARED_OPTS}
        if opts_i != opts:
            diff = {k: (opts[k], opts_i[k]) for k in _SHARED_OPTS
                    if opts[k] != opts_i[k]}
            raise FleetMismatch(
                f"rig {i} solver options differ from rig 0: {diff}")
    return widths, gok, n_groups, opts


def _build_mixed_fleet(handlers, x0s, dtype, k_pad_multiple: int,
                       mesh) -> FleetProblem:
    """Mixed-chain fleet: R multi-target self-calibrations in one vmapped
    arrow-structured solve. Single-rig counterpart:
    structured_driver.build_mixed_structured_problem."""
    from pycamset_tpu.optim.structured_mixed import (
        make_mixed_ops, make_mixed_structured_neq, merge_mixed_to_full,
        pad_mixed_pieces, split_full_mixed)

    widths, gok, n_groups, opts = _validate_mixed_fleet(handlers)
    h0 = handlers[0]
    op_fun = h0.op_fun
    n_cams, n_keys = len(h0.cam_names), h0.n_keys()

    v = opts["im_bucket"]
    im_bucket = 8 if v is _UNSET else v
    n_ims_fleet = max(int(h.bundlePrimitive.poses.shape[0])
                      for h in handlers)
    if im_bucket:
        n_ims_grid = ((n_ims_fleet + im_bucket - 1) // im_bucket) * im_bucket
    else:
        n_ims_grid = n_ims_fleet

    k_pad0 = -(-max(n_keys, 1) // k_pad_multiple) * k_pad_multiple
    gok_pad = np.concatenate(
        [gok, np.full(k_pad0 - n_keys, gok[0], dtype=np.int64)])

    uvs, masks, tpls, cmasks, pieces0 = [], [], [], [], []
    rig_host = []
    for h, x0 in zip(handlers, x0s):
        n_ims = int(h.bundlePrimitive.poses.shape[0])
        dd = h.get_detection_data(flatten=True)
        blocks = build_block_arrays(dd, n_cams, n_ims_grid, n_keys,
                                    k_pad_multiple=k_pad_multiple)
        k_pad = blocks.uv.shape[1]
        struct = op_fun.param_struct(n_cams, n_ims, n_keys,
                                     n_groups=n_groups)
        base_full = h.bundlePrimitive.base_full()
        unfixed = h.bundlePrimitive.unfixed_full()
        base_full[unfixed] = x0
        free_idx = np.where(unfixed)[0]
        tpl_pad = pad_template_table(h.template_table(), op_fun.templated,
                                     n_keys, k_pad)

        def to_np_pieces(full_np):
            p = split_full_mixed(full_np.astype(np.float64), op_fun,
                                 struct, n_cams, n_ims, n_keys, n_groups,
                                 xp=np)
            return pad_mixed_pieces(p, n_keys, k_pad, n_ims, n_ims_grid,
                                    xp=np)

        colmask_np = np.zeros_like(base_full)
        colmask_np[unfixed] = 1.0
        cmask = to_np_pieces(colmask_np)
        cmask.key[n_keys:] = 0.0
        cmask.im[n_ims:] = 0.0

        uvs.append(blocks.uv)
        masks.append(blocks.mask)
        tpls.append(tpl_pad)
        cmasks.append(cmask)
        pieces0.append(to_np_pieces(base_full))
        cam_i = dd[:, 0].astype(int)
        im_i = dd[:, 1].astype(int)
        key_i = dd[:, 2].astype(int)
        rig_host.append((struct, base_full, free_idx,
                         cam_i * n_ims_grid + im_i, key_i, n_ims))

    from pycamset_tpu.optim.structured_mixed import MixedPieces

    def stack(ps):
        return MixedPieces(*(jnp.asarray(np.stack(a), dtype=dtype)
                             for a in zip(*ps)))

    uv_s = jnp.asarray(np.stack(uvs), dtype=dtype)
    mask_s = jnp.asarray(np.stack(masks), dtype=dtype)
    tpl_s = jnp.asarray(np.stack(tpls), dtype=dtype)
    cmask_s = stack(cmasks)
    x0_s = stack(pieces0)

    neq_raw = make_mixed_structured_neq(
        op_fun, widths, n_cams, n_ims_grid, group_of_key=gok_pad,
        n_groups=n_groups, loss=_opt(opts, "loss", "linear"),
        f_scale=float(_opt(opts, "f_scale", 1.0)),
        loss_semantics=_opt(opts, "loss_semantics", "component"))
    ops = make_mixed_ops(neq_raw.onehot)
    max_nfev = int(_opt(opts, "max_nfev", 100))

    def one(xp, uv, mask, tpl, cm):
        def neq_fn(p):
            return neq_raw(p, uv, mask, tpl, cm)
        return structured_lm_solve(neq_fn, xp, max_nfev=max_nfev, ops=ops)

    solve_impl, uv_s, mask_s, tpl_s, cmask_s, x0_s = _fleet_solve_impl(
        one, mesh, uv_s, mask_s, tpl_s, cmask_s, x0_s)

    point_fn = op_fun.make_point_fn()
    blk_cam = np.repeat(np.arange(n_cams), n_ims_grid)
    blk_im = np.tile(np.arange(n_ims_grid), n_cams)
    gok_d = np.asarray(gok_pad)
    kk = np.asarray(widths.key_cols)
    gg_cols = np.asarray(widths.grp_cols)

    def _block_residual(x_pieces, uv, mask, tpl):
        cam_b = x_pieces.cam[blk_cam]
        im_b = x_pieces.im[blk_im]
        keyp = jnp.zeros((k_pad0, widths.c), dtype)
        keyp = keyp.at[:, kk].set(x_pieces.key)
        keyp = keyp.at[:, gg_cols].set(x_pieces.grp[gok_d])

        def slot(cp, ip, kp, t, u):
            return point_fn(jnp.concatenate([cp, ip, kp]), t) - u

        per_key = jax.vmap(slot, in_axes=(None, None, 0, 0, 0))
        per_blk = jax.vmap(per_key, in_axes=(0, 0, None, None, 0))
        return per_blk(cam_b, im_b, keyp, tpl, uv) * mask[..., None]

    block_residual_impl = jax.jit(_block_residual)
    fleet_residual_impl = jax.jit(jax.vmap(_block_residual))

    def extract_free(r: int, x_pieces) -> np.ndarray:
        struct, base_full, free_idx, _, _, n_ims = rig_host[r]
        xp = jax.tree_util.tree_map(np.asarray, x_pieces)
        full = merge_mixed_to_full(xp, op_fun, struct, n_cams, n_ims,
                                   n_keys, n_groups)
        return full[free_idx]

    def apply_free(r: int, x_free: np.ndarray):
        struct, base_full, free_idx, _, _, n_ims = rig_host[r]
        full = base_full.copy()
        full[free_idx] = np.asarray(x_free, dtype=np.float64)
        p = split_full_mixed(full, op_fun, struct, n_cams, n_ims, n_keys,
                             n_groups, xp=np)
        return pad_mixed_pieces(p, n_keys, tpls[r].shape[0], n_ims,
                                n_ims_grid, xp=np)

    def solve_fn():
        res: SLMResult = solve_impl(x0_s, uv_s, mask_s, tpl_s, cmask_s)
        res_h = jax.tree_util.tree_map(np.asarray, res)
        out = []
        for r in range(len(handlers)):
            res_r = jax.tree_util.tree_map(lambda a: a[r], res_h)
            out.append((extract_free(r, res_r.x), res_r))
        return out, res

    def residual_fn(r: int, x_free: np.ndarray) -> np.ndarray:
        p = jax.tree_util.tree_map(lambda a: jnp.asarray(a, dtype=dtype),
                                   apply_free(r, x_free))
        rr = np.asarray(block_residual_impl(p, uv_s[r], mask_s[r],
                                            tpl_s[r]))
        _, _, _, blk_i, key_i, _ = rig_host[r]
        return rr[blk_i, key_i]

    def residuals_from_pieces(pieces_b) -> list:
        rr = np.asarray(fleet_residual_impl(pieces_b, uv_s, mask_s, tpl_s))
        out = []
        for r in range(len(handlers)):
            _, _, _, blk_i, key_i, _ = rig_host[r]
            out.append(rr[r][blk_i, key_i])
        return out

    return FleetProblem(solve_fn, residual_fn, x0s, residuals_from_pieces,
                        x0_s)


def run_fleet_bundle_adjustment(handlers, dtype=None, mesh=None):
    """Solve every handler's bundle adjustment in one batched device solve.

    Fleet counterpart of ``optim/driver.py::run_bundle_adjustment``.

    :param mesh: optional 1-D device mesh — shards the rig axis.
    :return: (list[OptimizeResult], list[CameraSet]) — one per rig, in
        handler order.
    """
    from pycamset_tpu.optim.driver import OptimizeResult

    logging.info(f"Making a fleet optimisation problem ({len(handlers)} "
                 "rigs, one vmapped solve)")
    prob = build_fleet_problem(handlers, dtype=dtype, mesh=mesh)

    # whole-fleet residual evaluations: one dispatch + one fetch each (2R
    # per-rig round-trips would cost ~0.1 s of tunnel transport apiece —
    # more than the batched solve itself at bench scale)
    init_errs = prob.residuals_from_pieces(prob.x0_pieces)
    for r, err in enumerate(init_errs):
        e = float(np.mean(np.linalg.norm(err, axis=1)))
        logging.info(f"rig {r}: initial Euclidean error {e:.2f} px")
        if e > 150 or np.isnan(e):
            logging.critical(
                f"rig {r}: worryingly high/NaN initial error — check its "
                "seeding before trusting the fleet solve")

    start = time.time()
    solved, res_raw = prob.solve()
    logging.info(f"Fleet optimisation took {time.time() - start: .2f} "
                 "seconds.")
    final_errs = prob.residuals_from_pieces(res_raw.x)

    results, camsets = [], []
    for r, (handler, (x_final, res)) in enumerate(zip(handlers, solved)):
        final_res = final_errs[r]
        e = float(np.mean(np.linalg.norm(final_res, axis=1)))
        logging.info(f"rig {r}: final Euclidean error {e:.2f} px "
                     f"(nit={int(res.nit)}, status={int(res.status)})")
        if e > 5:
            logging.critical(f"rig {r}: remaining error is very large — "
                             "please check its output")
        hist = np.asarray(res.history)
        opt = OptimizeResult(
            x=x_final, fun=final_res.reshape(-1), jac=None,
            cost=float(res.cost) * 0.5, nfev=int(res.nfev),
            nit=int(res.nit), status=int(res.status),
            history=hist[hist >= 0])
        camset = handler.get_camset(x_final)
        camset.set_calibration_history(opt, handler)
        results.append(opt)
        camsets.append(camset)
    return results, camsets
