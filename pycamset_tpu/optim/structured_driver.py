"""Builder gluing handlers to the structured Schur LM backend."""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from pycamset_tpu.optim.blocks import key_type
from pycamset_tpu.optim.chain import OptimFunction
from pycamset_tpu.optim.structured import (
    BlockArrays, ParamPieces, auto_reduced_solver, build_block_arrays,
    chain_widths, make_structured_neq, merge_pieces_to_full,
    pad_pieces_to_grid, pad_template_table, split_full_params)
from pycamset_tpu.optim.structured_lm import SLMResult, structured_lm_solve


def _resolve_shard_axis(param_handler, mesh, n_cams: int,
                        n_ims_grid: int) -> tuple[str, int]:
    """(shard_axis, n_ims_grid) for a mesh run: 'auto' picks the axis that
    divides the mesh (pose pads any rig); the image grid rounds up to a
    device multiple when the pose axis is chosen."""
    from pycamset_tpu.parallel.sharded_structured import choose_shard_axis

    n_dev = mesh.devices.size
    shard_axis = param_handler.problem_opts.get("shard_axis", "auto")
    if shard_axis not in ("auto", "cam", "pose", "key"):
        raise ValueError(f"unknown shard_axis {shard_axis!r} "
                         "(expected 'auto', 'cam', 'pose' or 'key')")
    if shard_axis == "auto":
        shard_axis = choose_shard_axis(n_cams, n_ims_grid, n_dev)
    if shard_axis == "pose" and n_ims_grid % n_dev:
        n_ims_grid = -(-n_ims_grid // n_dev) * n_dev
    return shard_axis, n_ims_grid


def build_colmask_pieces(base_full, unfixed, op_fun, struct, widths,
                         grouped: bool, dtype, n_cams: int, n_ims: int,
                         n_keys: int, k_pad: int,
                         n_ims_grid: int) -> ParamPieces:
    """Host-numpy 0/1 unfixed column masks on the padded grid (padded key
    and image slots are never free parameters). Shared by the single-rig
    builder (where it is a captured closure constant — it must stay host
    numpy, see build_structured_problem) and the fleet builder (where it
    rides the batch axis as a traced argument)."""
    colmask_np = np.zeros_like(base_full)
    colmask_np[unfixed] = 1.0
    p_cm = split_full_params(colmask_np.astype(dtype), op_fun, struct,
                             n_cams, n_ims, n_keys, widths, xp=np)
    cm = pad_pieces_to_grid(p_cm, widths, grouped, n_keys, k_pad, n_ims,
                            n_ims_grid, xp=np)
    if widths.c and not grouped:
        cm.key[n_keys:] = 0.0
    if widths.b:
        cm.im[n_ims:] = 0.0
    return cm


def build_structured_problem(param_handler, dtype, k_pad_multiple: int = 128,
                             mesh=None):
    """Compile a handler's problem onto the structured backend.

    :return: (solve_fn(x0_free)->(x_free, SLMResult), residual_fn(x_free),
              x0_free) — same contract as optim.driver.build_solver.
    Raises UnsupportedChain when the chain does not fit the structured layout.

    The image axis of the device grid is padded to a bucket multiple
    (problem_opts['im_bucket'], default 8; None disables) so rigs with
    similar image counts share compiled executables — compilation dominates
    wall time for one-off solves (20-300 s vs tens of ms). Pad images carry
    replicated pose values, zero masks and zero column masks, so they
    contribute nothing.

    :param mesh: a jax.sharding.Mesh — shard the solve over its devices
        (backend="sharded"). problem_opts["shard_axis"] picks 'cam', 'pose',
        'key' or 'auto' (default: the axis that divides the mesh; the pose
        axis pads any rig). The same fused/per-block Pallas kernels serve
        the shard_map regions.
    """
    op_fun: OptimFunction = param_handler.op_fun
    widths = chain_widths(op_fun)

    x0 = np.asarray(param_handler.get_initial_params(), dtype=np.float64)
    n_cams = len(param_handler.cam_names)
    n_ims = int(param_handler.bundlePrimitive.poses.shape[0])
    n_keys = param_handler.n_keys()
    # the free-point chain has no image parameters, but every (cam, im) pair
    # in the table still indexes a block on the grid
    n_ims_true = n_ims if widths.b else int(param_handler.detection.max_ims)
    im_bucket = param_handler.problem_opts.get("im_bucket", 8)
    if im_bucket:
        n_ims_grid = ((n_ims_true + im_bucket - 1) // im_bucket) * im_bucket
    else:
        n_ims_grid = n_ims_true
    shard_axis = None
    if mesh is not None:
        shard_axis, n_ims_grid = _resolve_shard_axis(
            param_handler, mesh, n_cams, n_ims_grid)

    dd = param_handler.get_detection_data(flatten=True)
    # per-detection aux channels (rolling shutter: the normalized row)
    aux = getattr(param_handler, "aux_table", lambda rows: None)(dd)
    blocks = build_block_arrays(dd, n_cams, n_ims_grid, n_keys,
                                k_pad_multiple=k_pad_multiple, aux=aux)
    k_pad = blocks.uv.shape[1]

    # PER_GROUP-keyed chains (multi-target): the key axis carries one
    # parameter row per GROUP, expanded onto the key grid by group_of_key
    grouped = widths.key_link == key_type.PER_GROUP
    n_groups = int(param_handler.n_groups()) if grouped else 0
    if grouped:
        gok = np.asarray(param_handler.group_of_key(), dtype=np.int64)
        if gok.shape != (n_keys,):
            raise ValueError(
                f"group_of_key() must return one group index per key "
                f"({n_keys},); got shape {gok.shape}")
        if gok.min() < 0 or gok.max() >= n_groups:
            raise ValueError(
                f"group_of_key() indices out of range [0, {n_groups})")
        # pad key slots replicate key 0 (their masks are zero anyway)
        gok_pad = np.concatenate(
            [gok, np.full(k_pad - n_keys, gok[0], dtype=np.int64)])
        n_keyrows = n_groups
    else:
        gok_pad = None
        n_keyrows = n_keys

    struct = op_fun.param_struct(n_cams, n_ims, n_keys, n_groups=n_groups)
    base_full = param_handler.bundlePrimitive.base_full()
    unfixed = param_handler.bundlePrimitive.unfixed_full()
    base_full[unfixed] = x0
    free_idx = np.where(unfixed)[0]

    tpl_pad = pad_template_table(param_handler.template_table(),
                                 op_fun.templated, n_keys, k_pad)

    def to_pieces(full_np: np.ndarray) -> ParamPieces:
        p = split_full_params(jnp.asarray(full_np, dtype=dtype), op_fun,
                              struct, n_cams, n_ims, n_keys, widths)
        return pad_pieces_to_grid(p, widths, grouped, n_keys, k_pad,
                                  n_ims, n_ims_grid)

    # colmask is CAPTURED by solve_impl as a closure constant — it must be
    # host numpy (lowering a captured device array fetches it back through
    # the tunnel; the first such fetch in a process costs minutes on axon)
    colmask = build_colmask_pieces(base_full, unfixed, op_fun, struct,
                                   widths, grouped, dtype, n_cams, n_ims,
                                   n_keys, k_pad, n_ims_grid)

    neq_raw = None if mesh is not None else make_structured_neq(
        op_fun, widths, n_cams, n_ims_grid,
        loss=param_handler.problem_opts.get("loss", "linear"),
        f_scale=float(param_handler.problem_opts.get("f_scale", 1.0)),
        group_of_key=gok_pad, n_groups=n_groups if grouped else None,
        loss_semantics=param_handler.problem_opts.get(
            "loss_semantics", "component"))
    uv_d, mask_d = blocks.as_device(dtype)
    tpl_d = jnp.asarray(tpl_pad, dtype=dtype)
    max_nfev = int(param_handler.problem_opts.get("max_nfev", 100))

    # reduced-system solver: dense Cholesky for small rigs, matrix-free CG
    # when the (15C + 6I) system would be large to form
    reduced_solver = param_handler.problem_opts.get("reduced_solver", "auto")
    if reduced_solver == "auto":
        reduced_solver = auto_reduced_solver(widths, n_cams, n_ims_grid)

    if mesh is not None:
        from pycamset_tpu.parallel.sharded_structured import (
            make_sharded_structured_solver, shard_block_arrays)
        solve_impl = make_sharded_structured_solver(
            op_fun, widths, n_cams, n_ims_grid, mesh, colmask,
            max_nfev=max_nfev,
            loss=param_handler.problem_opts.get("loss", "linear"),
            f_scale=float(param_handler.problem_opts.get("f_scale", 1.0)),
            reduced_solver=reduced_solver, shard_axis=shard_axis,
            group_of_key=gok_pad, n_groups=n_groups if grouped else None,
            loss_semantics=param_handler.problem_opts.get(
                "loss_semantics", "component"))
        if shard_axis == "key":
            from pycamset_tpu.parallel.sharded_structured import (
                shard_key_data)
            uv_s, mask_s, tpl_s = shard_key_data(mesh, uv_d, mask_d,
                                                 tpl_d, n_cams)
        else:
            uv_s, mask_s = shard_block_arrays(mesh, uv_d, mask_d, n_cams,
                                              shard_axis=shard_axis)
            tpl_s = tpl_d
    else:
        uv_s, mask_s, tpl_s = uv_d, mask_d, tpl_d

        @jax.jit
        def solve_impl(x_pieces, uv, mask, tpl):
            def neq_fn(p):
                return neq_raw(p, uv, mask, tpl, colmask)
            return structured_lm_solve(neq_fn, x_pieces, max_nfev=max_nfev,
                                       reduced_solver=reduced_solver)

    point_fn = op_fun.make_point_fn()
    assemble = op_fun.make_local_assembler()
    aux_w = op_fun.aux_width
    # captured constants stay host-side (see colmask note above)
    blk_cam = np.repeat(np.arange(n_cams), n_ims_grid)
    blk_im = np.tile(np.arange(n_ims_grid), n_cams)

    gok_d = np.asarray(gok_pad) if grouped else None

    @jax.jit
    def block_residual_impl(x_pieces, uv, mask, tpl):
        cam_b = x_pieces.cam[blk_cam]
        im_b = x_pieces.im[blk_im]
        keyp = x_pieces.key[gok_d] if grouped else x_pieces.key

        def slot(cp, ip, kp, t, u):
            local = assemble(cp, ip, kp)
            if aux_w:
                return point_fn(local, t, u[2:]) - u[:2]
            return point_fn(local, t) - u

        per_key = jax.vmap(slot, in_axes=(None, None, 0, 0, 0))
        per_blk = jax.vmap(per_key, in_axes=(0, 0, None, None, 0))
        return per_blk(cam_b, im_b, keyp, tpl, uv) * mask[..., None]

    # unpadded residual extraction in detection-table row order
    cam_i = dd[:, 0].astype(int)
    im_i = dd[:, 1].astype(int)
    key_i = dd[:, 2].astype(int)
    blk_i = cam_i * n_ims_grid + im_i

    def apply_free(x_free: np.ndarray) -> ParamPieces:
        full = base_full.copy()
        full[free_idx] = np.asarray(x_free, dtype=np.float64)
        return to_pieces(full)

    def solve_fn(x_free: np.ndarray):
        res: SLMResult = solve_impl(apply_free(x_free), uv_s, mask_s, tpl_s)
        x_pieces = jax.tree_util.tree_map(np.asarray, res.x)
        full = np.asarray(merge_pieces_to_full(
            ParamPieces(jnp.asarray(x_pieces.cam, dtype=jnp.float64),
                        (jnp.asarray(x_pieces.im[:n_ims], dtype=jnp.float64)
                         if widths.b else jnp.zeros((n_ims, 0))),
                        jnp.asarray(x_pieces.key[:n_keyrows],
                                    dtype=jnp.float64)),
            op_fun, struct, n_cams, n_ims, n_keys))
        return full[free_idx], res

    def residual_fn(x_free: np.ndarray) -> np.ndarray:
        r = np.asarray(block_residual_impl(apply_free(x_free), uv_d, mask_d, tpl_d))
        return r[blk_i, key_i]

    return solve_fn, residual_fn, x0


def build_mixed_structured_problem(param_handler, dtype,
                                   k_pad_multiple: int = 128, mesh=None):
    """Compile a MIXED PER_KEY + PER_GROUP chain (multi-target
    self-calibration) onto the arrow-structured backend
    (optim/structured_mixed.py). Same contract as build_structured_problem;
    raises UnsupportedChain when the chain is not mixed. `mesh` shards the
    solve (backend="sharded"; problem_opts["shard_axis"] as in
    build_structured_problem).
    """
    from pycamset_tpu.optim.structured import UnsupportedChain
    from pycamset_tpu.optim.structured_mixed import (
        MixedPieces, make_mixed_ops, make_mixed_structured_neq,
        merge_mixed_to_full, mixed_chain_widths, pad_mixed_pieces,
        split_full_mixed)

    # a mixed chain is unusable without the key->group map; check before
    # any other handler access so the diagnostic names the actual gap
    # (getattr: duck-typed handlers may not define the group methods at
    # all — that must read as UnsupportedChain, not AttributeError, so the
    # driver's generic-backend fallback still engages)
    raw_gok = getattr(param_handler, "group_of_key", lambda: None)()
    n_groups = int(getattr(param_handler, "n_groups", lambda: 0)() or 0)
    if raw_gok is None or n_groups <= 0:
        raise UnsupportedChain(
            "mixed PER_KEY + PER_GROUP chain needs the handler to implement "
            "group_of_key() -> (n_keys,) int array and n_groups() -> int "
            f"(got group_of_key()={raw_gok!r}, n_groups()={n_groups})")

    op_fun: OptimFunction = param_handler.op_fun
    widths = mixed_chain_widths(op_fun)

    x0 = np.asarray(param_handler.get_initial_params(), dtype=np.float64)
    n_cams = len(param_handler.cam_names)
    n_ims = int(param_handler.bundlePrimitive.poses.shape[0])
    n_keys = param_handler.n_keys()
    im_bucket = param_handler.problem_opts.get("im_bucket", 8)
    n_ims_grid = (((n_ims + im_bucket - 1) // im_bucket) * im_bucket
                  if im_bucket else n_ims)
    shard_axis = None
    if mesh is not None:
        shard_axis, n_ims_grid = _resolve_shard_axis(
            param_handler, mesh, n_cams, n_ims_grid)

    dd = param_handler.get_detection_data(flatten=True)
    blocks = build_block_arrays(dd, n_cams, n_ims_grid, n_keys,
                                k_pad_multiple=k_pad_multiple)
    k_pad = blocks.uv.shape[1]

    gok = np.asarray(raw_gok, dtype=np.int64)
    if gok.shape != (n_keys,) or gok.min() < 0 or gok.max() >= n_groups:
        raise ValueError("group_of_key() must map every key into "
                         f"[0, {n_groups})")
    gok_pad = np.concatenate(
        [gok, np.full(k_pad - n_keys, gok[0], dtype=np.int64)])

    struct = op_fun.param_struct(n_cams, n_ims, n_keys, n_groups=n_groups)
    base_full = param_handler.bundlePrimitive.base_full()
    unfixed = param_handler.bundlePrimitive.unfixed_full()
    base_full[unfixed] = x0
    free_idx = np.where(unfixed)[0]

    def to_pieces(full_np: np.ndarray, xp=jnp) -> MixedPieces:
        # xp=np builds host pieces — required for closure constants
        # (lowering a captured device array fetches it through the tunnel)
        p = split_full_mixed(xp.asarray(full_np, dtype=dtype), op_fun,
                             struct, n_cams, n_ims, n_keys, n_groups, xp=xp)
        return pad_mixed_pieces(p, n_keys, k_pad, n_ims, n_ims_grid, xp=xp)

    def from_pieces(p: MixedPieces) -> np.ndarray:
        return merge_mixed_to_full(p, op_fun, struct, n_cams, n_ims,
                                   n_keys, n_groups)

    colmask_np = np.zeros_like(base_full)
    colmask_np[unfixed] = 1.0
    colmask = to_pieces(colmask_np, xp=np)  # captured constant: stay on host
    colmask.key[n_keys:] = 0.0
    colmask.im[n_ims:] = 0.0

    tpl_pad = pad_template_table(param_handler.template_table(),
                                 op_fun.templated, n_keys, k_pad)

    uv_d, mask_d = blocks.as_device(dtype)
    tpl_d = jnp.asarray(tpl_pad, dtype=dtype)
    max_nfev = int(param_handler.problem_opts.get("max_nfev", 100))
    loss_kw = dict(
        loss=param_handler.problem_opts.get("loss", "linear"),
        f_scale=float(param_handler.problem_opts.get("f_scale", 1.0)),
        loss_semantics=param_handler.problem_opts.get(
            "loss_semantics", "component"))

    if mesh is not None:
        from pycamset_tpu.parallel.sharded_mixed import (
            make_sharded_mixed_solver)
        from pycamset_tpu.parallel.sharded_structured import (
            shard_block_arrays)
        solve_impl = make_sharded_mixed_solver(
            op_fun, widths, n_cams, n_ims_grid, mesh, colmask, gok_pad,
            n_groups, max_nfev=max_nfev, shard_axis=shard_axis, **loss_kw)
        if shard_axis == "key":
            from pycamset_tpu.parallel.sharded_structured import (
                shard_key_data)
            uv_s, mask_s, tpl_s = shard_key_data(mesh, uv_d, mask_d,
                                                 tpl_d, n_cams)
        else:
            uv_s, mask_s = shard_block_arrays(mesh, uv_d, mask_d, n_cams,
                                              shard_axis=shard_axis)
            tpl_s = tpl_d
    else:
        uv_s, mask_s, tpl_s = uv_d, mask_d, tpl_d
        neq_raw = make_mixed_structured_neq(
            op_fun, widths, n_cams, n_ims_grid, group_of_key=gok_pad,
            n_groups=n_groups, **loss_kw)
        ops = make_mixed_ops(neq_raw.onehot)

        @jax.jit
        def solve_impl(x_pieces, uv, mask, tpl):
            def neq_fn(p):
                return neq_raw(p, uv, mask, tpl, colmask)
            return structured_lm_solve(neq_fn, x_pieces, max_nfev=max_nfev,
                                       ops=ops)

    point_fn = op_fun.make_point_fn()
    # captured constants stay host-side (see colmask note above)
    blk_cam = np.repeat(np.arange(n_cams), n_ims_grid)
    blk_im = np.tile(np.arange(n_ims_grid), n_cams)
    gok_d = np.asarray(gok_pad)
    kk = np.asarray(widths.key_cols)
    gg_cols = np.asarray(widths.grp_cols)

    @jax.jit
    def block_residual_impl(x_pieces, uv, mask, tpl):
        cam_b = x_pieces.cam[blk_cam]
        im_b = x_pieces.im[blk_im]
        keyp = jnp.zeros((k_pad, widths.c), dtype)
        keyp = keyp.at[:, kk].set(x_pieces.key)
        keyp = keyp.at[:, gg_cols].set(x_pieces.grp[gok_d])

        def slot(cp, ip, kp, t, u):
            return point_fn(jnp.concatenate([cp, ip, kp]), t) - u

        per_key = jax.vmap(slot, in_axes=(None, None, 0, 0, 0))
        per_blk = jax.vmap(per_key, in_axes=(0, 0, None, None, 0))
        return per_blk(cam_b, im_b, keyp, tpl, uv) * mask[..., None]

    cam_i = dd[:, 0].astype(int)
    im_i = dd[:, 1].astype(int)
    key_i = dd[:, 2].astype(int)
    blk_i = cam_i * n_ims_grid + im_i

    def apply_free(x_free: np.ndarray) -> MixedPieces:
        full = base_full.copy()
        full[free_idx] = np.asarray(x_free, dtype=np.float64)
        return to_pieces(full)

    def solve_fn(x_free: np.ndarray):
        res: SLMResult = solve_impl(apply_free(x_free), uv_s, mask_s, tpl_s)
        full = from_pieces(jax.tree_util.tree_map(np.asarray, res.x))
        return full[free_idx], res

    def residual_fn(x_free: np.ndarray) -> np.ndarray:
        r = np.asarray(block_residual_impl(
            apply_free(x_free), uv_d, mask_d, tpl_d))
        return r[blk_i, key_i]

    return solve_fn, residual_fn, x0
