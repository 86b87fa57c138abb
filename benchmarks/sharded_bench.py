#!/usr/bin/env python
"""Sharded-backend timing on a real TPU mesh: fused vs per-block kernels.

Times the cam-sharded structured/mixed LM solves on the (1-device) real
TPU mesh with the fused-reduction Pallas kernels enabled (default) and
disabled (PYCAMSET_FUSED_*=0 — the per-block kernel path), using
bench.py's fetch-forced differenced methodology (block_until_ready does
not block through the axon tunnel).

Problems:
- selfcal 16x100 (485k detections): the fused win is structural — the
  (B, K, a, 3) point coupling never reaches HBM.
- template 64x400 (7.78M detections): the compute-bound point; 400 is a
  BLOCK_TILE multiple so the fused template policy engages.
- mixed 2-target 16x100: the arrow-structured multi-target self-cal.

Run: python benchmarks/sharded_bench.py [--skip-big]
Results land in docs/performance.md (manual; not part of bench.py).
"""
from __future__ import annotations

import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import (fetch_scalar, log, mixed_colmask_groups,  # noqa: E402
                   mixed_problem, perturbed, selfcal_colmask,
                   selfcal_problem, standard_problem, template_colmask,
                   timed_solve)


def _sharded_standard(n_cams, n_ims, fused_env: str | None):
    """Cam-sharded template solve on the real mesh; fused_env forces the
    PYCAMSET_FUSED_TEMPLATE policy ('0'/'1'/None=default)."""
    import jax

    from pycamset_tpu.optim.blocks import (Extrinsic3D, Projection,
                                           TemplatePoints)
    from pycamset_tpu.optim.chain import OptimFunction
    from pycamset_tpu.optim.structured import chain_widths
    from pycamset_tpu.parallel.mesh import detection_mesh
    from pycamset_tpu.parallel.sharded_structured import (
        make_sharded_structured_solver, shard_block_arrays)

    solve_sd, pieces, (uv, mask, tpl), blocks, struct = standard_problem(
        n_cams, n_ims)
    del solve_sd
    op_fun = OptimFunction([Projection(), Extrinsic3D(), TemplatePoints()])
    widths = chain_widths(op_fun)
    dtype = uv.dtype
    k_pad = mask.shape[1]
    colmask = template_colmask(n_cams, n_ims, widths, k_pad, dtype)

    mesh = detection_mesh()
    uv_s, mask_s = shard_block_arrays(mesh, uv, mask, n_cams)
    if fused_env is not None:
        os.environ["PYCAMSET_FUSED_TEMPLATE"] = fused_env
    try:
        solve = make_sharded_structured_solver(
            op_fun, widths, n_cams, n_ims, mesh, colmask, max_nfev=100)
    finally:
        os.environ.pop("PYCAMSET_FUSED_TEMPLATE", None)
    return solve, pieces, (uv_s, mask_s, tpl), blocks


def _sharded_selfcal(n_cams, n_ims, fused_env: str | None):
    import jax

    from pycamset_tpu.optim.blocks import (Extrinsic3D, FreePoint,
                                           Projection, RigidTform3d)
    from pycamset_tpu.optim.chain import OptimFunction
    from pycamset_tpu.optim.structured import ParamPieces, chain_widths
    from pycamset_tpu.parallel.mesh import detection_mesh
    from pycamset_tpu.parallel.sharded_structured import (
        make_sharded_structured_solver, shard_block_arrays)

    solve_sd, pieces, (uv, mask), blocks = selfcal_problem(n_cams, n_ims)
    del solve_sd
    op_fun = OptimFunction([Projection(), Extrinsic3D(), RigidTform3d(),
                            FreePoint()])
    widths = chain_widths(op_fun)
    dtype = uv.dtype
    k_pad = mask.shape[1]
    colmask = selfcal_colmask(n_cams, n_ims, blocks.n_keys, k_pad, widths,
                              dtype)
    tpl = np.zeros((k_pad, 3), dtype=dtype)

    mesh = detection_mesh()
    uv_s, mask_s = shard_block_arrays(mesh, uv, mask, n_cams)
    if fused_env is not None:
        os.environ["PYCAMSET_FUSED_SELFCAL"] = fused_env
    try:
        solve = make_sharded_structured_solver(
            op_fun, widths, n_cams, n_ims, mesh, colmask, max_nfev=100)
    finally:
        os.environ.pop("PYCAMSET_FUSED_SELFCAL", None)
    return solve, pieces, (uv_s, mask_s, tpl), blocks


def _sharded_mixed(n_cams, n_ims, fused_env: str | None):
    import jax

    from pycamset_tpu.optim.blocks import (Extrinsic3D, FreePoint,
                                           GroupRigidTform3d, Projection,
                                           RigidTform3d)
    from pycamset_tpu.optim.chain import OptimFunction
    from pycamset_tpu.optim.structured_mixed import (MixedPieces,
                                                     mixed_chain_widths)
    from pycamset_tpu.parallel.mesh import detection_mesh
    from pycamset_tpu.parallel.sharded_mixed import make_sharded_mixed_solver
    from pycamset_tpu.parallel.sharded_structured import shard_block_arrays

    solve_sd, pieces, (uv, mask, tpl), blocks = mixed_problem(n_cams, n_ims)
    del solve_sd
    op_fun = OptimFunction([Projection(), Extrinsic3D(), RigidTform3d(),
                            GroupRigidTform3d(), FreePoint()])
    widths = mixed_chain_widths(op_fun)
    dtype = uv.dtype
    k_pad = mask.shape[1]
    colmask, gok = mixed_colmask_groups(n_cams, n_ims, blocks.n_keys,
                                        k_pad, dtype)

    mesh = detection_mesh()
    uv_s, mask_s = shard_block_arrays(mesh, uv, mask, n_cams)
    if fused_env is not None:
        os.environ["PYCAMSET_FUSED_MIXED"] = fused_env
    try:
        solve = make_sharded_mixed_solver(
            op_fun, widths, n_cams, n_ims, mesh, colmask, gok, 2,
            max_nfev=60)
    finally:
        os.environ.pop("PYCAMSET_FUSED_MIXED", None)
    return solve, pieces, (uv_s, mask_s, tpl), blocks


def run(name, make, fused_env, k_hi=12):
    solve, pieces, args, blocks = make(fused_env)
    t0 = time.perf_counter()
    res = solve(pieces, *args)
    cost = fetch_scalar(res.cost)
    first_s = time.perf_counter() - t0
    rms = float(np.sqrt(cost / (2 * blocks.n_real)))
    nit = int(np.asarray(res.nit))
    per = timed_solve(solve, perturbed(pieces, 4), args, k_hi=k_hi)
    log(f"{name}[fused={fused_env or 'default'}]: dets={blocks.n_real} "
        f"nit={nit} rms={rms:.4f} first={first_s:.1f}s "
        f"solve={per * 1e3:.2f}ms")
    return per


def main():
    import jax
    log(f"backend={jax.default_backend()} devices={len(jax.devices())}")
    skip_big = "--skip-big" in sys.argv

    results = {}
    results["selfcal16x100_fused"] = run(
        "sharded_selfcal16x100", lambda e: _sharded_selfcal(16, 100, e), "1")
    results["selfcal16x100_perblock"] = run(
        "sharded_selfcal16x100", lambda e: _sharded_selfcal(16, 100, e), "0")
    results["mixed16x100_fused"] = run(
        "sharded_mixed16x100", lambda e: _sharded_mixed(16, 100, e), "1",
        k_hi=7)
    results["mixed16x100_perblock"] = run(
        "sharded_mixed16x100", lambda e: _sharded_mixed(16, 100, e), "0",
        k_hi=7)
    if not skip_big:
        results["template64x400_fused"] = run(
            "sharded_template64x400",
            lambda e: _sharded_standard(64, 400, e), "1", k_hi=7)
        results["template64x400_perblock"] = run(
            "sharded_template64x400",
            lambda e: _sharded_standard(64, 400, e), "0", k_hi=7)

    for k, v in results.items():
        print(f"{k}: {v * 1e3:.2f} ms")


if __name__ == "__main__":
    main()
