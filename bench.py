#!/usr/bin/env python
"""Benchmark: the north-star full LM bundle adjustment on one TPU chip.

Problem (BASELINE.md driver target): 16 cameras x 100 views, full LM BA,
target < 10 s wall with RMS parity. The synthetic rig injects 0.3 px noise;
the solve is correct iff the final RMS reaches the noise floor.

Uses the structured (Schur) backend: block-grid residuals, MXU-assembled
normal equations, pose elimination, dense reduced camera system — all inside
one jitted lax.while_loop.

Prints ONE JSON line:
{"metric": "ba16x100_solve_s", "value": <seconds>, "unit": "s",
 "vs_baseline": <10.0 / seconds>}
plus detail lines on stderr.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from pycamset_tpu.config import default_device_dtype
    from pycamset_tpu.optim.blocks import Extrinsic3D, Projection, TemplatePoints
    from pycamset_tpu.optim.chain import OptimFunction
    from pycamset_tpu.optim.structured import (
        ParamPieces, build_block_arrays, chain_widths, make_structured_neq,
        split_full_params)
    from pycamset_tpu.optim.structured_lm import structured_lm_solve
    from pycamset_tpu.utils.synthetic import make_synthetic_rig

    dtype = default_device_dtype()
    backend = jax.default_backend()
    rig = make_synthetic_rig(n_cams=16, n_ims=100, grid=19, visibility=0.85,
                             noise_px=0.3, seed=0)
    n_cams, n_ims, n_keys = rig["n_cams"], rig["n_ims"], rig["n_keys"]

    op_fun = OptimFunction([Projection(), Extrinsic3D(), TemplatePoints()])
    widths = chain_widths(op_fun)
    struct = op_fun.param_struct(n_cams, n_ims, n_keys)
    blocks = build_block_arrays(rig["dd"], n_cams, n_ims, n_keys)
    k_pad = blocks.uv.shape[1]
    uv, mask = blocks.as_device(dtype)
    tpl_pad = np.zeros((k_pad, 3))
    tpl_pad[:n_keys] = rig["template"]
    tpl = jnp.asarray(tpl_pad, dtype=dtype)

    true_full = np.concatenate([rig["intr"].ravel(), rig["extr"].ravel(),
                                rig["poses"].ravel()])

    # perturb the seed like a PnP initialisation would be off
    rng = np.random.default_rng(1)
    x_full = true_full.copy()
    scale = np.concatenate([
        np.tile([10.0, 5, 10, 5, 1e-2, 1e-3, 1e-4, 1e-4, 1e-4], n_cams),
        np.tile([1e-2] * 6, n_cams),
        np.tile([1e-2] * 6, n_ims),
    ])
    x_full += rng.normal(size=struct.total) * scale
    pose_sl = struct.group_slice(2)
    x_full[pose_sl.start:pose_sl.start + 6] = 0.0  # gauge: pose 0 fixed at id

    pieces = split_full_params(jnp.asarray(x_full, dtype=dtype), op_fun,
                               struct, n_cams, n_ims, n_keys, widths)
    pieces = ParamPieces(pieces.cam, pieces.im,
                         jnp.zeros((k_pad, 0), dtype=dtype))
    colmask = ParamPieces(
        jnp.ones((n_cams, widths.a), dtype=dtype),
        jnp.ones((n_ims, widths.b), dtype=dtype).at[0].set(0.0),
        jnp.ones((k_pad, 0), dtype=dtype))

    neq_raw = make_structured_neq(op_fun, widths, n_cams, n_ims)
    max_nfev = 100

    @jax.jit
    def solve(p, uv_, mask_, tpl_):
        return structured_lm_solve(
            lambda pp: neq_raw(pp, uv_, mask_, tpl_, colmask), p,
            max_nfev=max_nfev)

    # compile + first run (excluded from the timing)
    t0 = time.perf_counter()
    res = solve(pieces, uv, mask, tpl)
    jax.block_until_ready(res.cost)
    compile_and_first = time.perf_counter() - t0

    # timed warm runs: report the best of 5 — per-dispatch RPC latency
    # through the axon tunnel (~8 ms) dominates the jitter at this scale
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        res = solve(pieces, uv, mask, tpl)
        jax.block_until_ready(res.cost)
        times.append(time.perf_counter() - t0)
    solve_s = min(times)

    n_res = 2 * blocks.n_real
    rms = float(np.sqrt(float(res.cost) / n_res))
    nit = int(res.nit)
    print(f"backend={backend} dtype={np.dtype(dtype).name} "
          f"detections={blocks.n_real} params={struct.total - 6} "
          f"iters={nit} nfev={int(res.nfev)} status={int(res.status)} "
          f"rms_px={rms:.4f} (noise floor ~{rig['noise_px']}) "
          f"first_call_s={compile_and_first:.2f} solve_s={solve_s:.3f} "
          f"iters_per_s={nit / solve_s:.1f}", file=sys.stderr)

    ok = rms < rig["noise_px"] * 1.2
    if not ok:
        print(f"WARNING: rms {rms:.4f} did not reach the noise floor",
              file=sys.stderr)

    print(json.dumps({
        "metric": "ba16x100_solve_s",
        "value": round(solve_s, 4),
        "unit": "s",
        "vs_baseline": round(10.0 / solve_s, 2),
    }))


if __name__ == "__main__":
    main()
