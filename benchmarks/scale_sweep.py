#!/usr/bin/env python
"""Scale sweep: full LM BA wall time vs rig size on one TPU chip.

Run: python benchmarks/scale_sweep.py [--configs small,north,large,huge]
Results land in docs/performance.md (run manually; not part of bench.py).
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CONFIGS = {
    "small": dict(n_cams=4, n_ims=25, grid=19),
    "north": dict(n_cams=16, n_ims=100, grid=19),     # the BASELINE target
    "large": dict(n_cams=32, n_ims=200, grid=19),
    "huge": dict(n_cams=64, n_ims=400, grid=19),
    # single-chip ceiling (31M detections, ~45 s host data gen) — run by
    # request: --configs ceiling
    "ceiling": dict(n_cams=128, n_ims=800, grid=19),
}
DEFAULT_CONFIGS = ("small", "north", "large", "huge")


def run_config(name, cfg):
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
    rig = make_synthetic_rig(visibility=0.85, noise_px=0.3, seed=0, **cfg)
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

    full = np.concatenate([rig["intr"].ravel(), rig["extr"].ravel(),
                           rig["poses"].ravel()])
    rng = np.random.default_rng(1)
    scale = np.concatenate([
        np.tile([10.0, 5, 10, 5, 1e-2, 1e-3, 1e-4, 1e-4, 1e-4], n_cams),
        np.tile([1e-2] * 6, n_cams), np.tile([1e-2] * 6, n_ims)])
    x_full = full + rng.normal(size=struct.total) * scale
    ps = struct.group_slice(2)
    x_full[ps.start:ps.start + 6] = 0.0

    pieces = split_full_params(jnp.asarray(x_full, dtype=dtype), op_fun,
                               struct, n_cams, n_ims, n_keys, widths)
    pieces = ParamPieces(pieces.cam, pieces.im,
                         jnp.zeros((k_pad, 0), dtype=dtype))
    # host-side colmask: jit-captured constants must stay host numpy
    # (device captures trigger the tunnel's first-d2h bring-up at lowering)
    cm_im = np.ones((n_ims, widths.b), dtype=dtype)
    cm_im[0] = 0.0
    colmask = ParamPieces(np.ones((n_cams, widths.a), dtype=dtype), cm_im,
                          np.ones((k_pad, 0), dtype=dtype))
    neq_raw = make_structured_neq(op_fun, widths, n_cams, n_ims)

    import jax

    import bench

    @jax.jit
    def solve(p, uv_, mask_, tpl_):
        return structured_lm_solve(
            lambda pp: neq_raw(pp, uv_, mask_, tpl_, colmask), p, max_nfev=100)

    t0 = time.perf_counter()
    res = solve(pieces, uv, mask, tpl)
    bench.fetch_scalar(res.cost)
    first = time.perf_counter() - t0
    # differenced fetch-forced timing (block_until_ready does not block
    # through the tunnel — see bench.py::timed_solve)
    warm = bench.timed_solve(solve, bench.perturbed(pieces, 4),
                             (uv, mask, tpl))
    rms = float(np.sqrt(float(np.asarray(res.cost)) / (2 * blocks.n_real)))
    print(f"{name:6s} cams={n_cams:3d} ims={n_ims:4d} "
          f"detections={blocks.n_real:9d} params={struct.total - 6:6d} "
          f"iters={int(res.nit):3d} rms={rms:.4f} "
          f"compile+first={first:6.1f}s solve={warm:7.3f}s "
          f"({blocks.n_real * int(res.nit) / warm / 1e6:7.1f}M det-iters/s)")
    return warm


if __name__ == "__main__":
    names = (sys.argv[sys.argv.index("--configs") + 1].split(",")
             if "--configs" in sys.argv else list(DEFAULT_CONFIGS))
    for nm in names:
        run_config(nm, CONFIGS[nm])
