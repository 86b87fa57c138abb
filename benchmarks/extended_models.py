#!/usr/bin/env python
"""Extended-camera-model solve times at north-star scale (16 cams x 100 ims).

Sweeps the four camera models (standard/rational/thin_prism/tilted) over the
template and self-cal chains on the current default backend (the real TPU
chip under axon). Results land in docs/performance.md (run manually; not
part of bench.py).

Run: python benchmarks/extended_models.py [--models standard,tilted]
                                          [--chains template,selfcal]
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

MODELS = ["standard", "rational", "thin_prism", "tilted", "fisheye"]
CHAINS = ["template", "selfcal"]


def run(model: str, chain: str, n_cams=16, n_ims=100, grid=19):
    import jax
    import jax.numpy as jnp

    from pycamset_tpu.config import default_device_dtype
    from pycamset_tpu.optim.blocks import (
        Extrinsic3D, FreePoint, Projection, ProjectionFisheye,
        ProjectionRational, ProjectionThinPrism, ProjectionTilted,
        RigidTform3d, TemplatePoints)
    from pycamset_tpu.optim.chain import OptimFunction
    from pycamset_tpu.optim.structured import (
        ParamPieces, build_block_arrays, chain_widths, make_structured_neq,
        split_full_params)
    from pycamset_tpu.optim.structured_lm import structured_lm_solve
    from pycamset_tpu.utils.synthetic import make_synthetic_rig

    proj = {"standard": Projection, "rational": ProjectionRational,
            "thin_prism": ProjectionThinPrism, "tilted": ProjectionTilted,
            "fisheye": ProjectionFisheye}[model]
    dtype = default_device_dtype()
    rig = make_synthetic_rig(n_cams=n_cams, n_ims=n_ims, grid=grid,
                             visibility=0.85, noise_px=0.3, seed=0,
                             camera_model=model)
    n_keys = rig["n_keys"]
    intr_w = rig["intr"].shape[1]

    blocks_list = [proj(), Extrinsic3D()]
    if chain == "selfcal":
        blocks_list += [RigidTform3d(), FreePoint()]
    else:
        blocks_list += [TemplatePoints()]
    op_fun = OptimFunction(blocks_list)
    widths = chain_widths(op_fun)
    struct = op_fun.param_struct(n_cams, n_ims, n_keys)
    blocks = build_block_arrays(rig["dd"], n_cams, n_ims, n_keys)
    k_pad = blocks.uv.shape[1]
    uv, mask = blocks.as_device(dtype)
    tpl_pad = np.zeros((k_pad, 3))
    tpl_pad[:n_keys] = rig["template"]
    tpl_pad[n_keys:] = rig["template"][0]  # pad rows replicate a real point
    tpl = jnp.asarray(tpl_pad, dtype=dtype)

    parts = [rig["intr"].ravel(), rig["extr"].ravel(), rig["poses"].ravel()]
    if chain == "selfcal":
        parts.append(rig["template"].ravel())
    full = np.concatenate(parts)

    rng = np.random.default_rng(1)
    scale = np.concatenate(
        [np.tile([10.0, 5, 10, 5] + [0.0] * (intr_w - 4), n_cams),
         np.tile([1e-2] * 6, n_cams), np.tile([1e-2] * 6, n_ims)]
        + ([np.zeros(3 * n_keys)] if chain == "selfcal" else []))
    x_full = full + rng.normal(size=struct.total) * scale
    pose_sl = struct.group_slice(2)
    x_full[pose_sl.start:pose_sl.start + 6] = 0.0

    pieces = split_full_params(jnp.asarray(x_full, dtype=dtype), op_fun,
                               struct, n_cams, n_ims, n_keys, widths)
    if chain == "selfcal":
        keyp = jnp.tile(pieces.key[:1], (k_pad, 1)).at[:n_keys].set(pieces.key)
        kmask = np.ones((k_pad, 3), dtype=dtype)
        kmask[n_keys:] = 0.0
        # gauge: freeze 7 structure coords; the 7th is z of a second-row
        # point (first-row points are collinear and the planar target's
        # residual axis rotation moves points purely in z)
        kmask[0] = 0.0
        kmask[1] = 0.0
        kmask[int(round(n_keys ** 0.5)), 2] = 0.0
        pieces = ParamPieces(pieces.cam, pieces.im, keyp)
    else:
        keyp = jnp.zeros((k_pad, 0), dtype)
        kmask = np.ones((k_pad, 0), dtype=dtype)
        pieces = ParamPieces(pieces.cam, pieces.im, keyp)
    # host-side colmask: jit-captured constants must stay host numpy
    # (device captures trigger the tunnel's first-d2h bring-up at lowering)
    cm_im = np.ones((n_ims, widths.b), dtype=dtype)
    cm_im[0] = 0.0
    colmask = ParamPieces(np.ones((n_cams, widths.a), dtype=dtype), cm_im,
                          kmask)

    neq_raw = make_structured_neq(op_fun, widths, n_cams, n_ims)

    @jax.jit
    def solve(p, uv_, mask_, tpl_):
        return structured_lm_solve(
            lambda pp: neq_raw(pp, uv_, mask_, tpl_, colmask), p,
            max_nfev=100)

    import bench

    t0 = time.perf_counter()
    res = solve(pieces, uv, mask, tpl)
    bench.fetch_scalar(res.cost)
    first = time.perf_counter() - t0
    # differenced fetch-forced timing (block_until_ready does not block
    # through the tunnel — see bench.py::timed_solve)
    warm = bench.timed_solve(solve, bench.perturbed(pieces, 4),
                             (uv, mask, tpl))
    rms = float(np.sqrt(float(np.asarray(res.cost)) / (2 * blocks.n_real)))
    print(f"{model:10s} {chain:8s} a={widths.a:2d} iters={int(res.nit):3d} "
          f"rms={rms:.4f} first={first:6.1f}s solve={warm:7.3f}s",
          flush=True)
    return warm


if __name__ == "__main__":
    models = (sys.argv[sys.argv.index("--models") + 1].split(",")
              if "--models" in sys.argv else MODELS)
    chains = (sys.argv[sys.argv.index("--chains") + 1].split(",")
              if "--chains" in sys.argv else CHAINS)
    for m in models:
        for ch in chains:
            run(m, ch)
