#!/usr/bin/env python
"""Roofline / MFU accounting for the fused template gram kernel.

Run: python benchmarks/roofline.py  (real TPU; results -> docs/performance.md)

What is counted
---------------
The kernel (optim/pallas_grams.py::_gram_kernel_body) is a VPU workload:
per (block, key) slot it builds 21 closed-form Jacobian columns + residuals
as (8, K) vectors and reduces them into a symmetric (W, W) gram, W = 22 for
the standard model. Per slot:

- gram accumulation: tri(W) = W(W+1)/2 = 253 independent entries, each
  ju_i*ju_j + jv_i*jv_j accumulated over the key axis = 4 flops/slot/entry
  -> 1012 flops
- projection + column construction (_projection_columns): rotation apply,
  Brown distortion + derivative chain, 21 column builds ~= 250 flops
  (hand count, +-20%)

The compute runs over every PADDED grid slot (n_cams * n_ims_grid * k_pad),
so utilisation is reported against slot count, with the real-detection
fraction shown.

The ceiling is the VPU, not the MXU: the inner contraction dims (22-24)
are far below the 128x128 systolic tile, so an MXU mapping would idle
>80% of the array; the elementwise/lane-reduction form is the right
mapping. v5e peaks used (public figures / microarch estimates):
MXU 197 TFLOP/s bf16, VPU ~= 7.5 TFLOP/s f32 (8x128 lanes x 4 ALUs x 2
flops @ ~0.94 GHz), HBM ~= 819 GB/s.

Timing: block_until_ready does not block through the tunnel; evals are
timed as difference quotients with a forced final fetch (see bench.py).
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

VPU_PEAK = 7.5e12     # f32 flop/s, microarch estimate (see module docstring)
MXU_PEAK = 197e12     # bf16 flop/s, public v5e figure
HBM_PEAK = 819e9      # bytes/s, public v5e figure

GRAM_W = 22           # standard model: intr 9 + ext 6 + pose 6 + residual
FLOPS_GRAM = 4 * GRAM_W * (GRAM_W + 1) // 2   # 1012
FLOPS_PROJ = 250      # hand count of _projection_columns, +-20%
FLOPS_PER_SLOT = FLOPS_GRAM + FLOPS_PROJ


def build(n_cams, n_ims):
    import jax
    import jax.numpy as jnp

    from pycamset_tpu.config import default_device_dtype
    from pycamset_tpu.optim.blocks import (Extrinsic3D, Projection,
                                           TemplatePoints)
    from pycamset_tpu.optim.chain import OptimFunction
    from pycamset_tpu.optim.structured import (
        ParamPieces, build_block_arrays, chain_widths, make_structured_neq,
        split_full_params)
    from pycamset_tpu.utils.synthetic import make_synthetic_rig

    dtype = default_device_dtype()
    rig = make_synthetic_rig(n_cams=n_cams, n_ims=n_ims, grid=19,
                             visibility=0.85, noise_px=0.3, seed=0)
    n_keys = rig["n_keys"]
    op_fun = OptimFunction([Projection(), Extrinsic3D(), TemplatePoints()])
    widths = chain_widths(op_fun)
    struct = op_fun.param_struct(n_cams, n_ims, n_keys)
    blocks = build_block_arrays(rig["dd"], n_cams, n_ims, n_keys)
    k_pad = blocks.uv.shape[1]
    uv, mask = blocks.as_device(dtype)
    tpl_pad = np.zeros((k_pad, 3))
    tpl_pad[:n_keys] = rig["template"]
    tpl = jnp.asarray(tpl_pad, dtype=dtype)
    x_full = np.concatenate([rig["intr"].ravel(), rig["extr"].ravel(),
                             rig["poses"].ravel()])
    pieces = split_full_params(jnp.asarray(x_full, dtype=dtype), op_fun,
                               struct, n_cams, n_ims, n_keys, widths)
    pieces = ParamPieces(pieces.cam, pieces.im,
                         jnp.zeros((k_pad, 0), dtype=dtype))
    cm_im = np.ones((n_ims, widths.b), dtype=dtype)
    cm_im[0] = 0.0
    colmask = ParamPieces(np.ones((n_cams, widths.a), dtype=dtype), cm_im,
                          np.ones((k_pad, 0), dtype=dtype))
    neq_raw = make_structured_neq(op_fun, widths, n_cams, n_ims)

    @jax.jit
    def neq(p, uv_, mask_, tpl_):
        return neq_raw(p, uv_, mask_, tpl_, colmask)

    slots = n_cams * n_ims * k_pad
    # HBM traffic per eval (f32): kernel inputs read + outputs written.
    # The unfused kernel writes the full (W, W) gram per block and the
    # block-grid reductions re-read it; the fused kernel (selected when the
    # per-cam image padding is <= 5%, see structured.py) masks + reduces the
    # cam-axis pieces in VMEM and writes only wci/gii/gi/cost per block.
    itemsize = np.dtype(dtype).itemsize
    b = n_cams * n_ims
    a = GRAM_W - 7  # cam columns (15 for the standard model)
    i_pad = -(-n_ims // 16) * 16
    fused = (i_pad - n_ims) <= 0.05 * n_ims
    in_bytes = (b * k_pad * 2      # uv
                + b * k_pad        # mask
                + 3 * k_pad        # template
                + b * 40)          # packed per-block params (approx ppb)
    if fused:
        out_bytes = (b * (a * 6 + 36 + 6 + 1)   # wci + gii + gi + cost
                     + n_cams * (a * a + a))    # hcc + gc accumulators
    else:
        out_bytes = 2 * b * GRAM_W * GRAM_W  # grams written + re-read
    bytes_eval = itemsize * (in_bytes + out_bytes)
    return neq, pieces, (uv, mask, tpl), blocks, slots, bytes_eval


def timed(fn, pieces_list, args, k_lo=2, k_hi=22):
    def run_k(k):
        t0 = time.perf_counter()
        r = None
        for i in range(k):
            r = fn(pieces_list[i % len(pieces_list)], *args)
        float(np.asarray(r.cost))
        return time.perf_counter() - t0
    t_lo = run_k(k_lo)
    t_hi = run_k(k_hi)
    per = (t_hi - t_lo) / (k_hi - k_lo)
    return per if per > 0 else t_hi / k_hi


def main():
    import jax
    import jax.numpy as jnp
    print(f"backend={jax.default_backend()}", file=sys.stderr)

    print(f"{'rig':>10} {'slots':>10} {'real%':>6} {'eval_ms':>8} "
          f"{'GFLOP/s':>9} {'%VPU':>6} {'GB/s':>7} {'%HBM':>6}")
    for n_cams, n_ims in [(16, 100), (32, 200), (64, 400)]:
        neq, pieces, args, blocks, slots, bytes_eval = build(n_cams, n_ims)
        r = neq(pieces, *args)
        float(np.asarray(r.cost))  # compile + d2h bring-up
        plist = []
        for i in range(4):
            cam = np.asarray(pieces.cam) + (i + 1) * 1e-10
            plist.append(pieces._replace(cam=jnp.asarray(cam,
                                                         pieces.cam.dtype)))
        per = timed(neq, plist, args)
        flops = slots * FLOPS_PER_SLOT
        gfs = flops / per / 1e9
        gbs = bytes_eval / per / 1e9
        print(f"{n_cams}x{n_ims:>6} {slots:>10} "
              f"{100 * blocks.n_real / slots:>5.1f} {per * 1e3:>8.3f} "
              f"{gfs:>9.1f} {100 * gfs * 1e9 / VPU_PEAK:>5.1f} "
              f"{gbs:>7.1f} {100 * gbs * 1e9 / HBM_PEAK:>5.1f}")


if __name__ == "__main__":
    main()
