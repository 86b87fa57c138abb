#!/usr/bin/env python
"""Dense reconstruction throughput on the chip: SGM + plane sweep.

Measures the two on-device reconstruction kernels at production sizes
with the fetch-forced differenced method (bench.py::timed_solve's
pattern — enqueue K runs on perturbed inputs, ONE forced fetch):

- census/SGM disparity at 480x640, max_disp 128 (the (H, W, D) volume
  rides the 128-wide lane axis; 8 scan directions);
- plane-sweep depth at 480x640, 4 source views, 128 planes (ZNCC
  window 7, top-k 3), with and without SGM volume regularisation.

Usage: python benchmarks/recon_bench.py [H W]   (default 480 640)
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import fetch_scalar, log  # noqa: E402


def _timed(fn, inputs, k_lo=2, k_hi=8):
    """Differenced enqueue timing over perturbed inputs, one fetch."""
    def run_k(k):
        t0 = time.perf_counter()
        out = None
        for i in range(k):
            out = fn(*inputs[i % len(inputs)])
        fetch_scalar(out.ravel()[7])
        return time.perf_counter() - t0

    t_lo = run_k(k_lo)
    t_hi = run_k(k_hi)
    per = (t_hi - t_lo) / (k_hi - k_lo)
    return per if per > 0 else t_hi / k_hi


def main():
    import jax
    import jax.numpy as jnp

    from pycamset_tpu.models.camera import Camera
    from pycamset_tpu.reconstruction import plane_sweep as ps
    from pycamset_tpu.reconstruction.dense_stereo import make_sgm_matcher

    h = int(sys.argv[1]) if len(sys.argv) > 1 else 480
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 640
    log(f"backend={jax.default_backend()} size={h}x{w}")
    rng = np.random.default_rng(0)

    # ---- SGM ----
    max_disp = 128
    base = rng.uniform(0, 255, (h, w + 32)).astype(np.float32)
    pairs = []
    for i in range(4):
        noisy = base + rng.normal(0, 0.5, base.shape).astype(np.float32)
        pairs.append((jnp.asarray(noisy[:, 16:16 + w]),
                      jnp.asarray(noisy[:, 9:9 + w])))
    match = make_sgm_matcher(max_disp=max_disp)
    t0 = time.perf_counter()
    fetch_scalar(match(*pairs[0]).ravel()[7])
    log(f"sgm first call {time.perf_counter() - t0:.1f}s "
        f"(compile + possible tunnel bring-up)")
    per = _timed(match, pairs)
    rate = h * w * max_disp / per
    log(f"sgm {h}x{w} d{max_disp}: {per * 1e3:.1f} ms "
        f"({rate / 1e9:.2f}G disp-hyp/s, {h * w / per / 1e6:.1f} Mpx/s)")

    # ---- plane sweep ----
    n_src, n_planes = 4, 128
    k = np.array([[500.0, 0, w / 2], [0, 500.0, h / 2], [0, 0, 1]])

    def cam(tx, ty):
        ext = np.eye(4)
        ext[:3, 3] = [-tx, -ty, 0]
        return Camera(extrinsic=ext, intrinsic=k, res=(w, h))

    ref = cam(0, 0)
    srcs = [cam(0.3, 0), cam(-0.3, 0), cam(0, 0.3), cam(0, -0.3)]
    depths = ps.inverse_depth_planes(2.0, 12.0, n_planes)
    homs = jnp.asarray(ps.planesweep_homographies(ref, srcs, depths),
                       jnp.float32)
    d_dev = jnp.asarray(depths, jnp.float32)
    ims = []
    for i in range(4):
        stack = rng.uniform(0, 255, (1 + n_src, h, w)).astype(np.float32)
        ims.append((jnp.asarray(stack[0]), jnp.asarray(stack[1:])))

    for reg in (False, True):
        def sweep(ref_im, src_ims):
            return ps._sweep(ref_im, src_ims, homs, d_dev, window=7,
                             top_k=3, regularize=reg, p1=0.02, p2=0.2,
                             min_sources=1, max_cost=0.8)[0]

        t0 = time.perf_counter()
        fetch_scalar(sweep(*ims[0]).ravel()[7])
        log(f"sweep reg={reg} first call {time.perf_counter() - t0:.1f}s")
        per = _timed(sweep, ims)
        hyp = h * w * n_planes * n_src
        log(f"sweep {h}x{w} z{n_planes} s{n_src} reg={reg}: "
            f"{per * 1e3:.1f} ms ({hyp / per / 1e9:.2f}G px-plane-src/s)")


if __name__ == "__main__":
    main()
