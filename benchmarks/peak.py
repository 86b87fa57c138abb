#!/usr/bin/env python
"""Measured machine peaks for the roofline (real chip).

The roofline in docs/performance.md previously divided by a MICROARCH
GUESS of the VPU f32 peak (8x128 lanes x 4 ALUs x 2 flops x ~0.94 GHz =
7.5 TFLOP/s). This measures what is actually achievable:

- VPU f32 FMA peak: a Pallas kernel holding two (BLK, 128) f32 tiles in
  registers/VMEM and issuing a long unrolled chain of dependent-pair FMAs
  (two interleaved accumulators so consecutive FMAs don't serialize on
  one register); flops = grid * BLK * 128 * iters * 2 ops * 2 flop.
- MXU matmul peak at f32-highest (the precision the solvers run at),
  f32-default, and bf16, via a 4096^3 jnp.dot.

Timing: the launch runs ~10 ms of work, so plain repeat-and-difference
timing with one forced fetch is safe even through the tunnel.

Usage: python benchmarks/peak.py
"""
from __future__ import annotations

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")
from bench import fetch_scalar, log  # noqa: E402

BLK = 512
LANES = 128
ITERS = 1024
GRID = 64


def vpu_peak():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def kernel(a_ref, o_ref):
        x = a_ref[...]
        # four independent FMA chains: enough ILP to cover the FMA
        # latency; coefficients hold values near the fixed point so
        # nothing overflows or denormalizes
        c = [x * 0.5 + 0.1 * i for i in range(4)]

        def body(_, carry):
            out = []
            for j, v in enumerate(carry):
                # 4 dependent FMAs per chain per iteration (unrolled)
                v = v * 0.999999 + 0.0001
                v = v * 1.000001 - 0.0001
                v = v * 0.999998 + 0.0001
                v = v * 1.000002 - 0.0001
                out.append(v)
            return tuple(out)

        c = jax.lax.fori_loop(0, ITERS, body, tuple(c))
        o_ref[...] = c[0] + c[1] + c[2] + c[3]

    @jax.jit
    def run(a):
        out = pl.pallas_call(
            kernel,
            grid=(GRID,),
            in_specs=[pl.BlockSpec((BLK, LANES), lambda i: (i, i * 0))],
            out_specs=pl.BlockSpec((BLK, LANES), lambda i: (i, i * 0)),
            out_shape=jax.ShapeDtypeStruct((GRID * BLK, LANES),
                                           jnp.float32),
        )(a)
        return jnp.sum(out)  # fetch a SCALAR (a 16 MB fetch through the
        # tunnel would swamp the differenced timing)

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(0.5, 1.0, (GRID * BLK, LANES)),
                    jnp.float32)
    fetch_scalar(run(a))  # compile + bring-up
    flops = GRID * BLK * LANES * ITERS * 16 * 2

    def run_k(k):
        t0 = time.perf_counter()
        r = None
        for i in range(k):
            r = run(a + np.float32(i) * np.float32(1e-7))
        fetch_scalar(r)
        return time.perf_counter() - t0

    qs = []
    for _ in range(5):
        t_lo, t_hi = run_k(1), run_k(4)
        qs.append((t_hi - t_lo) / 3)
    per = float(np.median(qs))
    tf = flops / per / 1e12
    log(f"VPU f32 FMA peak: {tf:.2f} TFLOP/s "
        f"({per * 1e3:.2f} ms per {flops / 1e9:.1f} GFLOP launch)")
    return tf


def mxu_peak(n=4096):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    for dtype, prec in ((jnp.float32, "highest"),
                        (jnp.float32, "default"),
                        (jnp.bfloat16, "default")):
        a = jnp.asarray(rng.normal(size=(n, n)), dtype)
        # scale so the stationary chain neither grows nor shrinks:
        # ||x @ b|| ~ sqrt(n) ||b_elem|| ||x||
        b = jnp.asarray(rng.normal(size=(n, n)) / np.sqrt(n), dtype)

        @partial(jax.jit, static_argnames=())
        def run(a_, b_, _prec=prec):
            # chain 8 dependent matmuls so one call is ~8 * 137 GFLOP
            x = a_
            for _ in range(8):
                x = jnp.dot(x, b_, precision=_prec,
                            preferred_element_type=dtype)
            return jnp.sum(x)

        fetch_scalar(run(a, b))
        flops = 8 * 2 * n ** 3

        def run_k(k):
            t0 = time.perf_counter()
            r = None
            for i in range(k):
                r = run(a + dtype(i) * dtype(1e-6), b)
            fetch_scalar(r)
            return time.perf_counter() - t0

        qs = []
        for _ in range(5):
            t_lo, t_hi = run_k(1), run_k(4)
            qs.append((t_hi - t_lo) / 3)
        per = float(np.median(qs))
        log(f"MXU {np.dtype(dtype).name}/{prec}: "
            f"{flops / per / 1e12:.1f} TFLOP/s")


if __name__ == "__main__":
    vpu_peak()
    mxu_peak()
