"""Pallas TPU kernel: dense SPD factorisation + solve in ONE launch.

Why this exists: XLA's TPU Cholesky / TriangularSolve / LU expand to
blocked algorithms whose unblocked inner loops run ~n sequential HLO
steps, and on v5e every dense factorisation or solve at n in [240, 960]
measures a flat 2.2-3.8 ms regardless of n or method (Cholesky, LU, QR,
inv, even 60 fori_loop CG iterations) — pure sequential-dispatch latency,
orders of magnitude above the flop time. The reduced (Schur) camera
system solve is therefore the largest non-kernel piece of every LM
iteration (the reference hands the same job to scipy's TRF machinery on
host: /root/reference/pyCamSet/optimisation/optimisation_handling.py:88).

This kernel keeps the whole (normalised) matrix resident in VMEM and
retires the entire solve in one launch:

- blocked right-looking Cholesky over statically-unrolled 128-wide
  panels (static slices only — no dynamic ref indexing);
- each panel's diagonal block factors with a 128-step masked rank-1
  fori_loop (one-hot column extraction, no scatters);
- each panel's triangular INVERSE comes from the nilpotent
  Newton-Schulz iteration: R0 = I - L X0 (X0 the diagonal inverse) is
  strictly lower triangular, hence nilpotent of index <= 128, and
  X_{k+1} = X_k (2I - L X_k) squares the residual, so SEVEN MXU matmul
  iterations terminate EXACTLY — no sequential substitution anywhere;
- forward/backward block substitution plus `refine` in-kernel iterative
  refinement passes (the f32 path needs them) reuse the factor and the
  VMEM-resident matrix;
- the kernel reports the final residual norm so the caller can fall
  back to the XLA path on the rare numerically-hostile system instead
  of silently returning a bad step.

The caller must pass the Jacobi-NORMALISED (unit-diagonal, ridged)
system — optim/structured.py::_psd_solve does — which bounds the pivot
range and keeps the Newton-Schulz intermediates finite in float32.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 128
MAX_N = 1024          # VMEM budget: a + L copies at 1024^2 f32 = 8.4 MB
_PIV_FLOOR = 1e-8     # rank-1 loop pivot clamp (normalised diag is ~1)
_NS_ITERS = 7         # ceil(log2(BLK)): exact for nilpotency index <= 128


def _mm(x, y):
    return jnp.dot(x, y, precision=jax.lax.Precision.HIGHEST,
                   preferred_element_type=jnp.float32)


def _make_psd_kernel(p: int, refine: int):
    """Kernel over p statically-unrolled 128-panels: factor + solve +
    refine; outputs the solution and the final residual/rhs norms."""
    f32 = jnp.float32

    def sl(j):
        return slice(j * BLK, (j + 1) * BLK)

    n_pad = p * BLK

    def kernel(a_ref, b_ref, x_ref, res_ref, l_ref, m_ref, y_ref):
        rows = jax.lax.broadcasted_iota(jnp.int32, (BLK, 1), 0)
        eye = (rows == rows.T).astype(f32)
        l_ref[...] = a_ref[...]

        for j in range(p):
            # ---- diagonal block: masked rank-1 Cholesky loop ----------
            # (VPU broadcasts only — MXU ops in the sequential loop cost
            # 6-pass latency each and dominated an earlier version)
            def step(i, carry):
                d, lb = carry
                e = (rows == i).astype(f32)                    # (BLK, 1)
                col = jnp.sum(d * e.T, axis=1, keepdims=True)  # column i
                piv = jnp.maximum(jnp.sum(col * e), _PIV_FLOOR)
                lcol = jnp.where(rows >= i, col * jax.lax.rsqrt(piv), 0.0)
                return d - lcol * lcol.T, lb + lcol * e.T

            # i32 array bounds: under x64, python-int bounds make the loop
            # index i64 and Mosaic's convert_element_type lowering recurses
            # to a RecursionError
            d0 = l_ref[sl(j), sl(j)]
            _, ljj = jax.lax.fori_loop(
                jnp.asarray(0, jnp.int32), jnp.asarray(BLK, jnp.int32),
                step, (d0, jnp.zeros((BLK, BLK), f32)))
            l_ref[sl(j), sl(j)] = ljj

            # ---- Mjj = Ljj^-1: nilpotent Newton-Schulz (exact) --------
            dinv = 1.0 / jnp.sum(ljj * eye, axis=1, keepdims=True)
            x = eye * dinv
            for _ in range(_NS_ITERS):
                x = _mm(x, 2.0 * eye - _mm(ljj, x))
            m_ref[j] = x

            # ---- panel below + trailing update: ONE matmul each -------
            lo = (j + 1) * BLK
            if lo < n_pad:
                below = _mm(l_ref[lo:n_pad, sl(j)], x.T)
                l_ref[lo:n_pad, sl(j)] = below
                l_ref[lo:n_pad, lo:n_pad] = (
                    l_ref[lo:n_pad, lo:n_pad] - _mm(below, below.T))

        # ---- block substitution through the panel inverses ------------
        # (y_ref holds L^-1 rhs forward, then the back-substituted x;
        # growing static slices keep each stage a single dot)
        def solve_into(rhs_blocks):
            for j in range(p):
                acc = rhs_blocks[j]
                if j:
                    acc = acc - _mm(l_ref[sl(j), 0:j * BLK],
                                    y_ref[0:j * BLK, :])
                y_ref[sl(j), :] = _mm(m_ref[j], acc)
            for j in reversed(range(p)):
                lo = (j + 1) * BLK
                acc = y_ref[sl(j), :]
                if lo < n_pad:
                    acc = acc - _mm(l_ref[lo:n_pad, sl(j)].T,
                                    y_ref[lo:n_pad, :])
                y_ref[sl(j), :] = _mm(m_ref[j].T, acc)

        bs = [b_ref[sl(j), :] for j in range(p)]
        solve_into(bs)
        x_ref[...] = y_ref[...]
        for _ in range(refine):
            r = b_ref[...] - _mm(a_ref[...], x_ref[...])
            solve_into([r[sl(j), :] for j in range(p)])
            x_ref[...] = x_ref[...] + y_ref[...]

        r = b_ref[...] - _mm(a_ref[...], x_ref[...])
        res2 = jnp.sum(r * r)
        b2 = jnp.sum(b_ref[...] * b_ref[...])
        res_ref[...] = jnp.stack([res2, b2]).reshape(1, 2)

    return kernel


@functools.partial(jax.jit, static_argnames=("refine", "interpret"))
def _pallas_psd_solve_raw(a_n: jnp.ndarray, rhs_n: jnp.ndarray,
                          refine: int = 2, interpret: bool = False):
    """Run the kernel on the normalised system; returns (x, res2, b2)."""
    n = a_n.shape[0]
    p = -(-n // BLK)
    n_pad = p * BLK
    a32 = a_n.astype(jnp.float32)
    b32 = rhs_n.astype(jnp.float32).reshape(n, 1)
    if n_pad != n:
        a32 = jnp.pad(a32, ((0, n_pad - n), (0, n_pad - n)))
        # identity on the padded diagonal WITHOUT a scatter (scatters
        # serialise on TPU and this runs inside every LM iteration)
        rr = jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), 0)
        cc = jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), 1)
        a32 = a32 + ((rr == cc) & (rr >= n)).astype(jnp.float32)
        b32 = jnp.pad(b32, ((0, n_pad - n), (0, 0)))

    x, res = pl.pallas_call(
        _make_psd_kernel(p, refine),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
                   jax.ShapeDtypeStruct((1, 2), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((n_pad, n_pad), jnp.float32),
                        pltpu.VMEM((p, BLK, BLK), jnp.float32),
                        pltpu.VMEM((n_pad, 1), jnp.float32)],
        interpret=interpret,
    )(a32, b32)
    return x[:n, 0].astype(a_n.dtype), res[0, 0], res[0, 1]


def pallas_psd_solve(a_n: jnp.ndarray, rhs_n: jnp.ndarray, *,
                     refine: int = 2, interpret: bool = False,
                     fallback=None) -> jnp.ndarray:
    """Solve the Jacobi-normalised SPD system a_n x = rhs_n in one kernel.

    :param fallback: optional jittable (a_n, rhs_n) -> x used (via
        lax.cond, so it only executes when taken) when the kernel's final
        relative residual exceeds 1e-4 — numerically-hostile systems
        where the f32 factor + refinement did not converge.
    """
    x, res2, b2 = _pallas_psd_solve_raw(a_n, rhs_n, refine=refine,
                                        interpret=interpret)
    if fallback is None:
        return x
    ok = res2 <= jnp.asarray(1e-8, res2.dtype) * b2  # ||r|| <= 1e-4 ||b||
    return jax.lax.cond(ok, lambda _: x,
                        lambda args: fallback(*args).astype(x.dtype),
                        (a_n, rhs_n))


def use_pallas_psd(n: int, dtype) -> bool:
    """Dispatch rule: OPT-IN via PYCAMSET_PALLAS_CHOL=1 (TPU, f32,
    n <= MAX_N required).

    Measured A/B on the round-4 bench (real v5e): default-on was a NET
    LOSS — 16x100 3.1 -> 4.3 ms, mixed 15.2 -> 17.3 ms, 64x400 44.3 ->
    47.4 ms. Although XLA's Cholesky costs ~3 ms per STANDALONE dispatch,
    inside a compiled LM loop the TPU runtime pipelines its While-step
    latency to an effective 0.15-0.3 ms at n in [852, 960] — cheaper than
    this kernel's 0.4-0.6 ms strictly-sequential latency plus its
    residual-check machinery. Kept opt-in: it is the faster choice for a
    standalone (single-dispatch) dense solve, and docs/performance.md
    records the full measurement story."""
    force = os.environ.get("PYCAMSET_PALLAS_CHOL")
    ok = (jax.default_backend() == "tpu"
          and not os.environ.get("PYCAMSET_NO_PALLAS")
          and jnp.dtype(dtype) == jnp.float32
          and n <= MAX_N)
    return ok and force == "1"
