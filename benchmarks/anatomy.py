#!/usr/bin/env python
"""Per-iteration anatomy, measured the honest way (real chip).

The round-2 anatomy table timed each piece as a STANDALONE dispatch,
which measures the dispatch pipeline, not device time (docs/performance.md,
"a measurement trap"). This script derives the pieces from differences of
whole compiled programs, each timed with the fetch-forced differenced
method of bench.py:

- per-ITERATION cost: the full LM solve at max_nfev = lo and hi, both
  BELOW the problem's convergence count (the tolerance exits clamp at
  50*eps and would otherwise fire); the difference quotient isolates one
  full LM iteration (neq eval + model reduction + Schur/dense solve +
  damping bookkeeping), free of compile/dispatch/fetch contamination.
- per-EVAL cost: a lax.scan chaining the neq data-dependently (the next
  pieces are perturbed by the previous cost, so nothing hoists) at lo and
  hi scan steps.
- (iteration - eval) = block reductions outside the kernel + Schur
  elimination + reduced dense solve + LM arithmetic, in context.

The 16x100 point sits at the tunnel's dispatch floor and is noisy
run-to-run (see docs/performance.md roofline notes); 64x400 is the
stable compute-bound anatomy.

Usage: python benchmarks/anatomy.py [ns] [big]   (default: both)
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")
from bench import fetch_scalar, log, perturbed, template_colmask  # noqa: E402


def timed(run, pieces_list, k_lo=2, k_hi=8):
    def run_k(k):
        t0 = time.perf_counter()
        r = None
        for i in range(k):
            r = run(pieces_list[i % len(pieces_list)])
        fetch_scalar(r)
        return time.perf_counter() - t0

    t_lo = run_k(k_lo)
    t_hi = run_k(k_hi)
    per = (t_hi - t_lo) / (k_hi - k_lo)
    return per if per > 0 else t_hi / k_hi


def run_ns(n_cams, n_ims, label, lo_it=2, hi_it=5, ev_lo=2, ev_hi=12):
    # max_nfev=n runs max(1, n-1) LM iterations (nfev starts at 1 and the
    # status-4 check fires when nfev >= max_nfev); the bench problems
    # converge (ftol clamp) at iteration ~5-6, so hi_it must stay BELOW
    # that or the difference quotient under-counts. lo=2 -> 1 iteration,
    # hi=5 -> 4 iterations, divisor hi-lo = 3 real iterations.
    import jax

    import bench as b
    from pycamset_tpu.config import default_device_dtype
    from pycamset_tpu.optim.blocks import (Extrinsic3D, Projection,
                                           TemplatePoints)
    from pycamset_tpu.optim.chain import OptimFunction
    from pycamset_tpu.optim.structured import (chain_widths,
                                               make_structured_neq)
    from pycamset_tpu.optim.structured_lm import structured_lm_solve

    _solve, pieces, args, blocks, _struct = b.standard_problem(n_cams, n_ims)
    dtype = default_device_dtype()
    op_fun = OptimFunction([Projection(), Extrinsic3D(), TemplatePoints()])
    widths = chain_widths(op_fun)
    k_pad = blocks.uv.shape[1]
    colmask = template_colmask(n_cams, n_ims, widths, k_pad, dtype)
    neq_raw = make_structured_neq(op_fun, widths, n_cams, n_ims)

    def make_forced(n):
        @jax.jit
        def run(p, uv_, mask_, tpl_):
            res = structured_lm_solve(
                lambda pp: neq_raw(pp, uv_, mask_, tpl_, colmask), p,
                max_nfev=n)
            return res.cost
        return run

    def make_evals(n):
        @jax.jit
        def run(p, uv_, mask_, tpl_):
            def step(pp, _):
                neq = neq_raw(pp, uv_, mask_, tpl_, colmask)
                # data-dependent perturbation: nothing hoists or reorders
                return pp._replace(cam=pp.cam + 1e-14 * neq.cost), neq.cost
            _, costs = jax.lax.scan(step, p, None, length=n)
            return costs[-1]
        return run

    pieces_list = perturbed(pieces, 4)
    f_lo, f_hi = make_forced(lo_it), make_forced(hi_it)
    e_lo, e_hi = make_evals(ev_lo), make_evals(ev_hi)
    for f in (f_lo, f_hi, e_lo, e_hi):  # compile + first-fetch bring-up
        fetch_scalar(f(pieces, *args))

    t_iter = (timed(lambda p: f_hi(p, *args), pieces_list)
              - timed(lambda p: f_lo(p, *args), pieces_list)) / (hi_it - lo_it)
    t_eval = (timed(lambda p: e_hi(p, *args), pieces_list)
              - timed(lambda p: e_lo(p, *args), pieces_list)) / (ev_hi - ev_lo)
    log(f"{label}: dets={blocks.n_real}")
    log(f"  per LM iteration (neq + schur + solve + bookkeeping): "
        f"{t_iter * 1e3:.2f} ms")
    log(f"  per neq eval (fused kernel + in-kernel reductions):   "
        f"{t_eval * 1e3:.2f} ms")
    log(f"  non-eval share (schur + dense solve + LM arithmetic): "
        f"{(t_iter - t_eval) * 1e3:.2f} ms")
    return t_iter, t_eval


def run_mixed(label="mixed16x100x2t", lo_it=2, hi_it=5, ev_lo=2, ev_hi=12):
    """Same decomposition for the mixed 2-target self-cal chain."""
    import jax

    import bench as b
    from pycamset_tpu.config import default_device_dtype
    from pycamset_tpu.optim.blocks import (Extrinsic3D, FreePoint,
                                           GroupRigidTform3d, Projection,
                                           RigidTform3d)
    from pycamset_tpu.optim.chain import OptimFunction
    from pycamset_tpu.optim.structured_lm import structured_lm_solve
    from pycamset_tpu.optim.structured_mixed import (
        make_mixed_ops, make_mixed_structured_neq, mixed_chain_widths)

    _s, pieces, args, blocks = b.mixed_problem()
    n_cams, n_ims = 16, 100
    dtype = default_device_dtype()
    op_fun = OptimFunction([Projection(), Extrinsic3D(), RigidTform3d(),
                            GroupRigidTform3d(), FreePoint()])
    widths = mixed_chain_widths(op_fun)
    k_pad = blocks.uv.shape[1]
    n_keys = 361  # bench mixed problem: 19x19 grid
    colmask, gok = b.mixed_colmask_groups(n_cams, n_ims, n_keys, k_pad,
                                          dtype)
    neq = make_mixed_structured_neq(op_fun, widths, n_cams, n_ims, gok, 2)
    ops = make_mixed_ops(neq.onehot)

    def make_forced(n):
        @jax.jit
        def run(p, uv_, mask_, tpl_):
            res = structured_lm_solve(
                lambda q: neq(q, uv_, mask_, tpl_, colmask), p,
                max_nfev=n, ops=ops)
            return res.cost
        return run

    def make_evals(n):
        @jax.jit
        def run(p, uv_, mask_, tpl_):
            def step(q, _):
                nn = neq(q, uv_, mask_, tpl_, colmask)
                return q._replace(cam=q.cam + 1e-14 * nn.cost), nn.cost
            _, costs = jax.lax.scan(step, p, None, length=n)
            return costs[-1]
        return run

    pieces_list = perturbed(pieces, 4)
    f_lo, f_hi = make_forced(lo_it), make_forced(hi_it)
    e_lo, e_hi = make_evals(ev_lo), make_evals(ev_hi)
    for f in (f_lo, f_hi, e_lo, e_hi):
        fetch_scalar(f(pieces, *args))
    t_iter = (timed(lambda p: f_hi(p, *args), pieces_list)
              - timed(lambda p: f_lo(p, *args), pieces_list)) / (hi_it - lo_it)
    t_eval = (timed(lambda p: e_hi(p, *args), pieces_list)
              - timed(lambda p: e_lo(p, *args), pieces_list)) / (ev_hi - ev_lo)
    log(f"{label}: dets={blocks.n_real}")
    log(f"  per LM iteration: {t_iter * 1e3:.2f} ms")
    log(f"  per neq eval:     {t_eval * 1e3:.2f} ms")
    log(f"  non-eval share:   {(t_iter - t_eval) * 1e3:.2f} ms")
    return t_iter, t_eval


def main():
    which = sys.argv[1:] or ["ns", "big"]
    if "ns" in which:
        run_ns(16, 100, "ns16x100")
    if "big" in which:
        run_ns(64, 400, "big64x400")
    if "mixed" in which:
        run_mixed()


if __name__ == "__main__":
    main()
