"""Levenberg–Marquardt over the structured (Schur) normal equations.

Same algorithm as optim/lm.py (running-max Jacobi scaling, Nielsen damping,
scipy-style termination) but the linear algebra runs on the block-structured
system from optim/structured.py: no dense (P,P) matrix is ever formed for the
eliminated groups, and there are no scatters anywhere in the iteration.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from pycamset_tpu.optim.structured import (
    NormalEq, ParamPieces, neq_diag, neq_matvec, schur_solve)


class SLMState(NamedTuple):
    x: ParamPieces
    neq: NormalEq
    scale2: ParamPieces
    lam: jnp.ndarray
    nu: jnp.ndarray
    nfev: jnp.ndarray
    it: jnp.ndarray
    status: jnp.ndarray
    history: jnp.ndarray


class SLMResult(NamedTuple):
    x: ParamPieces
    cost: jnp.ndarray
    nfev: jnp.ndarray
    nit: jnp.ndarray
    status: jnp.ndarray
    history: jnp.ndarray


def _pdot(p1, p2) -> jnp.ndarray:
    return sum(jnp.sum(a * b) for a, b in
               zip(jax.tree_util.tree_leaves(p1),
                   jax.tree_util.tree_leaves(p2)))


def _pnorm(p) -> jnp.ndarray:
    return jnp.sqrt(_pdot(p, p))


def _padd(p1, p2):
    return jax.tree_util.tree_map(lambda a, b: a + b, p1, p2)


def _pwhere(ok, p1, p2):
    return jax.tree_util.tree_map(lambda a, b: jnp.where(ok, a, b), p1, p2)


def _nwhere(ok, n1, n2):
    return jax.tree_util.tree_map(lambda a, b: jnp.where(ok, a, b), n1, n2)


def _resolve_ops(ops):
    if ops is None:
        diag_fn, matvec_fn, grad_fn = neq_diag, neq_matvec, None
        solve_fn = schur_solve
    else:
        diag_fn, matvec_fn, solve_fn, grad_fn = ops
    if grad_fn is None:
        def grad_fn(neq):
            return ParamPieces(neq.gc, neq.gi, neq.gk)
    return diag_fn, matvec_fn, solve_fn, grad_fn


def slm_init(neq_fn: Callable[[ParamPieces], NormalEq], x0: ParamPieces,
             *, max_nfev: int = 100, lam0: float = 1e-4,
             scale_floor: float = 1e-8, ops=None) -> SLMState:
    """The LM state at x0 (first eval counted); run it with slm_run.

    Splitting init/run from structured_lm_solve enables STAGED solving:
    run a batch of problems a few iterations, compact the unconverged
    ones, continue — the fleet's convergence-cohort cascade."""
    diag_fn, _mv, _sv, _gd = _resolve_ops(ops)
    dtype = x0.cam.dtype
    hist_len = max_nfev + 2
    neq0 = neq_fn(x0)
    floor = jnp.asarray(scale_floor, dtype)
    sc0 = jax.tree_util.tree_map(lambda d: jnp.maximum(d, floor),
                                 diag_fn(neq0))
    history0 = jnp.full((hist_len,), -1.0, dtype=dtype).at[0].set(neq0.cost)
    return SLMState(
        x=x0, neq=neq0, scale2=sc0,
        lam=jnp.asarray(lam0, dtype), nu=jnp.asarray(2.0, dtype),
        nfev=jnp.asarray(1, jnp.int32), it=jnp.asarray(0, jnp.int32),
        status=jnp.asarray(0, jnp.int32), history=history0)


def slm_result(state: SLMState) -> SLMResult:
    return SLMResult(x=state.x, cost=state.neq.cost, nfev=state.nfev,
                     nit=state.it, status=state.status,
                     history=state.history)


def structured_lm_solve(neq_fn: Callable[[ParamPieces], NormalEq],
                        x0: ParamPieces, *, max_nfev: int = 100,
                        ftol: float = 1e-8, xtol: float = 1e-8,
                        gtol: float = 1e-8, lam0: float = 1e-4,
                        scale_floor: float = 1e-8,
                        reduced_solver: str = "dense",
                        cg_tol: float = 1e-6,
                        cg_maxiter: int = 250,
                        ops=None) -> SLMResult:
    """Minimise the structured BA cost; fully traceable (use under jit).

    :param reduced_solver: 'dense' (exact Cholesky) or 'cg' (matrix-free,
        for rigs where the (15C + 6I) reduced system is too large to form).
    :param ops: optional (diag_fn, matvec_fn, solve_fn, grad_fn) overriding
        the standard structured linear algebra — the LM loop itself is
        generic over any (pieces, neq) pytree pair (e.g. the mixed
        PER_KEY+PER_GROUP system in optim/structured_mixed.py). solve_fn
        receives (neq, damp, method, cg_tol, cg_maxiter).
    """
    init = slm_init(neq_fn, x0, max_nfev=max_nfev, lam0=lam0,
                    scale_floor=scale_floor, ops=ops)
    final = slm_run(neq_fn, init, max_nfev=max_nfev, ftol=ftol, xtol=xtol,
                    gtol=gtol, reduced_solver=reduced_solver,
                    cg_tol=cg_tol, cg_maxiter=cg_maxiter, ops=ops)
    return slm_result(final)


def slm_run(neq_fn: Callable[[ParamPieces], NormalEq], state: SLMState, *,
            max_nfev: int = 100, nfev_cap: int | None = None,
            ftol: float = 1e-8, xtol: float = 1e-8, gtol: float = 1e-8,
            reduced_solver: str = "dense", cg_tol: float = 1e-6,
            cg_maxiter: int = 250, ops=None) -> SLMState:
    """Advance an LM state until convergence — or PAUSE at ``nfev_cap``
    evaluations (status stays 0; resuming with a later slm_run continues
    the exact same iteration sequence). ``max_nfev`` is the true budget:
    reaching it sets status 4 as in structured_lm_solve."""
    diag_fn, matvec_fn, solve_fn, grad_fn = _resolve_ops(ops)
    dtype = state.x.cam.dtype if hasattr(state.x, "cam") else \
        jax.tree_util.tree_leaves(state.x)[0].dtype
    hist_len = state.history.shape[-1]
    # scipy's 1e-8 defaults assume float64; clamp to the dtype's resolution
    eps = float(jnp.finfo(dtype).eps)
    ftol = max(ftol, 50 * eps)
    xtol = max(xtol, 50 * eps)
    gtol = max(gtol, 50 * eps)

    if nfev_cap is None:
        def cond(s: SLMState):
            return s.status == 0
    else:
        def cond(s: SLMState):
            return (s.status == 0) & (s.nfev < nfev_cap)

    def body(s: SLMState):
        damp = jax.tree_util.tree_map(lambda sc: s.lam * sc, s.scale2)
        dx = solve_fn(s.neq, damp, method=reduced_solver,
                      cg_tol=cg_tol, cg_maxiter=cg_maxiter)
        x_new = _padd(s.x, dx)

        neq_new = neq_fn(x_new)
        nfev = s.nfev + 1

        g = grad_fn(s.neq)
        if reduced_solver == "dense":
            # the refined dense solve makes (H + D)dx = -g hold to ~1e-6,
            # so H dx = -g - D dx and the model reduction needs NO H
            # matvec: pred_red = (dx'D dx - dx'g)/2 (scipy's formula).
            # Saves ~10 einsums per iteration — and one psum round in the
            # sharded backends, whose ops-injected matvec reduces over the
            # mesh. The CG path keeps the exact matvec: its steps can be
            # inexact enough (tol/maxiter) to corrupt rho through the
            # identity.
            ddx = jax.tree_util.tree_map(lambda dmp, x_: dmp * x_, damp, dx)
            pred_red = 0.5 * (_pdot(dx, ddx) - _pdot(dx, g))
        else:
            pred_red = -(_pdot(dx, g) + 0.5 * _pdot(dx, matvec_fn(s.neq, dx)))
        act_red = s.neq.cost - neq_new.cost
        rho = act_red / jnp.maximum(pred_red, jnp.finfo(dtype).tiny)
        ok = jnp.isfinite(neq_new.cost) & (act_red > 0)

        shrink = jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3)
        lam = jnp.where(ok, jnp.maximum(s.lam * shrink, 1e-12), s.lam * s.nu)
        nu = jnp.where(ok, jnp.asarray(2.0, dtype), s.nu * 2.0)

        x = _pwhere(ok, x_new, s.x)
        neq = _nwhere(ok, neq_new, s.neq)
        d_new = diag_fn(neq_new)
        scale2 = _pwhere(ok, jax.tree_util.tree_map(
            jnp.maximum, s.scale2, d_new), s.scale2)

        it = s.it + 1
        history = s.history.at[jnp.minimum(it, hist_len - 1)].set(neq.cost)

        g_now = grad_fn(neq)
        scaled_g = jnp.asarray(0.0, dtype)
        for gl, sl in zip(jax.tree_util.tree_leaves(g_now),
                          jax.tree_util.tree_leaves(scale2)):
            scaled_g = jnp.maximum(scaled_g, jnp.max(
                jnp.abs(gl) / jnp.sqrt(sl), initial=0.0))
        step_small = _pnorm(dx) < xtol * (xtol + _pnorm(s.x))
        cost_small = ok & (act_red < ftol * s.neq.cost)
        status = jnp.where(nfev >= max_nfev, 4, 0)
        status = jnp.where(scaled_g < gtol, 3, status)
        status = jnp.where(ok & step_small, 2, status)
        status = jnp.where(step_small & ~ok & (s.nu > 64), 2, status)
        # stall: many consecutive rejections = at the dtype's noise floor
        status = jnp.where(~ok & (s.nu > 1024), 2, status)
        status = jnp.where(cost_small, 1, status)

        return SLMState(x, neq, scale2, lam, nu, nfev, it,
                        status.astype(jnp.int32), history)

    return jax.lax.while_loop(cond, body, state)
