"""A device-resident Levenberg–Marquardt solver (lax.while_loop).

This replaces scipy.optimize.least_squares(method='trf', jac=<sparse>,
x_scale='jac') in the reference's hot loop (optimisation_handling.py:88-98):

- x_scale='jac' column scaling becomes a running-max Jacobi scale
  D_j = max over iterations of ||J_:j||  (scipy TRF semantics), applied as a
  Marquardt damping term  (JtJ + lam * diag(D^2)) dx = -g.
- lam follows Nielsen's update: accepted steps shrink lam by
  max(1/3, 1 - (2*rho - 1)^3); rejected steps multiply by a doubling nu.
- termination mirrors scipy: ftol on relative cost reduction, xtol on the
  step norm, gtol on the scaled gradient infinity norm, max_nfev on residual
  evaluations.

The entire loop — normal-equation build, dense solve, accept/reject — is one
jitted lax.while_loop: zero host round-trips per iteration. The solve is a
dense Cholesky of the (free-param) reduced system; for rigs where the free
parameter count is large, the Schur-complement path (optim/structured.py +
optim/structured_lm.py) applies.

Fixed parameters: the solver works on the free sub-vector; gathering the free
rows/columns of the full normal equations happens here with static index
arrays (the analogue of the reference's unfixed_params CSR column masking,
abstract_function_blocks.py:465-489).
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class LMState(NamedTuple):
    x: jnp.ndarray          # free parameter vector
    jtj: jnp.ndarray        # (F,F) at x
    grad: jnp.ndarray       # (F,) at x
    cost: jnp.ndarray       # scalar at x
    scale2: jnp.ndarray     # running max of diag(JtJ) (= max ||J_j||^2)
    lam: jnp.ndarray
    nu: jnp.ndarray
    nfev: jnp.ndarray
    it: jnp.ndarray
    status: jnp.ndarray     # 0 running, 1 ftol, 2 xtol, 3 gtol, 4 max_nfev
    history: jnp.ndarray    # cost per accepted iteration (padded with -1)


class LMResult(NamedTuple):
    x: jnp.ndarray
    cost: jnp.ndarray
    grad: jnp.ndarray
    nfev: jnp.ndarray
    nit: jnp.ndarray
    status: jnp.ndarray
    history: jnp.ndarray


def lm_solve(neq_fn: Callable, x0: jnp.ndarray, *, max_nfev: int = 100,
             ftol: float = 1e-8, xtol: float = 1e-8, gtol: float = 1e-8,
             lam0: float = 1e-4, scale_floor: float = 1e-8) -> LMResult:
    """Minimise 0.5*||r(x)||^2 given a normal-equation oracle.

    :param neq_fn: x -> (JtJ, grad, cost) on the free parameter vector.
    :param x0: initial free parameters.

    Traceable: call under jit (see lm_solve_jit) for a fully device-resident
    loop. One neq evaluation per iteration; rejected steps reuse the factored
    quantities and only re-evaluate the trial cost through the model decrease
    (cost via neq at the trial point would double work, so trial cost is
    evaluated with the same oracle but only its cost output is kept — XLA DCEs
    the unused JtJ when the oracle is split; to keep one oracle the trial also
    builds JtJ, which is then reused immediately on acceptance).
    """
    dtype = x0.dtype
    hist_len = max_nfev + 2
    # scipy's 1e-8 defaults assume float64; clamp to the dtype's resolution
    eps = float(jnp.finfo(dtype).eps)
    ftol = max(ftol, 50 * eps)
    xtol = max(xtol, 50 * eps)
    gtol = max(gtol, 50 * eps)

    jtj0, grad0, cost0 = neq_fn(x0)
    scale20 = jnp.maximum(jnp.diag(jtj0), scale_floor)
    history0 = jnp.full((hist_len,), -1.0, dtype=dtype).at[0].set(cost0)

    init = LMState(
        x=x0, jtj=jtj0, grad=grad0, cost=cost0, scale2=scale20,
        lam=jnp.asarray(lam0, dtype), nu=jnp.asarray(2.0, dtype),
        nfev=jnp.asarray(1, jnp.int32), it=jnp.asarray(0, jnp.int32),
        status=jnp.asarray(0, jnp.int32), history=history0)

    def cond(s: LMState):
        return s.status == 0

    def body(s: LMState):
        damp = s.lam * s.scale2
        a = s.jtj + jnp.diag(damp)
        dx = jnp.linalg.solve(a, -s.grad)
        x_new = s.x + dx

        jtj_new, grad_new, cost_new = neq_fn(x_new)
        nfev = s.nfev + 1

        # model reduction: m(0) - m(dx) = -(g.dx + 0.5 dx JtJ dx)
        pred_red = -(jnp.dot(dx, s.grad) + 0.5 * dx @ (s.jtj @ dx))
        act_red = s.cost - cost_new
        rho = act_red / jnp.maximum(pred_red, jnp.finfo(dtype).tiny)
        ok = jnp.isfinite(cost_new) & (act_red > 0)

        # Nielsen lam update
        shrink = jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3)
        lam_acc = jnp.maximum(s.lam * shrink, jnp.asarray(1e-12, dtype))
        lam_rej = s.lam * s.nu
        lam = jnp.where(ok, lam_acc, lam_rej)
        nu = jnp.where(ok, jnp.asarray(2.0, dtype), s.nu * 2.0)

        x = jnp.where(ok, x_new, s.x)
        jtj = jnp.where(ok, jtj_new, s.jtj)
        grad = jnp.where(ok, grad_new, s.grad)
        cost = jnp.where(ok, cost_new, s.cost)
        scale2 = jnp.where(ok, jnp.maximum(s.scale2, jnp.diag(jtj_new)), s.scale2)

        it = s.it + 1
        history = s.history.at[jnp.minimum(it, hist_len - 1)].set(cost)

        # termination
        step_small = jnp.linalg.norm(dx) < xtol * (xtol + jnp.linalg.norm(s.x))
        cost_small = ok & (act_red < ftol * s.cost)
        g_small = jnp.max(jnp.abs(grad) / jnp.sqrt(scale2)) < gtol
        status = jnp.where(nfev >= max_nfev, 4, 0)
        status = jnp.where(g_small, 3, status)
        status = jnp.where(ok & step_small, 2, status)
        status = jnp.where(step_small & ~ok & (s.nu > 64), 2, status)
        # stall: many consecutive rejections = at the dtype's noise floor
        status = jnp.where(~ok & (s.nu > 1024), 2, status)
        status = jnp.where(cost_small, 1, status)
        status = status.astype(jnp.int32)

        return LMState(x, jtj, grad, cost, scale2, lam, nu, nfev, it, status,
                       history)

    final = jax.lax.while_loop(cond, body, init)
    return LMResult(x=final.x, cost=final.cost, grad=final.grad,
                    nfev=final.nfev, nit=final.it, status=final.status,
                    history=final.history)


def lm_solve_masked(neq_full_fn: Callable, base_full: jnp.ndarray,
                    free_idx: np.ndarray, x0_free: jnp.ndarray,
                    **kwargs) -> LMResult:
    """LM over the free sub-vector of a full parameter vector.

    :param neq_full_fn: params_full -> (JtJ_full, grad_full, cost).
    :param base_full: the full parameter vector holding fixed values.
    :param free_idx: static indices of free parameters.
    """
    free_idx = jnp.asarray(np.asarray(free_idx), dtype=jnp.int32)

    def neq_free(x_free):
        full = base_full.at[free_idx].set(x_free)
        jtj, grad, cost = neq_full_fn(full)
        return jtj[free_idx][:, free_idx], grad[free_idx], cost

    return lm_solve(neq_free, x0_free, **kwargs)


lm_solve_jit = jax.jit(lm_solve, static_argnums=(0,),
                       static_argnames=("max_nfev",))
