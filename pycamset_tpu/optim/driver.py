"""The optimisation driver: handler -> device problem -> LM -> CameraSet.

Capability parity target (reference, behaviour only):
pyCamSet/optimisation/optimisation_handling.py:24-117 —
make_optimisation_function compiles the loss/jac and seeds parameters;
run_bundle_adjustment logs initial error, warns above 150 px, runs the solver
with max_nfev and x_scale='jac' semantics, logs the final error and attaches
the results to the CameraSet.

Instead of scipy's host-side TRF over numba kernels, the whole solve is one
jitted device computation (normal equations + damped solves inside a
lax.while_loop). dtype policy: float64 on CPU, float32 on TPU.
"""
from __future__ import annotations

import logging
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from pycamset_tpu.config import default_device_dtype
from pycamset_tpu.optim.handlers import TemplateBundleHandler
from pycamset_tpu.optim.lm import LMResult, lm_solve
from pycamset_tpu.optim.residuals import make_neq_fn, make_residual_fn


class OptimizeResult(dict):
    """A scipy-style result bag with attribute access."""

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    __setattr__ = dict.__setitem__


def build_solver(param_handler: TemplateBundleHandler, dtype=None,
                 pad_multiple: int = 512):
    """Compile the device problem for a handler.

    :return: (solve_fn(x0_free) -> LMResult,
              residual_fn(x_free) -> (n_real, 2) unpadded residuals,
              x0_free initial parameters)
    """
    dtype = dtype or default_device_dtype()
    op_fun = param_handler.op_fun
    if getattr(op_fun, "aux_width", 0):
        raise ValueError(
            "chains with per-detection aux inputs (rolling shutter) run on "
            "the structured backend; use backend='structured' or 'auto'")

    x0 = np.asarray(param_handler.get_initial_params(), dtype=np.float64)
    # build_problem must run after get_initial_params: missing poses are only
    # known once the pose seeding has run.
    struct, det = param_handler.build_problem(pad_multiple=pad_multiple)
    cols, tpl, uv, mask = det.as_device(dtype)

    base_full = param_handler.bundlePrimitive.base_full()
    unfixed = param_handler.bundlePrimitive.unfixed_full()
    base_full[unfixed] = x0
    free_idx = jnp.asarray(np.where(unfixed)[0], dtype=jnp.int32)
    base_dev = jnp.asarray(base_full, dtype=dtype)

    loss = param_handler.problem_opts.get("loss", "linear")
    f_scale = float(param_handler.problem_opts.get("f_scale", 1.0))
    semantics = param_handler.problem_opts.get("loss_semantics",
                                               "component")
    # fast generic assembly: detections grouped by identical gather rows
    # turn the per-detection scatter-add (~2 s/eval on TPU at 500k rows)
    # into batched matmuls + one small scatter; chains whose rows are
    # per-detection unique keep the scatter fallback
    grouped = None
    if param_handler.problem_opts.get("grouped_neq", True):
        from pycamset_tpu.optim.residuals import (
            build_grouped_detection_arrays, make_grouped_neq_fn)
        # reuse the flat arrays build_problem just assembled (only the
        # unpadded rows are read)
        grouped = build_grouped_detection_arrays(
            op_fun, struct, None, None, precomputed=det)
    if grouped is not None:
        g_rows, g_tpl, g_uv, g_mask = grouped.as_device(dtype)
        neq = make_grouped_neq_fn(op_fun, loss=loss, f_scale=f_scale,
                                  loss_semantics=semantics)
        neq_args = (g_rows, g_tpl, g_uv, g_mask)
    else:
        neq = make_neq_fn(op_fun, loss=loss, f_scale=f_scale,
                          loss_semantics=semantics)
        neq_args = (cols, tpl, uv, mask)
    residual = make_residual_fn(op_fun)
    max_nfev = int(param_handler.problem_opts.get("max_nfev", 100))

    def neq_free(x_free, base, args):
        full = base.at[free_idx].set(x_free)
        jtj, grad, cost = neq(full, *args)
        return jtj[free_idx][:, free_idx], grad[free_idx], cost

    @jax.jit
    def solve_impl(x0_free, base, args):
        return lm_solve(lambda x: neq_free(x, base, args),
                        x0_free, max_nfev=max_nfev)

    @jax.jit
    def residual_impl(x_free, base, c, t, u, m):
        full = base.at[free_idx].set(x_free)
        return residual(full, c, t, u, m)

    def solve_fn(x_free: np.ndarray):
        res = solve_impl(jnp.asarray(x_free, dtype=dtype),
                         base_dev, neq_args)
        return np.asarray(res.x, dtype=np.float64), res

    def residual_fn(x_free: np.ndarray) -> np.ndarray:
        r = residual_impl(jnp.asarray(x_free, dtype=dtype),
                          base_dev, cols, tpl, uv, mask)
        return np.array(r)[: det.n_real]

    return solve_fn, residual_fn, x0


def make_optimisation_function(param_handler: TemplateBundleHandler,
                               threads: int = 1
                               ) -> tuple[Callable, Callable | None, np.ndarray]:
    """A (loss_fn, jac_fn, init_params) triple over the free parameters.

    API parity with the reference (optimisation_handling.py:24-49): loss_fn
    returns the flattened residual vector and jac_fn a scipy.sparse.csr_array
    of shape (2*n_det, n_free) — device-evaluated per-detection local
    Jacobians scattered into CSR on the host. Directly consumable by
    scipy.optimize.least_squares.
    """
    from scipy.sparse import csr_array

    if getattr(param_handler.op_fun, "aux_width", 0):
        raise ValueError(
            "chains with per-detection aux inputs (rolling shutter) run on "
            "the structured backend; use backend='structured' or 'auto'")

    from pycamset_tpu.optim.residuals import make_local_jac_fn

    logging.info("getting initial params")
    dtype = default_device_dtype()
    op_fun = param_handler.op_fun
    x0 = np.asarray(param_handler.get_initial_params(), dtype=np.float64)
    struct, det = param_handler.build_problem()
    cols_np = det.cols[: det.n_real]
    darrs = det.as_device(dtype)

    base_full = param_handler.bundlePrimitive.base_full()
    unfixed = param_handler.bundlePrimitive.unfixed_full()
    base_full[unfixed] = x0
    free_idx = np.where(unfixed)[0]
    full_to_free = np.full(struct.total, -1, dtype=np.int64)
    full_to_free[free_idx] = np.arange(free_idx.size)

    residual = jax.jit(make_residual_fn(op_fun))
    local_jac = jax.jit(make_local_jac_fn(op_fun))
    free_idx_j = jnp.asarray(free_idx, dtype=jnp.int32)
    base_dev = jnp.asarray(base_full, dtype=dtype)

    def full_of(x):
        return base_dev.at[free_idx_j].set(jnp.asarray(x, dtype=dtype))

    def loss_fn(x):
        r = np.asarray(residual(full_of(x), *darrs))[: det.n_real]
        return r.reshape(-1)

    jac_fn = None
    if param_handler.can_make_jac():
        # precompute the CSR sparsity (free columns only); rows interleave
        # (x_i, y_i) per detection, matching the loss ordering
        col_free = full_to_free[cols_np]                    # (N, L), -1 = fixed
        keep = col_free >= 0
        counts = keep.sum(axis=1)                           # entries per row
        total = int(counts.sum())
        indptr = np.concatenate(
            [[0], np.cumsum(np.repeat(counts, 2))]).astype(np.int64)
        # positions of the x-row / y-row entries in the data array
        blk_start = np.concatenate([[0], np.cumsum(2 * counts)[:-1]])
        ent_start = np.concatenate([[0], np.cumsum(counts)[:-1]])
        within = np.arange(total) - np.repeat(ent_start, counts)
        x_pos = np.repeat(blk_start, counts) + within
        y_pos = x_pos + np.repeat(counts, counts)
        flat_cols = col_free[keep]
        indices = np.empty(2 * total, dtype=np.int64)
        indices[x_pos] = flat_cols
        indices[y_pos] = flat_cols

        def jac_fn(x):
            _, jac = local_jac(full_of(x), *darrs)
            jac = np.asarray(jac)[: det.n_real]             # (N,2,L)
            data = np.empty(2 * total)
            data[x_pos] = jac[:, 0][keep]
            data[y_pos] = jac[:, 1][keep]
            return csr_array((data, indices, indptr),
                             shape=(2 * det.n_real, free_idx.size))

    return loss_fn, jac_fn, x0


def run_bundle_adjustment(param_handler: TemplateBundleHandler,
                          threads: int = 1, dtype=None, backend: str = "auto"
                          ) -> tuple[OptimizeResult, object]:
    """Solve the bundle adjustment a handler describes.

    :return: (OptimizeResult with x/fun/cost/nfev/status/history,
              the argmin CameraSet)
    """
    logging.info("Making optimisation problem")
    dtype = dtype or default_device_dtype()
    if (param_handler.problem_opts.get("shared_intrinsics")
            and backend not in ("auto", "structured", "sharded")):
        # no silent fallback: scipy/generic (and any unrecognized backend
        # string, which dispatches to the generic branch) have no tying
        # fold and would solve every camera's lens independently
        raise ValueError(
            f"shared_intrinsics is not available on the {backend!r} "
            "backend (it would silently solve untied); use "
            "backend='auto' or 'structured'")
    if backend == "scipy":
        # reference-equivalent solver path: scipy TRF with the sparse
        # analytic Jacobian (device-evaluated) — kept for parity validation
        from scipy.optimize import least_squares
        loss_fn, jac_fn, init_params = make_optimisation_function(param_handler)

        class _ScipyResult:
            pass

        def solve_fn(x0):
            sol = least_squares(
                loss_fn, x0, jac=jac_fn,
                verbose=param_handler.problem_opts.get("verbosity", 0),
                max_nfev=param_handler.problem_opts.get("max_nfev", 100),
                loss=param_handler.problem_opts.get("loss", "linear"),
                f_scale=param_handler.problem_opts.get("f_scale", 1.0),
                x_scale="jac")
            res = _ScipyResult()
            res.cost = 2.0 * sol.cost  # scipy cost = 0.5 * sum(r^2)
            res.nfev = sol.nfev
            res.nit = sol.nfev
            res.status = sol.status
            res.history = np.array([2.0 * sol.cost])
            return np.asarray(sol.x, dtype=np.float64), res

        def residual_fn(x):
            return loss_fn(x).reshape(-1, 2)

    elif backend in ("auto", "structured", "sharded"):
        from pycamset_tpu.optim.structured import UnsupportedChain
        mesh = None
        if backend == "sharded":
            # multi-device solve over a 1-D detection mesh: shard_map +
            # psum around the same structured/mixed backends (and the same
            # Pallas kernels). problem_opts: "mesh" (default: all devices),
            # "shard_axis" ('auto'|'cam'|'pose'|'key').
            from pycamset_tpu.parallel.mesh import detection_mesh
            mesh = param_handler.problem_opts.get("mesh") or detection_mesh()
            logging.info(f"Sharding the solve over {mesh.devices.size} "
                         "device(s)")
        if param_handler.problem_opts.get("shared_intrinsics"):
            # one lens model tied across every camera: the tied
            # arrow-structured backend (optim/shared_intr.py). No silent
            # fallback — an untied solve would not honour the constraint.
            if mesh is not None:
                raise ValueError(
                    "shared_intrinsics is not available on the sharded "
                    "backend (the tied reduced system is tiny)")
            from pycamset_tpu.optim.shared_intr import (
                build_shared_structured_problem)
            solve_fn, residual_fn, init_params = (
                build_shared_structured_problem(param_handler, dtype=dtype))
            logging.info("Using the tied (shared-intrinsics) backend")
            return _finish_bundle_adjustment(param_handler, solve_fn,
                                             residual_fn, init_params)
        try:
            from pycamset_tpu.optim.structured_driver import (
                build_structured_problem)
            solve_fn, residual_fn, init_params = build_structured_problem(
                param_handler, dtype=dtype, mesh=mesh)
            logging.info("Using the structured (Schur) backend")
        except UnsupportedChain as e:
            try:
                # mixed PER_KEY+PER_GROUP chains (multi-target self-cal)
                # have their own arrow-structured backend
                from pycamset_tpu.optim.structured_driver import (
                    build_mixed_structured_problem)
                solve_fn, residual_fn, init_params = (
                    build_mixed_structured_problem(param_handler,
                                                   dtype=dtype, mesh=mesh))
                logging.info(
                    "Using the mixed (key+group) structured backend")
            except UnsupportedChain:
                if backend in ("structured", "sharded"):
                    raise e
                logging.info(f"Structured backend unavailable ({e}); "
                             "falling back to the generic backend")
                solve_fn, residual_fn, init_params = build_solver(
                    param_handler, dtype=dtype)
    else:
        solve_fn, residual_fn, init_params = build_solver(
            param_handler, dtype=dtype)

    return _finish_bundle_adjustment(param_handler, solve_fn, residual_fn,
                                     init_params)


def _finish_bundle_adjustment(param_handler, solve_fn, residual_fn,
                              init_params):
    """Run the built solver and package the result (shared by every
    backend branch of run_bundle_adjustment)."""
    init_err = residual_fn(init_params)
    init_euclid = float(np.mean(np.linalg.norm(init_err, axis=1)))
    logging.info(f"found {len(init_params):.2e} parameters")
    logging.info(f"found {init_err.size:.2e} control points")
    logging.info(f"Initial Euclidean error: {init_euclid:.2f} px")
    if init_euclid > 150 or np.isnan(init_euclid):
        logging.critical(
            "Found worryingly high/NaN initial error: check that the initial "
            "parametisation is sensible")
        logging.info(
            "This can often indicate failure to place a camera or target "
            "correctly, giving nonsensical errors.")

    start = time.time()
    x_final, res = solve_fn(init_params)
    end = time.time()

    final_res = residual_fn(x_final)
    final_euclid = float(np.mean(np.linalg.norm(final_res, axis=1)))
    logging.info(f"Final Euclidean error: {final_euclid:.2f} px")
    logging.info(f"Optimisation took {end - start: .2f} seconds.")
    if final_euclid > 5:
        logging.critical(
            "Remaining error is very large: please check the output results")

    optimisation = OptimizeResult(
        x=x_final, fun=final_res.reshape(-1), jac=None,
        cost=float(res.cost) * 0.5, nfev=int(res.nfev), nit=int(res.nit),
        status=int(res.status),
        history=np.asarray(res.history)[np.asarray(res.history) >= 0])

    camset = param_handler.get_camset(x_final)
    camset.set_calibration_history(optimisation, param_handler)
    return optimisation, camset
