"""Multi-device bundle adjustment: shard_map over detections + psum reductions.

TPU-native equivalent of the reference's prange data parallelism
(SURVEY.md §2.9): each device evaluates residuals + local Jacobians for its
shard of the detection table and scatter-adds a partial (P,P)/(P,) normal
equation; one psum over the mesh (ICI collectives) produces the replicated
global system; the damped solve and LM control flow run replicated on every
device (they are tiny relative to the residual work). The whole solve remains
a single jitted lax.while_loop — zero host round-trips per iteration on any
mesh size.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from pycamset_tpu.optim.chain import OptimFunction
from pycamset_tpu.optim.lm import LMResult, lm_solve
from pycamset_tpu.optim.residuals import make_neq_fn, make_residual_fn
from pycamset_tpu.parallel.mesh import DETECTION_AXIS


def make_sharded_neq_fn(op_fun: OptimFunction, mesh: Mesh):
    """neq over a detection table sharded on its leading axis.

    in: params_full replicated; cols/tpl/uv/mask sharded on axis 0.
    out: (JtJ, grad, cost) replicated (psum over the mesh).
    """
    neq = make_neq_fn(op_fun)

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(DETECTION_AXIS), P(DETECTION_AXIS),
                       P(DETECTION_AXIS), P(DETECTION_AXIS)),
             out_specs=(P(), P(), P()))
    def sharded_neq(params_full, cols, tpl, uv, mask):
        jtj, grad, cost = neq(params_full, cols, tpl, uv, mask)
        return (jax.lax.psum(jtj, DETECTION_AXIS),
                jax.lax.psum(grad, DETECTION_AXIS),
                jax.lax.psum(cost, DETECTION_AXIS))

    return sharded_neq


def make_sharded_residual_fn(op_fun: OptimFunction, mesh: Mesh):
    """Masked residuals with the detection axis sharded (output sharded)."""
    residual = make_residual_fn(op_fun)

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(DETECTION_AXIS), P(DETECTION_AXIS),
                       P(DETECTION_AXIS), P(DETECTION_AXIS)),
             out_specs=P(DETECTION_AXIS))
    def sharded_residual(params_full, cols, tpl, uv, mask):
        return residual(params_full, cols, tpl, uv, mask)

    return sharded_residual


def make_sharded_solver(op_fun: OptimFunction, mesh: Mesh, free_idx,
                        max_nfev: int = 100):
    """A jitted multi-device LM solve over sharded detection arrays.

    :return: solve(x0_free, base_full, cols, tpl, uv, mask) -> LMResult.
        base_full/x0 replicated; detection arrays sharded on axis 0 (their
        length must be divisible by the mesh size — use pad_to_bucket with a
        multiple of the device count).
    """
    sharded_neq = make_sharded_neq_fn(op_fun, mesh)
    free_idx = jnp.asarray(free_idx, dtype=jnp.int32)

    @jax.jit
    def solve(x0_free, base_full, cols, tpl, uv, mask) -> LMResult:
        def neq_free(x):
            full = base_full.at[free_idx].set(x)
            jtj, grad, cost = sharded_neq(full, cols, tpl, uv, mask)
            return jtj[free_idx][:, free_idx], grad[free_idx], cost

        return lm_solve(neq_free, x0_free, max_nfev=max_nfev)

    return solve
