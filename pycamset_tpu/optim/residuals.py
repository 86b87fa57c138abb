"""Residual evaluation and normal-equation assembly for bundle adjustment.

This replaces the reference's generated full_loss / full_jac kernels
(abstract_function_blocks.py:290-652): the per-detection chain is vmapped over
the (padded, statically shaped) detection table; per-detection local Jacobians
come from jacfwd over the small local parameter slice (2 x L, L ~ 21-24); the
global damped normal equations are assembled by scatter-add of the local
JtJ / Jtr outer products — the TPU-native analogue of the reference's CSR
construction + scipy's sparse products.

The detection axis is embarrassingly parallel: all functions here are pure in
(params, detection arrays), so the parallel layer can shard the N axis with
shard_map and psum the (P,P)/(P,) reductions over ICI.

Padding convention: pad rows must REPLICATE a real detection row with
mask = 0, so that every lane computes a finite value (no z=0 projections) and
contributes exactly zero after masking.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from pycamset_tpu.optim.chain import OptimFunction, ParamStruct


@dataclass
class DetectionArrays:
    """Statically-shaped device-ready detection table.

    cols: (N, L) int32 gather indices into the full parameter vector.
    template: (N, 3) per-detection template point (zeros if untemplated).
    uv: (N, 2) measured pixels. mask: (N,) 1.0 real / 0.0 padding.
    n_real: number of unpadded rows.
    """
    cols: np.ndarray
    template: np.ndarray
    uv: np.ndarray
    mask: np.ndarray
    n_real: int

    def as_device(self, dtype):
        return (jnp.asarray(self.cols),
                jnp.asarray(self.template, dtype=dtype),
                jnp.asarray(self.uv, dtype=dtype),
                jnp.asarray(self.mask, dtype=dtype))


def pad_to_bucket(n: int, multiple: int = 512) -> int:
    """Round a detection count up to a bucket size to stabilise jit shapes."""
    return max(multiple, ((n + multiple - 1) // multiple) * multiple)


def build_detection_arrays(op_fun: OptimFunction, struct: ParamStruct,
                           dd: np.ndarray, template_table: np.ndarray | None,
                           pad_multiple: int = 512,
                           group_of_key: np.ndarray | None = None
                           ) -> DetectionArrays:
    """Pack a flattened detection table [cam, im, key, u, v] into padded,
    statically-shaped arrays ready for the device residual.

    :param group_of_key: optional key -> PER_GROUP index mapping for chains
        with group-linked parameters (e.g. multi-target rigs).
    """
    cam_idx = dd[:, 0].astype(np.int64)
    im_idx = dd[:, 1].astype(np.int64)
    key_idx = dd[:, 2].astype(np.int64)
    uv = dd[:, 3:5].astype(np.float64)
    n = dd.shape[0]

    group_idx = None
    if group_of_key is not None:
        group_idx = np.asarray(group_of_key, dtype=np.int64)[key_idx]
    cols = struct.build_cols(cam_idx, im_idx, key_idx, group_idx)
    if template_table is not None and op_fun.templated:
        tpl = template_table.reshape(-1, 3)[key_idx]
    else:
        tpl = np.zeros((n, 3))

    n_pad = pad_to_bucket(n, pad_multiple)
    mask = np.zeros(n_pad)
    mask[:n] = 1.0

    def pad(a):
        reps = np.repeat(a[:1], n_pad - n, axis=0)
        return np.concatenate([a, reps], axis=0)

    return DetectionArrays(cols=pad(cols), template=pad(tpl), uv=pad(uv),
                           mask=mask, n_real=n)


@dataclass
class GroupedDetectionArrays:
    """Detections regrouped by identical parameter-gather rows.

    The TPU-fast generic layout: every detection whose ``cols`` row matches
    shares ALL its parameters (e.g. one (cam, image) pair of the template
    chain), so the table sorts into a dense (U, M) grid — U unique rows,
    M = max group size, short groups padded with replicas under mask 0.
    Normal equations then assemble as U batched matmuls over the M axis and
    ONE small (U*L^2)-element scatter, instead of a per-detection
    (N*L^2)-element scatter-add (which serialises on TPU).

    u_rows: (U, L) unique gather rows. template: (U, M, 3). uv: (U, M, 2).
    mask: (U, M). n_real: unpadded detection count.
    """
    u_rows: np.ndarray
    template: np.ndarray
    uv: np.ndarray
    mask: np.ndarray
    n_real: int

    def as_device(self, dtype):
        return (jnp.asarray(self.u_rows),
                jnp.asarray(self.template, dtype=dtype),
                jnp.asarray(self.uv, dtype=dtype),
                jnp.asarray(self.mask, dtype=dtype))


def build_grouped_detection_arrays(op_fun: OptimFunction, struct: ParamStruct,
                                   dd: np.ndarray,
                                   template_table: np.ndarray | None,
                                   group_of_key: np.ndarray | None = None,
                                   m_pad_multiple: int = 8,
                                   max_blowup: float = 3.0,
                                   precomputed: DetectionArrays | None = None
                                   ) -> GroupedDetectionArrays | None:
    """Group a detection table by identical gather rows, or None if the
    grouping would not pay (U*M exceeds max_blowup * N — e.g. chains whose
    cols rows are per-detection unique, which should use the structured
    backend or the scatter fallback instead).

    :param precomputed: an already-built flat DetectionArrays for the same
        problem (avoids rebuilding the gather tables; only its first n_real
        rows are read, so padding is fine)."""
    flat = (precomputed if precomputed is not None else
            build_detection_arrays(op_fun, struct, dd, template_table,
                                   pad_multiple=1,
                                   group_of_key=group_of_key))
    n = flat.n_real
    if n == 0:
        return None  # nothing to group; callers keep the scatter path
    u_rows, inv = np.unique(flat.cols[:n], axis=0, return_inverse=True)
    u = u_rows.shape[0]
    counts = np.bincount(inv, minlength=u)
    m = int(counts.max())
    m = ((m + m_pad_multiple - 1) // m_pad_multiple) * m_pad_multiple
    if u * m > max_blowup * n:
        return None
    order = np.argsort(inv, kind="stable")
    tpl = np.zeros((u, m, 3))
    uv = np.zeros((u, m, 2))
    mask = np.zeros((u, m))
    slot = np.concatenate([np.arange(c) for c in counts])
    gi = inv[order]
    tpl[gi, slot] = flat.template[:n][order]
    uv[gi, slot] = flat.uv[:n][order]
    mask[gi, slot] = 1.0
    # pad slots replicate the group's first real row (NaN-safety: every
    # lane must stay finite; the mask kills its contribution)
    first = tpl[:, 0], uv[:, 0]
    pad = mask == 0.0
    tpl[pad] = np.repeat(first[0], m, axis=0).reshape(u, m, 3)[pad]
    uv[pad] = np.repeat(first[1], m, axis=0).reshape(u, m, 2)[pad]
    return GroupedDetectionArrays(u_rows=u_rows, template=tpl, uv=uv,
                                  mask=mask, n_real=n)


def make_grouped_neq_fn(op_fun: OptimFunction, loss: str = "linear",
                        f_scale: float = 1.0,
                        loss_semantics: str = "component"):
    """Normal-equation builder over the (U, M) grouped grid.

    neq(params_full, u_rows, tpl, uv, mask) -> (JtJ, grad, cost): parameters
    gather ONCE per group, residual/Jacobian vectorise over the dense grid,
    grams contract over the M axis on the MXU, and only the (U, L, L) /
    (U, L) group results scatter into the global system. Same robust-loss
    handling as make_neq_fn (IRLS weights; loss_semantics selects the
    per-observation or per-component convention).
    """
    from pycamset_tpu.optim.losses import check_loss_semantics, make_loss

    check_loss_semantics(loss_semantics)
    point_fn = op_fun.make_point_fn()
    rho_fn, weight_fn = make_loss(loss, f_scale)
    robust = loss != "linear"

    def neq(params_full, u_rows, tpl, uv, mask):
        p_total = params_full.shape[0]
        local_u = params_full[u_rows]                  # (U, L)

        def res_one(lp, t, u):
            return point_fn(lp, t) - u

        def rj(lp, t, u):
            return res_one(lp, t, u), jax.jacfwd(res_one)(lp, t, u)

        per_m = jax.vmap(rj, in_axes=(None, 0, 0))
        r, jac = jax.vmap(per_m)(local_u, tpl, uv)     # (U,M,2), (U,M,2,L)
        r = r * mask[..., None]
        if robust and loss_semantics == "component":
            s = r * r
            cost = jnp.sum(rho_fn(s) * mask[..., None])
            sw = jnp.sqrt(weight_fn(s)) * mask[..., None]
            r = r * sw
            jac = jac * sw[..., None]
        elif robust:
            s = jnp.sum(r * r, axis=-1)
            cost = jnp.sum(rho_fn(s) * mask)
            sw = jnp.sqrt(weight_fn(s)) * mask
            r = r * sw[..., None]
            jac = jac * sw[..., None, None]
        else:
            cost = jnp.sum(r * r)
            jac = jac * mask[..., None, None]

        gram_u = jnp.einsum("umki,umkj->uij", jac, jac)   # (U,L,L) MXU
        g_u = jnp.einsum("umki,umk->ui", jac, r)          # (U,L)
        jtj = jnp.zeros((p_total, p_total), dtype=r.dtype).at[
            u_rows[:, :, None], u_rows[:, None, :]].add(gram_u)
        grad = jnp.zeros((p_total,), dtype=r.dtype).at[u_rows].add(g_u)
        return jtj, grad, cost

    return neq


def make_residual_fn(op_fun: OptimFunction):
    """residual(params_full, cols, tpl, uv, mask) -> (N,2) masked residuals."""
    point_fn = op_fun.make_point_fn()

    def residual(params_full, cols, tpl, uv, mask):
        local = params_full[cols]
        pred = jax.vmap(point_fn)(local, tpl)
        return (pred - uv) * mask[:, None]

    return residual


def make_cost_fn(op_fun: OptimFunction):
    """cost(params_full, ...) -> sum of squared masked residuals."""
    residual = make_residual_fn(op_fun)

    def cost(params_full, cols, tpl, uv, mask):
        r = residual(params_full, cols, tpl, uv, mask)
        return jnp.sum(r * r)

    return cost


def make_local_jac_fn(op_fun: OptimFunction):
    """(params_full, ...) -> (residuals (N,2), local jacobians (N,2,L)).

    The raw per-detection pieces, for host-side sparse-Jacobian assembly
    (scipy interop) — the analogue of the reference's generated full_jac.
    """
    point_fn = op_fun.make_point_fn()

    def local_jac(params_full, cols, tpl, uv, mask):
        local = params_full[cols]

        def res_one(lp, t, u):
            return point_fn(lp, t) - u

        def rj(lp, t, u):
            return res_one(lp, t, u), jax.jacfwd(res_one)(lp, t, u)

        r, jac = jax.vmap(rj)(local, tpl, uv)
        return r * mask[:, None], jac * mask[:, None, None]

    return local_jac


def make_neq_fn(op_fun: OptimFunction, loss: str = "linear",
                f_scale: float = 1.0,
                loss_semantics: str = "component"):
    """Normal-equation builder.

    neq(params_full, cols, tpl, uv, mask) ->
        (JtJ (P,P), grad (P,) = J^T r, cost scalar)

    assembled by scatter-add of per-detection (L,L)/(L,) contributions.
    Robust losses apply IRLS weights per 2D observation, like the
    structured backend.
    """
    from pycamset_tpu.optim.losses import check_loss_semantics, make_loss

    check_loss_semantics(loss_semantics)
    point_fn = op_fun.make_point_fn()
    rho_fn, weight_fn = make_loss(loss, f_scale)
    robust = loss != "linear"

    def neq(params_full, cols, tpl, uv, mask):
        p_total = params_full.shape[0]
        local = params_full[cols]

        def res_one(lp, t, u):
            return point_fn(lp, t) - u

        def rj(lp, t, u):
            return res_one(lp, t, u), jax.jacfwd(res_one)(lp, t, u)

        r, jac = jax.vmap(rj)(local, tpl, uv)          # (N,2), (N,2,L)
        r = r * mask[:, None]
        if robust and loss_semantics == "component":
            s = r * r
            robust_cost = jnp.sum(rho_fn(s) * mask[:, None])
            sw = jnp.sqrt(weight_fn(s)) * mask[:, None]
            r = r * sw
            jac = jac * sw[..., None]
        elif robust:
            s = jnp.sum(r * r, axis=-1)
            robust_cost = jnp.sum(rho_fn(s) * mask)
            sw = jnp.sqrt(weight_fn(s)) * mask
            r = r * sw[:, None]
            jac = jac * sw[:, None, None]
        else:
            jac = jac * mask[:, None, None]

        gram = jnp.einsum("nki,nkj->nij", jac, jac)    # (N,L,L)
        jtr = jnp.einsum("nki,nk->ni", jac, r)         # (N,L)

        jtj = jnp.zeros((p_total, p_total), dtype=r.dtype).at[
            cols[:, :, None], cols[:, None, :]].add(gram)
        grad = jnp.zeros((p_total,), dtype=r.dtype).at[cols].add(jtr)
        cost = robust_cost if robust else jnp.sum(r * r)
        return jtj, grad, cost

    return neq
