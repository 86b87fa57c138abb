#!/usr/bin/env python
"""Decompose the mixed-chain NON-EVAL cost on the real chip.

benchmarks/anatomy.py shows the mixed LM iteration is reduced-solve-bound
(r4: 1.73 ms = 0.74 eval + 0.99 non-eval). This probe times chained,
data-dependent program variants that add the solve pieces one at a time:

  eval        : neq only (the Pallas kernel + reductions)
  eval+damp   : + diag/damp tree arithmetic
  eval+solve  : + the full mixed reduced solve (dx computation)
  variants    : solve with 0/1/2 refinement steps, without the stacked
                s_corr contraction (timing-only, wrong result)

Each variant chains data-dependently inside ONE jitted lax.scan (the next
input is perturbed by the previous output) so nothing hoists, timed with
the fetch-forced differenced method.

Usage: python benchmarks/mixed_solve_probe.py
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")
from bench import fetch_scalar, log, perturbed  # noqa: E402


def timed(run, pieces_list, k_lo=2, k_hi=8):
    def run_k(k):
        t0 = time.perf_counter()
        r = None
        for i in range(k):
            r = run(pieces_list[i % len(pieces_list)])
        fetch_scalar(r)
        return time.perf_counter() - t0

    import numpy as np
    qs = []
    for q in range(3):
        t_lo = run_k(k_lo)
        t_hi = run_k(k_hi)
        qs.append((t_hi - t_lo) / (k_hi - k_lo))
    per = float(np.median(qs))
    return per if per > 0 else run_k(k_hi) / k_hi


def main():
    import jax
    import jax.numpy as jnp

    import bench as b
    from pycamset_tpu.optim.blocks import (Extrinsic3D, FreePoint,
                                           GroupRigidTform3d, Projection,
                                           RigidTform3d)
    from pycamset_tpu.optim.chain import OptimFunction
    from pycamset_tpu.optim.structured import block_diag_dense, \
        _normalized_inv, _psd_solve
    from pycamset_tpu.optim.structured_mixed import (
        MixedPieces, make_mixed_ops, make_mixed_structured_neq,
        mixed_chain_widths)
    from pycamset_tpu.config import default_device_dtype

    _s, pieces, args, blocks = b.mixed_problem()
    uv, mask, tpl = args
    dtype = default_device_dtype()
    op_fun = OptimFunction([Projection(), Extrinsic3D(), RigidTform3d(),
                            GroupRigidTform3d(), FreePoint()])
    widths = mixed_chain_widths(op_fun)
    n_cams, n_ims = 16, 100
    k_pad = blocks.uv.shape[1]
    n_keys = 361
    colmask, gok = b.mixed_colmask_groups(n_cams, n_ims, n_keys, k_pad,
                                          dtype)
    neq_fn = make_mixed_structured_neq(op_fun, widths, n_cams, n_ims,
                                       gok, 2)
    diag_fn, _mv, solve_fn, grad_fn = make_mixed_ops(neq_fn.onehot)
    onehot = neq_fn.onehot

    def chained(step_fn, n):
        @jax.jit
        def run(p):
            def step(pp, _):
                out = step_fn(pp)
                bump = (out * 1e-14).astype(dtype)
                return pp._replace(cam=pp.cam + bump), out
            _, outs = jax.lax.scan(step, p, None, length=n)
            return outs.sum()
        return run

    def force_all(neq):
        # defeat DCE: every neq leaf feeds the output
        return sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(neq)) \
            * 1e-30

    def eval_cost_only(pp):
        # XLA may dead-code the unused coupling reductions
        return neq_fn(pp, uv, mask, tpl, colmask).cost

    def eval_only(pp):
        neq = neq_fn(pp, uv, mask, tpl, colmask)
        return neq.cost + force_all(neq)

    def eval_damp(pp):
        neq = neq_fn(pp, uv, mask, tpl, colmask)
        d = diag_fn(neq)
        damp = jax.tree_util.tree_map(lambda x: 1e-4 * x, d)
        return neq.cost + force_all(neq) \
            + sum(jnp.sum(x) for x in damp) * 1e-30

    def make_eval_stage(stage):
        def f(pp):
            neq = neq_fn(pp, uv, mask, tpl, colmask)
            d = diag_fn(neq)
            damp = jax.tree_util.tree_map(lambda x: 1e-4 * x, d)
            out = _solve_stage(neq, damp, stage)
            return neq.cost + force_all(neq) + out * 1e-30
        return f

    def _solve_stage(neq, damp, stage):
        oh = jnp.asarray(onehot, dtype=neq.gc.dtype)
        c_, i_, g_ = neq.hcc.shape[0], neq.hii.shape[0], neq.hgg.shape[0]
        a, b_w = neq.hcc.shape[2], neq.hii.shape[2]
        cg = neq.hgg.shape[2]
        k_, ck = neq.hkk.shape[0], neq.hkk.shape[2]
        na, nb, ng = c_ * a, i_ * b_w, g_ * cg
        hcc = neq.hcc + jax.vmap(jnp.diag)(damp.cam)
        hii = neq.hii + jax.vmap(jnp.diag)(damp.im)
        hkk = neq.hkk + jax.vmap(jnp.diag)(damp.key)
        hgg = neq.hgg + jax.vmap(jnp.diag)(damp.grp)
        kinv = _normalized_inv(hkk)
        if stage == "kinv":
            return jnp.sum(kinv)
        vc = neq.wck.transpose(1, 3, 0, 2).reshape(k_, ck, na)
        vi = neq.wik.transpose(1, 3, 0, 2).reshape(k_, ck, nb)
        vg = (oh[:, None, :, None]
              * neq.wkg[:, :, None, :]).reshape(k_, ck, ng)
        v = jnp.concatenate([vc, vi, vg], axis=2)
        t = jnp.einsum("kpq,kqr->kpr", kinv, v)
        s_corr = jnp.einsum("kpr,kps->rs", v, t)
        if stage == "corr":
            return jnp.sum(s_corr)
        wci_f = neq.wci.transpose(0, 2, 1, 3).reshape(na, nb)
        wcg_f = neq.wcg.transpose(0, 2, 1, 3).reshape(na, ng)
        wig_f = neq.wig.transpose(0, 2, 1, 3).reshape(nb, ng)
        top = jnp.concatenate([block_diag_dense(hcc), wci_f, wcg_f], axis=1)
        mid = jnp.concatenate([wci_f.T, block_diag_dense(hii), wig_f],
                              axis=1)
        bot = jnp.concatenate([wcg_f.T, wig_f.T, block_diag_dense(hgg)],
                              axis=1)
        amat = jnp.concatenate([top, mid, bot], axis=0) - s_corr
        if stage == "amat":
            return jnp.sum(amat)
        n = amat.shape[0]
        dd = jnp.sqrt(jnp.clip(jnp.diag(amat), 1e-30, None))
        a_n = amat / dd[:, None] / dd[None, :]
        ridge = jnp.asarray(10.0, amat.dtype) * jnp.finfo(amat.dtype).eps
        a_n = a_n + ridge * jnp.eye(n, dtype=amat.dtype)
        chol, lower = jax.scipy.linalg.cho_factor(a_n)
        if stage == "chol":
            return jnp.sum(chol)
        tk = jnp.einsum("kpq,kq->kp", kinv, neq.gk)
        g_base = jnp.concatenate([neq.gc.reshape(-1), neq.gi.reshape(-1),
                                  neq.gg.reshape(-1)])
        rhs = -(g_base - jnp.einsum("kpr,kp->r", v, tk))
        rhs_n = rhs / dd
        sol = jax.scipy.linalg.cho_solve((chol, lower), rhs_n)
        if stage == "solve1":
            return jnp.sum(sol)
        for _ in range(2):
            resid = rhs_n - a_n @ sol
            sol = sol + jax.scipy.linalg.cho_solve((chol, lower), resid)
        sol = sol / dd
        dxc = sol[:na].reshape(c_, a)
        dxi = sol[na:na + nb].reshape(i_, b_w)
        dxg = sol[na + nb:].reshape(g_, cg)
        rk = -neq.gk - jnp.einsum("kpr,r->kp", v, sol)
        dxk = jnp.einsum("kpq,kq->kp", kinv, rk)
        return sum(jnp.sum(x) for x in (dxc, dxi, dxg, dxk))

    def make_eval_solve(refine, with_corr=True):
        def f(pp):
            neq = neq_fn(pp, uv, mask, tpl, colmask)
            d = diag_fn(neq)
            damp = jax.tree_util.tree_map(lambda x: 1e-4 * x, d)
            dx = _mixed_solve_variant(neq, damp, refine, with_corr)
            return neq.cost + sum(jnp.sum(x) for x in
                                  jax.tree_util.tree_leaves(dx)) * 1e-30
        return f

    def _mixed_solve_variant(neq, damp, refine, with_corr):
        oh = jnp.asarray(onehot, dtype=neq.gc.dtype)
        c_, i_, g_ = neq.hcc.shape[0], neq.hii.shape[0], neq.hgg.shape[0]
        a, b_w = neq.hcc.shape[2], neq.hii.shape[2]
        cg = neq.hgg.shape[2]
        k_, ck = neq.hkk.shape[0], neq.hkk.shape[2]
        na, nb, ng = c_ * a, i_ * b_w, g_ * cg

        hcc = neq.hcc + jax.vmap(jnp.diag)(damp.cam)
        hii = neq.hii + jax.vmap(jnp.diag)(damp.im)
        hkk = neq.hkk + jax.vmap(jnp.diag)(damp.key)
        hgg = neq.hgg + jax.vmap(jnp.diag)(damp.grp)
        kinv = _normalized_inv(hkk)
        vc = neq.wck.transpose(1, 3, 0, 2).reshape(k_, ck, na)
        vi = neq.wik.transpose(1, 3, 0, 2).reshape(k_, ck, nb)
        vg = (oh[:, None, :, None]
              * neq.wkg[:, :, None, :]).reshape(k_, ck, ng)
        v = jnp.concatenate([vc, vi, vg], axis=2)
        t = jnp.einsum("kpq,kqr->kpr", kinv, v)
        wci_f = neq.wci.transpose(0, 2, 1, 3).reshape(na, nb)
        wcg_f = neq.wcg.transpose(0, 2, 1, 3).reshape(na, ng)
        wig_f = neq.wig.transpose(0, 2, 1, 3).reshape(nb, ng)
        top = jnp.concatenate([block_diag_dense(hcc), wci_f, wcg_f], axis=1)
        mid = jnp.concatenate([wci_f.T, block_diag_dense(hii), wig_f],
                              axis=1)
        bot = jnp.concatenate([wcg_f.T, wig_f.T, block_diag_dense(hgg)],
                              axis=1)
        amat = jnp.concatenate([top, mid, bot], axis=0)
        if with_corr:
            amat = amat - jnp.einsum("kpr,kps->rs", v, t)
        tk = jnp.einsum("kpq,kq->kp", kinv, neq.gk)
        g_base = jnp.concatenate([neq.gc.reshape(-1), neq.gi.reshape(-1),
                                  neq.gg.reshape(-1)])
        rhs = -(g_base - jnp.einsum("kpr,kp->r", v, tk))

        n = amat.shape[0]
        dd = jnp.sqrt(jnp.clip(jnp.diag(amat), 1e-30, None))
        a_n = amat / dd[:, None] / dd[None, :]
        ridge = jnp.asarray(10.0, amat.dtype) * jnp.finfo(amat.dtype).eps
        a_n = a_n + ridge * jnp.eye(n, dtype=amat.dtype)
        rhs_n = rhs / dd
        chol, lower = jax.scipy.linalg.cho_factor(a_n)
        sol = jax.scipy.linalg.cho_solve((chol, lower), rhs_n)
        for _ in range(refine):
            resid = rhs_n - a_n @ sol
            sol = sol + jax.scipy.linalg.cho_solve((chol, lower), resid)
        sol = sol / dd
        dxc = sol[:na].reshape(c_, a)
        dxi = sol[na:na + nb].reshape(i_, b_w)
        dxg = sol[na + nb:].reshape(g_, cg)
        rk = -neq.gk - jnp.einsum("kpr,r->kp", v, sol)
        dxk = jnp.einsum("kpq,kq->kp", kinv, rk)
        return MixedPieces(dxc, dxi, dxg, dxk)

    plist = perturbed(pieces, 4)
    variants = [
        ("eval(cost-only,DCE)", eval_cost_only),
        ("eval(forced)", eval_only),
        ("eval+damp", eval_damp),
        ("+kinv", make_eval_stage("kinv")),
        ("+v,s_corr", make_eval_stage("corr")),
        ("+amat", make_eval_stage("amat")),
        ("+cho_factor", make_eval_stage("chol")),
        ("+cho_solve1", make_eval_stage("solve1")),
        ("+refine2+backsub", make_eval_stage("full")),
    ]
    lo, hi = 3, 12
    for name, fn in variants:
        run = chained(fn, 1)
        run_n = chained(fn, 16)
        # compile both
        fetch_scalar(run(plist[0]))
        fetch_scalar(run_n(plist[0]))
        t1 = timed(run_n, plist)
        t0 = timed(run, plist)
        per = (t1 - t0) / 15.0
        log(f"{name:>24}: per-step {per * 1e3:.3f} ms")


if __name__ == "__main__":
    main()


def main2():
    """Variant A/B: closed-form 3x3 kinv; HIGH-precision reduced solve."""
    import jax
    import jax.numpy as jnp

    import bench as b
    from pycamset_tpu.optim.blocks import (Extrinsic3D, FreePoint,
                                           GroupRigidTform3d, Projection,
                                           RigidTform3d)
    from pycamset_tpu.optim.chain import OptimFunction
    from pycamset_tpu.optim.structured import block_diag_dense
    from pycamset_tpu.optim.structured_mixed import (
        make_mixed_structured_neq, mixed_chain_widths, make_mixed_ops)
    from pycamset_tpu.config import default_device_dtype

    _s, pieces, args, blocks = b.mixed_problem()
    uv, mask, tpl = args
    dtype = default_device_dtype()
    op_fun = OptimFunction([Projection(), Extrinsic3D(), RigidTform3d(),
                            GroupRigidTform3d(), FreePoint()])
    widths = mixed_chain_widths(op_fun)
    n_cams, n_ims = 16, 100
    k_pad = blocks.uv.shape[1]
    colmask, gok = b.mixed_colmask_groups(n_cams, n_ims, 361, k_pad, dtype)
    neq_fn = make_mixed_structured_neq(op_fun, widths, n_cams, n_ims,
                                       gok, 2)
    onehot = neq_fn.onehot
    diag_fn, _mv, _sv, _gd = make_mixed_ops(onehot)

    def inv3_closed(blocks_):
        d = jnp.sqrt(jnp.clip(jnp.diagonal(blocks_, axis1=-2, axis2=-1),
                              1e-30, None))
        m = blocks_ / d[..., :, None] / d[..., None, :]
        a00, a01, a02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
        a11, a12, a22 = m[..., 1, 1], m[..., 1, 2], m[..., 2, 2]
        c00 = a11 * a22 - a12 * a12
        c01 = a02 * a12 - a01 * a22
        c02 = a01 * a12 - a02 * a11
        c11 = a00 * a22 - a02 * a02
        c12 = a01 * a02 - a00 * a12
        c22 = a00 * a11 - a01 * a01
        det = a00 * c00 + a01 * c01 + a02 * c02
        inv = jnp.stack([
            jnp.stack([c00, c01, c02], -1),
            jnp.stack([c01, c11, c12], -1),
            jnp.stack([c02, c12, c22], -1)], -2) / det[..., None, None]
        return inv / d[..., :, None] / d[..., None, :]

    def force_all(neq):
        return sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(neq)) \
            * 1e-30

    def make_variant(kinv_mode, prec):
        def f(pp):
            neq = neq_fn(pp, uv, mask, tpl, colmask)
            d = diag_fn(neq)
            damp = jax.tree_util.tree_map(lambda x: 1e-4 * x, d)
            oh = jnp.asarray(onehot, dtype=neq.gc.dtype)
            c_, i_, g_ = (neq.hcc.shape[0], neq.hii.shape[0],
                          neq.hgg.shape[0])
            a, b_w = neq.hcc.shape[2], neq.hii.shape[2]
            cg = neq.hgg.shape[2]
            k_, ck = neq.hkk.shape[0], neq.hkk.shape[2]
            na, nb, ng = c_ * a, i_ * b_w, g_ * cg
            hcc = neq.hcc + jax.vmap(jnp.diag)(damp.cam)
            hii = neq.hii + jax.vmap(jnp.diag)(damp.im)
            hkk = neq.hkk + jax.vmap(jnp.diag)(damp.key)
            hgg = neq.hgg + jax.vmap(jnp.diag)(damp.grp)
            if kinv_mode == "closed":
                kinv = inv3_closed(hkk)
            else:
                from pycamset_tpu.optim.structured import _normalized_inv
                kinv = _normalized_inv(hkk)
            with jax.default_matmul_precision(prec):
                vc = neq.wck.transpose(1, 3, 0, 2).reshape(k_, ck, na)
                vi = neq.wik.transpose(1, 3, 0, 2).reshape(k_, ck, nb)
                vg = (oh[:, None, :, None]
                      * neq.wkg[:, :, None, :]).reshape(k_, ck, ng)
                v = jnp.concatenate([vc, vi, vg], axis=2)
                t = jnp.einsum("kpq,kqr->kpr", kinv, v)
                s_corr = jnp.einsum("kpr,kps->rs", v, t)
                wci_f = neq.wci.transpose(0, 2, 1, 3).reshape(na, nb)
                wcg_f = neq.wcg.transpose(0, 2, 1, 3).reshape(na, ng)
                wig_f = neq.wig.transpose(0, 2, 1, 3).reshape(nb, ng)
                top = jnp.concatenate(
                    [block_diag_dense(hcc), wci_f, wcg_f], axis=1)
                mid = jnp.concatenate(
                    [wci_f.T, block_diag_dense(hii), wig_f], axis=1)
                bot = jnp.concatenate(
                    [wcg_f.T, wig_f.T, block_diag_dense(hgg)], axis=1)
                amat = jnp.concatenate([top, mid, bot], axis=0) - s_corr
                n = amat.shape[0]
                dd = jnp.sqrt(jnp.clip(jnp.diag(amat), 1e-30, None))
                a_n = amat / dd[:, None] / dd[None, :]
                ridge = (jnp.asarray(10.0, amat.dtype)
                         * jnp.finfo(amat.dtype).eps)
                a_n = a_n + ridge * jnp.eye(n, dtype=amat.dtype)
                chol, lower = jax.scipy.linalg.cho_factor(a_n)
                tk = jnp.einsum("kpq,kq->kp", kinv, neq.gk)
                g_base = jnp.concatenate(
                    [neq.gc.reshape(-1), neq.gi.reshape(-1),
                     neq.gg.reshape(-1)])
                rhs = -(g_base - jnp.einsum("kpr,kp->r", v, tk))
                rhs_n = rhs / dd
                sol = jax.scipy.linalg.cho_solve((chol, lower), rhs_n)
                for _ in range(2):
                    resid = rhs_n - a_n @ sol
                    sol = sol + jax.scipy.linalg.cho_solve((chol, lower),
                                                           resid)
                sol = sol / dd
                rk = -neq.gk - jnp.einsum("kpr,r->kp", v, sol)
                dxk = jnp.einsum("kpq,kq->kp", kinv, rk)
            return (neq.cost + force_all(neq)
                    + (jnp.sum(sol) + jnp.sum(dxk)) * 1e-30)
        return f

    plist = perturbed(pieces, 4)
    variants = [
        ("lu-inv / highest", make_variant("lu", "highest")),
        ("closed / highest", make_variant("closed", "highest")),
        ("closed / high", make_variant("closed", "high")),
        ("closed / default", make_variant("closed", "default")),
    ]
    for name, fn in variants:
        run = chained_global(fn, 1)
        run_n = chained_global(fn, 16)
        fetch_scalar(run(plist[0]))
        fetch_scalar(run_n(plist[0]))
        t1 = timed(run_n, plist)
        t0 = timed(run, plist)
        log(f"{name:>20}: per-step {(t1 - t0) / 15.0 * 1e3:.3f} ms")


def chained_global(step_fn, n):
    import jax

    from pycamset_tpu.config import default_device_dtype
    dtype = default_device_dtype()

    @jax.jit
    def run(p):
        def step(pp, _):
            out = step_fn(pp)
            bump = (out * 1e-14).astype(dtype)
            return pp._replace(cam=pp.cam + bump), out
        _, outs = jax.lax.scan(step, p, None, length=n)
        return outs.sum()
    return run
