"""Pallas dense SPD solve (ops/pallas_cholesky.py): interpret-mode parity.

The kernel replaces XLA's latency-bound Cholesky/TriangularSolve inside
`_psd_solve` on TPU; here its algorithm runs in interpret mode on the CPU
backend against float64 numpy solves. Compiled-Mosaic behaviour is covered
by the chip tier (tests/test_tpu_hardware.py)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pycamset_tpu.ops.pallas_cholesky import (
    BLK, MAX_N, pallas_psd_solve, use_pallas_psd)


def _normalized_spd(n, cond, seed=0):
    """Unit-diagonal SPD with the given spectral condition, plus the
    production ridge (what _psd_solve hands the kernel)."""
    rng = np.random.default_rng(seed)
    q, _ = np.linalg.qr(rng.normal(size=(n, n)))
    ev = np.logspace(0, -np.log10(cond), n)
    a = (q * ev) @ q.T
    d = np.sqrt(np.diag(a))
    a_n = a / d[:, None] / d[None, :]
    a_n = a_n + 10 * np.finfo(np.float32).eps * np.eye(n)
    return a_n, rng.normal(size=n)


@pytest.mark.parametrize("n,cond,tol", [
    (64, 1e3, 1e-4),       # single panel, interior padding
    (128, 1e2, 1e-4),      # exactly one panel
    (200, 1e4, 1e-3),      # two panels, ragged
    (384, 1e6, 2e-2),      # three panels, f32-hard conditioning
])
def test_interpret_parity_vs_float64(n, cond, tol):
    a_n, rhs = _normalized_spd(n, cond)
    x = np.asarray(pallas_psd_solve(jnp.asarray(a_n, jnp.float32),
                                    jnp.asarray(rhs, jnp.float32),
                                    interpret=True))
    x_ref = np.linalg.solve(a_n, rhs)
    rel = np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref)
    assert rel < tol, f"n={n} cond={cond:.0e}: rel err {rel:.2e}"


def test_zero_rhs_gives_zero_solution():
    a_n, _ = _normalized_spd(200, 1e3)
    x = np.asarray(pallas_psd_solve(jnp.asarray(a_n, jnp.float32),
                                    jnp.zeros(200, jnp.float32),
                                    interpret=True))
    np.testing.assert_array_equal(x, 0.0)


def test_residual_fallback_takes_xla_path_on_hostile_system():
    """A numerically-broken system (NaN entry) must trip the in-kernel
    residual check and route through the fallback."""
    a_n, rhs = _normalized_spd(128, 1e2)
    a_bad = a_n.copy()
    a_bad[3, 5] = a_bad[5, 3] = np.nan
    calls = []

    def fallback(a, b):
        calls.append(1)
        return jnp.zeros_like(b) + 7.0

    x = np.asarray(pallas_psd_solve(jnp.asarray(a_bad, jnp.float32),
                                    jnp.asarray(rhs, jnp.float32),
                                    interpret=True, fallback=fallback))
    assert calls, "fallback branch was never traced"
    np.testing.assert_allclose(x, 7.0)

    # ... and a healthy system must NOT take it
    x_ok = np.asarray(pallas_psd_solve(jnp.asarray(a_n, jnp.float32),
                                       jnp.asarray(rhs, jnp.float32),
                                       interpret=True, fallback=fallback))
    x_ref = np.linalg.solve(a_n, rhs)
    assert np.linalg.norm(x_ok - x_ref) / np.linalg.norm(x_ref) < 1e-3


def test_matches_xla_psd_solve_semantics():
    """End parity with the production _psd_solve contract: same problem
    through the raw (unnormalised) interface, kernel vs XLA path."""
    from pycamset_tpu.optim.structured import _cho_refine_solve, _psd_solve
    rng = np.random.default_rng(3)
    n = 200
    base = rng.normal(size=(n, n + 16))
    amat = base @ base.T / n + np.diag(np.abs(rng.normal(size=n)) * 5)
    rhs = rng.normal(size=n)

    # the XLA production path (CPU backend dispatches to it)
    x_xla = np.asarray(_psd_solve(jnp.asarray(amat), jnp.asarray(rhs)))

    # the kernel on the normalised system, as _psd_solve would call it
    d = np.sqrt(np.diag(amat))
    a_n = amat / d[:, None] / d[None, :]
    a_n = a_n + 10 * np.finfo(np.float64).eps * np.eye(n)
    x_k = np.asarray(pallas_psd_solve(
        jnp.asarray(a_n, jnp.float32), jnp.asarray(rhs / d, jnp.float32),
        interpret=True, fallback=_cho_refine_solve)) / d
    np.testing.assert_allclose(x_k, x_xla, rtol=2e-4, atol=1e-7)


def test_dispatch_rule():
    """The kernel is OPT-IN (measured net-negative inside the LM loop);
    even opted in, the backend/dtype/size gates hold."""
    assert not use_pallas_psd(512, jnp.float32)  # no opt-in
    import os
    os.environ["PYCAMSET_PALLAS_CHOL"] = "1"
    try:
        on_tpu = jax.default_backend() == "tpu"
        assert use_pallas_psd(512, jnp.float32) == on_tpu
        assert not use_pallas_psd(MAX_N + BLK, jnp.float32)
        assert not use_pallas_psd(512, jnp.float64)
    finally:
        del os.environ["PYCAMSET_PALLAS_CHOL"]
