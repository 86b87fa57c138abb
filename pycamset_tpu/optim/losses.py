"""Robust loss functions for the bundle adjustment (IRLS weighting).

Definitions follow scipy.optimize.least_squares' loss/f_scale forms, but
applied PER 2D OBSERVATION (s = ||r_i||^2 over the u,v pair — the standard
BA convention, as in Ceres), whereas scipy applies rho per residual
COMPONENT. The divergence is bounded and measured
(tests/test_robust_loss.py::test_device_vs_scipy_robust_semantics_bounded):
every shipped rho is concave with rho(0)=0, so pointwise
rho(ru^2+rv^2) <= rho(ru^2)+rho(rv^2) <= 2*rho(ru^2+rv^2) — the two
objectives agree within a factor of 2, exactly on huber inliers, and the
gap concentrates in (downweighted) outliers. On the 5%-outlier benchmark
problem the device IRLS argmin evaluates BETTER under scipy's own
per-component objective than scipy TRF's own solution at the default
budget (ratios 0.29 huber / 0.09 cauchy): scipy's robust path is the
weaker oracle, not a stricter one; backend='scipy' keeps scipy's
per-component semantics for exact reference parity under loss='linear'.
With z = s / f_scale^2 where s = ||r_i||^2 per observation,

    linear : rho(z) = z            w = 1
    huber  : z <= 1: z, else 2*sqrt(z)-1        w = min(1, 1/sqrt(z))
    soft_l1: 2*(sqrt(1+z)-1)                    w = 1/sqrt(1+z)
    cauchy : ln(1+z)                            w = 1/(1+z)

The damped normal equations use the reweighted Gauss-Newton form
JtWJ / JtWr (sqrt(w) folded into J and r); the LM gain ratio uses the true
robust cost f_scale^2 * sum rho(z). The reference carries loss="cauchy"
only as a commented-out option (optimisation_handling.py:96); here it is a
first-class capability of both backends.
"""
from __future__ import annotations

import jax.numpy as jnp

LOSSES = ("linear", "huber", "soft_l1", "cauchy")
LOSS_SEMANTICS = ("observation", "component")


def check_loss_semantics(value: str) -> str:
    """Validate a loss_semantics option (typos must raise, not silently
    fall back to the default convention)."""
    if value not in LOSS_SEMANTICS:
        raise ValueError(
            f"unknown loss_semantics {value!r}; options: {LOSS_SEMANTICS}")
    return value


def make_loss(loss: str = "linear", f_scale: float = 1.0):
    """(rho_fn, weight_fn) on a squared residual s.

    rho_fn returns the robust cost (already rescaled by f_scale^2 so costs
    are comparable with the linear loss); weight_fn the IRLS weight to fold
    into the normal equations. The SEMANTICS — whether s is each squared
    component (default: scipy convention, bitwise reference parity) or the
    per-observation ||r_i||^2 (Ceres convention) — is chosen by the caller
    via ``loss_semantics`` on the gram/neq builders ("component" or
    "observation"); the rho/weight forms are identical either way.
    """
    if loss not in LOSSES:
        raise ValueError(f"unknown loss {loss!r}; options: {LOSSES}")
    c2 = float(f_scale) ** 2

    if loss == "linear":
        return (lambda s: s), (lambda s: jnp.ones_like(s))

    if loss == "huber":
        def rho(s):
            z = s / c2
            return c2 * jnp.where(z <= 1.0, z, 2.0 * jnp.sqrt(z) - 1.0)

        def weight(s):
            z = jnp.maximum(s / c2, 1e-30)
            return jnp.minimum(1.0, 1.0 / jnp.sqrt(z))
        return rho, weight

    if loss == "soft_l1":
        def rho(s):
            return c2 * 2.0 * (jnp.sqrt(1.0 + s / c2) - 1.0)

        def weight(s):
            return 1.0 / jnp.sqrt(1.0 + s / c2)
        return rho, weight

    # cauchy
    def rho(s):
        return c2 * jnp.log1p(s / c2)

    def weight(s):
        return 1.0 / (1.0 + s / c2)
    return rho, weight
