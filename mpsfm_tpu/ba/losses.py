"""Robust loss functions (Ceres-compatible) for IRLS-weighted Gauss-Newton.

Matches the loss surface of the reference's BA
(mpsfm/sfm/mapper/bundle_adjustment.py:44-48,98-102,159-176):
TRIVIAL / CAUCHY / SOFT_L1, each with a scale ``a`` and an outer
``magnitude`` multiplier. ``rho(s)`` takes the *squared* residual norm s,
as in Ceres; the IRLS weight is ``rho'(s)``.
"""

from __future__ import annotations

import jax.numpy as jnp

TRIVIAL, SOFT_L1, CAUCHY = 0, 1, 2

LOSS_IDS = {"trivial": TRIVIAL, "softl1": SOFT_L1, "soft_l1": SOFT_L1, "SOFT_L1": SOFT_L1, "cauchy": CAUCHY}


def rho(loss_id: int, s, a):
    """Robust cost of squared residual s with scale a. loss_id is static."""
    a2 = jnp.maximum(a * a, 1e-12)
    if loss_id == TRIVIAL:
        return s
    if loss_id == SOFT_L1:
        return 2.0 * a2 * (jnp.sqrt(1.0 + s / a2) - 1.0)
    if loss_id == CAUCHY:
        return a2 * jnp.log1p(s / a2)
    raise ValueError(loss_id)


def rho_prime(loss_id: int, s, a):
    """d rho / d s — the IRLS weight."""
    a2 = jnp.maximum(a * a, 1e-12)
    if loss_id == TRIVIAL:
        return jnp.ones_like(s)
    if loss_id == SOFT_L1:
        return 1.0 / jnp.sqrt(1.0 + s / a2)
    if loss_id == CAUCHY:
        return 1.0 / (1.0 + s / a2)
    raise ValueError(loss_id)
