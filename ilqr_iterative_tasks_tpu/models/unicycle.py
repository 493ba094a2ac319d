"""Unicycle (differential-drive) dynamics — nonlinear second system.

Beyond-the-reference capability (the reference is bicycle-only): a 3-state
nonholonomic model exercising the generic solver's autodiff-Jacobian path on
a nonlinear system with a different state dimension than the bicycle.

State x = [px, py, theta]; input u = [v, omega].
"""

from __future__ import annotations

import jax.numpy as jnp

X_DIM = 3
U_DIM = 2


def step(x: jnp.ndarray, u: jnp.ndarray, dt) -> jnp.ndarray:
    """One discrete step. x: (..., 3), u: (..., 2) -> (..., 3)."""
    px, py, theta = x[..., 0], x[..., 1], x[..., 2]
    v, omega = u[..., 0], u[..., 1]
    return jnp.stack(
        [
            px + v * jnp.cos(theta) * dt,
            py + v * jnp.sin(theta) * dt,
            theta + omega * dt,
        ],
        axis=-1,
    )


def step_comps(x, u, dt):
    """Component-tuple form for the SoA generic solver
    (ops/generic_ilqr_soa.py): x = (px, py, theta), u = (v, omega)."""
    px, py, theta = x
    v, omega = u
    return (px + v * jnp.cos(theta) * dt,
            py + v * jnp.sin(theta) * dt,
            theta + omega * dt)
