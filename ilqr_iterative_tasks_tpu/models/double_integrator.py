"""Planar double-integrator dynamics — second system for the generic solver.

Beyond-the-reference capability: the reference is single-system (only the
kinematic bicycle exists, `/root/reference/iterative_ilqr/systems/
kinetic_bicycle.py`). This model plugs into `ops/generic_ilqr.py` unchanged,
demonstrating the framework's system-agnostic solver API.

State x = [px, py, vx, vy]; input u = [ax, ay]; exact discrete (2nd-order)
position update, matching the bicycle model's integration order.
"""

from __future__ import annotations

import jax.numpy as jnp

X_DIM = 4
U_DIM = 2


def step(x: jnp.ndarray, u: jnp.ndarray, dt) -> jnp.ndarray:
    """One discrete step. x: (..., 4), u: (..., 2) -> (..., 4)."""
    px, py, vx, vy = x[..., 0], x[..., 1], x[..., 2], x[..., 3]
    ax, ay = u[..., 0], u[..., 1]
    return jnp.stack(
        [
            px + vx * dt + 0.5 * ax * dt * dt,
            py + vy * dt + 0.5 * ay * dt * dt,
            vx + ax * dt,
            vy + ay * dt,
        ],
        axis=-1,
    )


def step_comps(x, u, dt):
    """Component-tuple form for the SoA generic solver
    (ops/generic_ilqr_soa.py): x = (px, py, vx, vy), u = (ax, ay) as
    batch-trailing arrays."""
    px, py, vx, vy = x
    ax, ay = u
    return (px + vx * dt + 0.5 * ax * dt * dt,
            py + vy * dt + 0.5 * ay * dt * dt,
            vx + ax * dt,
            vy + ay * dt)
