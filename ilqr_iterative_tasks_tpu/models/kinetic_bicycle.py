"""Kinematic bicycle dynamics, TPU-native (pure jnp, shape-polymorphic).

Discrete-time model with second-order position update:

    x'     = x + cos(theta) * (v*dt + a*dt^2/2)
    y'     = y + sin(theta) * (v*dt + a*dt^2/2)
    v'     = v + a*dt
    theta' = theta + delta*dt

Behavioral parity: /root/reference/iterative_ilqr/systems/kinetic_bicycle.py:10-52.
All functions broadcast over arbitrary leading batch dimensions, so the same
code serves the scalar plant step, the horizon-vectorized Jacobian stack, and
vmapped candidate/scenario batches.
"""

from __future__ import annotations

import jax.numpy as jnp


def step(x: jnp.ndarray, u: jnp.ndarray, dt) -> jnp.ndarray:
    """One discrete dynamics step. x: (..., 4), u: (..., 2) -> (..., 4)."""
    px, py, v, theta = x[..., 0], x[..., 1], x[..., 2], x[..., 3]
    accel, delta = u[..., 0], u[..., 1]
    arc = v * dt + 0.5 * accel * dt * dt
    return jnp.stack(
        [
            px + jnp.cos(theta) * arc,
            py + jnp.sin(theta) * arc,
            v + accel * dt,
            theta + delta * dt,
        ],
        axis=-1,
    )


def jacobian_A(v, theta, accel, dt) -> jnp.ndarray:
    """df/dx evaluated at (v, theta, accel). Inputs (...,) -> (..., 4, 4).

    NOTE the reference evaluates these at the *successor* state's (v, theta)
    paired with the current input's accel (kinetic_bicycle.py:30-43 called from
    iterative_ilqr.py:92-98 with ``xvar[:, 1:]``). Callers choose what to pass;
    this function is evaluation-point agnostic.
    """
    z = jnp.zeros_like(v)
    o = jnp.ones_like(v)
    arc = v * dt + 0.5 * accel * dt * dt
    row0 = jnp.stack([o, z, jnp.cos(theta) * dt, -arc * jnp.sin(theta)], axis=-1)
    row1 = jnp.stack([z, o, jnp.sin(theta) * dt, arc * jnp.cos(theta)], axis=-1)
    row2 = jnp.stack([z, z, o, z], axis=-1)
    row3 = jnp.stack([z, z, z, o], axis=-1)
    return jnp.stack([row0, row1, row2, row3], axis=-2)


def jacobian_B(theta, dt) -> jnp.ndarray:
    """df/du evaluated at theta. Inputs (...,) -> (..., 4, 2)."""
    z = jnp.zeros_like(theta)
    o = jnp.ones_like(theta)
    half_dt2 = 0.5 * dt * dt
    row0 = jnp.stack([half_dt2 * jnp.cos(theta), z], axis=-1)
    row1 = jnp.stack([half_dt2 * jnp.sin(theta), z], axis=-1)
    row2 = jnp.stack([dt * o, z], axis=-1)
    row3 = jnp.stack([z, dt * o], axis=-1)
    return jnp.stack([row0, row1, row2, row3], axis=-2)
