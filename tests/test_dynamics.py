"""Unit tests for the kinematic bicycle dynamics and analytic Jacobians.

The reference has no unit tests at this level (SURVEY.md §4); Jacobians are
validated against jax.jacfwd autodiff, the gold standard the reference lacks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ilqr_iterative_tasks_tpu.models import kinetic_bicycle as dyn


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def test_step_matches_closed_form(rng):
    x = jnp.asarray(rng.normal(size=4))
    u = jnp.asarray(rng.normal(size=2))
    dt = 0.7
    out = dyn.step(x, u, dt)
    arc = x[2] * dt + 0.5 * u[0] * dt**2
    expected = jnp.array([
        x[0] + jnp.cos(x[3]) * arc,
        x[1] + jnp.sin(x[3]) * arc,
        x[2] + u[0] * dt,
        x[3] + u[1] * dt,
    ])
    np.testing.assert_allclose(out, expected, rtol=1e-12)


def test_step_batched(rng):
    xs = jnp.asarray(rng.normal(size=(5, 3, 4)))
    us = jnp.asarray(rng.normal(size=(5, 3, 2)))
    out = dyn.step(xs, us, 1.0)
    for i in range(5):
        for j in range(3):
            np.testing.assert_allclose(out[i, j], dyn.step(xs[i, j], us[i, j], 1.0))


def test_jacobian_A_matches_autodiff(rng):
    dt = 1.0
    for _ in range(10):
        x = jnp.asarray(rng.normal(size=4))
        u = jnp.asarray(rng.normal(size=2))
        a_auto = jax.jacfwd(lambda xx: dyn.step(xx, u, dt))(x)
        a_analytic = dyn.jacobian_A(x[2], x[3], u[0], dt)
        np.testing.assert_allclose(a_analytic, a_auto, rtol=1e-10, atol=1e-12)


def test_jacobian_B_matches_autodiff(rng):
    dt = 0.5
    for _ in range(10):
        x = jnp.asarray(rng.normal(size=4))
        u = jnp.asarray(rng.normal(size=2))
        b_auto = jax.jacfwd(lambda uu: dyn.step(x, uu, dt))(u)
        b_analytic = dyn.jacobian_B(x[3], dt)
        np.testing.assert_allclose(b_analytic, b_auto, rtol=1e-10, atol=1e-12)


def test_jacobians_batched_over_horizon(rng):
    v = jnp.asarray(rng.normal(size=6))
    theta = jnp.asarray(rng.normal(size=6))
    accel = jnp.asarray(rng.normal(size=6))
    A = dyn.jacobian_A(v, theta, accel, 1.0)
    B = dyn.jacobian_B(theta, 1.0)
    assert A.shape == (6, 4, 4)
    assert B.shape == (6, 4, 2)
    for i in range(6):
        np.testing.assert_allclose(A[i], dyn.jacobian_A(v[i], theta[i], accel[i], 1.0))
        np.testing.assert_allclose(B[i], dyn.jacobian_B(theta[i], 1.0))
