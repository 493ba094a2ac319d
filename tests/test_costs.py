"""Unit tests for the barrier cost stack against autodiff oracles.

Semantics under test mirror /root/reference/iterative_ilqr/control/
ilqr_helper.py: exponential repelling barriers with Gauss-Newton Hessians.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ilqr_iterative_tasks_tpu.models.obstacle import Obstacle
from ilqr_iterative_tasks_tpu.ops import costs
from ilqr_iterative_tasks_tpu.utils.params import IlqrParams, SystemLimits

DT = jnp.float64


@pytest.fixture
def params():
    return IlqrParams.make(dtype=DT)


@pytest.fixture
def limits():
    return SystemLimits.make(dtype=DT)


def _ctrl_barrier_scalar(u, params, limits):
    """Sum of the 4 input-bound barrier values b = q1*e^{q2 c}."""
    q1, q2 = params.tuning_ctrl_q1, params.tuning_ctrl_q2
    a_max, d_max = limits.a_max, limits.delta_max_r
    c = jnp.array([u[0] - a_max, -a_max - u[0], u[1] - d_max, -d_max - u[1]])
    return jnp.sum(q1 * jnp.exp(q2 * c))


def test_control_barrier_grad_matches_autodiff(params, limits):
    rng = np.random.default_rng(0)
    for _ in range(10):
        u = jnp.asarray(rng.uniform(-2, 2, size=2))
        b_dot, b_ddot = costs.control_barrier_derivs(u, params, limits)
        g = jax.grad(_ctrl_barrier_scalar)(u, params, limits)
        np.testing.assert_allclose(b_dot, g, rtol=1e-10)
        # exact Hessian == GN Hessian here because each c is linear in u
        h = jax.hessian(_ctrl_barrier_scalar)(u, params, limits)
        np.testing.assert_allclose(b_ddot, h, rtol=1e-10)


def _obs_barrier_scalar(pos, off, obstacle, params):
    q1, q2 = params.tuning_obs_q1, params.tuning_obs_q2
    cx, cy = obstacle.center_at(off)
    h = (1.0 + params.safety_margin
         - ((pos[0] - cx) ** 2 / obstacle.width ** 2
            + (pos[1] - cy) ** 2 / obstacle.height ** 2))
    return q1 * jnp.exp(q2 * h)


@pytest.mark.parametrize("moving_option,spd", [(0, 0.0), (1, 1.0), (2, 0.2)])
def test_obstacle_barrier_grad_matches_autodiff(params, moving_option, spd):
    obstacle = Obstacle.make(31.0, -2.0, 8.0, 6.0, spd=spd,
                             moving_option=moving_option, dtype=DT)
    rng = np.random.default_rng(1)
    for off in [0.0, 3.0]:
        pos = jnp.asarray(rng.uniform(20, 40, size=2))
        b_dot, b_ddot = costs.obstacle_barrier_derivs(
            pos[0], pos[1], jnp.asarray(off, DT), obstacle, params)
        g = jax.grad(_obs_barrier_scalar)(pos, jnp.asarray(off, DT), obstacle, params)
        np.testing.assert_allclose(b_dot[:2], g, rtol=1e-9)
        np.testing.assert_allclose(b_dot[2:], 0.0)
        # Gauss-Newton Hessian: q1 q2^2 e^{q2 h} h_dot h_dot^T (not the exact
        # Hessian — the reference drops the curvature term, ilqr_helper.py:63)
        q1, q2 = params.tuning_obs_q1, params.tuning_obs_q2
        hd = g / (q2 * _obs_barrier_scalar(pos, jnp.asarray(off, DT), obstacle, params))
        gn = (q1 * q2 ** 2 * jnp.exp(
            q2 * (jnp.log(_obs_barrier_scalar(pos, jnp.asarray(off, DT), obstacle,
                                              params) / q1) / q2))
              ) * jnp.outer(hd, hd)
        np.testing.assert_allclose(b_ddot[:2, :2], gn, rtol=1e-8)


def test_absent_obstacle_contributes_nothing(params):
    absent = Obstacle.absent(dtype=DT)
    b_dot, b_ddot = costs.obstacle_barrier_derivs(
        jnp.asarray(31.0, DT), jnp.asarray(-2.0, DT), jnp.asarray(0.0, DT),
        absent, params)
    np.testing.assert_allclose(b_dot, 0.0)
    np.testing.assert_allclose(b_ddot, 0.0)


def test_moving_obstacle_extrapolation(params):
    up = Obstacle.make(10.0, 5.0, 2.0, 2.0, spd=1.5, moving_option=1, dtype=DT)
    cx, cy = up.center_at(jnp.asarray(4.0, DT))
    assert float(cx) == 10.0 and float(cy) == pytest.approx(5.0 + 6.0)
    left = Obstacle.make(10.0, 5.0, 2.0, 2.0, spd=0.5, moving_option=2, dtype=DT)
    cx, cy = left.center_at(jnp.asarray(4.0, DT))
    assert float(cx) == pytest.approx(8.0) and float(cy) == 5.0


def test_trajectory_cost_default_weights_terminal_only(params):
    rng = np.random.default_rng(2)
    xs = jnp.asarray(rng.normal(size=(7, 4)))
    us = jnp.asarray(rng.normal(size=(6, 2)))
    x_term = jnp.asarray(rng.normal(size=4))
    c = costs.trajectory_cost(xs, us, x_term, jnp.zeros(4, DT), params)
    d = xs[-1] - x_term
    np.testing.assert_allclose(
        c, d @ params.matrix_Qterminal @ d, rtol=1e-12)
