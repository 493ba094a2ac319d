"""Unit tests for the core iLQR solver: regularized inverse, Riccati backward
pass vs an independent NumPy oracle, and solve-level behavior.

Oracle semantics follow /root/reference/iterative_ilqr/control/
iterative_ilqr.py:88-130 (eigenvalue-clamp regularization, gain recursion),
re-derived here in plain NumPy as a test oracle.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ilqr_iterative_tasks_tpu.models import kinetic_bicycle as dyn
from ilqr_iterative_tasks_tpu.models.obstacle import Obstacle
from ilqr_iterative_tasks_tpu.ops import costs
from ilqr_iterative_tasks_tpu.ops import ilqr as oi
from ilqr_iterative_tasks_tpu.utils.params import IlqrParams, SystemLimits

DT = jnp.float64


@pytest.fixture
def params():
    return IlqrParams.make(dtype=DT)


@pytest.fixture
def limits():
    return SystemLimits.make(dtype=DT)


def _oracle_reg_inv(quu: np.ndarray, lamb: float) -> np.ndarray:
    evals, evecs = np.linalg.eigh(quu)
    evals = np.maximum(evals, 0.0) + lamb
    return evecs @ np.diag(1.0 / evals) @ evecs.T


def test_reg_inv_2x2_matches_eig_oracle():
    rng = np.random.default_rng(3)
    for _ in range(50):
        m = rng.normal(size=(2, 2))
        quu = m + m.T  # symmetric, possibly indefinite
        lamb = float(rng.uniform(0.01, 100.0))
        got = oi._reg_inv_2x2(jnp.asarray(quu), jnp.asarray(lamb))
        want = _oracle_reg_inv(quu, lamb)
        np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12)


def test_reg_inv_2x2_degenerate_eigenvalues():
    quu = np.diag([2.0, 2.0])
    got = oi._reg_inv_2x2(jnp.asarray(quu), jnp.asarray(0.5))
    np.testing.assert_allclose(got, np.diag([0.4, 0.4]), rtol=1e-12)


def _oracle_backward(xs, us, x_term, lamb, obstacle, params, limits, dt):
    """Independent NumPy Riccati recursion (iterative_ilqr.py:88-130 semantics)."""
    n = us.shape[0]
    f_x = np.asarray(dyn.jacobian_A(jnp.asarray(xs[1:, 2]), jnp.asarray(xs[1:, 3]),
                                    jnp.asarray(us[:, 0]), dt))
    f_u = np.asarray(dyn.jacobian_B(jnp.asarray(xs[1:, 3]), dt))
    l_u, l_uu, l_x, l_xx = [np.asarray(a) for a in costs.stage_cost_derivs(
        jnp.asarray(xs[:-1]), jnp.asarray(us), jnp.zeros(4, DT), obstacle,
        params, limits)]
    v_x, v_xx = [np.asarray(a) for a in costs.terminal_cost_derivs(
        jnp.asarray(xs[-1]), jnp.asarray(x_term), obstacle, params)]
    ks = np.zeros((n, 2))
    Ks = np.zeros((n, 2, 4))
    for i in range(n - 1, -1, -1):
        q_x = l_x[i] + f_x[i].T @ v_x
        q_u = l_u[i] + f_u[i].T @ v_x
        q_xx = l_xx[i] + f_x[i].T @ v_xx @ f_x[i]
        q_uu = l_uu[i] + f_u[i].T @ v_xx @ f_u[i]
        q_ux = f_u[i].T @ v_xx @ f_x[i]
        quu_inv = _oracle_reg_inv(q_uu, lamb)
        ks[i] = -quu_inv @ q_u
        Ks[i] = -quu_inv @ q_ux
        v_x = q_x - Ks[i].T @ q_uu @ ks[i]
        v_xx = q_xx - Ks[i].T @ q_uu @ Ks[i]
    return ks, Ks


def test_backward_pass_matches_numpy_oracle(params, limits):
    rng = np.random.default_rng(4)
    dt = 1.0
    obstacle = Obstacle.make(31.0, -2.0, 8.0, 6.0, dtype=DT)
    x0 = np.zeros(4)
    us = rng.uniform(-1, 1, size=(6, 2))
    xs = np.asarray(oi.rollout(jnp.asarray(x0), jnp.asarray(us), dt))
    x_term = xs[-1] + rng.normal(size=4) * 0.5
    lamb = 1.0
    ks, Ks = oi.backward_pass(jnp.asarray(xs), jnp.asarray(us),
                              jnp.asarray(x_term), jnp.zeros(4, DT),
                              jnp.asarray(lamb), obstacle, params, limits,
                              jnp.asarray(dt))
    ks_o, Ks_o = _oracle_backward(xs, us, x_term, lamb, obstacle, params,
                                  limits, dt)
    np.testing.assert_allclose(ks, ks_o, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(Ks, Ks_o, rtol=1e-8, atol=1e-10)


def test_ilqr_reaches_reachable_terminal(params, limits):
    obstacle = Obstacle.absent(dtype=DT)
    x0 = jnp.zeros(4, DT)
    # terminal state from a feasible rollout => exactly reachable
    us_true = jnp.asarray(np.random.default_rng(5).uniform(-0.5, 0.5, (6, 2)))
    x_term = oi.rollout(x0, us_true, 1.0)[-1]
    sol = oi.ilqr_solve(params, limits, obstacle, x0, x_term,
                        jnp.zeros((6, 2), DT), 1.0, 1.0, num_horizon=6)
    assert float(jnp.linalg.norm(sol.xs[-1] - x_term)) < 0.5
    # returned xs must be the rollout of returned us
    np.testing.assert_allclose(sol.xs, oi.rollout(x0, sol.us, 1.0), rtol=1e-12)


def test_ilqr_inputs_clipped(params, limits):
    obstacle = Obstacle.absent(dtype=DT)
    x0 = jnp.zeros(4, DT)
    x_term = jnp.asarray([200.0, 0.0, 0.0, 0.0], DT)  # far => wants huge accel
    sol = oi.ilqr_solve(params, limits, obstacle, x0, x_term,
                        jnp.zeros((6, 2), DT), 1.0, 1.0, num_horizon=6)
    assert float(jnp.max(jnp.abs(sol.us[:, 0]))) <= float(limits.a_max) + 1e-12
    assert float(jnp.max(jnp.abs(sol.us[:, 1]))) <= float(limits.delta_max_r) + 1e-12


def test_ilqr_candidate_batch_matches_single(params, limits):
    obstacle = Obstacle.make(31.0, -2.0, 8.0, 6.0, dtype=DT)
    x0 = jnp.zeros(4, DT)
    rng = np.random.default_rng(6)
    xts = jnp.asarray(rng.uniform(0, 10, size=(4, 4)))
    u0 = jnp.zeros((6, 2), DT)
    batch = oi.ilqr_solve_candidates(params, limits, obstacle, x0, xts, u0,
                                     1.0, 1.0, num_horizon=6)
    for j in range(4):
        single = oi.ilqr_solve(params, limits, obstacle, x0, xts[j], u0,
                               1.0, 1.0, num_horizon=6)
        np.testing.assert_allclose(batch.us[j], single.us, rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(batch.cost[j], single.cost, rtol=1e-9, atol=1e-12)
