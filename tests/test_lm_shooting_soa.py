"""SoA LM-shooting solver vs the AoS reference path (ops/lm_shooting.py).

The SoA solver reassociates the LM linear solve (dual-space Cholesky vs
primal LU), so iterates are not bitwise-equal; in f64 the two must agree on
every feasibility decision, with matching solutions at feasible lanes.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ilqr_iterative_tasks_tpu.models.obstacle import Obstacle
from ilqr_iterative_tasks_tpu.ops.lm_shooting import (
    lm_feasibility_solve_candidates)
from ilqr_iterative_tasks_tpu.ops.lm_shooting_soa import (
    lm_feasibility_solve_soa)
from ilqr_iterative_tasks_tpu.utils.params import SystemLimits

F64 = jnp.float64


def _candidates(key, num, dtype):
    """Reachable-ish terminal states ~N steps ahead of x0 plus noise."""
    ks = jax.random.split(key, 3)
    base = jnp.asarray([9.0, -1.0, 2.0, -0.2], dtype)
    spread = jnp.asarray([6.0, 3.0, 1.5, 0.5], dtype)
    xt = base + spread * jax.random.uniform(ks[0], (num, 4), dtype,
                                            minval=-1.0, maxval=1.0)
    u0 = 0.3 * jax.random.normal(ks[1], (num, 6, 2), dtype)
    return xt, u0


@pytest.mark.parametrize("present", [True, False])
def test_soa_matches_aos_decisions_f64(present):
    limits = SystemLimits.make(dtype=F64)
    obstacle = Obstacle.make(8.0, -1.0, 4.0, 3.0, present=present, dtype=F64)
    x0 = jnp.asarray([0.0, 0.0, 1.0, 0.0], F64)
    xt, u0 = _candidates(jax.random.PRNGKey(0), 24, F64)

    aos = lm_feasibility_solve_candidates(limits, obstacle, x0, xt, u0, 1.0,
                                          num_horizon=6)
    soa = lm_feasibility_solve_soa(limits, obstacle, x0, xt.T,
                                   jnp.moveaxis(u0, 0, -1), 1.0,
                                   num_horizon=6)
    assert np.array_equal(np.asarray(aos.feasible), np.asarray(soa.feasible))
    feas = np.asarray(aos.feasible)
    if feas.any():
        np.testing.assert_allclose(np.asarray(soa.term_err)[feas],
                                   np.asarray(aos.term_err)[feas], atol=1e-8)
        us_aos = np.moveaxis(np.asarray(aos.us), 0, -1)  # (N, 2, K)
        np.testing.assert_allclose(np.asarray(soa.us)[..., feas],
                                   us_aos[..., feas], atol=1e-5)
    # infeasible lanes: both sides must agree the residual is not driven to 0
    np.testing.assert_allclose(np.asarray(soa.max_violation),
                               np.asarray(aos.max_violation),
                               atol=1e-6)


def test_soa_moving_obstacle_and_bounds_f64():
    """Moving obstacle + a terminal state far enough to saturate inputs."""
    limits = SystemLimits.make(dtype=F64)
    obstacle = Obstacle.make(6.0, 0.0, 3.0, 3.0, spd=0.5, moving_option=1,
                             dtype=F64)
    x0 = jnp.asarray([0.0, 0.0, 0.5, 0.0], F64)
    xt = jnp.asarray([[10.0, 0.5, 1.5, 0.0],
                      [60.0, 0.0, 9.0, 0.0],   # needs a > a_max: infeasible
                      [7.0, -2.0, 1.0, -0.3]], F64)
    u0 = jnp.zeros((3, 6, 2), F64)
    aos = lm_feasibility_solve_candidates(limits, obstacle, x0, xt, u0, 1.0,
                                          num_horizon=6)
    soa = lm_feasibility_solve_soa(limits, obstacle, x0, xt.T,
                                   jnp.moveaxis(u0, 0, -1), 1.0,
                                   num_horizon=6)
    assert np.array_equal(np.asarray(aos.feasible), np.asarray(soa.feasible))
    assert not bool(np.asarray(aos.feasible)[1])


def test_soa_multidim_batch_shape():
    limits = SystemLimits.make(dtype=F64)
    obstacle = Obstacle.make(8.0, -1.0, 4.0, 3.0, dtype=F64)
    x0 = jnp.asarray([0.0, 0.0, 1.0, 0.0], F64)
    xt, u0 = _candidates(jax.random.PRNGKey(3), 12, F64)
    sol_flat = lm_feasibility_solve_soa(limits, obstacle, x0, xt.T,
                                        jnp.moveaxis(u0, 0, -1), 1.0,
                                        num_horizon=6)
    xt2 = xt.T.reshape(4, 3, 4)
    u2 = jnp.moveaxis(u0, 0, -1).reshape(6, 2, 3, 4)
    sol_2d = lm_feasibility_solve_soa(limits, obstacle, x0, xt2, u2, 1.0,
                                      num_horizon=6)
    np.testing.assert_array_equal(
        np.asarray(sol_flat.feasible).reshape(3, 4),
        np.asarray(sol_2d.feasible))
    np.testing.assert_allclose(np.asarray(sol_flat.term_err).reshape(3, 4),
                               np.asarray(sol_2d.term_err), rtol=1e-12)
