"""Equivalence tests: SoA (batch-trailing, scalarized) solver and batch-native
simulator vs the reference-parity AoS implementations."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ilqr_iterative_tasks_tpu.control.batched_soa import (
    SoaScenarios, simulate_learning_runs_soa)
from ilqr_iterative_tasks_tpu.models.obstacle import Obstacle
from ilqr_iterative_tasks_tpu.ops.ilqr import ilqr_solve_candidates
from ilqr_iterative_tasks_tpu.ops.ilqr_soa import ilqr_solve_soa
from ilqr_iterative_tasks_tpu.sim.seed import seed_trajectory
from ilqr_iterative_tasks_tpu.utils.params import IlqrParams, SystemLimits

DT = jnp.float64


@pytest.mark.parametrize("obstacle_kind", ["static", "moving_up",
                                           "moving_left", "absent"])
def test_soa_solver_matches_aos_f64(obstacle_kind):
    params = IlqrParams.make(dtype=DT)
    limits = SystemLimits.make(dtype=DT)
    if obstacle_kind == "static":
        obs = Obstacle.make(31.0, -2.0, 8.0, 6.0, dtype=DT)
    elif obstacle_kind == "moving_up":
        obs = Obstacle.make(31.0, -2.0, 8.0, 6.0, spd=1.0, moving_option=1,
                            dtype=DT)
    elif obstacle_kind == "moving_left":
        obs = Obstacle.make(31.0, -2.0, 8.0, 6.0, spd=0.5, moving_option=2,
                            dtype=DT)
    else:
        obs = Obstacle.absent(dtype=DT)
    x0 = jnp.zeros(4, DT)
    rng = np.random.default_rng(0)
    bsz = 16
    xts = jnp.asarray(rng.uniform(0, 30, (bsz, 4)), DT)
    u0 = jnp.zeros((6, 2), DT)
    ref = ilqr_solve_candidates(params, limits, obs, x0, xts, u0, 1.0, 1.0,
                                num_horizon=6)
    soa = ilqr_solve_soa(params, limits, obs, x0, xts.T,
                         jnp.zeros((6, 2, bsz), DT), 1.0, 1.0, num_horizon=6)
    us_soa = np.moveaxis(np.asarray(soa.us), 2, 0)
    xs_soa = np.moveaxis(np.asarray(soa.xs), 2, 0)
    np.testing.assert_allclose(us_soa, np.asarray(ref.us), atol=1e-9)
    np.testing.assert_allclose(xs_soa, np.asarray(ref.xs), atol=1e-8)
    np.testing.assert_allclose(np.asarray(soa.cost), np.asarray(ref.cost),
                               rtol=1e-6, atol=1e-7)


def test_soa_solver_2d_batch_shape():
    """(K, B) batch shape — the layout used inside the batch-native sim."""
    params = IlqrParams.make(dtype=DT)
    limits = SystemLimits.make(dtype=DT)
    obs = Obstacle.make(31.0, -2.0, 8.0, 6.0, dtype=DT)
    x0 = jnp.zeros(4, DT)
    rng = np.random.default_rng(1)
    xts = jnp.asarray(rng.uniform(0, 20, (4, 3, 5)), DT)
    sol = ilqr_solve_soa(params, limits, obs, x0, xts,
                         jnp.zeros((6, 2, 3, 5), DT), 1.0, 1.0, num_horizon=6)
    assert sol.us.shape == (6, 2, 3, 5)
    # flattening must be equivalent
    flat = ilqr_solve_soa(params, limits, obs, x0, xts.reshape(4, 15),
                          jnp.zeros((6, 2, 15), DT), 1.0, 1.0, num_horizon=6)
    np.testing.assert_allclose(np.asarray(sol.us).reshape(6, 2, 15),
                               np.asarray(flat.us), atol=1e-12)


@pytest.mark.slow
def test_soa_simulator_matches_host_lap_sequence():
    dtype = jnp.float32
    params = IlqrParams.make(dtype=dtype)
    limits = SystemLimits.make(dtype=dtype)
    xcl, ucl = seed_trajectory(1.0)
    seed_xs = jnp.zeros((128, 4), dtype).at[:121].set(jnp.asarray(xcl, dtype))
    seed_us = jnp.zeros((128, 2), dtype).at[:120].set(jnp.asarray(ucl, dtype))
    obs = Obstacle.make(31.0, -2.0, 8.0, 6.0, dtype=dtype)
    scs = SoaScenarios.broadcast(np.zeros(4), xcl[-1], obs, 2,
                                 noise_on=False, dtype=dtype)
    res = simulate_learning_runs_soa(
        params, limits, scs, seed_xs, seed_us, 121, 1.0,
        jax.random.PRNGKey(0), num_laps=3, max_steps=128, max_laps=8)
    steps = np.asarray(res.lap_steps)
    assert np.all(res.lap_done)
    assert np.all(steps[:, 0] == steps[:, 1])  # identical lanes agree
    # host controller f32 append: [55, 28, 25] (+-1 boundary tolerance)
    for got, want in zip(steps[:, 0].tolist(), [55, 28, 25]):
        assert abs(got - want) <= 2, steps
    assert steps[0, 0] > steps[1, 0] > steps[2, 0] - 2


@pytest.mark.slow
def test_soa_simulator_solver_cap_preserves_behavior():
    """Capping lockstep LM iterations at 40 must not change lap outcomes
    materially (mean convergence is ~14 iterations)."""
    dtype = jnp.float32
    params = IlqrParams.make(dtype=dtype)
    limits = SystemLimits.make(dtype=dtype)
    xcl, ucl = seed_trajectory(1.0)
    seed_xs = jnp.zeros((128, 4), dtype).at[:121].set(jnp.asarray(xcl, dtype))
    seed_us = jnp.zeros((128, 2), dtype).at[:120].set(jnp.asarray(ucl, dtype))
    obs = Obstacle.make(31.0, -2.0, 8.0, 6.0, dtype=dtype)
    # NOTE: B=1 triggers a pathological XLA:CPU compile on this graph
    # (>10 min); B>=2 compiles in ~30 s. Production batches are >=1024.
    scs = SoaScenarios.broadcast(np.zeros(4), xcl[-1], obs, 2,
                                 noise_on=False, dtype=dtype)
    res = simulate_learning_runs_soa(
        params, limits, scs, seed_xs, seed_us, 121, 1.0,
        jax.random.PRNGKey(0), num_laps=3, max_steps=128, max_laps=8,
        solver_max_iter=40)
    steps = np.asarray(res.lap_steps)[:, 0]
    assert np.all(res.lap_done)
    assert steps[0] <= 60 and steps[-1] <= 30


@pytest.mark.slow
def test_soa_simulator_multi_iter_lexicographic():
    """num_ss_iter=2 exercises the multi-row lexicographic selection in the
    batch-native path. Host controller (f32, append): [55, 28, 24]."""
    dtype = jnp.float32
    params = IlqrParams.make(num_ss_iter=2, dtype=dtype)
    limits = SystemLimits.make(dtype=dtype)
    xcl, ucl = seed_trajectory(1.0)
    seed_xs = jnp.zeros((128, 4), dtype).at[:121].set(jnp.asarray(xcl, dtype))
    seed_us = jnp.zeros((128, 2), dtype).at[:120].set(jnp.asarray(ucl, dtype))
    obs = Obstacle.make(31.0, -2.0, 8.0, 6.0, dtype=dtype)
    scs = SoaScenarios.broadcast(np.zeros(4), xcl[-1], obs, 2,
                                 noise_on=False, dtype=dtype)
    res = simulate_learning_runs_soa(
        params, limits, scs, seed_xs, seed_us, 121, 1.0,
        jax.random.PRNGKey(0), num_laps=3, max_steps=128, max_laps=8)
    steps = np.asarray(res.lap_steps)[:, 0]
    assert np.all(res.lap_done)
    for got, want in zip(steps.tolist(), [55, 28, 24]):
        assert abs(got - want) <= 1, steps
