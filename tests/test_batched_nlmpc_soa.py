"""Batch-native SoA NLMPC simulator vs the AoS (vmapped) batched sim and the
reference-behavior envelope.

Noise streams differ between the two sims (per-scenario keys vs one batched
stream), so comparisons run zero-noise; there the closed-loop decisions must
coincide (same kNN, same candidate solves up to linear-solve reassociation,
same lexicographic selection), giving identical lap step counts.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ilqr_iterative_tasks_tpu.control.batched import make_batch_scenarios
from ilqr_iterative_tasks_tpu.control.batched_nlmpc import simulate_nlmpc_batch
from ilqr_iterative_tasks_tpu.control.batched_nlmpc_soa import (
    simulate_nlmpc_runs_soa)
from ilqr_iterative_tasks_tpu.control.batched_soa import SoaScenarios
from ilqr_iterative_tasks_tpu.models.obstacle import Obstacle
from ilqr_iterative_tasks_tpu.sim.seed import seed_trajectory
from ilqr_iterative_tasks_tpu.utils.params import LmpcParams, SystemLimits

DT = jnp.float32


def _setup(batch, noise_on=False):
    params = LmpcParams.make(ss_option="spaceVarying")
    limits = SystemLimits.make(dtype=DT)
    xcl, ucl = seed_trajectory(1.0)
    seed_xs = jnp.zeros((128, 4), DT).at[:121].set(jnp.asarray(xcl, DT))
    seed_us = jnp.zeros((128, 2), DT).at[:120].set(jnp.asarray(ucl, DT))
    obstacle = Obstacle.make(31.0, -2.0, 8.0, 6.0, dtype=DT)
    scs = SoaScenarios.broadcast(np.zeros(4), xcl[-1], obstacle, batch,
                                 noise_on=noise_on, dtype=DT)
    return params, limits, scs, seed_xs, seed_us, xcl, obstacle


@pytest.mark.slow
def test_nlmpc_soa_converges_and_lanes_agree():
    params, limits, scs, seed_xs, seed_us, _, _ = _setup(4)
    res = simulate_nlmpc_runs_soa(params, limits, scs, seed_xs, seed_us, 121,
                                  1.0, jax.random.PRNGKey(0), num_laps=3,
                                  max_steps=128, max_laps=8)
    steps = np.asarray(res.lap_steps)  # (num_laps, B)
    assert np.all(np.asarray(res.lap_done))
    assert (steps == steps[:, :1]).all()  # identical lanes agree
    assert steps[0, 0] <= 40 and steps[-1, 0] <= 26
    assert (np.diff(steps[:, 0]) <= 0).all()  # monotone improvement


@pytest.mark.slow
def test_nlmpc_soa_matches_aos_batched_sim():
    """Zero-noise closed loop: SoA and AoS sims take identical lap counts."""
    params, limits, scs, seed_xs, seed_us, xcl, obstacle = _setup(2)
    soa = simulate_nlmpc_runs_soa(params, limits, scs, seed_xs, seed_us, 121,
                                  1.0, jax.random.PRNGKey(0), num_laps=3,
                                  max_steps=128, max_laps=8)
    aos_scs = make_batch_scenarios(np.zeros(4), xcl[-1], obstacle, 2,
                                   jax.random.PRNGKey(0), dtype=DT)
    aos = simulate_nlmpc_batch(params, limits, aos_scs, seed_xs, seed_us, 121,
                               1.0, num_laps=3, max_steps=128, max_laps=8)
    np.testing.assert_array_equal(np.asarray(soa.lap_steps),
                                  np.asarray(aos.lap_steps).T)


@pytest.mark.slow
def test_nlmpc_soa_moving_obstacle():
    params, limits, _, seed_xs, seed_us, xcl, _ = _setup(2)
    moving = Obstacle.make(35.0, -16.0, 20.0, 20.0, spd=1.0, moving_option=1,
                           dtype=DT)
    scs = SoaScenarios.broadcast(np.zeros(4), xcl[-1], moving, 2,
                                 noise_on=False, dtype=DT)
    res = simulate_nlmpc_runs_soa(params, limits, scs, seed_xs, seed_us, 121,
                                  1.0, jax.random.PRNGKey(0), num_laps=3,
                                  max_steps=128, max_laps=8)
    assert np.all(np.asarray(res.lap_done))
    assert np.asarray(res.lap_steps)[-1, 0] <= 30


@pytest.mark.slow
def test_nlmpc_soa_checkpoint_exact_resume(tmp_path):
    """2 laps + checkpoint + 1 resumed lap == 3 laps in one run, exactly."""
    from ilqr_iterative_tasks_tpu.utils.checkpoint import (
        load_soa_run, save_soa_run)

    params, limits, scs, seed_xs, seed_us, _, _ = _setup(2, noise_on=True)
    key = jax.random.PRNGKey(11)
    kw = dict(max_steps=128, max_laps=8)
    full = simulate_nlmpc_runs_soa(params, limits, scs, seed_xs, seed_us, 121,
                                   1.0, key, num_laps=3, **kw)
    part = simulate_nlmpc_runs_soa(params, limits, scs, seed_xs, seed_us, 121,
                                   1.0, key, num_laps=2, **kw)
    path = str(tmp_path / "ck.npz")
    save_soa_run(path, part)
    resume, steps_part, _ = load_soa_run(path)
    rest = simulate_nlmpc_runs_soa(params, limits, scs, seed_xs, seed_us, 121,
                                   1.0, resume[2], num_laps=1,
                                   resume_from=resume, **kw)
    got = np.concatenate([steps_part, np.asarray(rest.lap_steps)], axis=0)
    np.testing.assert_array_equal(got, np.asarray(full.lap_steps))


def test_nlmpc_inactive_skip_bitwise_neutral():
    """Mirror of test_batched.py::test_inactive_skip_bitwise_neutral for the
    NLMPC SoA simulator (ADVICE r1, medium): the inactive-lane compaction
    path (lane_src/lane_dst permutation including the u_warm permute, plus the
    with_skip input of the fused LM kernel) must be BITWISE neutral — it only
    reorders lanes entering the kernel and masks discarded outputs. Run with
    k*b = 2 tiles (tile_rows=1, b=32, k=8) so whole-tile early exit is
    exercised once the lane tail is all-inactive."""
    from ilqr_iterative_tasks_tpu.ops.pallas_lm_shooting import (
        build_fused_lm_shooting)

    params, limits, _, seed_xs, seed_us, xcl, obstacle = _setup(1)
    b = 32  # k*b = 256 = two tile_rows=1 tiles
    scs = SoaScenarios.broadcast(np.zeros(4), xcl[-1], obstacle, b,
                                 noise_on=True, dtype=DT)
    key = jax.random.PRNGKey(7)
    kw = dict(num_laps=3, max_steps=128, max_laps=8, max_lm_iters=10)
    base_solver = build_fused_lm_shooting(limits, 1.0, num_horizon=6,
                                          max_iters=10, tile_rows=1,
                                          interpret=True)
    base = simulate_nlmpc_runs_soa(params, limits, scs, seed_xs, seed_us, 121,
                                   1.0, key, pallas_solver=base_solver, **kw)
    skip_solver = build_fused_lm_shooting(limits, 1.0, num_horizon=6,
                                          max_iters=10, tile_rows=1,
                                          interpret=True, with_skip=True)
    assert skip_solver.with_skip
    fast = simulate_nlmpc_runs_soa(params, limits, scs, seed_xs, seed_us, 121,
                                   1.0, key, pallas_solver=skip_solver, **kw)
    np.testing.assert_array_equal(np.asarray(base.lap_steps),
                                  np.asarray(fast.lap_steps))
    np.testing.assert_array_equal(np.asarray(base.lap_done),
                                  np.asarray(fast.lap_done))
    for a, c in zip(base.safe_set, fast.safe_set):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
