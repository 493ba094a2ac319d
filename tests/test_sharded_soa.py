"""Trailing-axis (SoA) scenario sharding over the virtual 8-device CPU mesh.

The production batch-trailing sims must compile and run with their LAST axis
sharded (parallel/sharded_soa.py) and produce the same results as the
unsharded program (embarrassingly parallel — no cross-lane math)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ilqr_iterative_tasks_tpu.control.batched_soa import (
    SoaScenarios, simulate_learning_runs_soa)
from ilqr_iterative_tasks_tpu.control.batched_nlmpc_soa import (
    simulate_nlmpc_runs_soa)
from ilqr_iterative_tasks_tpu.models.obstacle import Obstacle
from ilqr_iterative_tasks_tpu.parallel.mesh import make_mesh
from ilqr_iterative_tasks_tpu.parallel.sharded_soa import (
    shard_soa_scenarios, simulate_learning_runs_soa_sharded,
    simulate_nlmpc_runs_soa_sharded, simulate_nlmpc_runs_soa_shardmap)
from ilqr_iterative_tasks_tpu.sim.seed import seed_trajectory
from ilqr_iterative_tasks_tpu.utils.params import (IlqrParams, LmpcParams,
                                                   SystemLimits)

DT = jnp.float32


def _setup(batch):
    limits = SystemLimits.make(dtype=DT)
    xcl, ucl = seed_trajectory(1.0)
    seed_xs = jnp.zeros((128, 4), DT).at[:121].set(jnp.asarray(xcl, DT))
    seed_us = jnp.zeros((128, 2), DT).at[:120].set(jnp.asarray(ucl, DT))
    obstacle = Obstacle.make(31.0, -2.0, 8.0, 6.0, dtype=DT)
    scs = SoaScenarios.broadcast(np.zeros(4), xcl[-1], obstacle, batch,
                                 noise_on=False, dtype=DT)
    return limits, seed_xs, seed_us, scs


def test_shard_placement():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(8)
    _, _, _, scs = _setup(16)
    sharded = shard_soa_scenarios(scs, mesh)
    # trailing axis split 8 ways: each device holds 2 lanes of x0
    shard_shapes = {s.data.shape for s in sharded.x0.addressable_shards}
    assert shard_shapes == {(4, 2)}


@pytest.mark.slow
def test_i2lqr_soa_sharded_matches_unsharded():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(8)
    limits, seed_xs, seed_us, scs = _setup(16)
    params = IlqrParams.make(dtype=DT)
    kw = dict(num_laps=2, max_steps=128, max_laps=8, solver_max_iter=40)
    key = jax.random.PRNGKey(0)
    ref = simulate_learning_runs_soa(params, limits, scs, seed_xs, seed_us,
                                     121, 1.0, key, **kw)
    sh = simulate_learning_runs_soa_sharded(params, limits, scs, seed_xs,
                                            seed_us, 121, 1.0, key, mesh,
                                            **kw)
    np.testing.assert_array_equal(np.asarray(sh.lap_steps),
                                  np.asarray(ref.lap_steps))


@pytest.mark.slow
def test_nlmpc_soa_sharded_matches_unsharded():
    """f64: the sharded and unsharded programs are two different XLA
    compilations of the same per-lane math — fusion/FMA formation can
    round f32 differently and flip LM accept boundaries (the repo's
    parity convention: cross-compilation bitwise comparison is only valid
    at f64 — CLAUDE.md / docs/PARITY.md). Observed at f32 after the
    round-4 simulator carries reshuffled fusion: lap steps [32, 24] vs
    [31, 22] between the two compilations of identical inputs."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(8)
    f64 = jnp.float64
    limits = SystemLimits.make(dtype=f64)
    xcl, _u = seed_trajectory(1.0)
    seed_xs = jnp.zeros((128, 4), f64).at[:121].set(jnp.asarray(xcl, f64))
    seed_us = jnp.zeros((128, 2), f64)
    obstacle = Obstacle.make(31.0, -2.0, 8.0, 6.0, dtype=f64)
    scs = SoaScenarios.broadcast(np.zeros(4), xcl[-1], obstacle, 16,
                                 noise_on=False, dtype=f64)
    params = LmpcParams.make(ss_option="spaceVarying", dtype=f64)
    kw = dict(num_laps=2, max_steps=128, max_laps=8)
    key = jax.random.PRNGKey(0)
    ref = simulate_nlmpc_runs_soa(params, limits, scs, seed_xs, seed_us, 121,
                                  1.0, key, **kw)
    sh = simulate_nlmpc_runs_soa_sharded(params, limits, scs, seed_xs,
                                         seed_us, 121, 1.0, key, mesh, **kw)
    np.testing.assert_array_equal(np.asarray(sh.lap_steps),
                                  np.asarray(ref.lap_steps))


@pytest.mark.slow
def test_i2lqr_shardmap_step_kernel_matches_per_shard():
    """shard_map wrapper with the whole-step Pallas kernel (interpret):
    the 2-device mesh run must equal running each shard separately with its
    fold_in(key, shard) stream — bitwise (all math is lane-local)."""
    from ilqr_iterative_tasks_tpu.ops.pallas_i2lqr_step import (
        build_fused_i2lqr_step)
    from ilqr_iterative_tasks_tpu.parallel.sharded_soa import (
        simulate_learning_runs_soa_shardmap)

    if len(jax.devices()) < 2:
        pytest.skip("needs >=2 virtual devices")
    mesh = make_mesh(2)
    limits, seed_xs, seed_us, scs = _setup(256)
    params = IlqrParams.make(dtype=DT)
    solver = build_fused_i2lqr_step(
        params, limits, 1.0, num_horizon=params.num_horizon, max_steps=128,
        max_laps=8, max_iter=10, tile_rows=1, interpret=True)
    kw = dict(num_laps=2, max_steps=128, max_laps=8, solver_max_iter=10,
              sim_step_budget=70, pallas_step_solver=solver)
    key = jax.random.PRNGKey(11)
    res = simulate_learning_runs_soa_shardmap(
        params, limits, scs, seed_xs, seed_us, 121, 1.0, key, mesh, **kw)

    # per-shard oracle: slice the scenario batch by hand, fold the key
    halves = []
    for i in range(2):
        scs_i = jax.tree_util.tree_map(
            lambda a: a[..., i * 128:(i + 1) * 128], scs)
        r = simulate_learning_runs_soa(
            params, limits, scs_i, seed_xs, seed_us, 121, 1.0,
            jax.random.fold_in(key, i), **kw)
        halves.append(r)
    want_steps = np.concatenate(
        [np.asarray(h.lap_steps) for h in halves], axis=-1)
    np.testing.assert_array_equal(np.asarray(res.lap_steps), want_steps)
    want_done = np.concatenate(
        [np.asarray(h.lap_done) for h in halves], axis=-1)
    np.testing.assert_array_equal(np.asarray(res.lap_done), want_done)
    for j in range(4):
        want = np.concatenate(
            [np.asarray(h.safe_set[j]) for h in halves], axis=-1)
        np.testing.assert_array_equal(np.asarray(res.safe_set[j]), want)


@pytest.mark.slow
def test_sharded_sim_compiles_with_zero_collectives():
    """The scaling-efficiency property, proven on the compiled program: the
    scenario-sharded sim contains NO cross-device collectives (all-reduce /
    all-gather / collective-permute / all-to-all / reduce-scatter) — the
    scenario axis is pure data parallelism, so weak scaling is linear by
    construction (per-device work is independent; the single partition-id op
    is the per-shard PRNG fold). See docs/PERF.md 'Weak scaling'."""
    import re

    from jax.sharding import Mesh

    from ilqr_iterative_tasks_tpu.parallel.sharded_soa import (
        simulate_nlmpc_runs_soa_shardmap)

    dt64 = jnp.float64
    params = LmpcParams.make(ss_option="spaceVarying")
    limits = SystemLimits.make(dtype=dt64)
    xcl, _ = seed_trajectory(1.0)
    seed_xs = jnp.zeros((128, 4), dt64).at[:121].set(jnp.asarray(xcl, dt64))
    seed_us = jnp.zeros((128, 2), dt64)
    obstacle = Obstacle.make(31.0, -2.0, 8.0, 6.0, dtype=dt64)
    mesh = Mesh(np.array(jax.devices()[:4]), ("scenario",))
    scs = shard_soa_scenarios(
        SoaScenarios.broadcast(np.zeros(4), xcl[-1], obstacle, 8,
                               noise_on=True, dtype=dt64), mesh)
    f = jax.jit(lambda s: simulate_nlmpc_runs_soa_shardmap(
        params, limits, s, seed_xs, seed_us, 121, 1.0, jax.random.PRNGKey(3),
        mesh, num_laps=1, max_steps=128, max_laps=4, max_lm_iters=8))
    txt = f.lower(scs).compile().as_text()
    for op in ("all-reduce", "all-gather", "collective-permute",
               "all-to-all", "reduce-scatter"):
        assert not re.findall(op + r"\(", txt), op


@pytest.mark.slow
def test_nlmpc_shardmap_step_kernel_matches_per_shard():
    """NLMPC mirror of the i2LQR step-kernel shard_map test: the 2-device
    mesh run of the whole-step NLMPC kernel (interpret) must equal running
    each shard separately with its fold_in(key, shard) stream — bitwise.
    Covers the production wrapper bench.py would use on a pod, incl. the
    round-4 exact shrink semantics and the envelope-gated
    infeasible-retire path."""
    from ilqr_iterative_tasks_tpu.ops.pallas_nlmpc_step import (
        build_fused_nlmpc_step)

    if len(jax.devices()) < 2:
        pytest.skip("needs >=2 virtual devices")
    mesh = make_mesh(2)
    limits, seed_xs, seed_us, _ = _setup(256)
    xcl, _u = seed_trajectory(1.0)
    obstacle = Obstacle.make(31.0, -2.0, 8.0, 6.0, dtype=DT)
    scs = SoaScenarios.broadcast(np.zeros(4), xcl[-1], obstacle, 256,
                                 noise_on=True, dtype=DT)
    params = LmpcParams.make(ss_option="spaceVarying")
    solver = build_fused_nlmpc_step(
        params, limits, 1.0, num_horizon=params.num_horizon, max_steps=128,
        max_laps=8, max_iters=10, tile_rows=1, qsort_skip=True,
        interpret=True)
    kw = dict(num_laps=1, max_steps=128, max_laps=8, max_lm_iters=10,
              sim_step_budget=45, pallas_step_solver=solver,
              infeasible_retire=8)
    key = jax.random.PRNGKey(11)
    res = simulate_nlmpc_runs_soa_shardmap(
        params, limits, scs, seed_xs, seed_us, 121, 1.0, key, mesh, **kw)

    halves = []
    for i in range(2):
        scs_i = jax.tree_util.tree_map(
            lambda a: a[..., i * 128:(i + 1) * 128], scs)
        r = simulate_nlmpc_runs_soa(
            params, limits, scs_i, seed_xs, seed_us, 121, 1.0,
            jax.random.fold_in(key, i), **kw)
        halves.append(r)
    want_steps = np.concatenate(
        [np.asarray(h.lap_steps) for h in halves], axis=-1)
    np.testing.assert_array_equal(np.asarray(res.lap_steps), want_steps)
    want_done = np.concatenate(
        [np.asarray(h.lap_done) for h in halves], axis=-1)
    np.testing.assert_array_equal(np.asarray(res.lap_done), want_done)
    for j in range(4):
        want = np.concatenate(
            [np.asarray(h.safe_set[j]) for h in halves], axis=-1)
        np.testing.assert_array_equal(np.asarray(res.safe_set[j]), want)


def test_nlmpc_shardmap_with_streak_stats():
    """ADVICE r4 regression: with_streak_stats=True populates the
    ``streaks`` field of the result pytree — the shard_map out_specs must
    carry a matching entry or shard_map fails on the pytree mismatch."""
    if len(jax.devices()) < 2:
        pytest.skip("needs >=2 virtual devices")
    mesh = make_mesh(2)
    limits, seed_xs, seed_us, scs = _setup(8)
    params = LmpcParams.make(ss_option="spaceVarying")
    kw = dict(num_laps=1, max_steps=128, max_laps=8, max_lm_iters=8,
              sim_step_budget=20, with_streak_stats=True)
    res = simulate_nlmpc_runs_soa_shardmap(
        params, limits, scs, seed_xs, seed_us, 121, 1.0,
        jax.random.PRNGKey(0), mesh, **kw)
    assert len(res.streaks) == 2
    assert np.asarray(res.streaks[0]).shape == (1, 8)


@pytest.mark.slow
def test_nlmpc_all_mode_shardmap_step_kernel_matches_per_shard():
    """mode='all' (every stored point a candidate — the SURVEY §5
    long-context axis) through the shard_map production wrapper: the
    2-device mesh run of the HBM-streamed all-mode step kernel (with the
    round-5 strict-descent dominance scan) must equal running each shard
    separately with its fold_in(key, shard) stream — bitwise."""
    from ilqr_iterative_tasks_tpu.ops.pallas_nlmpc_step import (
        build_fused_nlmpc_step)

    if len(jax.devices()) < 2:
        pytest.skip("needs >=2 virtual devices")
    mesh = make_mesh(2)
    limits, seed_xs, seed_us, _ = _setup(256)
    xcl, _u = seed_trajectory(1.0)
    obstacle = Obstacle.make(31.0, -2.0, 8.0, 6.0, dtype=DT)
    scs = SoaScenarios.broadcast(np.zeros(4), xcl[-1], obstacle, 256,
                                 noise_on=True, dtype=DT)
    params = LmpcParams.make(all_ss_point=True)
    solver = build_fused_nlmpc_step(
        params, limits, 1.0, num_horizon=params.num_horizon, max_steps=128,
        max_laps=8, max_iters=8, tile_rows=1, mode="all",
        stream_safe_set=True, store_solutions=False, all_rev_skip=True,
        interpret=True)
    kw = dict(num_laps=1, max_steps=128, max_laps=8, max_lm_iters=8,
              sim_step_budget=40, pallas_step_solver=solver)
    key = jax.random.PRNGKey(29)
    res = simulate_nlmpc_runs_soa_shardmap(
        params, limits, scs, seed_xs, seed_us, 121, 1.0, key, mesh, **kw)

    halves = []
    for i in range(2):
        scs_i = jax.tree_util.tree_map(
            lambda a: a[..., i * 128:(i + 1) * 128], scs)
        r = simulate_nlmpc_runs_soa(
            params, limits, scs_i, seed_xs, seed_us, 121, 1.0,
            jax.random.fold_in(key, i), **kw)
        halves.append(r)
    want_steps = np.concatenate(
        [np.asarray(h.lap_steps) for h in halves], axis=-1)
    np.testing.assert_array_equal(np.asarray(res.lap_steps), want_steps)
    for j in range(5):
        want = np.concatenate(
            [np.asarray(h.safe_set[j]) for h in halves], axis=-1)
        np.testing.assert_array_equal(np.asarray(res.safe_set[j]), want)
