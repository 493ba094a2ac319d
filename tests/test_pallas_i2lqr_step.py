"""Whole-control-step fused kernel (ops/pallas_i2lqr_step.py) vs the
composed path (per-candidate fused solver + XLA kNN/selection glue).

Per-lane candidate solves are lockstep-invariant (done lanes freeze), the
kNN/extraction/selection math mirrors control/batched_soa.py op-for-op, and
masked one-hot sums are exact (single non-zero) — so the fused step must be
BITWISE identical to the composed path, including with skip lanes (done /
replay) present and across multiple kernel tiles.

PROCESS ISOLATION: this module's largest interpret-mode compiles segfault
XLA:CPU when they run late in a long-lived pytest process (reproduced 5x
mid-suite in backend_compile_and_load and in the persistent-cache
put/get of the same programs; every fresh-process run passes). The suite
therefore runs this module in its OWN subprocess via
tests/test_isolated_kernel_modules.py — under plain collection it is
skipped unless ISOLATED_KERNEL_TESTS=1 (set by the wrapper, or manually
to run the module directly: ``ISOLATED_KERNEL_TESTS=1 pytest
tests/test_pallas_i2lqr_step.py``). This replaces the former
conftest first-in-suite reordering + module-scoped cache-write disable,
which only dodged the crash for one specific ordering.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ilqr_iterative_tasks_tpu.control.batched_soa import (
    SoaScenarios, simulate_learning_runs_soa)
from ilqr_iterative_tasks_tpu.models.obstacle import Obstacle
from ilqr_iterative_tasks_tpu.ops.pallas_i2lqr_step import (
    build_fused_i2lqr_step)
from ilqr_iterative_tasks_tpu.ops.pallas_ilqr import build_fused_ilqr
from ilqr_iterative_tasks_tpu.sim.seed import seed_trajectory
from ilqr_iterative_tasks_tpu.utils.params import IlqrParams, SystemLimits

DT = jnp.float32

pytestmark = pytest.mark.skipif(
    os.environ.get("ISOLATED_KERNEL_TESTS") != "1",
    reason="runs in an isolated subprocess — see "
           "tests/test_isolated_kernel_modules.py (set "
           "ISOLATED_KERNEL_TESTS=1 to run this module directly)")


def _setup(dtype=DT, **overrides):
    params = IlqrParams.make(dtype=dtype)
    if overrides:
        params = params.replace(**overrides)
    limits = SystemLimits.make(dtype=dtype)
    xcl, ucl = seed_trajectory(1.0)
    max_steps = 128
    seed_xs = jnp.zeros((max_steps, 4), dtype).at[:121].set(
        jnp.asarray(xcl, dtype))
    seed_us = jnp.zeros((max_steps, 2), dtype).at[:120].set(
        jnp.asarray(ucl, dtype))
    obstacle = Obstacle.make(31.0, -2.0, 8.0, 6.0, dtype=dtype)
    return params, limits, seed_xs, seed_us, xcl, obstacle


def _run_both(params, limits, seed_xs, seed_us, xcl, obstacle, b, num_laps,
              cap, tile_rows):
    scs = SoaScenarios.broadcast(np.zeros(4), xcl[-1], obstacle, b,
                                 noise_on=True, dtype=DT)
    # 70-step budget (vs the reference 121) keeps every learning lap
    # completable (lap 1 needs ~55 steps) while trimming interpret-mode cost;
    # both paths get the same budget so the comparison is unaffected.
    kw = dict(num_laps=num_laps, max_steps=128, max_laps=8,
              solver_max_iter=cap, sim_step_budget=70)
    key = jax.random.PRNGKey(3)
    composed_solver = build_fused_ilqr(
        params, limits, 1.0, num_horizon=params.num_horizon, max_iter=cap,
        tile_rows=1, interpret=True)
    composed = simulate_learning_runs_soa(
        params, limits, scs, seed_xs, seed_us, 121, 1.0, key,
        pallas_solver=composed_solver, **kw)
    step_solver = build_fused_i2lqr_step(
        params, limits, 1.0, num_horizon=params.num_horizon, max_steps=128,
        max_laps=8, max_iter=cap, tile_rows=tile_rows, interpret=True)
    fused = simulate_learning_runs_soa(
        params, limits, scs, seed_xs, seed_us, 121, 1.0, key,
        pallas_step_solver=step_solver, **kw)
    return composed, fused


def _assert_bitwise(composed, fused):
    np.testing.assert_array_equal(np.asarray(composed.lap_steps),
                                  np.asarray(fused.lap_steps))
    np.testing.assert_array_equal(np.asarray(composed.lap_done),
                                  np.asarray(fused.lap_done))
    for a, c in zip(composed.safe_set, fused.safe_set):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


@pytest.mark.slow
def test_step_kernel_bitwise_vs_composed():
    """One kernel tile, default params (k=8, nsi=1), noise on: the fused
    step (kNN + 3 passes + selection in-kernel) must reproduce the composed
    path bitwise across a full learning run (skip lanes exercised by the
    done/replay masking of laps finishing at different steps)."""
    setup = _setup()
    composed, fused = _run_both(*setup, b=128, num_laps=2, cap=8,
                                tile_rows=1)
    _assert_bitwise(composed, fused)


@pytest.mark.slow
def test_step_kernel_two_tiles_nsi2_bitwise():
    """Two kernel tiles and num_ss_iter=2: exercises the scalar-prefetch
    lap indexing with a not-yet-valid history row (lap_ok masking on the
    first learning lap) and the in-kernel lexicographic row selection."""
    setup = _setup(num_ss_iter=2)
    composed, fused = _run_both(*setup, b=256, num_laps=2, cap=8,
                                tile_rows=1)
    _assert_bitwise(composed, fused)


@pytest.mark.slow
def test_step_kernel_dedup_bitwise_neutral():
    """In-kernel cross-pass candidate dedup (cache substitution + pre-done
    lanes) must be bitwise-neutral vs the non-dedup step kernel: the cached
    result IS the identical pure solve, and done lanes are lockstep-
    invariant."""
    params, limits, seed_xs, seed_us, xcl, obstacle = _setup()
    scs = SoaScenarios.broadcast(np.zeros(4), xcl[-1], obstacle, 128,
                                 noise_on=True, dtype=DT)
    kw = dict(num_laps=2, max_steps=128, max_laps=8, solver_max_iter=8,
              sim_step_budget=70)
    key = jax.random.PRNGKey(9)
    runs = []
    for dd in (False, True):
        solver = build_fused_i2lqr_step(
            params, limits, 1.0, num_horizon=params.num_horizon,
            max_steps=128, max_laps=8, max_iter=8, tile_rows=1,
            dedup=dd, interpret=True)
        runs.append(simulate_learning_runs_soa(
            params, limits, scs, seed_xs, seed_us, 121, 1.0, key,
            pallas_step_solver=solver, **kw))
    _assert_bitwise(runs[0], runs[1])


@pytest.mark.slow
def test_step_kernel_dom_skip_group_bitwise_neutral():
    """Cost-dominance candidate skip (dom_skip) and interleaved candidate
    groups (group=2) must be bitwise-neutral vs the plain step kernel in a
    full closed-loop learning sim: a dominated candidate's relaxed-reach
    cost lower bound q+n+100 cannot beat the running best under first-min
    argmin (candidate 0 always solves for the all-infeasible fallback), and
    grouped solves freeze done lanes exactly as the sequential fori does."""
    params, limits, seed_xs, seed_us, xcl, obstacle = _setup()
    scs = SoaScenarios.broadcast(np.zeros(4), xcl[-1], obstacle, 128,
                                 noise_on=True, dtype=DT)
    kw = dict(num_laps=2, max_steps=128, max_laps=8, solver_max_iter=8,
              sim_step_budget=70)
    key = jax.random.PRNGKey(21)
    runs = []
    for variant in (dict(dedup=True),
                    dict(dedup=True, dom_skip=True, group=2)):
        solver = build_fused_i2lqr_step(
            params, limits, 1.0, num_horizon=params.num_horizon,
            max_steps=128, max_laps=8, max_iter=8, tile_rows=1,
            interpret=True, **variant)
        runs.append(simulate_learning_runs_soa(
            params, limits, scs, seed_xs, seed_us, 121, 1.0, key,
            pallas_step_solver=solver, **kw))
    _assert_bitwise(runs[0], runs[1])


def test_step_kernel_with_stats_decisions_unchanged():
    """with_stats instrumentation appends outputs without touching the
    solver decisions; useful <= executed, skip lanes report 0 useful."""
    params, limits, seed_xs, seed_us, xcl, obstacle = _setup()
    from ilqr_iterative_tasks_tpu.ops.pallas_ilqr import obstacle_to_lanes
    b, t_rows, max_laps = 128, 32, 2
    rng = np.random.default_rng(3)
    states = jnp.asarray(rng.uniform(0, 12, (max_laps, t_rows, 4, b)), DT)
    qfun = jnp.asarray(
        np.maximum(20 - np.arange(t_rows), 0)[None, :, None]
        * np.ones((max_laps, 1, b)), DT)
    lap_len = jnp.full((max_laps, b), 20, jnp.int32)
    obs_l = obstacle_to_lanes(obstacle.as_pytree(dtype=DT)
                              if hasattr(obstacle, "as_pytree") else obstacle,
                              b)
    x = jnp.asarray(rng.uniform(0, 5, (4, b)), DT)
    skip = jnp.zeros((b,), jnp.float32).at[96:].set(1.0)
    lap_ids = jnp.zeros((1,), jnp.int32)
    lap_ok = jnp.ones((1,), jnp.int32)
    kw = dict(num_horizon=params.num_horizon, max_steps=t_rows,
              max_laps=max_laps, max_iter=8, tile_rows=1, interpret=True)
    base = build_fused_i2lqr_step(params, limits, 1.0, **kw)
    inst = build_fused_i2lqr_step(params, limits, 1.0, with_stats=True, **kw)
    us0, sh0, ix0, rw0 = base(x, x, states, qfun, lap_len, lap_ids, lap_ok,
                              obs_l, skip)
    us1, sh1, ix1, _rw1, useful, execd, qfloor = inst(
        x, x, states, qfun, lap_len, lap_ids, lap_ok, obs_l, skip)
    assert jnp.all(us0 == us1) and jnp.all(sh0 == sh1)
    assert jnp.all(ix0 == ix1)
    assert jnp.all(execd >= useful)
    assert float(jnp.max(useful[96:])) == 0.0
    assert jnp.all(qfloor >= 0.0)
    # with_stats composes with qsort_skip: decisions still unchanged,
    # executed now counts only the positions the early-terminated q-sorted
    # loop actually runs — strictly fewer lockstep trips than the unsorted
    # schedule on this config
    qinst = build_fused_i2lqr_step(params, limits, 1.0, with_stats=True,
                                   qsort_skip=True, **kw)
    us2, sh2, ix2, _rw2, useful_q, execd_q, _qf = qinst(
        x, x, states, qfun, lap_len, lap_ids, lap_ok, obs_l, skip)
    assert jnp.all(us0 == us2) and jnp.all(sh0 == sh2)
    assert jnp.all(ix0 == ix2)
    assert jnp.all(execd_q >= useful_q)
    assert float(jnp.sum(execd_q)) < float(jnp.sum(execd))


@pytest.mark.slow
def test_step_kernel_stream_nostore_bitwise():
    """stream_safe_set (HBM-resident safe set + per-extraction DMA) and
    store_solutions=False (winner re-solve instead of per-candidate solution
    scratch) — the space/compute trades that unlock enlarged-candidate
    configs — must be bitwise-neutral vs the default step kernel. Exercised
    at nsi=2 with dedup on (cache without stored solutions)."""
    setup = _setup(num_ss_iter=2)
    params, limits, seed_xs, seed_us, xcl, obstacle = setup
    scs = SoaScenarios.broadcast(np.zeros(4), xcl[-1], obstacle, 128,
                                 noise_on=True, dtype=DT)
    kw = dict(num_laps=2, max_steps=128, max_laps=8, solver_max_iter=8,
              sim_step_budget=70)
    key = jax.random.PRNGKey(13)
    runs = []
    for variant in (dict(),
                    dict(stream_safe_set=True, store_solutions=False,
                         dedup=True)):
        solver = build_fused_i2lqr_step(
            params, limits, 1.0, num_horizon=params.num_horizon,
            max_steps=128, max_laps=8, max_iter=8, tile_rows=1,
            interpret=True, **variant)
        runs.append(simulate_learning_runs_soa(
            params, limits, scs, seed_xs, seed_us, 121, 1.0, key,
            pallas_step_solver=solver, **kw))
    _assert_bitwise(runs[0], runs[1])


@pytest.mark.slow
def test_step_kernel_moving_obstacle_bitwise():
    """Moving obstacle (option 1, +y at spd per step): the step kernel's
    per-lane obstacle packing (spd_up/spd_left folded into the (6, B) lanes)
    and in-solve horizon extrapolation must reproduce the composed path
    bitwise while the simulator advances the obstacle every step."""
    params, limits, seed_xs, seed_us, xcl, _ = _setup()
    obstacle = Obstacle.make(35.0, -16.0, 16.0, 16.0, spd=1.0,
                             moving_option=1, dtype=DT)
    composed, fused = _run_both(params, limits, seed_xs, seed_us, xcl,
                                obstacle, b=128, num_laps=2, cap=8,
                                tile_rows=1)
    _assert_bitwise(composed, fused)


@pytest.mark.slow
def test_step_kernel_qsort_skip_bitwise_neutral():
    """q-sorted dominance skip (qsort_skip) must be bitwise-neutral vs the
    plain dedup step kernel in a full closed-loop learning sim: the
    traversal keeps the lexicographic (cost, original slot) minimum so ties
    resolve exactly as the first-min argmin; the STRICT lower-bound skip
    means a skipped candidate's cost strictly exceeds the final best (the
    tier-quantized costs can tie across different q, which is why >= would
    be wrong here); dedup cache entries stored by position substitute the
    identical pure results."""
    params, limits, seed_xs, seed_us, xcl, obstacle = _setup()
    scs = SoaScenarios.broadcast(np.zeros(4), xcl[-1], obstacle, 128,
                                 noise_on=True, dtype=DT)
    kw = dict(num_laps=2, max_steps=128, max_laps=8, solver_max_iter=8,
              sim_step_budget=70)
    key = jax.random.PRNGKey(29)
    runs = []
    for variant in (dict(dedup=True), dict(dedup=True, qsort_skip=True),
                    dict(qsort_skip=True)):
        solver = build_fused_i2lqr_step(
            params, limits, 1.0, num_horizon=params.num_horizon,
            max_steps=128, max_laps=8, max_iter=8, tile_rows=1,
            interpret=True, **variant)
        runs.append(simulate_learning_runs_soa(
            params, limits, scs, seed_xs, seed_us, 121, 1.0, key,
            pallas_step_solver=solver, **kw))
    _assert_bitwise(runs[0], runs[1])
    _assert_bitwise(runs[0], runs[2])


def test_step_kernel_qsort_skip_builder_guards():
    params, limits, *_ = _setup(num_ss_iter=2)
    with pytest.raises(ValueError, match="qsort_skip"):
        build_fused_i2lqr_step(params, limits, 1.0,
                               num_horizon=params.num_horizon, max_steps=128,
                               max_laps=8, max_iter=8, tile_rows=1,
                               qsort_skip=True, interpret=True)
    params1 = _setup()[0]
    with pytest.raises(ValueError, match="supersedes"):
        build_fused_i2lqr_step(params1, limits, 1.0,
                               num_horizon=params1.num_horizon, max_steps=128,
                               max_laps=8, max_iter=8, tile_rows=1,
                               qsort_skip=True, dom_skip=True,
                               interpret=True)


@pytest.mark.slow
def test_step_kernel_reuse_extract_bitwise_neutral():
    """reuse_extract (skip the pass-2/3 kNN sweeps when no lane's guess
    moved since the previous pass) must be bitwise-neutral vs the headline
    dedup+qsort kernel: extraction is a pure function of (guess, safe set,
    lap ids), and the candidate scratch retains exactly the values a re-run
    would write."""
    params, limits, seed_xs, seed_us, xcl, obstacle = _setup()
    scs = SoaScenarios.broadcast(np.zeros(4), xcl[-1], obstacle, 128,
                                 noise_on=True, dtype=DT)
    kw = dict(num_laps=2, max_steps=128, max_laps=8, solver_max_iter=8,
              sim_step_budget=70)
    key = jax.random.PRNGKey(31)
    runs = []
    for reuse in (False, True):
        solver = build_fused_i2lqr_step(
            params, limits, 1.0, num_horizon=params.num_horizon,
            max_steps=128, max_laps=8, max_iter=8, tile_rows=1,
            dedup=True, qsort_skip=True, reuse_extract=reuse,
            interpret=True)
        runs.append(simulate_learning_runs_soa(
            params, limits, scs, seed_xs, seed_us, 121, 1.0, key,
            pallas_step_solver=solver, **kw))
    _assert_bitwise(runs[0], runs[1])


@pytest.mark.slow
def test_step_kernel_tail_shrink_bitwise():
    """tail_shrink with the i2LQR whole-step kernel (interpret): once
    compacted, the kernel runs on the static prefix and padding equals the
    zeros skip lanes produce — bitwise vs the full-width run."""
    params, limits, seed_xs, seed_us, xcl, obstacle = _setup()
    scs = SoaScenarios.broadcast(np.zeros(4), xcl[-1], obstacle, 256,
                                 noise_on=True, dtype=DT)
    solver = build_fused_i2lqr_step(
        params, limits, 1.0, num_horizon=params.num_horizon, max_steps=128,
        max_laps=8, max_iter=10, tile_rows=1, interpret=True)
    kw = dict(num_laps=1, max_steps=128, max_laps=8, solver_max_iter=10,
              sim_step_budget=60, pallas_step_solver=solver)
    key = jax.random.PRNGKey(17)
    base = simulate_learning_runs_soa(params, limits, scs, seed_xs, seed_us,
                                      121, 1.0, key, **kw)
    ts = simulate_learning_runs_soa(params, limits, scs, seed_xs, seed_us,
                                    121, 1.0, key, tail_shrink=128, **kw)
    np.testing.assert_array_equal(np.asarray(base.lap_steps),
                                  np.asarray(ts.lap_steps))
    np.testing.assert_array_equal(np.asarray(base.lap_done),
                                  np.asarray(ts.lap_done))
    for j in range(4):
        np.testing.assert_array_equal(np.asarray(base.safe_set[j]),
                                      np.asarray(ts.safe_set[j]))
