"""Whole-control-step fused NLMPC kernel (ops/pallas_nlmpc_step.py) vs the
composed path (general XLA glue + per-candidate fused LM-shooting kernel
with with_skip/with_hzn — the kNN/selection/bookkeeping math is mirrored
op-for-op and the solves share the same tile functions, so runs are
BITWISE equal). Same equality argument as tests/test_pallas_i2lqr_step.py:
lockstep-invariant per-lane solves + shared ``_advance_tail`` bookkeeping.
Both routes carry the exact reference semantics incl. per-lane shrinking
horizons (base.py:640-654) and the h1 reach check (nonlinear_lmpc.py:
199-213)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ilqr_iterative_tasks_tpu.control.batched_nlmpc_soa import (
    simulate_nlmpc_runs_soa)
from ilqr_iterative_tasks_tpu.control.batched_soa import SoaScenarios
from ilqr_iterative_tasks_tpu.models.obstacle import Obstacle
from ilqr_iterative_tasks_tpu.ops.pallas_lm_shooting import (
    build_fused_lm_shooting)
from ilqr_iterative_tasks_tpu.ops.pallas_nlmpc_step import (
    build_fused_nlmpc_step)
from ilqr_iterative_tasks_tpu.sim.seed import seed_trajectory
from ilqr_iterative_tasks_tpu.utils.params import LmpcParams, SystemLimits

DT = jnp.float32

# PROCESS ISOLATION (same story as tests/test_pallas_i2lqr_step.py): this
# module's interpret-mode whole-step kernels grew heavy enough in round 5
# (all_rev / prox variants) to reintroduce the late-session XLA:CPU
# compile crash in the main pytest process. It therefore runs in its own
# subprocess via tests/test_isolated_kernel_modules.py.
pytestmark = pytest.mark.skipif(
    os.environ.get("ISOLATED_KERNEL_TESTS") != "1",
    reason="runs in an isolated subprocess — see "
           "tests/test_isolated_kernel_modules.py (set "
           "ISOLATED_KERNEL_TESTS=1 to run this module directly)")


def _setup(dtype=DT, **overrides):
    params = LmpcParams.make(ss_option="spaceVarying")
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
    # 70-step budget (vs the reference 121): every NLMPC lap completes well
    # under it; both paths get the same budget so the comparison holds.
    kw = dict(num_laps=num_laps, max_steps=128, max_laps=8,
              max_lm_iters=cap, sim_step_budget=70)
    key = jax.random.PRNGKey(5)
    composed_solver = build_fused_lm_shooting(
        limits, 1.0, num_horizon=params.num_horizon, max_iters=cap,
        tile_rows=1, interpret=True, with_skip=True, with_hzn=True)
    composed = simulate_nlmpc_runs_soa(
        params, limits, scs, seed_xs, seed_us, 121, 1.0, key,
        pallas_solver=composed_solver, **kw)
    step_solver = build_fused_nlmpc_step(
        params, limits, 1.0, num_horizon=params.num_horizon, max_steps=128,
        max_laps=8, max_iters=cap, tile_rows=tile_rows, interpret=True)
    fused = simulate_nlmpc_runs_soa(
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
def test_nlmpc_step_kernel_bitwise_vs_composed():
    """One kernel tile, default params (k=8, nsi=1), noise on: the fused
    NLMPC step (kNN on the terminal guess + warm-started feasibility solves
    + selection + successor-guess advance in-kernel) must reproduce the
    composed path bitwise across a full learning run."""
    setup = _setup()
    composed, fused = _run_both(*setup, b=128, num_laps=2, cap=8,
                                tile_rows=1)
    _assert_bitwise(composed, fused)


@pytest.mark.slow
def test_nlmpc_step_kernel_two_tiles_nsi2_bitwise():
    """Two kernel tiles and num_ss_iter=2: scalar-prefetch lap indexing with
    a not-yet-valid history row and in-kernel lexicographic row selection."""
    setup = _setup(num_ss_iter=2)
    composed, fused = _run_both(*setup, b=256, num_laps=2, cap=8,
                                tile_rows=1)
    _assert_bitwise(composed, fused)


@pytest.mark.slow
def test_nlmpc_step_kernel_nostore_bitwise():
    """store_solutions=False (winner re-solve) must be bitwise-neutral —
    it is what fits the nsi=2 NLMPC config in VMEM on v5e (the default
    storage overflows the 16 MB scoped stack by 52 KB there)."""
    setup = _setup(num_ss_iter=2)
    params, limits, seed_xs, seed_us, xcl, obstacle = setup
    scs = SoaScenarios.broadcast(np.zeros(4), xcl[-1], obstacle, 128,
                                 noise_on=True, dtype=DT)
    kw = dict(num_laps=2, max_steps=128, max_laps=8, max_lm_iters=8,
              sim_step_budget=70)
    key = jax.random.PRNGKey(17)
    runs = []
    for store in (True, False):
        solver = build_fused_nlmpc_step(
            params, limits, 1.0, num_horizon=params.num_horizon,
            max_steps=128, max_laps=8, max_iters=8, tile_rows=1,
            store_solutions=store, interpret=True)
        runs.append(simulate_nlmpc_runs_soa(
            params, limits, scs, seed_xs, seed_us, 121, 1.0, key,
            pallas_step_solver=solver, **kw))
    _assert_bitwise(runs[0], runs[1])


@pytest.mark.slow
def test_nlmpc_step_kernel_moving_obstacle_bitwise():
    """Moving obstacle through the NLMPC step kernel's (7, B) obstacle
    packing and keep-out extrapolation — bitwise vs the composed path."""
    params, limits, seed_xs, seed_us, xcl, _ = _setup()
    obstacle = Obstacle.make(35.0, -16.0, 16.0, 16.0, spd=1.0,
                             moving_option=1, dtype=DT)
    composed, fused = _run_both(params, limits, seed_xs, seed_us, xcl,
                                obstacle, b=128, num_laps=2, cap=8,
                                tile_rows=1)
    _assert_bitwise(composed, fused)


@pytest.mark.slow
def test_nlmpc_step_kernel_qsort_skip_bitwise():
    """qsort_skip (q-sorted candidate solves + running-best dominance skip,
    nsi=1 only) must be BITWISE neutral: the candidate cost n + Qfun is
    known pre-solve and the stable q-rank puts equal-q candidates in
    original-slot order, so the first feasible position IS the first-min
    argmin and skipped solves cannot change the selection, the stored
    solution, the advanced guess, or the warm-start shift."""
    setup = _setup()
    params, limits, seed_xs, seed_us, xcl, obstacle = setup
    scs = SoaScenarios.broadcast(np.zeros(4), xcl[-1], obstacle, 128,
                                 noise_on=True, dtype=DT)
    kw = dict(num_laps=2, max_steps=128, max_laps=8, max_lm_iters=8,
              sim_step_budget=70)
    key = jax.random.PRNGKey(23)
    runs = []
    for qsort in (False, True):
        solver = build_fused_nlmpc_step(
            params, limits, 1.0, num_horizon=params.num_horizon,
            max_steps=128, max_laps=8, max_iters=8, tile_rows=1,
            qsort_skip=qsort, interpret=True)
        runs.append(simulate_nlmpc_runs_soa(
            params, limits, scs, seed_xs, seed_us, 121, 1.0, key,
            pallas_step_solver=solver, **kw))
    _assert_bitwise(runs[0], runs[1])


def test_nlmpc_step_kernel_qsort_skip_requires_nsi1():
    params, limits, *_ = _setup(num_ss_iter=2)
    with pytest.raises(ValueError, match="qsort_skip"):
        build_fused_nlmpc_step(params, limits, 1.0,
                               num_horizon=params.num_horizon, max_steps=128,
                               max_laps=8, max_iters=8, tile_rows=1,
                               qsort_skip=True, interpret=True)


@pytest.mark.slow
def test_nlmpc_step_kernel_time_varying_bitwise():
    """mode="timeVarying": the in-kernel advancing index window
    (base.py:537-546, incl. the last-point fallback) + per-lane shrinking
    horizons must reproduce the composed route (general XLA glue +
    per-candidate kernel) bitwise across a full learning lap. timeVarying
    laps run long (~111 steps at f64) — one lap, full reference budget."""
    params, limits, seed_xs, seed_us, xcl, obstacle = _setup(
        ss_option="timeVarying")
    b = 128
    scs = SoaScenarios.broadcast(np.zeros(4), xcl[-1], obstacle, b,
                                 noise_on=True, dtype=DT)
    kw = dict(num_laps=1, max_steps=128, max_laps=8, max_lm_iters=8,
              sim_step_budget=121)
    key = jax.random.PRNGKey(29)
    composed_solver = build_fused_lm_shooting(
        limits, 1.0, num_horizon=params.num_horizon, max_iters=8,
        tile_rows=1, interpret=True, with_skip=True, with_hzn=True)
    composed = simulate_nlmpc_runs_soa(
        params, limits, scs, seed_xs, seed_us, 121, 1.0, key,
        pallas_solver=composed_solver, **kw)
    step_solver = build_fused_nlmpc_step(
        params, limits, 1.0, num_horizon=params.num_horizon, max_steps=128,
        max_laps=8, max_iters=8, tile_rows=1, mode="timeVarying",
        interpret=True)
    fused = simulate_nlmpc_runs_soa(
        params, limits, scs, seed_xs, seed_us, 121, 1.0, key,
        pallas_step_solver=step_solver, **kw)
    _assert_bitwise(composed, fused)


def test_nlmpc_step_kernel_rejects_unknown_mode():
    params, limits, *_ = _setup()
    with pytest.raises(ValueError, match="mode"):
        build_fused_nlmpc_step(params, limits, 1.0,
                               num_horizon=params.num_horizon, max_steps=128,
                               max_laps=8, max_iters=8, tile_rows=1,
                               mode="bogus", interpret=True)


@pytest.mark.slow
def test_nlmpc_step_kernel_all_mode_bitwise():
    """mode="all" + all_ss_iter (every stored point of every lap,
    base.py:564-571) fused in-kernel: per-row position sweeps with the
    running lexicographic-best cost list in (T, tile) scratch, HBM-streamed
    safe set, winner re-solve. Must reproduce the composed route (general
    XLA glue + per-candidate kernel) bitwise. One learning lap (the 'all'
    candidate sweep is T*L solves per step — the heaviest regime)."""
    params, limits, seed_xs, seed_us, xcl, obstacle = _setup(
        all_ss_point=True, all_ss_iter=True)
    b = 128
    scs = SoaScenarios.broadcast(np.zeros(4), xcl[-1], obstacle, b,
                                 noise_on=True, dtype=DT)
    kw = dict(num_laps=1, max_steps=128, max_laps=4, max_lm_iters=8,
              sim_step_budget=45)
    key = jax.random.PRNGKey(37)
    composed_solver = build_fused_lm_shooting(
        limits, 1.0, num_horizon=params.num_horizon, max_iters=8,
        tile_rows=1, interpret=True, with_skip=True, with_hzn=True)
    composed = simulate_nlmpc_runs_soa(
        params, limits, scs, seed_xs, seed_us, 121, 1.0, key,
        pallas_solver=composed_solver, **kw)
    step_solver = build_fused_nlmpc_step(
        params, limits, 1.0, num_horizon=params.num_horizon, max_steps=128,
        max_laps=4, max_iters=8, tile_rows=1, mode="all", all_iter=True,
        stream_safe_set=True, store_solutions=False, interpret=True)
    fused = simulate_nlmpc_runs_soa(
        params, limits, scs, seed_xs, seed_us, 121, 1.0, key,
        pallas_step_solver=step_solver, **kw)
    _assert_bitwise(composed, fused)


def test_nlmpc_step_kernel_all_mode_builder_guards():
    params, limits, *_ = _setup(all_ss_point=True)
    kw = dict(num_horizon=6, max_steps=128, max_laps=4, max_iters=8,
              tile_rows=1, interpret=True)
    with pytest.raises(ValueError, match="store_solutions"):
        build_fused_nlmpc_step(params, limits, 1.0, mode="all", **kw)
    with pytest.raises(ValueError, match="stream_safe_set"):
        build_fused_nlmpc_step(params, limits, 1.0, mode="all",
                               all_iter=True, store_solutions=False, **kw)


@pytest.mark.slow
def test_nlmpc_step_kernel_with_stats_bitwise_neutral():
    """``with_stats`` (useful/executed LM-trip counters, the straggler-
    waste accounting of docs/PERF.md) is an observer: decisions, records
    and safe set must be bitwise-unchanged, and the counters must be
    populated with useful <= executed per lane."""
    params, limits, seed_xs, seed_us, xcl, obstacle = _setup()
    scs = SoaScenarios.broadcast(np.zeros(4), xcl[-1], obstacle, 128,
                                 noise_on=True, dtype=DT)
    kw = dict(num_laps=1, max_steps=128, max_laps=8, max_lm_iters=12,
              sim_step_budget=45)
    key = jax.random.PRNGKey(5)
    runs = {}
    for ws in (False, True):
        solver = build_fused_nlmpc_step(
            params, limits, 1.0, num_horizon=params.num_horizon,
            max_steps=128, max_laps=8, max_iters=12, tile_rows=1,
            qsort_skip=True, with_stats=ws, interpret=True)
        runs[ws] = simulate_nlmpc_runs_soa(
            params, limits, scs, seed_xs, seed_us, 121, 1.0, key,
            pallas_step_solver=solver, **kw)
    _assert_bitwise(runs[False], runs[True])
    useful, execd = (np.asarray(v) for v in runs[True].iter_stats)
    assert useful.sum() > 0 and execd.sum() > 0
    assert (useful <= execd + 1e-6).all()


@pytest.mark.slow
def test_nlmpc_step_kernel_all_rev_skip_bitwise():
    """``all_rev_skip`` (mode='all', nsi=1): the strict-descent dominance
    scan (descending positions + reachability-bound pre-skip + tile-level
    early termination) must reproduce the forward full-sweep all-mode
    kernel BITWISE across a full learning run — cost hzn + Qfun strictly
    decreases in stored position, so the last feasible position IS the
    first-min argmin and a skipped solve can never change selection."""
    params, limits, seed_xs, seed_us, xcl, obstacle = _setup(
        all_ss_point=True)
    b = 128
    scs = SoaScenarios.broadcast(np.zeros(4), xcl[-1], obstacle, b,
                                 noise_on=True, dtype=DT)
    kw = dict(num_laps=2, max_steps=128, max_laps=4, max_lm_iters=8,
              sim_step_budget=45)
    key = jax.random.PRNGKey(19)
    runs = []
    for rev in (False, True):
        solver = build_fused_nlmpc_step(
            params, limits, 1.0, num_horizon=params.num_horizon,
            max_steps=128, max_laps=4, max_iters=8, tile_rows=1, mode="all",
            stream_safe_set=True, store_solutions=False, all_rev_skip=rev,
            interpret=True)
        runs.append(simulate_nlmpc_runs_soa(
            params, limits, scs, seed_xs, seed_us, 121, 1.0, key,
            pallas_step_solver=solver, **kw))
    _assert_bitwise(runs[0], runs[1])


def test_nlmpc_step_kernel_all_rev_skip_builder_guards():
    params, limits, *_ = _setup(all_ss_point=True, num_ss_iter=2)
    kw = dict(num_horizon=6, max_steps=128, max_laps=4, max_iters=8,
              tile_rows=1, interpret=True)
    with pytest.raises(ValueError, match="SINGLE lap row"):
        build_fused_nlmpc_step(params, limits, 1.0, mode="all",
                               stream_safe_set=True, store_solutions=False,
                               all_rev_skip=True, **kw)
    p1, limits1, *_ = _setup()
    with pytest.raises(ValueError, match="mode='all'"):
        build_fused_nlmpc_step(p1, limits1, 1.0, all_rev_skip=True, **kw)


@pytest.mark.slow
def test_nlmpc_step_kernel_prox_skip_bitwise():
    """``prox_skip`` (temporal-coherence / extraction-order dominance skip,
    the exact variant of VERDICT r4 #5) must be BITWISE neutral vs the
    plain full-sweep kernel: the non-strict per-candidate dominance skip
    cannot flip the first-min argmin (ties keep the earlier slot) and the
    suffix-min tile exit only retires positions that are dominated for
    every active lane."""
    params, limits, seed_xs, seed_us, xcl, obstacle = _setup()
    b = 128
    scs = SoaScenarios.broadcast(np.zeros(4), xcl[-1], obstacle, b,
                                 noise_on=True, dtype=DT)
    kw = dict(num_laps=2, max_steps=128, max_laps=8, max_lm_iters=8,
              sim_step_budget=70)
    key = jax.random.PRNGKey(23)
    runs = []
    for prox in (False, True):
        solver = build_fused_nlmpc_step(
            params, limits, 1.0, num_horizon=params.num_horizon,
            max_steps=128, max_laps=8, max_iters=8, tile_rows=1,
            prox_skip=prox, interpret=True)
        runs.append(simulate_nlmpc_runs_soa(
            params, limits, scs, seed_xs, seed_us, 121, 1.0, key,
            pallas_step_solver=solver, **kw))
    _assert_bitwise(runs[0], runs[1])
