"""Tests for the fully-jitted batched lap simulator and sharded execution.

The batched path must reproduce the host controller's closed-loop behavior
exactly for the nominal scenario (same f32 dtype, zero noise)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ilqr_iterative_tasks_tpu.control.batched import (
    ScenarioSpec, lexicographic_argmin, make_batch_scenarios,
    simulate_learning_batch, simulate_learning_run)
from ilqr_iterative_tasks_tpu.models.obstacle import Obstacle
from ilqr_iterative_tasks_tpu.sim.seed import seed_trajectory
from ilqr_iterative_tasks_tpu.utils.params import IlqrParams, SystemLimits

DT = jnp.float32


def test_lexicographic_argmin_matches_python_list_min():
    rng = np.random.default_rng(8)
    for _ in range(30):
        rows = rng.choice([1.0, 2.0, 3.0, np.inf], size=(4, 5))
        valid = np.ones(4, dtype=bool)
        got = int(lexicographic_argmin(jnp.asarray(rows), jnp.asarray(valid)))
        lists = [list(r) for r in rows]
        want = lists.index(min(lists))
        assert got == want, (rows, got, want)


def test_lexicographic_argmin_skips_invalid_rows():
    rows = jnp.asarray([[0.0, 0.0], [5.0, 5.0]])
    valid = jnp.asarray([False, True])
    assert int(lexicographic_argmin(rows, valid)) == 1


def _setup(dtype=DT):
    params = IlqrParams.make(dtype=dtype)
    limits = SystemLimits.make(dtype=dtype)
    xcl, ucl = seed_trajectory(1.0)
    max_steps = 128
    seed_xs = jnp.zeros((max_steps, 4), dtype).at[:121].set(jnp.asarray(xcl, dtype))
    seed_us = jnp.zeros((max_steps, 2), dtype).at[:120].set(jnp.asarray(ucl, dtype))
    obstacle = Obstacle.make(31.0, -2.0, 8.0, 6.0, dtype=dtype)
    return params, limits, seed_xs, seed_us, xcl, obstacle


@pytest.mark.slow
def test_batched_nominal_matches_host_controller():
    """Nominal scenario must equal the host controller's f32 lap sequence
    [55, 28, 25] (run_closed_loop append variant, zero noise)."""
    params, limits, seed_xs, seed_us, xcl, obstacle = _setup()
    sc = ScenarioSpec(x0=jnp.zeros(4, DT), obstacle=obstacle,
                      goal=jnp.asarray(xcl[-1], DT),
                      noise_key=jax.random.PRNGKey(0),
                      noise_on=jnp.asarray(0.0, DT))
    res = simulate_learning_run(params, limits, sc, seed_xs, seed_us, 121,
                                1.0, num_laps=3, max_steps=128, max_laps=8)
    steps = res.lap_steps.tolist()
    # Host controller f32 gives [55, 28, 25]; decision-boundary steps may move
    # a lap by ~1 step across envs (x64 flag changes weak-type rounding in the
    # host half), so assert the sequence within 1 step and monotone.
    for got, want in zip(steps, [55, 28, 25]):
        assert abs(got - want) <= 1, steps
    assert steps[0] > steps[1] > steps[2] - 1
    assert bool(jnp.all(res.lap_done))
    # safe set bookkeeping: seed + 3 learning laps
    assert int(res.safe_set.num_laps) == 4
    # lap lengths recorded = steps + 2 (initial state + appended goal row)
    assert res.safe_set.lap_len.tolist()[:4] == [121] + [s + 2 for s in steps]


@pytest.mark.slow
def test_batched_vmap_consistent_with_single():
    params, limits, seed_xs, seed_us, xcl, obstacle = _setup()
    scs = make_batch_scenarios(np.zeros(4), xcl[-1], obstacle, 3,
                               jax.random.PRNGKey(2), x0_jitter=0.0, dtype=DT)
    res = simulate_learning_batch(params, limits, scs, seed_xs, seed_us, 121,
                                  1.0, num_laps=2, max_steps=128, max_laps=8)
    # identical scenarios (no jitter, no noise) -> identical lanes
    assert res.lap_steps.shape == (3, 2)
    assert np.all(res.lap_steps == res.lap_steps[0])
    assert bool(jnp.all(res.lap_done))


def test_sharded_dryrun_virtual_mesh():
    """The driver's dryrun path: 8-device virtual CPU mesh."""
    from ilqr_iterative_tasks_tpu.parallel.sharded import dryrun
    assert len(jax.devices()) >= 8
    dryrun(8)


def test_sharded_candidate_sweep_matches_local():
    from ilqr_iterative_tasks_tpu.ops.ilqr import ilqr_solve_candidates
    from ilqr_iterative_tasks_tpu.parallel.mesh import make_mesh
    from ilqr_iterative_tasks_tpu.parallel.sharded import sharded_candidate_sweep

    dtype = jnp.float32
    params = IlqrParams.make(num_ss_points=4, dtype=dtype)
    limits = SystemLimits.make(dtype=dtype)
    obstacle = Obstacle.make(5.0, -2.0, 1.0, 1.0, dtype=dtype)
    mesh = make_mesh(4, axis_name="candidate")
    x0 = jnp.zeros(4, dtype)
    cands = jnp.asarray(np.linspace([2.0, 0.0, 1.0, 0.0],
                                    [6.0, 0.5, 2.0, 0.1], 8), dtype)
    qs = jnp.arange(8, dtype=dtype)
    u0 = jnp.zeros((4, 2), dtype)
    us, xs, cost, idx = sharded_candidate_sweep(
        params, limits, obstacle, x0, cands, qs, u0, 1.0, 1.0,
        num_horizon=4, mesh=mesh)
    # local reference: same sweep on one device
    sols = ilqr_solve_candidates(params, limits, obstacle, x0, cands, u0,
                                 1.0, 1.0, num_horizon=4)
    d = jnp.linalg.norm(sols.xs[:, -1, :] - cands, axis=-1)
    i_relax = jnp.maximum(jnp.ceil(d / 80.0 - 1e-12), 1.0)
    local_cost = jnp.where(d <= 80.0 * params.max_relax_iter,
                           qs + 4.0 + 100.0 * i_relax, jnp.inf)
    want = int(jnp.argmin(local_cost))
    assert int(idx) == want
    np.testing.assert_allclose(np.asarray(us), np.asarray(sols.us[want]),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_batched_nlmpc_converges():
    """Fully-jitted NLMPC lap sim: converges near the host path's 23 steps
    (fixed-horizon deviation documented in control/batched_nlmpc.py)."""
    from ilqr_iterative_tasks_tpu.control.batched_nlmpc import (
        simulate_nlmpc_batch)
    from ilqr_iterative_tasks_tpu.utils.params import LmpcParams

    params = LmpcParams.make(ss_option="spaceVarying")
    limits = SystemLimits.make(dtype=DT)
    xcl, ucl = seed_trajectory(1.0)
    seed_xs = jnp.zeros((128, 4), DT).at[:121].set(jnp.asarray(xcl, DT))
    seed_us = jnp.zeros((128, 2), DT).at[:120].set(jnp.asarray(ucl, DT))
    obstacle = Obstacle.make(31.0, -2.0, 8.0, 6.0, dtype=DT)
    scs = make_batch_scenarios(np.zeros(4), xcl[-1], obstacle, 2,
                               jax.random.PRNGKey(0), dtype=DT)
    res = simulate_nlmpc_batch(params, limits, scs, seed_xs, seed_us, 121,
                               1.0, num_laps=3, max_steps=128, max_laps=8)
    steps = np.asarray(res.lap_steps)  # (B, num_laps)
    assert np.all(res.lap_done)
    assert np.all(steps[0] == steps[1])  # identical lanes agree
    assert steps[0, 0] <= 40 and steps[0, -1] <= 26


@pytest.mark.slow
def test_batched_soa_moving_obstacle():
    """Batch-native sim with a moving obstacle: per-step advance + per-lap
    reset must influence but not break learning."""
    from ilqr_iterative_tasks_tpu.control.batched_soa import (
        SoaScenarios, simulate_learning_runs_soa)
    params, limits, seed_xs, seed_us, xcl, _ = _setup()
    moving = Obstacle.make(35.0, -16.0, 20.0, 20.0, spd=1.0, moving_option=1,
                           dtype=DT)
    scs = SoaScenarios.broadcast(np.zeros(4), xcl[-1], moving, 2,
                                 noise_on=False, dtype=DT)
    res = simulate_learning_runs_soa(
        params, limits, scs, seed_xs, seed_us, 121, 1.0,
        jax.random.PRNGKey(0), num_laps=3, max_steps=128, max_laps=8)
    steps = np.asarray(res.lap_steps)[:, 0]
    assert np.all(res.lap_done)
    assert steps[-1] <= 35  # learns despite the moving obstacle


@pytest.mark.slow
def test_soa_checkpoint_exact_resume(tmp_path):
    """2 laps + checkpoint + 1 resumed lap == 3 laps in one run, exactly
    (same safe-set tensors, same PRNG key threading)."""
    from ilqr_iterative_tasks_tpu.control.batched_soa import (
        SoaScenarios, simulate_learning_runs_soa)
    from ilqr_iterative_tasks_tpu.utils.checkpoint import (
        load_soa_run, save_soa_run)

    params, limits, seed_xs, seed_us, xcl, obstacle = _setup()
    scs = SoaScenarios.broadcast(np.zeros(4), xcl[-1], obstacle, 2,
                                 noise_on=True, dtype=DT)
    kw = dict(num_laps=None, max_steps=128, max_laps=8, solver_max_iter=40)
    key = jax.random.PRNGKey(7)

    kw["num_laps"] = 3
    full = simulate_learning_runs_soa(params, limits, scs, seed_xs, seed_us,
                                      121, 1.0, key, **kw)
    kw["num_laps"] = 2
    part = simulate_learning_runs_soa(params, limits, scs, seed_xs, seed_us,
                                      121, 1.0, key, **kw)
    path = str(tmp_path / "ck.npz")
    save_soa_run(path, part)
    resume, steps_part, _ = load_soa_run(path)
    kw["num_laps"] = 1
    rest = simulate_learning_runs_soa(params, limits, scs, seed_xs, seed_us,
                                      121, 1.0, resume[2], resume_from=resume,
                                      **kw)
    got = np.concatenate([steps_part, np.asarray(rest.lap_steps)], axis=0)
    np.testing.assert_array_equal(got, np.asarray(full.lap_steps))
    assert int(rest.lap_count) == 4  # seed + 3 learned laps


@pytest.mark.slow
def test_soa_randomized_scenarios_heterogeneous_obstacles():
    """Per-lane randomized x0 + obstacle geometry (BASELINE config 4) runs in
    one compiled program; mild jitter keeps every lane completing."""
    from ilqr_iterative_tasks_tpu.control.batched_soa import (
        SoaScenarios, simulate_learning_runs_soa)

    params, limits, seed_xs, seed_us, xcl, obstacle = _setup()
    # position-only jitter: the reference algorithm is brittle to even small
    # heading/velocity offsets (see SoaScenarios.randomized docstring)
    scs = SoaScenarios.randomized(np.zeros(4), xcl[-1], obstacle, 4,
                                  jax.random.PRNGKey(3),
                                  x0_jitter=(0.5, 0.5, 0.0, 0.0),
                                  obs_pos_jitter=2.0, noise_on=False,
                                  dtype=DT)
    ox = np.asarray(scs.obstacle.x)
    assert len(np.unique(ox)) == 4  # genuinely heterogeneous lanes
    res = simulate_learning_runs_soa(params, limits, scs, seed_xs, seed_us,
                                     121, 1.0, jax.random.PRNGKey(0),
                                     num_laps=3, max_steps=128, max_laps=8,
                                     solver_max_iter=40)
    steps = np.asarray(res.lap_steps)
    assert np.all(np.asarray(res.lap_done))
    assert (steps[-1] <= 30).all()


@pytest.mark.slow
def test_soa_enlarged_safe_set_config3():
    """BASELINE config 3 shape in the batch-native sim: num_ss_points=32,
    num_ss_iter=4 (4-row lexicographic selection, k > lap length early on)."""
    from ilqr_iterative_tasks_tpu.control.batched_soa import (
        SoaScenarios, simulate_learning_runs_soa)

    limits = SystemLimits.make(dtype=DT)
    params = IlqrParams.make(num_ss_points=32, num_ss_iter=4, dtype=DT)
    _, _, seed_xs, seed_us, xcl, obstacle = _setup()
    scs = SoaScenarios.broadcast(np.zeros(4), xcl[-1], obstacle, 2,
                                 noise_on=False, dtype=DT)
    res = simulate_learning_runs_soa(params, limits, scs, seed_xs, seed_us,
                                     121, 1.0, jax.random.PRNGKey(0),
                                     num_laps=3, max_steps=128, max_laps=8,
                                     solver_max_iter=40)
    steps = np.asarray(res.lap_steps)
    assert np.all(np.asarray(res.lap_done))
    # richer candidate sets accelerate early learning (host path: [~26, 23..])
    assert steps[0, 0] <= 60 and steps[-1, 0] <= 26
    assert (np.diff(steps[:, 0]) <= 0).all()


@pytest.mark.slow
def test_dedup_passes_bitwise_neutral():
    """Cross-pass candidate dedup (skip + compaction into the fused kernel)
    must be BITWISE neutral: a skipped lane's cached result is the same pure
    solve, and fresh lanes' results are tile-membership invariant (done lanes
    freeze their us/lamb in the lockstep loop)."""
    from ilqr_iterative_tasks_tpu.control.batched_soa import (
        SoaScenarios, simulate_learning_runs_soa)
    from ilqr_iterative_tasks_tpu.ops.pallas_ilqr import build_fused_ilqr

    params, limits, seed_xs, seed_us, xcl, obstacle = _setup()
    b = 16  # k*b = 128 = one tile_rows=1 tile
    scs = SoaScenarios.broadcast(np.zeros(4), xcl[-1], obstacle, b,
                                 noise_on=True, dtype=DT)
    kw = dict(num_laps=3, max_steps=128, max_laps=8, solver_max_iter=12)
    key = jax.random.PRNGKey(3)
    base_solver = build_fused_ilqr(params, limits, 1.0, num_horizon=6,
                                   max_iter=12, tile_rows=1, interpret=True)
    base = simulate_learning_runs_soa(params, limits, scs, seed_xs, seed_us,
                                      121, 1.0, key, pallas_solver=base_solver,
                                      **kw)
    skip_solver = build_fused_ilqr(params, limits, 1.0, num_horizon=6,
                                   max_iter=12, tile_rows=1, interpret=True,
                                   with_skip=True)
    dedup = simulate_learning_runs_soa(params, limits, scs, seed_xs, seed_us,
                                       121, 1.0, key,
                                       pallas_solver=skip_solver,
                                       dedup_passes=True, **kw)
    np.testing.assert_array_equal(np.asarray(base.lap_steps),
                                  np.asarray(dedup.lap_steps))
    np.testing.assert_array_equal(np.asarray(base.lap_done),
                                  np.asarray(dedup.lap_done))
    np.testing.assert_array_equal(np.asarray(base.final_x),
                                  np.asarray(dedup.final_x))
    for a, c in zip(base.safe_set, dedup.safe_set):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_inactive_skip_bitwise_neutral():
    """Inactive-lane compaction (done/replay lanes enter the fused kernel
    pre-done, actives compacted to the batch front) must be BITWISE neutral:
    per-lane results are tile-membership invariant, and inactive-lane outputs
    are fully masked by the simulator. This is the production straggler
    optimization (noise-on laps run to the 121-step budget while >99% of
    lanes are done)."""
    from ilqr_iterative_tasks_tpu.control.batched_soa import (
        SoaScenarios, simulate_learning_runs_soa)
    from ilqr_iterative_tasks_tpu.ops.pallas_ilqr import build_fused_ilqr

    params, limits, seed_xs, seed_us, xcl, obstacle = _setup()
    b = 16  # k*b = 128 = one tile_rows=1 tile
    scs = SoaScenarios.broadcast(np.zeros(4), xcl[-1], obstacle, b,
                                 noise_on=True, dtype=DT)
    kw = dict(num_laps=3, max_steps=128, max_laps=8, solver_max_iter=12)
    key = jax.random.PRNGKey(7)
    base_solver = build_fused_ilqr(params, limits, 1.0, num_horizon=6,
                                   max_iter=12, tile_rows=1, interpret=True)
    base = simulate_learning_runs_soa(params, limits, scs, seed_xs, seed_us,
                                      121, 1.0, key, pallas_solver=base_solver,
                                      **kw)
    skip_solver = build_fused_ilqr(params, limits, 1.0, num_horizon=6,
                                   max_iter=12, tile_rows=1, interpret=True,
                                   with_skip=True)
    assert skip_solver.with_skip
    fast = simulate_learning_runs_soa(params, limits, scs, seed_xs, seed_us,
                                      121, 1.0, key,
                                      pallas_solver=skip_solver, **kw)
    np.testing.assert_array_equal(np.asarray(base.lap_steps),
                                  np.asarray(fast.lap_steps))
    np.testing.assert_array_equal(np.asarray(base.lap_done),
                                  np.asarray(fast.lap_done))
    for a, c in zip(base.safe_set, fast.safe_set):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_lex_argmin_tile_matches_python_list_min():
    """The in-kernel shared selection helper (ops/_pallas_lm_core.
    lex_argmin_tile) is plain jnp math — check it directly against Python's
    min() over per-lap cost lists (the reference semantics, base.py:462)
    and first-min argmin over the winning row."""
    from ilqr_iterative_tasks_tpu.ops._pallas_lm_core import lex_argmin_tile

    rng = np.random.default_rng(21)
    nsi, k, shp = 3, 4, (2, 5)
    for _ in range(20):
        cost = rng.choice([1.0, 2.0, 3.0, np.inf], size=(nsi, k) + shp)
        rows = [[jnp.asarray(cost[i, j], jnp.float32) for j in range(k)]
                for i in range(nsi)]
        br, bc, bcost = lex_argmin_tile(rows, shp)
        br, bc, bcost = np.asarray(br), np.asarray(bc), np.asarray(bcost)
        for a in range(shp[0]):
            for b in range(shp[1]):
                lists = [list(cost[i, :, a, b]) for i in range(nsi)]
                want_row = lists.index(min(lists))
                want_col = int(np.argmin(cost[want_row, :, a, b]))
                assert br[a, b] == want_row, (cost[:, :, a, b], br[a, b])
                assert bc[a, b] == want_col
                assert bcost[a, b] == cost[want_row, want_col, a, b]


def test_retile_bitwise_neutral():
    """Periodic straggler re-tiling (``retile_frac``, VERDICT r4 #1) is a
    pure schedule change: all per-lane state (solver carry, records, safe
    set, scenario leaves) permutes together, noise draws are routed by the
    carried original lane ids, and outputs return in original lane order —
    so the run must be BITWISE identical to retile off. Randomized
    heterogeneous scenarios + noise exercise per-lane divergence."""
    from ilqr_iterative_tasks_tpu.control.batched_soa import (
        SoaScenarios, simulate_learning_runs_soa)

    params, limits, seed_xs, seed_us, xcl, obstacle = _setup()
    scs = SoaScenarios.randomized(np.zeros(4), xcl[-1], obstacle, 48,
                                  jax.random.PRNGKey(42), noise_on=True,
                                  dtype=DT)
    kw = dict(num_laps=2, max_steps=128, max_laps=8, solver_max_iter=12,
              sim_step_budget=50)
    key = jax.random.PRNGKey(7)
    base = simulate_learning_runs_soa(params, limits, scs, seed_xs, seed_us,
                                      121, 1.0, key, **kw)
    rt = simulate_learning_runs_soa(params, limits, scs, seed_xs, seed_us,
                                    121, 1.0, key, retile_frac=0.2, **kw)
    np.testing.assert_array_equal(np.asarray(base.lap_steps),
                                  np.asarray(rt.lap_steps))
    np.testing.assert_array_equal(np.asarray(base.lap_done),
                                  np.asarray(rt.lap_done))
    for j in range(4):
        np.testing.assert_array_equal(np.asarray(base.safe_set[j]),
                                      np.asarray(rt.safe_set[j]))
    np.testing.assert_array_equal(np.asarray(base.final_key),
                                  np.asarray(rt.final_key))


def test_tail_shrink_bitwise_neutral():
    """``tail_shrink`` (round-5 tail prefix-shrink): after the one-shot
    3-way compaction permute (solver-active, replay-not-done, done) the
    not-done lanes occupy a static prefix forever (done-ness is monotone
    within a lap), so the record writes restrict to the prefix — and with
    a step kernel the solve would too. Full-width writes are no-ops for
    done lanes, so the run must be BITWISE identical. f64: the tail
    machinery changes the compiled program, and cross-compilation bitwise
    comparison is only valid at f64 (docs/PARITY.md convention — at f32
    the recompiled fusion shifts late-lap rounding by ~1e-3 while lap
    decisions stay identical)."""
    from ilqr_iterative_tasks_tpu.control.batched_soa import (
        SoaScenarios, simulate_learning_runs_soa)

    f64 = jnp.float64
    params, limits, seed_xs, seed_us, xcl, obstacle = _setup(dtype=f64)
    scs = SoaScenarios.randomized(np.zeros(4), xcl[-1], obstacle, 48,
                                  jax.random.PRNGKey(42), noise_on=True,
                                  dtype=f64)
    kw = dict(num_laps=2, max_steps=128, max_laps=8, solver_max_iter=12,
              sim_step_budget=50)
    key = jax.random.PRNGKey(7)
    base = simulate_learning_runs_soa(params, limits, scs, seed_xs, seed_us,
                                      121, 1.0, key, **kw)
    ts = simulate_learning_runs_soa(params, limits, scs, seed_xs, seed_us,
                                    121, 1.0, key, tail_shrink=16, **kw)
    both = simulate_learning_runs_soa(params, limits, scs, seed_xs, seed_us,
                                      121, 1.0, key, tail_shrink=16,
                                      retile_frac=0.25, **kw)
    for r in (ts, both):
        np.testing.assert_array_equal(np.asarray(base.lap_steps),
                                      np.asarray(r.lap_steps))
        np.testing.assert_array_equal(np.asarray(base.lap_done),
                                      np.asarray(r.lap_done))
        for j in range(4):
            np.testing.assert_array_equal(np.asarray(base.safe_set[j]),
                                          np.asarray(r.safe_set[j]))
