"""Ragged Python-list lexicographic selection semantics (base.py:462/:605).

The reference compares per-lap candidate cost LISTS with Python ``min``;
when ``num_ss_points`` exceeds a stored lap's length a list is shorter, and
a strict-prefix list ranks BELOW its extension. The batched paths emulate
this with a comparison-only tensor that ranks absent tail slots -inf (real
costs keep +inf so within-row argmin and the all-infeasible test are
unchanged). These tests pin that emulation against a Python oracle —
including exact prefix ties, which the previous +inf padding resolved the
WRONG way (toward the longer lap) — and pin the k=32/short-lap closed loop
(the recommended brittleness-rescue config) to the host controller exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ilqr_iterative_tasks_tpu.control.batched_soa import _lex_argmin_rows
from ilqr_iterative_tasks_tpu.ops._pallas_lm_core import lex_argmin_tile


def _ragged_oracle(cost, lens):
    """Python min() over ragged per-lap lists. cost: (L, K); lens: (L,)."""
    lists = [list(cost[i, :lens[i]]) for i in range(len(lens))]
    want_row = lists.index(min(lists))
    want_col = int(np.argmin(cost[want_row, :lens[want_row]]))
    return want_row, want_col


def _random_ragged(rng, nsi, k):
    """Random ragged tier-quantized costs with frequent exact prefix ties."""
    lens = rng.integers(1, k + 1, size=nsi)
    # tier-quantized values (q + n + 100*i with small-integer q) tie often,
    # like the real relaxed reach costs
    cost = rng.choice([107.0, 108.0, 207.0, 208.0, np.inf],
                      size=(nsi, k)).astype(np.float64)
    # force a strict-prefix tie between rows 0 and 1 half the time
    if nsi >= 2 and rng.random() < 0.5:
        la, lb = sorted(rng.integers(1, k + 1, size=2))
        lens[0], lens[1] = lb, la  # row 1 strictly shorter or equal
        cost[1, :la] = cost[0, :la]  # exact prefix tie
    cmp = cost.copy()
    for i in range(nsi):
        cmp[i, lens[i]:] = -np.inf
    return cost, cmp, lens


def test_lex_argmin_rows_ragged_matches_python_list_min():
    rng = np.random.default_rng(31)
    for _ in range(60):
        nsi, k = int(rng.integers(2, 5)), int(rng.integers(2, 7))
        cost, cmp, lens = _random_ragged(rng, nsi, k)
        best = int(_lex_argmin_rows(jnp.asarray(cmp)[:, :, None])[0])
        want_row, _ = _ragged_oracle(cost, lens)
        assert best == want_row, (cost, lens, best, want_row)


def test_lex_argmin_tile_cmp_rows_ragged_matches_python_list_min():
    """lex_argmin_tile with cmp_rows (the in-kernel ragged emulation shared
    by both whole-step kernels) vs the Python oracle; the within-row argmin
    must still use REAL costs (+inf at absent slots)."""
    rng = np.random.default_rng(32)
    nsi, k, shp = 3, 5, (1, 8)
    for _ in range(25):
        cost = np.empty((nsi, k) + shp)
        cmp = np.empty_like(cost)
        lens = np.empty(shp, dtype=object)
        for a in range(shp[0]):
            for b in range(shp[1]):
                c, m, ln = _random_ragged(rng, nsi, k)
                cost[:, :, a, b], cmp[:, :, a, b] = c, m
                lens[a, b] = ln
        rows = [[jnp.asarray(cost[i, j], jnp.float32) for j in range(k)]
                for i in range(nsi)]
        # real costs carry +inf at absent slots (cand_ok mask in the kernels)
        for i in range(nsi):
            for j in range(k):
                rows[i][j] = jnp.where(jnp.asarray(cmp[i, j] == -np.inf),
                                       jnp.inf, rows[i][j])
        cmps = [[jnp.asarray(cmp[i, j], jnp.float32) for j in range(k)]
                for i in range(nsi)]
        br, bc, _ = lex_argmin_tile(rows, shp, cmp_rows=cmps)
        br, bc = np.asarray(br), np.asarray(bc)
        for a in range(shp[0]):
            for b in range(shp[1]):
                want_row, want_col = _ragged_oracle(cost[:, :, a, b],
                                                    lens[a, b])
                assert br[a, b] == want_row, (cost[:, :, a, b], lens[a, b])
                assert bc[a, b] == want_col


def test_prefix_tie_flips_selection_vs_inf_padding():
    """The concrete failure mode of +inf padding: a strict-prefix tie.
    Row 1 (shorter lap) == row 0's prefix -> Python ranks row 1 BELOW row 0;
    +inf padding would rank row 0 (the extension) first."""
    cost = np.array([[107.0, 108.0, 109.0],
                     [107.0, 108.0, np.inf]])  # slot 2 of row 1 is ABSENT
    cmp = cost.copy()
    cmp[1, 2] = -np.inf
    assert int(_lex_argmin_rows(jnp.asarray(cmp)[:, :, None])[0]) == 1
    # the old padding picks the wrong row (kept as documentation of the bug)
    assert int(_lex_argmin_rows(jnp.asarray(cost)[:, :, None])[0]) == 0


@pytest.mark.slow
def test_k32_short_lap_closed_loop_matches_host_exactly():
    """k=32 / nsi=2 (k far above the converged ~23-step lap length — the
    brittleness-rescue regime, docs/PERF.md): the batched SoA sim must equal
    the reference-faithful host controller lap-for-lap at f64 zero-noise.
    This drives the ragged lexicographic compare end-to-end: from lap 3 on,
    both compared laps are shorter than k, so every selection uses ragged
    rows and prefix ties are live."""
    from ilqr_iterative_tasks_tpu.control.batched_soa import (
        SoaScenarios, simulate_learning_runs_soa)
    from ilqr_iterative_tasks_tpu.control.i2lqr import I2LqrController
    from ilqr_iterative_tasks_tpu.experiments.runner import (
        default_obstacle, run_closed_loop)
    from ilqr_iterative_tasks_tpu.models.obstacle import Obstacle
    from ilqr_iterative_tasks_tpu.sim.seed import seed_trajectory
    from ilqr_iterative_tasks_tpu.utils.params import (IlqrParams,
                                                       SystemLimits)

    params = IlqrParams.make(num_ss_points=32, num_ss_iter=2,
                             dtype=jnp.float64)
    ctrl = I2LqrController(params, obstacle=default_obstacle(1.0),
                           dtype=jnp.float64)
    host = run_closed_loop(ctrl, lap_number=4, dt=1.0, goal_fixup="append")
    assert all(host.lap_finished)

    limits = SystemLimits.make(dtype=jnp.float64)
    xcl, ucl = seed_trajectory(1.0)
    seed_xs = jnp.zeros((128, 4), jnp.float64).at[:121].set(
        jnp.asarray(xcl, jnp.float64))
    seed_us = jnp.zeros((128, 2), jnp.float64).at[:120].set(
        jnp.asarray(ucl, jnp.float64))
    obstacle = Obstacle.make(31.0, -2.0, 8.0, 6.0, dtype=jnp.float64)
    scs = SoaScenarios.broadcast(np.zeros(4), xcl[-1], obstacle, 2,
                                 noise_on=False, dtype=jnp.float64)
    res = simulate_learning_runs_soa(params, limits, scs, seed_xs, seed_us,
                                     121, 1.0, jax.random.PRNGKey(0),
                                     num_laps=4, max_steps=128, max_laps=8)
    steps = np.asarray(res.lap_steps)
    assert np.all(np.asarray(res.lap_done))
    assert (steps == steps[:, :1]).all()
    assert steps[:, 0].tolist() == [int(t) for t in host.lap_times]
