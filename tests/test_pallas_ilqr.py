"""Fused Pallas kernel vs the SoA solver (interpret mode on CPU).

f32 LM accept/reject cascades make bitwise comparison meaningless on chaotic
far candidates (documented in ops/pallas_ilqr.py); parity is asserted at the
level the controller consumes: relaxed-cost tiers and candidate argmin on
realistic (safe-set-like) candidate sets, plus tight agreement on converged
lanes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ilqr_iterative_tasks_tpu.models.obstacle import Obstacle
from ilqr_iterative_tasks_tpu.ops.ilqr_soa import ilqr_solve_soa
from ilqr_iterative_tasks_tpu.ops.pallas_ilqr import (
    TILE, build_fused_ilqr, obstacle_to_lanes)
from ilqr_iterative_tasks_tpu.sim.seed import seed_trajectory
from ilqr_iterative_tasks_tpu.utils.params import IlqrParams, SystemLimits

DT = jnp.float32


def _realistic_candidates(batch):
    """Terminal candidates sampled from seed-trajectory states (the actual
    i2LQR candidate distribution), tiled + jittered to fill the batch."""
    xcl, _ = seed_trajectory(1.0)
    rng = np.random.default_rng(0)
    rows = xcl[rng.integers(4, 14, size=batch)]
    rows = rows + rng.normal(size=rows.shape) * 0.05
    return jnp.asarray(rows.T, DT)  # (4, batch)


@pytest.mark.slow
def test_pallas_matches_soa_at_decision_level():
    params = IlqrParams.make(dtype=DT)
    limits = SystemLimits.make(dtype=DT)
    obs = Obstacle.make(31.0, -2.0, 8.0, 6.0, dtype=DT)
    batch = 1024
    xts = _realistic_candidates(batch)
    x0 = jnp.zeros((4, batch), DT)
    solve = build_fused_ilqr(params, limits, 1.0, num_horizon=6,
                             tile_rows=8, interpret=True)
    us_p, xl_p, cost_p, dist_p = solve(x0, xts, jnp.zeros((6, 2, batch), DT),
                                       obstacle_to_lanes(obs, batch))
    ref = ilqr_solve_soa(params, limits, obs, jnp.zeros(4, DT), xts,
                         jnp.zeros((6, 2, batch), DT), 1.0, 1.0,
                         num_horizon=6)
    dist_s = np.sqrt(np.asarray(
        ((ref.xs[-1] - xts) ** 2).sum(axis=0)))
    # relaxed-cost tier (what the controller actually consumes,
    # base.py:427-437 at pass 0: ceil(d/80)) must agree on virtually all lanes
    tier_p = np.maximum(np.ceil(np.asarray(dist_p) / 80.0), 1.0)
    tier_s = np.maximum(np.ceil(dist_s / 80.0), 1.0)
    assert (tier_p == tier_s).mean() >= 0.999
    # converged lanes (reachable candidates) agree tightly
    conv = dist_s < 1.0
    assert conv.mean() > 0.5  # realistic candidates are mostly reachable
    dd = np.abs(np.asarray(dist_p)[conv] - dist_s[conv])
    # f32 accept/reject cascades can move a handful of borderline lanes;
    # require 99.5% tight agreement and a tiny median
    assert (dd < 0.2).mean() >= 0.995, dd.max()
    assert float(np.median(dd)) < 1e-3
    du = np.abs(np.asarray(us_p - ref.us)).max(axis=(0, 1))
    assert float(np.median(du[conv])) < 1e-2


@pytest.mark.slow
def test_pallas_argmin_matches_soa():
    """The candidate selection (argmin of Qfun + tiered cost) must pick the
    same winner as the SoA path on realistic candidate pools."""
    params = IlqrParams.make(dtype=DT)
    limits = SystemLimits.make(dtype=DT)
    obs = Obstacle.make(31.0, -2.0, 8.0, 6.0, dtype=DT)
    batch = 1024
    xts = _realistic_candidates(batch)
    x0 = jnp.zeros((4, batch), DT)
    qfun = jnp.asarray(np.random.default_rng(1).integers(
        10, 100, size=batch), DT)
    solve = build_fused_ilqr(params, limits, 1.0, num_horizon=6,
                             tile_rows=8, interpret=True)
    _, _, _, dist_p = solve(x0, xts, jnp.zeros((6, 2, batch), DT),
                            obstacle_to_lanes(obs, batch))
    ref = ilqr_solve_soa(params, limits, obs, jnp.zeros(4, DT), xts,
                         jnp.zeros((6, 2, batch), DT), 1.0, 1.0,
                         num_horizon=6)
    dist_s = jnp.sqrt(((ref.xs[-1] - xts) ** 2).sum(axis=0))

    def relax_cost(d):
        i = np.maximum(np.ceil(np.asarray(d) / 80.0 - 1e-12), 1.0)
        return np.where(np.asarray(d) <= 80.0 * 55, np.asarray(qfun) + 6.0
                        + 100.0 * i, np.inf)

    # compare winners within each group of 8 (the per-step candidate count)
    cp = relax_cost(dist_p).reshape(-1, 8)
    cs = relax_cost(dist_s).reshape(-1, 8)
    agree = (cp.argmin(axis=1) == cs.argmin(axis=1)).mean()
    assert agree >= 0.99
