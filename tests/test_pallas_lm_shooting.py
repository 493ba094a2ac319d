"""Fused Pallas LM-shooting kernel vs the SoA solver (interpret mode, CPU).

Both sides run the same algorithm in f32; iterates are identical up to
fused-multiply reassociation, so parity is asserted at the level the NLMPC
controller consumes (feasibility decisions) plus tight numeric agreement on
feasible lanes.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ilqr_iterative_tasks_tpu.models.obstacle import Obstacle
from ilqr_iterative_tasks_tpu.ops.lm_shooting_soa import (
    lm_feasibility_solve_soa)
from ilqr_iterative_tasks_tpu.ops.pallas_lm_shooting import (
    build_fused_lm_shooting, obstacle_to_lanes_nlmpc)
from ilqr_iterative_tasks_tpu.sim.seed import seed_trajectory
from ilqr_iterative_tasks_tpu.utils.params import SystemLimits

DT = jnp.float32


def _rollout_check(x0, xts, us, obs):
    """Roll ``us`` (N,2,B) through the dynamics; return (term_err (B,),
    max ellipse violation (B,)) as numpy."""
    from ilqr_iterative_tasks_tpu.ops.ilqr_soa import step_soa

    n = us.shape[0]
    xs = [tuple(x0[i] for i in range(4))]
    for j in range(n):
        xs.append(step_soa(xs[-1], (us[j, 0], us[j, 1]), 1.0))
    te = jnp.sqrt(sum((xs[n][i] - xts[i]) ** 2 for i in range(4)))
    viol = None
    for k in range(1, n):
        cx, cy = obs.center_at(float(k))
        g = obs.present * (1.0 - ((xs[k][0] - cx) ** 2 / obs.width ** 2
                                  + (xs[k][1] - cy) ** 2 / obs.height ** 2))
        viol = g if viol is None else jnp.maximum(viol, g)
    return np.asarray(te), np.asarray(viol)


def _realistic_candidates(batch):
    """Terminal candidates sampled from seed-trajectory states (the actual
    NLMPC candidate distribution), jittered."""
    xcl, _ = seed_trajectory(1.0)
    rng = np.random.default_rng(1)
    rows = xcl[rng.integers(4, 14, size=batch)]
    rows = rows + rng.normal(size=rows.shape) * 0.05
    return jnp.asarray(rows.T, DT)  # (4, batch)


@pytest.mark.slow
@pytest.mark.parametrize("moving", [False, True])
def test_pallas_lm_matches_soa(moving):
    limits = SystemLimits.make(dtype=DT)
    if moving:
        obs = Obstacle.make(8.0, -1.0, 4.0, 3.0, spd=0.5, moving_option=1,
                            dtype=DT)
    else:
        obs = Obstacle.make(8.0, -1.0, 4.0, 3.0, dtype=DT)
    batch = 1024
    xts = _realistic_candidates(batch)
    x0 = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 1.0, 0.0], DT)[:, None], (4, batch))
    rng = np.random.default_rng(2)
    u_warm = jnp.asarray(0.3 * rng.normal(size=(6, 2, batch)), DT)

    solve = build_fused_lm_shooting(limits, 1.0, num_horizon=6,
                                    tile_rows=8, interpret=True)
    us_p, xl_p, te_p, fe_p = solve(x0, xts, u_warm,
                                   obstacle_to_lanes_nlmpc(obs, batch))
    ref = lm_feasibility_solve_soa(limits, obs, x0, xts, u_warm, 1.0,
                                   num_horizon=6, max_iters=60)
    fe_s = np.asarray(ref.feasible)
    fe_pb = np.asarray(fe_p) > 0.5
    # f32 accept/reject cascades can flip a handful of borderline lanes
    assert (fe_pb == fe_s).mean() >= 0.99
    both = fe_pb & fe_s
    assert both.mean() > 0.5  # realistic candidates are mostly feasible
    np.testing.assert_allclose(np.asarray(te_p)[both],
                               np.asarray(ref.term_err)[both], atol=2e-4)
    # No elementwise input comparison: with an obstacle the feasibility
    # problem is multi-modal (pass left/right), and f32 rounding picks
    # different zero-residual solutions on a large fraction of lanes EVEN
    # between the AoS and SoA XLA paths (measured >50% lane divergence at
    # 100% feasibility agreement). The controller-level contract is the
    # feasibility decision + A feasible input; re-roll the kernel's inputs
    # through the dynamics and check they genuinely satisfy the NLP.
    te_roll, viol_roll = _rollout_check(x0, xts, us_p, obs)
    assert np.all(te_roll[fe_pb] <= 1.5e-4)  # f32 re-rollout slack
    assert np.all(viol_roll[fe_pb] <= 1.5e-4)


def test_pallas_lm_absent_obstacle():
    """present=0 must disable the keep-out rows entirely."""
    limits = SystemLimits.make(dtype=DT)
    obs = Obstacle.absent(dtype=DT)
    batch = 1024
    xts = _realistic_candidates(batch)
    x0 = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 1.0, 0.0], DT)[:, None], (4, batch))
    u_warm = jnp.zeros((6, 2, batch), DT)
    solve = build_fused_lm_shooting(limits, 1.0, num_horizon=6,
                                    tile_rows=8, interpret=True)
    _, _, te_p, fe_p = solve(x0, xts, u_warm,
                             obstacle_to_lanes_nlmpc(obs, batch))
    ref = lm_feasibility_solve_soa(limits, obs, x0, xts, u_warm, 1.0,
                                   num_horizon=6, max_iters=60)
    assert ((np.asarray(fe_p) > 0.5) == np.asarray(ref.feasible)).mean() \
        >= 0.99


@pytest.mark.slow
def test_pallas_lm_with_hzn_matches_soa_m_lanes():
    """with_hzn=True applies the exact per-lane horizon-m masking of
    lm_feasibility_solve_soa(m_lanes=...) (the LMPC shrinking-horizon
    branch, base.py:640-654): feasibility decisions agree with the SoA
    reference at every m in [2, N], and x_last reports the horizon-m state."""
    limits = SystemLimits.make(dtype=DT)
    obs = Obstacle.make(8.0, -1.0, 4.0, 3.0, dtype=DT)
    batch = 1024
    xts = _realistic_candidates(batch)
    x0 = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 1.0, 0.0], DT)[:, None], (4, batch))
    rng = np.random.default_rng(5)
    u_warm = jnp.asarray(0.3 * rng.normal(size=(6, 2, batch)), DT)
    hzn = jnp.asarray(rng.integers(2, 7, size=batch), jnp.int32)

    solve = build_fused_lm_shooting(limits, 1.0, num_horizon=6,
                                    tile_rows=8, interpret=True,
                                    with_skip=True, with_hzn=True)
    us_p, xm_p, te_p, fe_p = solve(x0, xts, u_warm,
                                   obstacle_to_lanes_nlmpc(obs, batch),
                                   None, hzn)
    ref = lm_feasibility_solve_soa(limits, obs, x0, xts, u_warm, 1.0,
                                   num_horizon=6, max_iters=60,
                                   m_lanes=hzn)
    fe_s = np.asarray(ref.feasible)
    fe_pb = np.asarray(fe_p) > 0.5
    assert (fe_pb == fe_s).mean() >= 0.99  # f32 borderline-lane slack
    both = fe_pb & fe_s
    assert both.mean() > 0.4
    np.testing.assert_allclose(np.asarray(te_p)[both],
                               np.asarray(ref.term_err)[both], atol=2e-4)
    # x_last must be the horizon-m state: re-roll the kernel's inputs and
    # compare against the m-indexed rollout state per lane
    from ilqr_iterative_tasks_tpu.ops.ilqr_soa import step_soa
    xs = [tuple(x0[i] for i in range(4))]
    for j in range(6):
        xs.append(step_soa(xs[-1], (us_p[j, 0], us_p[j, 1]), 1.0))
    m_np = np.asarray(hzn)
    for c in range(4):
        want = np.stack([np.asarray(xs[m][c]) for m in range(7)])[
            m_np, np.arange(batch)]
        np.testing.assert_allclose(np.asarray(xm_p[c]), want, atol=1e-5)
