"""Behavior-level parity envelope gates for non-bitwise optimizations.

The fused kernels' bitwise tests gate decision-identical optimizations; the
envelope (utils/envelope.py, docs/PARITY.md) gates optimizations that change
floating-point trajectories but must not change closed-loop BEHAVIOR. Each
gated optimization gets one test here running the full learning sim with
and without it over the same scenario batch and PRNG key.

Gate history:
- NLMPC zeros-start skip: envelope-VALID in round 3 (shortcut semantics),
  envelope-REJECTED since round 4's exact per-lane horizon shrink (the
  tie-flip now changes shrink-cascade entry) — retired from bench.py; the
  rejection itself is pinned below.
- i2LQR stall-reseed guard: must be behavior-neutral on NOMINAL scenarios
  (its effect exists only on the randomized brittleness configs).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ilqr_iterative_tasks_tpu.control.batched_nlmpc_soa import (
    simulate_nlmpc_runs_soa)
from ilqr_iterative_tasks_tpu.control.batched_soa import SoaScenarios
from ilqr_iterative_tasks_tpu.models.obstacle import Obstacle
from ilqr_iterative_tasks_tpu.ops.pallas_nlmpc_step import (
    build_fused_nlmpc_step)
from ilqr_iterative_tasks_tpu.sim.seed import seed_trajectory
from ilqr_iterative_tasks_tpu.utils.envelope import (
    assert_behavior_envelope, compare_runs)
from ilqr_iterative_tasks_tpu.utils.params import LmpcParams, SystemLimits

DT = jnp.float32


@pytest.mark.slow
def test_nlmpc_zeros_skip_rejected_by_envelope():
    """zeros_skip was ENVELOPE-VALID in round 3 (shortcut semantics) and is
    ENVELOPE-REJECTED since round 4's exact per-lane horizon shrink: a
    multi-start tie broken the other way can change whether a lane enters
    the near-goal shrink cascade (whose h1 reach test is
    noise-unsatisfiable, the reference's pause-forever state), so the
    "equally valid solution" argument no longer holds — measured
    completion drops ~6 pp at this gate config. The optimization is
    therefore retired from bench.py; this test pins BOTH facts: the gate
    rejects it, and the perturbation is still non-trivial (so the flag
    still does something — if it ever becomes a no-op, revisit)."""
    params = LmpcParams.make(ss_option="spaceVarying")
    limits = SystemLimits.make(dtype=DT)
    xcl, ucl = seed_trajectory(1.0)
    seed_xs = jnp.zeros((128, 4), DT).at[:121].set(jnp.asarray(xcl, DT))
    seed_us = jnp.zeros((128, 2), DT).at[:120].set(jnp.asarray(ucl, DT))
    obstacle = Obstacle.make(31.0, -2.0, 8.0, 6.0, dtype=DT)
    b = 128
    scs = SoaScenarios.broadcast(np.zeros(4), xcl[-1], obstacle, b,
                                 noise_on=True, dtype=DT)
    kw = dict(num_laps=2, max_steps=128, max_laps=8, max_lm_iters=12,
              sim_step_budget=70)
    key = jax.random.PRNGKey(5)
    runs = []
    for zs in (False, True):
        solver = build_fused_nlmpc_step(
            params, limits, 1.0, num_horizon=params.num_horizon,
            max_steps=128, max_laps=8, max_iters=12, tile_rows=1,
            zeros_skip=zs, interpret=True)
        runs.append(simulate_nlmpc_runs_soa(
            params, limits, scs, seed_xs, seed_us, 121, 1.0, key,
            pallas_step_solver=solver, **kw))
    rec = compare_runs(runs[0], runs[1])
    assert rec["frac_lanes_changed"] > 0.0  # the flag still perturbs
    with pytest.raises(AssertionError):
        assert_behavior_envelope(runs[0], runs[1])


def test_envelope_helper_rejects_material_drift():
    """The envelope must actually fail when behavior drifts: simulate a
    candidate whose median lap time regressed by one step."""
    class R:
        def __init__(self, steps, done):
            self.lap_steps = steps
            self.lap_done = done

    steps = np.full((2, 64), 24, np.int32)
    done = np.ones((2, 64), bool)
    base = R(steps, done)
    worse = R(steps + 1, done)
    with pytest.raises(AssertionError):
        assert_behavior_envelope(base, worse)
    rec = compare_runs(base, worse)
    assert rec["delta_max"] == 1.0


@pytest.mark.slow
def test_i2lqr_stall_reseed_within_envelope_on_nominal():
    """The stall-reseed robustness guard (control/batched_soa.py
    ``stall_reseed``) must be behavior-neutral on NOMINAL scenarios: the
    winner's time-to-go decreases nearly every step there, so the S=3
    trigger (3 consecutive no-progress steps) should almost never fire —
    any lanes it does touch must stay within the noise-level envelope.
    Its intended effect (un-parking stalled lanes) only exists on the
    randomized-jitter brittleness configs, measured on the bench canary
    (docs/PERF.md)."""
    from ilqr_iterative_tasks_tpu.control.batched_soa import (
        simulate_learning_runs_soa)
    from ilqr_iterative_tasks_tpu.utils.params import IlqrParams

    params = IlqrParams.make(dtype=DT)
    limits = SystemLimits.make(dtype=DT)
    xcl, ucl = seed_trajectory(1.0)
    seed_xs = jnp.zeros((128, 4), DT).at[:121].set(jnp.asarray(xcl, DT))
    seed_us = jnp.zeros((128, 2), DT).at[:120].set(jnp.asarray(ucl, DT))
    obstacle = Obstacle.make(31.0, -2.0, 8.0, 6.0, dtype=DT)
    b = 128
    scs = SoaScenarios.broadcast(np.zeros(4), xcl[-1], obstacle, b,
                                 noise_on=True, dtype=DT)
    kw = dict(num_laps=2, max_steps=128, max_laps=8, solver_max_iter=12,
              sim_step_budget=70)
    key = jax.random.PRNGKey(13)
    runs = [simulate_learning_runs_soa(
        params, limits, scs, seed_xs, seed_us, 121, 1.0, key,
        stall_reseed=sr, **kw) for sr in (None, 3)]
    assert_behavior_envelope(runs[0], runs[1])
