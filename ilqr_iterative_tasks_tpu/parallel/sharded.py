"""Pod-scale sharded execution paths.

Two first-class parallel axes (SURVEY.md §2 'Native components & parallelism'):

1. **Scenario data parallelism** — thousands of independent lap simulations
   sharded over the mesh; no cross-device communication until metrics
   reduction. (`simulate_learning_batch_sharded`)

2. **Candidate parallelism** — ONE control step whose safe-set candidate sweep
   is sharded across devices (the ss_option=all / 16k-candidate regime,
   base.py:569-571 at scale). Each device solves its candidate shard, reduces
   to a local best, then the global best is selected with ICI collectives
   inside shard_map (allgather of per-device (cost, index) pairs — bytes, not
   trajectories; the winning trajectory is then broadcast).
   (`sharded_candidate_sweep`)

The reference has no distributed runtime at all; this module is the TPU-native
equivalent of what NCCL/MPI would be in a CUDA framework.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ilqr_iterative_tasks_tpu.control.batched import (
    ScenarioSpec, make_batch_scenarios, simulate_learning_batch)
from ilqr_iterative_tasks_tpu.models.obstacle import Obstacle
from ilqr_iterative_tasks_tpu.ops.ilqr import ilqr_solve
from ilqr_iterative_tasks_tpu.parallel.mesh import make_mesh
from ilqr_iterative_tasks_tpu.utils.params import IlqrParams, SystemLimits


def shard_scenarios(scenarios: ScenarioSpec, mesh: Mesh,
                    axis: str = "scenario") -> ScenarioSpec:
    """Place a scenario batch with its leading axis sharded over the mesh."""
    sh = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), scenarios)


def simulate_learning_batch_sharded(params, limits, scenarios, seed_xs,
                                    seed_us, seed_len, dt, mesh: Mesh,
                                    **kw):
    """Scenario-sharded full learning runs: jit partitions the vmapped program
    over the mesh given sharded inputs (XLA inserts no collectives — the work
    is embarrassingly parallel; metric reductions happen at the caller)."""
    scenarios = shard_scenarios(scenarios, mesh)
    return simulate_learning_batch(params, limits, scenarios, seed_xs,
                                   seed_us, seed_len, dt, **kw)


@partial(jax.jit, static_argnames=("num_horizon", "axis_name", "mesh"))
def _candidate_sweep_impl(params: IlqrParams, limits: SystemLimits,
                          obstacle: Obstacle, x0, x_terminals, q_terms,
                          u_init, lamb0, dt, *, num_horizon: int,
                          mesh: Mesh, axis_name: str = "candidate"):
    n_dev = mesh.devices.size

    def local_sweep(x_terms_l, q_terms_l):
        """Runs on one device with its candidate shard (C/n_dev, 4)."""
        sols = jax.vmap(
            lambda xt: ilqr_solve(params, limits, obstacle, x0, xt, u_init,
                                  lamb0, dt, num_horizon=num_horizon)
        )(x_terms_l)
        d = jnp.linalg.norm(sols.xs[:, -1, :] - x_terms_l, axis=-1)
        # candidate cost: Qfun + horizon + distance penalty (relaxation pass 0)
        unit = 80.0
        i_relax = jnp.maximum(jnp.ceil(d / unit - 1e-12), 1.0)
        cost = jnp.where(d <= unit * params.max_relax_iter,
                         q_terms_l + float(num_horizon) + 100.0 * i_relax,
                         jnp.inf)
        local_best = jnp.argmin(cost)
        my_idx = jax.lax.axis_index(axis_name)
        # ICI reduction: gather (cost, owner, local_index) triples — O(n_dev)
        # scalars over the interconnect, not trajectories.
        all_costs = jax.lax.all_gather(cost[local_best], axis_name)
        all_owners = jax.lax.all_gather(my_idx, axis_name)
        all_locals = jax.lax.all_gather(local_best, axis_name)
        winner = jnp.argmin(all_costs)
        owner = all_owners[winner]
        win_local = all_locals[winner]
        # broadcast the winning trajectory from its owner via masked psum
        mine = (my_idx == owner).astype(sols.us.dtype)
        us_win = jax.lax.psum(sols.us[win_local] * mine, axis_name)
        xs_win = jax.lax.psum(sols.xs[win_local] * mine, axis_name)
        best_cost = all_costs[winner]
        global_idx = owner * x_terms_l.shape[0] + win_local
        return us_win, xs_win, best_cost, global_idx

    from jax import shard_map
    sharded = shard_map(
        local_sweep, mesh=mesh,
        in_specs=(P(axis_name), P(axis_name)),
        out_specs=(P(), P(), P(), P()), check_vma=False)
    return sharded(x_terminals, q_terms)


def sharded_candidate_sweep(params, limits, obstacle, x0, x_terminals,
                            q_terms, u_init, lamb0, dt, *, num_horizon: int,
                            mesh: Mesh, axis_name: str = "candidate"):
    """One i2LQR control-step candidate sweep sharded over the mesh.

    x_terminals: (C, 4) with C divisible by mesh size. Returns
    (us (N,2), xs (N+1,4), cost, global candidate index) — the argmin over all
    C candidates, reduced over ICI.
    """
    sh = NamedSharding(mesh, P(axis_name))
    x_terminals = jax.device_put(x_terminals, sh)
    q_terms = jax.device_put(q_terms, sh)
    return _candidate_sweep_impl(
        params, limits, obstacle, x0, x_terminals, q_terms, u_init, lamb0,
        dt, num_horizon=num_horizon, mesh=mesh, axis_name=axis_name)


def dryrun(n_devices: int) -> None:
    """Multi-chip dry run used by the driver: builds an n-device mesh, jits
    the full training step (closed-loop learning lap with safe-set update)
    scenario-sharded, plus a candidate-sharded sweep with ICI argmin, on tiny
    shapes."""
    import jax.numpy as jnp

    dtype = jnp.float32
    mesh = make_mesh(n_devices)
    params = IlqrParams.make(num_ss_points=4, dtype=dtype)
    limits = SystemLimits.make(dtype=dtype)
    obstacle = Obstacle.make(5.0, -2.0, 1.0, 1.0, dtype=dtype)

    # --- tiny seed lap ---
    import numpy as np
    from ilqr_iterative_tasks_tpu.models import kinetic_bicycle as dyn
    max_steps = 16
    xs = [np.zeros(4, np.float32)]
    for i in range(8):
        u = np.array([1.0 if i < 2 else 0.0, 0.0], np.float32)
        xs.append(np.asarray(dyn.step(jnp.asarray(xs[-1]), jnp.asarray(u), 1.0)))
    seed = np.stack(xs)
    seed_xs = jnp.zeros((max_steps, 4), dtype).at[:9].set(jnp.asarray(seed))
    seed_us = jnp.zeros((max_steps, 2), dtype)
    goal = seed[-1]

    # --- 1) scenario-sharded full learning step (1 lap, tiny budget) ---
    scenarios = make_batch_scenarios(np.zeros(4), goal, obstacle,
                                     batch=n_devices, key=jax.random.PRNGKey(0),
                                     dtype=dtype)
    res = simulate_learning_batch_sharded(
        params, limits, scenarios, seed_xs, seed_us, 9, 1.0, mesh,
        num_laps=1, max_steps=max_steps, max_laps=4, sim_step_budget=4)
    jax.block_until_ready(res)
    assert res.lap_steps.shape == (n_devices, 1)

    # --- 2) candidate-sharded sweep with ICI argmin ---
    cands = jnp.asarray(
        np.linspace([2.0, 0.0, 1.0, 0.0], [6.0, 0.5, 2.0, 0.1],
                    2 * n_devices), dtype)
    qs = jnp.arange(2 * n_devices, dtype=dtype)
    mesh_c = make_mesh(n_devices, axis_name="candidate")
    us, xs_w, cost, idx = sharded_candidate_sweep(
        params, limits, obstacle, jnp.zeros(4, dtype), cands, qs,
        jnp.zeros((4, 2), dtype), 1.0, 1.0, num_horizon=4, mesh=mesh_c)
    jax.block_until_ready((us, xs_w, cost, idx))
    assert us.shape == (4, 2) and xs_w.shape == (5, 4)

    # --- 3) production SoA sims (batch-trailing), trailing-axis sharded ---
    from ilqr_iterative_tasks_tpu.control.batched_soa import SoaScenarios
    from ilqr_iterative_tasks_tpu.parallel.sharded_soa import (
        simulate_learning_runs_soa_sharded, simulate_nlmpc_runs_soa_sharded)
    from ilqr_iterative_tasks_tpu.utils.params import LmpcParams

    b = 2 * n_devices  # >= 2 lanes per device (B=1 hits an XLA:CPU pathology)
    soa_sc = SoaScenarios.broadcast(np.zeros(4), goal, obstacle, b,
                                    dtype=dtype)
    res_i = simulate_learning_runs_soa_sharded(
        params, limits, soa_sc, seed_xs, seed_us, 9, 1.0,
        jax.random.PRNGKey(1), mesh, num_laps=1, max_steps=max_steps,
        max_laps=4, sim_step_budget=4, solver_max_iter=8)
    jax.block_until_ready(res_i)
    assert res_i.lap_steps.shape == (1, b)
    lmpc_params = LmpcParams.make(num_ss_points=4)
    res_n = simulate_nlmpc_runs_soa_sharded(
        lmpc_params, limits, soa_sc, seed_xs, seed_us, 9, 1.0,
        jax.random.PRNGKey(2), mesh, num_laps=1, max_steps=max_steps,
        max_laps=4, sim_step_budget=4, max_lm_iters=8)
    jax.block_until_ready(res_n)
    assert res_n.lap_steps.shape == (1, b)

    # --- 4) shard_map-wrapped sim with the whole-step Pallas kernel ---
    # (a pallas_call has no GSPMD partitioning rule; the production
    # multi-chip path for the step-kernel backends is shard_map —
    # interpret=True runs the same program on the CPU mesh)
    from ilqr_iterative_tasks_tpu.ops.pallas_i2lqr_step import (
        build_fused_i2lqr_step)
    from ilqr_iterative_tasks_tpu.parallel.sharded_soa import (
        simulate_learning_runs_soa_shardmap)

    tile = 128  # tile_rows=1 (interpret mode is not bound by hw tiling)
    b_sm = tile * n_devices
    sm_sc = SoaScenarios.broadcast(np.zeros(4), goal, obstacle, b_sm,
                                   dtype=dtype)
    step_solver = build_fused_i2lqr_step(
        params, limits, 1.0, num_horizon=params.num_horizon,
        max_steps=max_steps, max_laps=4, max_iter=8, tile_rows=1,
        interpret=True)
    res_sm = simulate_learning_runs_soa_shardmap(
        params, limits, sm_sc, seed_xs, seed_us, 9, 1.0,
        jax.random.PRNGKey(3), mesh, num_laps=1, max_steps=max_steps,
        max_laps=4, sim_step_budget=4, solver_max_iter=8,
        pallas_step_solver=step_solver)
    jax.block_until_ready(res_sm)
    assert res_sm.lap_steps.shape == (1, b_sm)
