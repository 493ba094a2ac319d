"""Pod-scale sharding of the batch-native (SoA) production simulators.

The SoA simulators (control/batched_soa.py, control/batched_nlmpc_soa.py)
keep the scenario batch TRAILING so it rides the TPU lane dimension; the same
axis is the data-parallel axis at pod scale. Sharding it over the mesh
partitions every per-lane tensor column-wise: all solver math, kNN gathers,
and record scatters are lane-local, so XLA inserts no collectives inside the
step — scaling is embarrassingly parallel until the caller reduces metrics
(the same property the reference's candidate sweep has implicitly on one
Python process, base.py:391-460, made explicit over ICI here).

Usage: build scenarios with a batch divisible by the mesh size, place them
with shard_soa_scenarios, and call the wrapped sims — jit partitions the
compiled program from the input shardings.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ilqr_iterative_tasks_tpu.control.batched_soa import (
    SoaScenarios, simulate_learning_runs_soa)
from ilqr_iterative_tasks_tpu.control.batched_nlmpc_soa import (
    simulate_nlmpc_runs_soa)


def shard_soa_scenarios(scenarios: SoaScenarios, mesh: Mesh,
                        axis: str = "scenario") -> SoaScenarios:
    """Place a batch-trailing scenario pytree with its LAST axis sharded."""
    def put(x):
        spec = P(*([None] * (x.ndim - 1) + [axis]))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, scenarios)


def simulate_learning_runs_soa_sharded(params, limits, scenarios, seed_xs,
                                       seed_us, seed_len, dt, key,
                                       mesh: Mesh, **kw):
    """Scenario-sharded batch-native i2LQR learning runs (trailing axis)."""
    scenarios = shard_soa_scenarios(scenarios, mesh)
    return simulate_learning_runs_soa(params, limits, scenarios, seed_xs,
                                      seed_us, seed_len, dt, key, **kw)


def simulate_nlmpc_runs_soa_sharded(params, limits, scenarios, seed_xs,
                                    seed_us, seed_len, dt, key,
                                    mesh: Mesh, **kw):
    """Scenario-sharded batch-native NLMPC learning runs (trailing axis)."""
    scenarios = shard_soa_scenarios(scenarios, mesh)
    return simulate_nlmpc_runs_soa(params, limits, scenarios, seed_xs,
                                   seed_us, seed_len, dt, key, **kw)


def _shardmap_sim(sim_fn, params, limits, scenarios, seed_xs, seed_us,
                  seed_len, dt, key, mesh: Mesh, axis: str, kw):
    if kw.get("resume_from") is not None:
        raise NotImplementedError(
            "resume_from under the shard_map wrapper: resume the per-shard "
            "runs individually (per-shard PRNG keys are folded in)")

    def local(scen):
        i = jax.lax.axis_index(axis)
        # independent per-shard noise stream; deterministic in (key, shard)
        k_local = jax.random.fold_in(key, i)
        res = sim_fn(params, limits, scen, seed_xs, seed_us, seed_len, dt,
                     k_local, **kw)
        # lap_count is shard-invariant; final_key differs per shard — drop it
        # (it is only meaningful for exact resume, unsupported here)
        return res._replace(final_key=jnp.zeros((2,), jnp.uint32))

    trailing = lambda x: P(*([None] * (x.ndim - 1) + [axis]))
    in_specs = (jax.tree_util.tree_map(trailing, scenarios),)

    # trailing-axis out_specs by FIELD: every per-lane tensor (lap stats,
    # final state, safe-set tensors) is batch-trailing; only the scalar
    # lap counter and the zeroed final_key are replicated
    out_shapes = jax.eval_shape(
        lambda scen: sim_fn(params, limits, scen, seed_xs, seed_us, seed_len,
                            dt, key, **kw)._replace(
                                final_key=jnp.zeros((2,), jnp.uint32)),
        scenarios)
    extra = {}
    if getattr(out_shapes, "shrink_hits", None) is not None:
        extra["shrink_hits"] = trailing(out_shapes.shrink_hits)
    if getattr(out_shapes, "iter_stats", ()) != ():
        extra["iter_stats"] = tuple(trailing(t)
                                    for t in out_shapes.iter_stats)
    if getattr(out_shapes, "streaks", ()) != ():
        extra["streaks"] = tuple(trailing(t) for t in out_shapes.streaks)
    out_specs = type(out_shapes)(
        lap_steps=trailing(out_shapes.lap_steps),
        lap_done=trailing(out_shapes.lap_done),
        final_x=trailing(out_shapes.final_x),
        safe_set=tuple(trailing(t) for t in out_shapes.safe_set),
        lap_count=P(),
        final_key=P(),
        **extra,
    )
    fn = jax.shard_map(local, mesh=mesh, in_specs=in_specs,
                       out_specs=out_specs, check_vma=False)
    return fn(scenarios)


def simulate_learning_runs_soa_shardmap(params, limits, scenarios, seed_xs,
                                        seed_us, seed_len, dt, key,
                                        mesh: Mesh, axis: str = "scenario",
                                        **kw):
    """shard_map i2LQR learning runs — required for the Pallas step-kernel
    backends (a pallas_call has no GSPMD partitioning rule, so plain-jit
    trailing-axis sharding cannot split it; shard_map runs the whole sim
    per shard, all lane-local). Per-shard PRNG = fold_in(key, shard index),
    so results equal running each shard separately with its folded key
    (validated bitwise in tests/test_sharded_soa.py). ``final_key`` is
    zeroed (exact resume is per-shard, not supported through this wrapper).
    """
    return _shardmap_sim(simulate_learning_runs_soa, params, limits,
                         scenarios, seed_xs, seed_us, seed_len, dt, key,
                         mesh, axis, kw)


def simulate_nlmpc_runs_soa_shardmap(params, limits, scenarios, seed_xs,
                                     seed_us, seed_len, dt, key,
                                     mesh: Mesh, axis: str = "scenario",
                                     **kw):
    """shard_map NLMPC learning runs (see simulate_learning_runs_soa_shardmap)."""
    return _shardmap_sim(simulate_nlmpc_runs_soa, params, limits, scenarios,
                         seed_xs, seed_us, seed_len, dt, key, mesh, axis, kw)
