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
