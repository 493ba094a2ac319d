"""Multi-process CPU-loopback worker for the jax.distributed tests.

Launched by tests/test_distributed.py as one OS process per simulated host:

    python tests/_distributed_worker.py <port> <process_id> <num_processes> \
        <out.npz> [nlmpc|i2lqr]

Each process exposes 2 virtual CPU devices, joins the coordination service
over loopback (parallel/distributed.py::initialize_distributed), builds its
host-local slice of a global scenario batch (host_local_batch_slice), lifts
it to a global array (jax.make_array_from_process_local_data) on the
host-major global mesh, runs ONE shard_map learning lap of the requested
controller family, and writes its addressable result columns for the driver
to compare against a single-process run on an equal-size virtual mesh (the
per-shard PRNG fold makes the two bitwise comparable).
"""

import os
import sys

port, pid, nproc, out = (sys.argv[1], int(sys.argv[2]), int(sys.argv[3]),
                         sys.argv[4])
which = sys.argv[5] if len(sys.argv) > 5 else "nlmpc"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")

import jax  # noqa: E402

# the environment pins JAX_PLATFORMS=axon via sitecustomize; config wins
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from ilqr_iterative_tasks_tpu.parallel.distributed import (  # noqa: E402
    global_scenario_mesh, host_local_batch_slice, initialize_distributed)


def main():
    initialize_distributed(f"localhost:{port}", nproc, pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.local_devices()) == 2
    mesh = global_scenario_mesh()
    assert mesh.devices.size == 2 * nproc

    from ilqr_iterative_tasks_tpu.control.batched_soa import SoaScenarios
    from ilqr_iterative_tasks_tpu.models.obstacle import Obstacle
    from ilqr_iterative_tasks_tpu.parallel.sharded_soa import (
        simulate_learning_runs_soa_shardmap, simulate_nlmpc_runs_soa_shardmap)
    from ilqr_iterative_tasks_tpu.sim.seed import seed_trajectory
    from ilqr_iterative_tasks_tpu.utils.params import (IlqrParams,
                                                       LmpcParams,
                                                       SystemLimits)

    dt64 = jnp.float64
    b = 8
    limits = SystemLimits.make(dtype=dt64)
    xcl, ucl = seed_trajectory(1.0)
    seed_xs = jnp.zeros((128, 4), dt64).at[:121].set(jnp.asarray(xcl, dt64))
    seed_us = jnp.zeros((128, 2), dt64).at[:120].set(jnp.asarray(ucl, dt64))
    obstacle = Obstacle.make(31.0, -2.0, 8.0, 6.0, dtype=dt64)
    scen_full = SoaScenarios.broadcast(np.zeros(4), xcl[-1], obstacle, b,
                                       noise_on=True, dtype=dt64)
    sl = host_local_batch_slice(b)

    def to_global(a):
        local = np.asarray(a)[..., sl]
        spec = P(*([None] * (a.ndim - 1) + ["scenario"]))
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), local)

    scen = jax.tree_util.tree_map(to_global, scen_full)
    if which == "i2lqr":
        res = simulate_learning_runs_soa_shardmap(
            IlqrParams.make(dtype=dt64), limits, scen, seed_xs, seed_us,
            121, 1.0, jax.random.PRNGKey(3), mesh, num_laps=1,
            max_steps=128, max_laps=4, solver_max_iter=8)
    else:
        res = simulate_nlmpc_runs_soa_shardmap(
            LmpcParams.make(ss_option="spaceVarying"), limits, scen,
            seed_xs, seed_us, 121, 1.0, jax.random.PRNGKey(3), mesh,
            num_laps=1, max_steps=128, max_laps=4, max_lm_iters=8)

    def local_cols(arr):
        shards = sorted(arr.addressable_shards,
                        key=lambda s: s.index[-1].start or 0)
        return np.concatenate([np.asarray(s.data) for s in shards], axis=-1)

    np.savez(out, steps=local_cols(res.lap_steps),
             done=local_cols(res.lap_done), start=sl.start, stop=sl.stop,
             n_global_dev=mesh.devices.size)


if __name__ == "__main__":
    main()
