"""Multi-host (2-process) CPU-loopback tests of parallel/distributed.py.

The reference is single-process with no distributed backend (SURVEY.md §5);
our multi-host path is jax.distributed + a host-major global mesh + shard_map
sims. These tests exercise the REAL multi-process runtime over loopback:
two OS processes x 2 virtual CPU devices join a coordination service
(initialize_distributed), slice a global scenario batch host-locally
(host_local_batch_slice), lift local shards to global arrays, and run a
shard_map NLMPC lap on the 4-device global mesh. The per-shard PRNG fold of
_shardmap_sim makes the distributed result bitwise comparable to the SAME
shard_map run in one process on a 4-device virtual mesh.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_distributed_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _single_process_reference(which: str):
    """The same shard_map sim on a 4-device single-process virtual mesh."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from ilqr_iterative_tasks_tpu.control.batched_soa import SoaScenarios
    from ilqr_iterative_tasks_tpu.models.obstacle import Obstacle
    from ilqr_iterative_tasks_tpu.parallel.sharded_soa import (
        shard_soa_scenarios, simulate_learning_runs_soa_shardmap,
        simulate_nlmpc_runs_soa_shardmap)
    from ilqr_iterative_tasks_tpu.sim.seed import seed_trajectory
    from ilqr_iterative_tasks_tpu.utils.params import (IlqrParams,
                                                       LmpcParams,
                                                       SystemLimits)

    dt64 = jnp.float64
    b = 8
    mesh = Mesh(np.array(jax.devices()[:4]), ("scenario",))
    limits = SystemLimits.make(dtype=dt64)
    xcl, ucl = seed_trajectory(1.0)
    seed_xs = jnp.zeros((128, 4), dt64).at[:121].set(jnp.asarray(xcl, dt64))
    seed_us = jnp.zeros((128, 2), dt64).at[:120].set(jnp.asarray(ucl, dt64))
    obstacle = Obstacle.make(31.0, -2.0, 8.0, 6.0, dtype=dt64)
    scen = shard_soa_scenarios(
        SoaScenarios.broadcast(np.zeros(4), xcl[-1], obstacle, b,
                               noise_on=True, dtype=dt64), mesh)
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
    return np.asarray(res.lap_steps), np.asarray(res.lap_done)


def _run_loopback(tmp_path, which: str):
    port = _free_port()
    nproc = 2
    procs, outs = [], []
    env = dict(os.environ)
    for pid in range(nproc):
        out = str(tmp_path / f"proc{pid}.npz")
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, str(port), str(pid), str(nproc), out,
             which],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT))
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            p.kill()
            stdout, _ = p.communicate()
        logs.append(stdout.decode(errors="replace"))
    assert all(p.returncode == 0 for p in procs), "\n".join(logs)

    steps_ref, done_ref = _single_process_reference(which)
    covered = np.zeros(steps_ref.shape[-1], dtype=bool)
    for out in outs:
        z = np.load(out)
        assert int(z["n_global_dev"]) == 4
        sl = slice(int(z["start"]), int(z["stop"]))
        np.testing.assert_array_equal(z["steps"], steps_ref[..., sl])
        np.testing.assert_array_equal(z["done"], done_ref[..., sl])
        covered[sl] = True
    assert covered.all()  # the host-local slices tile the global batch


@pytest.mark.slow
def test_two_process_loopback_matches_single_process(tmp_path):
    _run_loopback(tmp_path, "nlmpc")


@pytest.mark.slow
def test_two_process_loopback_i2lqr_matches_single_process(tmp_path):
    """i2LQR mirror of the NLMPC loopback: the PRODUCTION learning simulator
    (simulate_learning_runs_soa) over 2 OS processes x 2 virtual devices,
    bitwise vs the same shard_map run in one process."""
    _run_loopback(tmp_path, "i2lqr")
