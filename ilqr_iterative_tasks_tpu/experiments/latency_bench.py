"""Latency & scaling benchmark CLI.

Reports (JSON):
- per-step closed-loop solve latency percentiles for the host controller
  (the reference's real-time metric, base.py:145-150; budget: dt = 1 s),
- SoA candidate-solver throughput across batch sizes,
- scenario-sharded learning-run throughput across device counts (the
  solves/s scaling report of BASELINE.md).

Run:  python -m ilqr_iterative_tasks_tpu.experiments.latency_bench \
          [--platform cpu] [--batches 2048,32768] [--devices 1,2,4,8]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def bench_step_latency():
    import jax.numpy as jnp
    from ilqr_iterative_tasks_tpu.control.i2lqr import I2LqrController
    from ilqr_iterative_tasks_tpu.experiments.runner import (
        default_obstacle, run_closed_loop)
    from ilqr_iterative_tasks_tpu.utils import metrics
    from ilqr_iterative_tasks_tpu.utils.params import IlqrParams

    ctrl = I2LqrController(IlqrParams.make(), obstacle=default_obstacle(1.0))
    res = run_closed_loop(ctrl, lap_number=3, dt=1.0, goal_fixup="append")
    return metrics.summary_dict(res)


def bench_step_latency_nlmpc():
    from ilqr_iterative_tasks_tpu.control.nlmpc import NlmpcController
    from ilqr_iterative_tasks_tpu.experiments.runner import (
        default_obstacle, run_closed_loop)
    from ilqr_iterative_tasks_tpu.utils import metrics
    from ilqr_iterative_tasks_tpu.utils.params import LmpcParams

    ctrl = NlmpcController(LmpcParams.make(ss_option="spaceVarying"),
                           obstacle=default_obstacle(1.0))
    res = run_closed_loop(ctrl, lap_number=3, dt=1.0)
    return metrics.summary_dict(res)


def bench_solver_throughput(batches):
    import jax
    import jax.numpy as jnp
    from ilqr_iterative_tasks_tpu.models.obstacle import Obstacle
    from ilqr_iterative_tasks_tpu.ops.ilqr_soa import ilqr_solve_soa
    from ilqr_iterative_tasks_tpu.utils.params import IlqrParams, SystemLimits

    dtype = jnp.float32
    params = IlqrParams.make(dtype=dtype)
    limits = SystemLimits.make(dtype=dtype)
    obstacle = Obstacle.make(31.0, -2.0, 8.0, 6.0, dtype=dtype)
    x0 = jnp.zeros(4, dtype)
    rng = np.random.default_rng(0)
    out = {}
    for bsz in batches:
        xts = jnp.asarray(rng.uniform(0, 30, (4, bsz)), dtype)
        u0 = jnp.zeros((6, 2, bsz), dtype)
        run = lambda: jax.block_until_ready(ilqr_solve_soa(
            params, limits, obstacle, x0, xts, u0, 1.0, 1.0, num_horizon=6))
        run()
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            run()
            times.append(time.perf_counter() - t0)
        out[str(bsz)] = round(bsz / min(times), 1)
    return out


def bench_tpu_step_latency(batch: int = 1024, reps: int = 30,
                           pipeline_depth: int = 10):
    """Latency of ONE fused control-step kernel on the device — the
    per-step real-time metric when the controller runs on the TPU (the
    reference budget is dt = 1 s, base.py:145-150). Uses the production
    whole-step kernel (k=8, dedup on) against a seed-lap safe set.

    ``batch=1024`` is ONE kernel tile (tile_rows=8 x 128 lanes) — the launch
    quantum of the step kernel, so this IS the honest single-vehicle number:
    controlling 1 vehicle costs the same as controlling 1024. Two numbers are
    reported: blocking round-trip latency per dispatch (includes the host<->
    device link, what a 1 Hz real-time controller would see), and the
    amortized per-step time of a ``pipeline_depth``-deep async dispatch chain
    (the device-side cost, link latency amortized away)."""
    import jax
    import jax.numpy as jnp
    if jax.default_backend() != "tpu":
        return None
    from ilqr_iterative_tasks_tpu.models.obstacle import Obstacle
    from ilqr_iterative_tasks_tpu.ops.pallas_i2lqr_step import (
        build_fused_i2lqr_step)
    from ilqr_iterative_tasks_tpu.ops.pallas_ilqr import obstacle_to_lanes
    from ilqr_iterative_tasks_tpu.sim.seed import seed_trajectory
    from ilqr_iterative_tasks_tpu.utils.params import (IlqrParams,
                                                       SystemLimits)

    dtype = jnp.float32
    params = IlqrParams.make(dtype=dtype)
    limits = SystemLimits.make(dtype=dtype)
    xcl, _ = seed_trajectory(1.0)
    max_steps, max_laps = 128, 8
    states = jnp.zeros((max_laps, max_steps, 4, batch), dtype)
    states = states.at[0, :121].set(
        jnp.broadcast_to(jnp.asarray(xcl, dtype)[:, :, None],
                         (121, 4, batch)))
    qfun = jnp.zeros((max_laps, max_steps, batch), dtype)
    qfun = qfun.at[0].set(
        jnp.maximum(120.0 - jnp.arange(max_steps, dtype=dtype), 0.0)[:, None])
    lap_len = jnp.zeros((max_laps, batch), jnp.int32).at[0].set(121)
    obstacle = Obstacle.make(31.0, -2.0, 8.0, 6.0, dtype=dtype)
    obs_l = obstacle_to_lanes(obstacle, batch)
    x = jnp.zeros((4, batch), dtype)
    skip = jnp.zeros((batch,), jnp.float32)
    solver = build_fused_i2lqr_step(
        params, limits, 1.0, num_horizon=params.num_horizon,
        max_steps=max_steps, max_laps=max_laps, max_iter=16, tile_rows=8,
        dedup=True)
    lap_ids = jnp.zeros((1,), jnp.int32)
    lap_ok = jnp.ones((1,), jnp.int32)

    def run():
        out = solver(x, x, states, qfun, lap_len, lap_ids, lap_ok,
                     obs_l, skip)
        jax.block_until_ready(out)

    run()
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        run()
        times.append((time.perf_counter() - t0) * 1e3)
    times.sort()

    def pctile(sorted_ms, q):
        # nearest-rank percentile (the old int(len*0.99) indexed the max)
        import math
        return sorted_ms[min(len(sorted_ms) - 1,
                             max(0, math.ceil(q * len(sorted_ms)) - 1))]

    # amortized device-side time: enqueue pipeline_depth dispatches without
    # blocking, block once at the end — the host<->device link round-trip is
    # paid once per chain instead of once per step
    amort = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = None
        for _ in range(pipeline_depth):
            out = solver(x, x, states, qfun, lap_len, lap_ids, lap_ok,
                         obs_l, skip)
        jax.block_until_ready(out)
        amort.append((time.perf_counter() - t0) * 1e3 / pipeline_depth)
    amort.sort()
    return {"batch": batch,
            "note": "batch=1024 is ONE kernel tile — the single-vehicle cost",
            "p50_ms": round(pctile(times, 0.5), 3),
            "p99_ms": round(pctile(times, 0.99), 3),
            "p50_ms_per_step_pipelined": round(pctile(amort, 0.5), 3),
            "p99_ms_per_step_pipelined": round(pctile(amort, 0.99), 3),
            "budget_ms": 1000.0}


def bench_device_scaling(device_counts):
    import jax
    import jax.numpy as jnp
    from ilqr_iterative_tasks_tpu.control.batched_soa import (
        SoaScenarios, simulate_learning_runs_soa)
    from ilqr_iterative_tasks_tpu.models.obstacle import Obstacle
    from jax.sharding import NamedSharding, PartitionSpec as P
    from ilqr_iterative_tasks_tpu.parallel.mesh import make_mesh
    from ilqr_iterative_tasks_tpu.sim.seed import seed_trajectory
    from ilqr_iterative_tasks_tpu.utils.params import IlqrParams, SystemLimits

    dtype = jnp.float32
    params = IlqrParams.make(dtype=dtype)
    limits = SystemLimits.make(dtype=dtype)
    xcl, ucl = seed_trajectory(1.0)
    seed_xs = jnp.zeros((128, 4), dtype).at[:121].set(jnp.asarray(xcl, dtype))
    seed_us = jnp.zeros((128, 2), dtype).at[:120].set(jnp.asarray(ucl, dtype))
    obstacle = Obstacle.make(31.0, -2.0, 8.0, 6.0, dtype=dtype)
    n_avail = len(jax.devices())
    per_dev = 256 if jax.default_backend() == "tpu" else 8
    num_laps = 2
    out = {}
    for nd in device_counts:
        if nd > n_avail:
            continue
        batch = per_dev * nd
        mesh = make_mesh(nd)
        scs = SoaScenarios.broadcast(np.zeros(4), xcl[-1], obstacle, batch,
                                     noise_on=True, dtype=dtype)
        # SoaScenarios is batch-TRAILING: shard the last axis over the mesh
        def shard_last(a):
            if a.ndim and a.shape[-1] == batch:
                spec = P(*([None] * (a.ndim - 1) + ["scenario"]))
                return jax.device_put(a, NamedSharding(mesh, spec))
            return a
        scs = jax.tree_util.tree_map(shard_last, scs)
        kw = dict(num_laps=num_laps, max_steps=128, max_laps=8,
                  solver_max_iter=40)
        run = lambda seed: jax.block_until_ready(simulate_learning_runs_soa(
            params, limits, scs, seed_xs, seed_us, 121, 1.0,
            jax.random.PRNGKey(seed), **kw))
        run(0)
        t0 = time.perf_counter()
        run(1)
        dtm = time.perf_counter() - t0
        out[str(nd)] = round(batch * num_laps / dtm, 1)
    return out


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--platform", type=str, default=None,
                        choices=["cpu", "tpu"])
    parser.add_argument("--batches", type=str, default="2048,32768")
    parser.add_argument("--devices", type=str, default="1")
    parser.add_argument("--skip-latency", action="store_true")
    args = parser.parse_args(argv)
    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    max_dev = max(int(d) for d in args.devices.split(","))
    if args.platform == "cpu" and max_dev > 1:
        jax.config.update("jax_num_cpu_devices", max_dev)
    report = {"backend": None}
    report["backend"] = jax.default_backend()
    if not args.skip_latency:
        report["per_step_latency"] = bench_step_latency()
        report["per_step_latency_nlmpc"] = bench_step_latency_nlmpc()
    tpu_lat = bench_tpu_step_latency()  # no-op off-TPU
    if tpu_lat is not None:
        report["tpu_fused_step_latency"] = tpu_lat
    report["soa_solves_per_s"] = bench_solver_throughput(
        [int(b) for b in args.batches.split(",")])
    report["lap_sims_per_s_by_devices"] = bench_device_scaling(
        [int(d) for d in args.devices.split(",")])
    print(json.dumps(report, indent=2, default=float))


if __name__ == "__main__":
    main()
