"""One-off probe: headline learning-run throughput vs scenario batch size.

Usage: python -m ilqr_iterative_tasks_tpu.experiments.batch_probe 65536
       python -m ilqr_iterative_tasks_tpu.experiments.batch_probe --nlmpc --step 8192
Prints one JSON line per batch size (same metric as bench.py).
"""

import json
import os
import sys
import time

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import jax.numpy as jnp


def run(batch: int, num_laps: int = 3, solver_max_iter: int = 40,
        tile_rows: int = 128, noise_on: bool = True, dedup: bool = False,
        step: bool = False, stats: bool = False):
    from ilqr_iterative_tasks_tpu.control.batched_soa import (
        SoaScenarios, simulate_learning_runs_soa)
    from ilqr_iterative_tasks_tpu.models.obstacle import Obstacle
    from ilqr_iterative_tasks_tpu.ops.pallas_ilqr import build_fused_ilqr
    from ilqr_iterative_tasks_tpu.sim.seed import seed_trajectory
    from ilqr_iterative_tasks_tpu.utils.params import IlqrParams, SystemLimits

    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.float32
    params = IlqrParams.make(dtype=dtype)
    limits = SystemLimits.make(dtype=dtype)
    xcl, ucl = seed_trajectory(1.0)
    max_steps = 128
    seed_xs = jnp.zeros((max_steps, 4), dtype).at[:121].set(
        jnp.asarray(xcl, dtype))
    seed_us = jnp.zeros((max_steps, 2), dtype).at[:120].set(
        jnp.asarray(ucl, dtype))
    obstacle = Obstacle.make(31.0, -2.0, 8.0, 6.0, dtype=dtype)
    scenarios = SoaScenarios.broadcast(np.zeros(4), xcl[-1], obstacle, batch,
                                       noise_on=noise_on, dtype=dtype)
    kw = dict(num_laps=num_laps, max_steps=max_steps, max_laps=8,
              solver_max_iter=solver_max_iter)
    backend = "soa"
    if step or stats:
        # whole-control-step fused kernel (tile_rows fixed at 8: 4 violates
        # the f32 (8, 128) reshape tiling, 16 overflows VMEM on v5e).
        # --stats: the HEADLINE config (dedup + qsort_skip) instrumented
        # with in-kernel useful/executed LM-trip counters — the roofline
        # numbers in docs/PERF.md come from this probe.
        from ilqr_iterative_tasks_tpu.ops.pallas_i2lqr_step import (
            build_fused_i2lqr_step)
        kw["pallas_step_solver"] = build_fused_i2lqr_step(
            params, limits, 1.0, num_horizon=params.num_horizon,
            max_steps=max_steps, max_laps=8, max_iter=solver_max_iter,
            tile_rows=8, interpret=not on_tpu,
            dedup=stats, qsort_skip=stats, with_stats=stats)
        backend = "pallas_step"
    elif on_tpu:
        kw["pallas_solver"] = build_fused_ilqr(
            params, limits, 1.0, num_horizon=params.num_horizon,
            max_iter=solver_max_iter, tile_rows=tile_rows, with_skip=dedup)
        kw["dedup_passes"] = dedup
        backend = "pallas"
    key = jax.random.PRNGKey(0)
    t0 = time.time()
    out = simulate_learning_runs_soa(params, limits, scenarios, seed_xs,
                                     seed_us, 121, 1.0, key, **kw)
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    t0 = time.time()
    out = simulate_learning_runs_soa(params, limits, scenarios, seed_xs,
                                     seed_us, 121, 1.0,
                                     jax.random.PRNGKey(1), **kw)
    jax.block_until_ready(out)
    dt_s = time.time() - t0
    rate = batch * num_laps / dt_s
    done = float(jnp.mean(out.lap_done.astype(jnp.float32)))
    mean_steps = [round(float(v), 2)
                  for v in jnp.mean(out.lap_steps.astype(jnp.float32),
                                    axis=-1)]
    rec = {
        "batch": batch, "tile_rows": tile_rows, "cap": solver_max_iter,
        "dedup": dedup, "solver_backend": backend,
        "lap_sims_per_s": round(rate, 1),
        "seconds": round(dt_s, 2), "compile_s": round(compile_s, 1),
        "completion": round(done, 4),
        "mean_lap_steps": mean_steps}
    if stats and out.iter_stats:
        useful, execd, _qfloor = (np.asarray(a, np.float64)
                                  for a in out.iter_stats)
        rec["useful_iters_per_lane"] = round(float(useful.mean()), 1)
        rec["executed_iters_per_lane"] = round(float(execd.mean()), 1)
        rec["straggler_waste"] = round(
            1.0 - float(useful.sum()) / float(execd.sum()), 4)
    print(json.dumps(rec), flush=True)


def run_nlmpc(batch: int, num_laps: int = 3, max_lm_iters: int = 60,
              noise_on: bool = True, pallas: bool = False,
              tile_rows: int = 64, step: bool = False,
              ss_option: str = "spaceVarying", qsort: bool = False,
              retire: int | None = None, stats: bool = False):
    from ilqr_iterative_tasks_tpu.control.batched_soa import SoaScenarios
    from ilqr_iterative_tasks_tpu.control.batched_nlmpc_soa import (
        simulate_nlmpc_runs_soa)
    from ilqr_iterative_tasks_tpu.models.obstacle import Obstacle
    from ilqr_iterative_tasks_tpu.sim.seed import seed_trajectory
    from ilqr_iterative_tasks_tpu.utils.params import LmpcParams, SystemLimits

    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.float32
    params = LmpcParams.make(ss_option=ss_option)
    limits = SystemLimits.make(dtype=dtype)
    xcl, ucl = seed_trajectory(1.0)
    max_steps = 128
    seed_xs = jnp.zeros((max_steps, 4), dtype).at[:121].set(
        jnp.asarray(xcl, dtype))
    seed_us = jnp.zeros((max_steps, 2), dtype).at[:120].set(
        jnp.asarray(ucl, dtype))
    obstacle = Obstacle.make(31.0, -2.0, 8.0, 6.0, dtype=dtype)
    scenarios = SoaScenarios.broadcast(np.zeros(4), xcl[-1], obstacle, batch,
                                       noise_on=noise_on, dtype=dtype)
    kw = dict(num_laps=num_laps, max_steps=max_steps, max_laps=8,
              max_lm_iters=max_lm_iters)
    if retire is not None:
        kw["infeasible_retire"] = retire
    backend = "soa"
    if step:
        from ilqr_iterative_tasks_tpu.ops.pallas_nlmpc_step import (
            build_fused_nlmpc_step)
        step_kw = {}
        if ss_option == "all":
            # mode='all' streams the HBM-resident safe set and re-solves
            # the winner (store_solutions is incompatible with the
            # per-row position loop); qsort_skip is undefined there.
            step_kw = dict(mode="all", stream_safe_set=True,
                           store_solutions=False)
        elif ss_option == "timeVarying":
            step_kw = dict(mode="timeVarying", qsort_skip=qsort)
        else:
            step_kw = dict(qsort_skip=qsort)
        kw["pallas_step_solver"] = build_fused_nlmpc_step(
            params, limits, 1.0, num_horizon=params.num_horizon,
            max_steps=max_steps, max_laps=8, max_iters=max_lm_iters,
            tile_rows=8, interpret=not on_tpu, with_stats=stats,
            **step_kw)
        backend = "pallas_step"
    elif pallas:
        from ilqr_iterative_tasks_tpu.ops.pallas_lm_shooting import (
            build_fused_lm_shooting)
        kw["pallas_solver"] = build_fused_lm_shooting(
            limits, 1.0, num_horizon=params.num_horizon,
            max_iters=max_lm_iters, tile_rows=tile_rows,
            with_skip=True, with_hzn=True)
        backend = "pallas"
    t0 = time.time()
    out = simulate_nlmpc_runs_soa(params, limits, scenarios, seed_xs, seed_us,
                                  121, 1.0, jax.random.PRNGKey(0), **kw)
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    t0 = time.time()
    out = simulate_nlmpc_runs_soa(params, limits, scenarios, seed_xs, seed_us,
                                  121, 1.0, jax.random.PRNGKey(1), **kw)
    jax.block_until_ready(out)
    dt_s = time.time() - t0
    done = float(jnp.mean(out.lap_done.astype(jnp.float32)))
    mean_steps = [round(float(v), 2)
                  for v in jnp.mean(out.lap_steps.astype(jnp.float32),
                                    axis=-1)]
    rec = {
        "controller": "nlmpc", "batch": batch, "max_lm_iters": max_lm_iters,
        "solver_backend": backend, "ss_option": ss_option, "qsort": qsort,
        "retire": retire,
        "lap_sims_per_s": round(batch * num_laps / dt_s, 1),
        "seconds": round(dt_s, 2), "compile_s": round(compile_s, 1),
        "completion": round(done, 4),
        "mean_lap_steps": mean_steps}
    if stats and out.iter_stats:
        useful, execd = (np.asarray(v) for v in out.iter_stats)
        rec["useful_per_lane"] = round(float(useful.mean()), 1)
        rec["executed_per_lane"] = round(float(execd.mean()), 1)
        rec["straggler_waste"] = round(
            1.0 - float(useful.sum()) / float(execd.sum()), 4)
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))))
    argv = sys.argv[1:]
    nlmpc = "--nlmpc" in argv
    pallas = "--pallas" in argv
    dedup = "--dedup" in argv
    step = "--step" in argv
    stats = "--stats" in argv
    qsort = "--qsort" in argv
    nonoise = "--nonoise" in argv
    ss_option = "spaceVarying"
    retire = None
    for a in argv:
        if a.startswith("--retire="):
            retire = int(a.split("=", 1)[1])
        if a.startswith("--ss-option="):
            ss_option = {"space": "spaceVarying", "time": "timeVarying",
                         "all": "all"}.get(a.split("=", 1)[1],
                                           a.split("=", 1)[1])
    argv = [a for a in argv
            if a not in ("--nlmpc", "--pallas", "--dedup", "--step",
                         "--stats", "--qsort", "--nonoise")
            and not a.startswith("--ss-option=")
            and not a.startswith("--retire=")]
    for arg in argv or (["8192"] if nlmpc else ["65536"]):
        if nlmpc:
            if ":" in arg:
                parts = arg.split(":")
                run_nlmpc(int(parts[0]), max_lm_iters=int(parts[1]),
                          pallas=pallas, step=step,
                          tile_rows=int(parts[2]) if len(parts) > 2 else 64,
                          ss_option=ss_option, qsort=qsort,
                          noise_on=not nonoise, retire=retire, stats=stats)
            else:
                run_nlmpc(int(arg), pallas=pallas, step=step, tile_rows=64,
                          ss_option=ss_option, qsort=qsort,
                          noise_on=not nonoise, retire=retire, stats=stats)
        elif ":" in arg:
            parts = arg.split(":")
            run(int(parts[0]), tile_rows=int(parts[1]),
                solver_max_iter=int(parts[2]) if len(parts) > 2 else 40,
                dedup=dedup, step=step, stats=stats)
        else:
            run(int(arg), dedup=dedup, step=step, stats=stats)
