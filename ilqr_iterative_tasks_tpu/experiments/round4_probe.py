"""Round-4 measurement probes (one chip). Each subcommand prints one JSON
line; run them individually so a failure doesn't lose the session:

  python -m ilqr_iterative_tasks_tpu.experiments.round4_probe stats
      with_stats accounting at the qsort_skip operating point (docs/PERF.md
      "Roofline" refresh): useful/executed/queue_floor at the headline
      config.
  python -m ilqr_iterative_tasks_tpu.experiments.round4_probe reuse
      A/B of reuse_extract (pass-2/3 kNN skip) at the headline config.
  python -m ilqr_iterative_tasks_tpu.experiments.round4_probe canary
      randomized moving-obstacle completion at k8/nsi1 with
      stall_reseed in {None, 3, 5} (robustness guard measurement).
  python -m ilqr_iterative_tasks_tpu.experiments.round4_probe nlmpc_modes
      step-kernel-backed NLMPC learning-run throughput for the
      timeVarying / all / all+all_iter safe-set options (spaceVarying is
      bench.py's headline) — the docs/PERF.md per-mode table.
  python -m ilqr_iterative_tasks_tpu.experiments.round4_probe cap
      i2LQR headline throughput at LM caps 16 (headline) vs 14 vs 15 —
      candidate knob for the next envelope-gated win.
  python -m ilqr_iterative_tasks_tpu.experiments.round4_probe stall
      i2LQR headline config with stall_reseed=3: does rescuing the 0.3%
      budget-timeout tail also shorten the tile-hot window (throughput)?
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "..", "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import jax.numpy as jnp


def _setup(batch):
    from ilqr_iterative_tasks_tpu.control.batched_soa import SoaScenarios
    from ilqr_iterative_tasks_tpu.models.obstacle import Obstacle
    from ilqr_iterative_tasks_tpu.sim.seed import seed_trajectory
    from ilqr_iterative_tasks_tpu.utils.params import (IlqrParams,
                                                       SystemLimits)

    dtype = jnp.float32
    params = IlqrParams.make(dtype=dtype)
    limits = SystemLimits.make(dtype=dtype)
    xcl, ucl = seed_trajectory(1.0)
    seed_xs = jnp.zeros((128, 4), dtype).at[:121].set(jnp.asarray(xcl, dtype))
    seed_us = jnp.zeros((128, 2), dtype).at[:120].set(jnp.asarray(ucl, dtype))
    obstacle = Obstacle.make(31.0, -2.0, 8.0, 6.0, dtype=dtype)
    scs = SoaScenarios.broadcast(np.zeros(4), xcl[-1], obstacle, batch,
                                 noise_on=True, dtype=dtype)
    return params, limits, seed_xs, seed_us, scs


def _run(params, limits, scs, seed_xs, seed_us, batch, **solver_kw):
    from ilqr_iterative_tasks_tpu.control.batched_soa import (
        simulate_learning_runs_soa)
    from ilqr_iterative_tasks_tpu.ops.pallas_i2lqr_step import (
        build_fused_i2lqr_step)

    solver = build_fused_i2lqr_step(
        params, limits, 1.0, num_horizon=params.num_horizon, max_steps=128,
        max_laps=8, max_iter=16, tile_rows=8, **solver_kw)
    kw = dict(num_laps=3, max_steps=128, max_laps=8, solver_max_iter=16,
              pallas_step_solver=solver)

    def go(seed):
        res = simulate_learning_runs_soa(
            params, limits, scs, seed_xs, seed_us, 121, 1.0,
            jax.random.PRNGKey(seed), **kw)
        jax.block_until_ready(res)
        return res

    t0 = time.time()
    res = go(0)
    compile_s = time.time() - t0
    times = []
    for rep in (1, 2):
        t0 = time.perf_counter()
        go(rep)
        times.append(time.perf_counter() - t0)
    return res, min(times), compile_s


def cmd_stats():
    batch = 32768
    params, limits, seed_xs, seed_us, scs = _setup(batch)
    res, best, compile_s = _run(params, limits, scs, seed_xs, seed_us, batch,
                                dedup=True, qsort_skip=True, with_stats=True)
    useful, execd, qfloor = (np.asarray(a, np.float64)
                             for a in res.iter_stats)
    print(json.dumps({
        "probe": "with_stats_at_qsort_point", "batch": batch,
        "lap_sims_per_s": round(batch * 3 / best, 1),
        "useful_per_lane": round(float(useful.mean()), 1),
        "executed_per_lane": round(float(execd.mean()), 1),
        "straggler_waste": round(1 - float(useful.sum()) / float(execd.sum()),
                                 4),
        "queue_floor_per_lane": round(float(qfloor.mean()), 1),
        "completion": round(float(np.asarray(res.lap_done).mean()), 4),
        "compile_s": round(compile_s, 1),
    }), flush=True)


def cmd_reuse():
    batch = 49152
    params, limits, seed_xs, seed_us, scs = _setup(batch)
    out = {}
    for tag, kw in (("base", dict(dedup=True, qsort_skip=True)),
                    ("reuse", dict(dedup=True, qsort_skip=True,
                                   reuse_extract=True))):
        res, best, compile_s = _run(params, limits, scs, seed_xs, seed_us,
                                    batch, **kw)
        out[tag] = {"lap_sims_per_s": round(batch * 3 / best, 1),
                    "completion": round(
                        float(np.asarray(res.lap_done).mean()), 4),
                    "mean_lap_steps": [round(float(v), 2) for v in np.asarray(
                        res.lap_steps, np.float64).mean(-1)],
                    "compile_s": round(compile_s, 1)}
    out["probe"] = "reuse_extract_ab"
    out["batch"] = batch
    out["speedup"] = round(out["reuse"]["lap_sims_per_s"]
                           / out["base"]["lap_sims_per_s"], 3)
    print(json.dumps(out), flush=True)


def _run_kw(params, limits, scs, seed_xs, seed_us, batch, max_iter,
            stall_reseed=None, **solver_kw):
    from ilqr_iterative_tasks_tpu.control.batched_soa import (
        simulate_learning_runs_soa)
    from ilqr_iterative_tasks_tpu.ops.pallas_i2lqr_step import (
        build_fused_i2lqr_step)

    solver = build_fused_i2lqr_step(
        params, limits, 1.0, num_horizon=params.num_horizon, max_steps=128,
        max_laps=8, max_iter=max_iter, tile_rows=8, **solver_kw)
    kw = dict(num_laps=3, max_steps=128, max_laps=8,
              solver_max_iter=max_iter, pallas_step_solver=solver,
              stall_reseed=stall_reseed)

    def go(seed):
        res = simulate_learning_runs_soa(
            params, limits, scs, seed_xs, seed_us, 121, 1.0,
            jax.random.PRNGKey(seed), **kw)
        jax.block_until_ready(res)
        return res

    go(0)
    res = go(0)
    times = []
    for rep in (1, 2):
        t0 = time.perf_counter()
        go(rep)
        times.append(time.perf_counter() - t0)
    return res, min(times)


def _summ(res, batch, best):
    return {"lap_sims_per_s": round(batch * 3 / best, 1),
            "completion": round(float(np.asarray(res.lap_done).mean()), 4),
            "mean_lap_steps": [round(float(v), 2) for v in np.asarray(
                res.lap_steps, np.float64).mean(-1)]}


def cmd_cap():
    batch = 49152
    params, limits, seed_xs, seed_us, scs = _setup(batch)
    out = {"probe": "i2lqr_cap_ladder", "batch": batch}
    for cap in (16, 15, 14):
        res, best = _run_kw(params, limits, scs, seed_xs, seed_us, batch,
                            cap, dedup=True, qsort_skip=True)
        out[f"cap{cap}"] = _summ(res, batch, best)
    print(json.dumps(out), flush=True)


def cmd_stall():
    batch = 49152
    params, limits, seed_xs, seed_us, scs = _setup(batch)
    out = {"probe": "i2lqr_stall_reseed_headline", "batch": batch}
    for tag, sr in (("base", None), ("sr3", 3)):
        res, best = _run_kw(params, limits, scs, seed_xs, seed_us, batch,
                            16, stall_reseed=sr, dedup=True, qsort_skip=True)
        out[tag] = _summ(res, batch, best)
    print(json.dumps(out), flush=True)


def cmd_nlmpc_modes():
    from ilqr_iterative_tasks_tpu.control.batched_nlmpc_soa import (
        simulate_nlmpc_runs_soa)
    from ilqr_iterative_tasks_tpu.models.obstacle import Obstacle
    from ilqr_iterative_tasks_tpu.ops.pallas_nlmpc_step import (
        build_fused_nlmpc_step)
    from ilqr_iterative_tasks_tpu.sim.seed import seed_trajectory
    from ilqr_iterative_tasks_tpu.utils.params import (LmpcParams,
                                                       SystemLimits)
    from ilqr_iterative_tasks_tpu.control.batched_soa import SoaScenarios

    dtype = jnp.float32
    limits = SystemLimits.make(dtype=dtype)
    xcl, ucl = seed_trajectory(1.0)
    seed_xs = jnp.zeros((128, 4), dtype).at[:121].set(jnp.asarray(xcl, dtype))
    seed_us = jnp.zeros((128, 2), dtype).at[:120].set(jnp.asarray(ucl, dtype))
    obstacle = Obstacle.make(31.0, -2.0, 8.0, 6.0, dtype=dtype)
    batch = 8192
    scs = SoaScenarios.broadcast(np.zeros(4), xcl[-1], obstacle, batch,
                                 noise_on=True, dtype=dtype)
    configs = {
        "timeVarying": (dict(ss_option="timeVarying"),
                        dict(mode="timeVarying")),
        "all": (dict(all_ss_point=True),
                dict(mode="all", store_solutions=False,
                     stream_safe_set=True)),
        "all_ss_iter": (dict(all_ss_point=True, all_ss_iter=True),
                        dict(mode="all", all_iter=True,
                             store_solutions=False, stream_safe_set=True)),
    }
    sel = sys.argv[2:]  # optional tag filter, e.g. "all all_ss_iter"
    out = {"probe": "nlmpc_step_kernel_modes", "batch": batch}
    for tag, (pkw, skw) in configs.items():
        if sel and tag not in sel:
            continue
        params = LmpcParams.make(dtype=dtype, **pkw)
        solver = build_fused_nlmpc_step(
            params, limits, 1.0, num_horizon=params.num_horizon,
            max_steps=128, max_laps=8, max_iters=12, tile_rows=8, **skw)
        kw = dict(num_laps=3, max_steps=128, max_laps=8, max_lm_iters=12,
                  pallas_step_solver=solver)

        def go(seed):
            res = simulate_nlmpc_runs_soa(
                params, limits, scs, seed_xs, seed_us, 121, 1.0,
                jax.random.PRNGKey(seed), **kw)
            jax.block_until_ready(res)
            return res

        t0 = time.time()
        res = go(0)
        compile_s = time.time() - t0
        times = []
        for rep in (1, 2):
            t0 = time.perf_counter()
            go(rep)
            times.append(time.perf_counter() - t0)
        out[tag] = {**_summ(res, batch, min(times)),
                    "compile_s": round(compile_s, 1)}
        print(json.dumps({tag: out[tag]}), flush=True)
    print(json.dumps(out), flush=True)


def cmd_canary():
    from ilqr_iterative_tasks_tpu.experiments.scenario_sweep import run_sweep
    rows = {}
    for sr in (None, 3, 5):
        r = run_sweep(4096, 4, moving=True, num_ss_points=8, num_ss_iter=1,
                      stall_reseed=sr, quiet=True)
        rows[str(sr)] = {"completion": r["completion_rate"],
                         "final_lap_mean": r["final_lap_mean"]}
    print(json.dumps({"probe": "stall_reseed_canary", **rows}), flush=True)


if __name__ == "__main__":
    {"stats": cmd_stats, "reuse": cmd_reuse, "canary": cmd_canary,
     "nlmpc_modes": cmd_nlmpc_modes, "cap": cmd_cap,
     "stall": cmd_stall}[sys.argv[1]]()
