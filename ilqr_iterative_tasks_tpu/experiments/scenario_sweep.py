"""Randomized batched scenario sweep — BASELINE config 4.

Runs a batch of i2LQR learning simulations with per-lane randomized initial
states and obstacle positions/speeds (heterogeneous obstacles are per-lane
data in the SoA sims and Pallas kernels) and reports robust statistics.

Run:  python -m ilqr_iterative_tasks_tpu.experiments.scenario_sweep \
          --batch 1024 --laps 3 [--moving] [--platform cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import jax.numpy as jnp


def run_sweep(batch: int, num_laps: int, moving: bool = False,
              x0_jitter=(0.5, 0.5, 0.0, 0.0), obs_pos_jitter: float = 4.0,
              seed: int = 0, solver_max_iter: int = 16,
              num_ss_iter: int = 1, num_ss_points: int = 8,
              use_pallas: bool | None = None, quiet: bool = False,
              stall_reseed: int | None = None):
    from ilqr_iterative_tasks_tpu.control.batched_soa import (
        SoaScenarios, simulate_learning_runs_soa)
    from ilqr_iterative_tasks_tpu.models.obstacle import Obstacle
    from ilqr_iterative_tasks_tpu.sim.seed import seed_trajectory
    from ilqr_iterative_tasks_tpu.utils.params import IlqrParams, SystemLimits

    dtype = jnp.float32
    params = IlqrParams.make(num_ss_iter=num_ss_iter,
                             num_ss_points=num_ss_points,
                             dtype=dtype)
    limits = SystemLimits.make(dtype=dtype)
    xcl, ucl = seed_trajectory(1.0)
    max_steps = 128
    seed_xs = jnp.zeros((max_steps, 4), dtype).at[:121].set(
        jnp.asarray(xcl, dtype))
    seed_us = jnp.zeros((max_steps, 2), dtype).at[:120].set(
        jnp.asarray(ucl, dtype))
    if moving:
        obstacle = Obstacle.make(35.0, -16.0, 20.0, 20.0, spd=1.0,
                                 moving_option=1, dtype=dtype)
        spd_jitter = 0.3
    else:
        obstacle = Obstacle.make(31.0, -2.0, 8.0, 6.0, dtype=dtype)
        spd_jitter = 0.0
    scenarios = SoaScenarios.randomized(
        np.zeros(4), xcl[-1], obstacle, batch, jax.random.PRNGKey(seed),
        x0_jitter=x0_jitter, obs_pos_jitter=obs_pos_jitter,
        obs_spd_jitter=spd_jitter, noise_on=True, dtype=dtype)
    kw = dict(num_laps=num_laps, max_steps=max_steps, max_laps=8,
              solver_max_iter=solver_max_iter, stall_reseed=stall_reseed)
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas and batch % (8 * 128) == 0:
        # whole-step fused kernel: per-lane obstacle parameters ride as
        # kernel inputs, so heterogeneous randomized scenarios are free.
        # Enlarged-candidate configs switch to the HBM-streamed safe set +
        # winner-re-solve modes (bitwise-neutral; the default per-candidate
        # solution scratch scales with nsi*k and overflows VMEM at k=32):
        # measured 2.34x the per-candidate kernel at k=32/nsi=4.
        from ilqr_iterative_tasks_tpu.ops.pallas_i2lqr_step import (
            build_fused_i2lqr_step)
        big = num_ss_iter * num_ss_points > 16
        kw["pallas_step_solver"] = build_fused_i2lqr_step(
            params, limits, 1.0, num_horizon=params.num_horizon,
            max_steps=max_steps, max_laps=8, max_iter=solver_max_iter,
            tile_rows=8, dedup=True, stream_safe_set=big,
            store_solutions=not big,
            qsort_skip=(num_ss_iter == 1))  # bitwise-neutral, nsi=1 only
    elif use_pallas and (params.num_ss_points * batch) % (64 * 128) == 0:
        from ilqr_iterative_tasks_tpu.ops.pallas_ilqr import build_fused_ilqr
        kw["pallas_solver"] = build_fused_ilqr(
            params, limits, 1.0, num_horizon=params.num_horizon,
            max_iter=solver_max_iter, tile_rows=64)
    t0 = time.time()
    res = simulate_learning_runs_soa(params, limits, scenarios, seed_xs,
                                     seed_us, 121, 1.0,
                                     jax.random.PRNGKey(seed + 1), **kw)
    jax.block_until_ready(res.lap_steps)
    wall = time.time() - t0
    steps = np.asarray(res.lap_steps, np.float64)  # (L, B)
    done = np.asarray(res.lap_done)
    report = {
        "batch": batch, "num_laps": num_laps, "moving": moving,
        "num_ss_iter": num_ss_iter, "num_ss_points": num_ss_points,
        "x0_jitter": (list(x0_jitter) if hasattr(x0_jitter, "__len__")
                      else x0_jitter),
        "obs_pos_jitter": obs_pos_jitter,
        "stall_reseed": stall_reseed,
        "completion_rate": round(float(done.mean()), 4),
        "lap_steps_p50": [float(np.percentile(steps[i], 50))
                          for i in range(num_laps)],
        "lap_steps_p95": [float(np.percentile(steps[i], 95))
                          for i in range(num_laps)],
        "final_lap_mean": round(float(steps[-1].mean()), 2),
        "wall_s": round(wall, 2),
        "lap_sims_per_s": round(batch * num_laps / wall, 1),
        "backend": jax.default_backend(),
    }
    if not quiet:
        print(json.dumps(report), flush=True)
    return report


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=1024)
    parser.add_argument("--laps", type=int, default=3)
    parser.add_argument("--moving", action="store_true")
    parser.add_argument("--x0-jitter", type=str, default="0.5,0.5,0,0",
                        help="scalar or 4 comma-separated per-state sigmas")
    parser.add_argument("--obs-pos-jitter", type=float, default=4.0)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--num-ss-iters", type=int, default=1)
    parser.add_argument("--num-ss-points", type=int, default=8)
    parser.add_argument("--stall-reseed", type=int, default=None)
    parser.add_argument("--platform", type=str, default=None,
                        choices=["cpu", "tpu"])
    args = parser.parse_args(argv)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    xj = [float(v) for v in str(args.x0_jitter).split(",")]
    run_sweep(args.batch, args.laps, moving=args.moving,
              x0_jitter=xj[0] if len(xj) == 1 else tuple(xj),
              obs_pos_jitter=args.obs_pos_jitter,
              seed=args.seed, num_ss_iter=args.num_ss_iters,
              num_ss_points=args.num_ss_points,
              stall_reseed=args.stall_reseed)


if __name__ == "__main__":
    main()
