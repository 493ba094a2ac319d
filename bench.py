#!/usr/bin/env python
"""Headline benchmark: batched i2LQR lap-simulations per second on one chip.

Runs the fully-jitted batch-native learning simulator (seed lap + 3 learning
laps of closed-loop i2LQR with safe-set growth, plant noise on) for a large
scenario batch and reports throughput as ONE JSON line:

    {"metric": "i2lqr_lap_sims_per_s_per_chip", "value": ..., "unit":
     "lap_sims/s", "vs_baseline": ...}

vs_baseline is measured against the north-star target of 1000 batched
lap-simulations/s on a v4-16 (BASELINE.md) — i.e. vs_baseline = value / 1000,
achieved here on a single chip.
"""

import json
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import jax.numpy as jnp


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from ilqr_iterative_tasks_tpu.control.batched_soa import (
        SoaScenarios, simulate_learning_runs_soa)
    from ilqr_iterative_tasks_tpu.models.obstacle import Obstacle
    from ilqr_iterative_tasks_tpu.sim.seed import seed_trajectory
    from ilqr_iterative_tasks_tpu.utils.params import IlqrParams, SystemLimits

    on_tpu = jax.default_backend() == "tpu"
    # B=49152 is the measured peak for the dedup step kernel (65.6k/s vs
    # 64.2k at 32768 and 62.5k at 65536); B=131072 runs fine (no device
    # fault under the step kernel) but is flat — the kernel is compute-bound.
    batch = 49152 if on_tpu else 64
    num_laps = 3
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
                                       noise_on=True, dtype=dtype)
    # Lockstep LM cap 16: measured behavior-neutral vs cap 40/150 (mean lap
    # steps within 0.3, completion 0.9973 vs 0.9955 — docs/PERF.md ladder);
    # cap 12 starts degrading laps. +26% throughput over cap 40.
    kw = dict(num_laps=num_laps, max_steps=max_steps, max_laps=8,
              solver_max_iter=16)
    solver_backend = "soa"
    if on_tpu and batch % (8 * 128) == 0:
        # fused WHOLE-CONTROL-STEP kernel (ops/pallas_i2lqr_step.py): kNN,
        # 3 relaxation passes, k candidate solves and selection per lane in
        # one VMEM-resident kernel — 2.7x over the per-candidate kernel +
        # XLA glue (which was ~80% scalar-core gathers / top-k sweeps).
        from ilqr_iterative_tasks_tpu.ops.pallas_i2lqr_step import (
            build_fused_i2lqr_step)
        # dedup=True: in-kernel cross-pass candidate dedup, bitwise-neutral
        # (+23% measured: 62.7k vs 50.9k lap-sims/s)
        # qsort_skip=True: q-sorted candidate solves + strict running-best
        # dominance skip (supersedes dom_skip) — position-indexed skips are
        # tile-coherent, so whole tiles exit the LM loop at iteration zero.
        # Bitwise-neutral (tests/test_pallas_i2lqr_step.py + verified on
        # hardware); 1.88x measured: 130.1k vs 69.1k lap-sims/s at B=49152.
        kw["pallas_step_solver"] = build_fused_i2lqr_step(
            params, limits, 1.0, num_horizon=params.num_horizon,
            max_steps=max_steps, max_laps=8, max_iter=16, tile_rows=8,
            dedup=True, qsort_skip=True)
        solver_backend = "pallas_step"

    def run(seed):
        res = simulate_learning_runs_soa(
            params, limits, scenarios, seed_xs, seed_us, 121, 1.0,
            jax.random.PRNGKey(seed), **kw)
        jax.block_until_ready(res)
        return res

    res = run(0)  # compile + warm
    done_frac = float(np.asarray(res.lap_done, dtype=np.float32).mean())
    times = []
    for rep in range(1, 3):
        t0 = time.perf_counter()
        run(rep)
        times.append(time.perf_counter() - t0)
    best = min(times)
    value = batch * num_laps / best

    # secondary metric: batch-native NLMPC learning runs (fused Pallas LM
    # shooting when on TPU) — the constrained-MPC controller family
    from ilqr_iterative_tasks_tpu.control.batched_nlmpc_soa import (
        simulate_nlmpc_runs_soa)
    from ilqr_iterative_tasks_tpu.utils.params import LmpcParams

    # NLMPC under qsort_skip is flat ~270-272k/s from 32k up (peak 49152)
    n_batch = 49152 if on_tpu else 32
    n_params = LmpcParams.make(ss_option="spaceVarying")
    n_scen = SoaScenarios.broadcast(np.zeros(4), xcl[-1], obstacle, n_batch,
                                    noise_on=True, dtype=dtype)
    # Lockstep LM cap 12: behavior-neutral vs cap 60 (mean lap steps within
    # 0.02, completion 1.0 — docs/PERF.md ladder; cap 8 starts drifting).
    # infeasible_retire=8: a lane retires from the SOLVER after 8
    # consecutive all-infeasible steps (the plant keeps integrating the
    # held-input creep, so records/completion stay exact unless the lane
    # would have regained feasibility later — measured: recovered streaks
    # are <=2 for all but ~0.03% of lane-laps, and the lap-step record is
    # IDENTICAL at this config; envelope-gated in
    # tests/test_batched_nlmpc_soa.py). Attacks the reference's own noise
    # tail: ~5% of lanes end laps in an unrecoverable all-infeasible creep
    # to the 121-step budget (docs/PERF.md "The NLMPC noise tail").
    # retile_frac=0.25: periodic straggler re-tiling (round 5) — the ~90
    # feasible-but-creeping noise-tail lanes scattered 1-2 per tile kept
    # every tile's position loop hot; compacted together they cost ONE hot
    # tile. BITWISE-identical schedule change (test_batched_nlmpc_soa.py);
    # measured 42.6k -> 67.4k lap-sims/s at this config (docs/PERF.md
    # round-5). The i2LQR headline does NOT retile: its budget tail is
    # replay-mode (already all-skip tiles) and the permutes measured -19%.
    n_kw = dict(num_laps=num_laps, max_steps=max_steps, max_laps=8,
                max_lm_iters=12, infeasible_retire=8, retile_frac=0.25)
    if on_tpu and n_batch % (8 * 128) == 0:
        from ilqr_iterative_tasks_tpu.ops.pallas_nlmpc_step import (
            build_fused_nlmpc_step)
        # qsort_skip: candidates solved in per-lane Q-ascending order with a
        # running-best dominance skip — after the first feasible candidate
        # the remaining positions are all-skip tiles. BITWISE-neutral for
        # nsi=1 (tests/test_pallas_nlmpc_step.py); +2.54x measured.
        # zeros_skip was RETIRED in round 4: under the exact per-lane
        # horizon-shrink semantics the multi-start tie-flip can change
        # whether a lane enters the near-goal shrink cascade, and the
        # behavior-envelope gate rejects it (completion -5.9 pp at the gate
        # config — tests/test_behavior_envelope.py, docs/PARITY.md).
        n_kw["pallas_step_solver"] = build_fused_nlmpc_step(
            n_params, limits, 1.0, num_horizon=n_params.num_horizon,
            max_steps=max_steps, max_laps=8, max_iters=12, tile_rows=8,
            qsort_skip=True)

    def run_nlmpc(seed):
        res = simulate_nlmpc_runs_soa(
            n_params, limits, n_scen, seed_xs, seed_us, 121, 1.0,
            jax.random.PRNGKey(seed), **n_kw)
        jax.block_until_ready(res)
        return res

    n_res = run_nlmpc(0)  # compile + warm
    nlmpc_done = float(np.asarray(n_res.lap_done,
                                  dtype=np.float32).mean())
    n_times = []
    for rep in range(1, 3):
        t0 = time.perf_counter()
        run_nlmpc(rep)
        n_times.append(time.perf_counter() - t0)
    nlmpc_rate = n_batch * num_laps / min(n_times)

    # Round-4 tier visibility (VERDICT r4 #7): the timeVarying and `all`
    # safe-set modes + the generic-system solver tier are tracked here so a
    # regression in any round-4 capability shows in BENCH_r{N}.json, not
    # only in ad-hoc probes (docs/PERF.md "Safe-set option tiers").
    tiers = {}
    if on_tpu:
        from ilqr_iterative_tasks_tpu.ops.pallas_nlmpc_step import (
            build_fused_nlmpc_step)

        def run_tier(tag, batch_m, pkw, skw, sim_kw, reps):
            p_m = LmpcParams.make(dtype=dtype, **pkw)
            scen_m = SoaScenarios.broadcast(np.zeros(4), xcl[-1], obstacle,
                                            batch_m, noise_on=True,
                                            dtype=dtype)
            solver_m = build_fused_nlmpc_step(
                p_m, limits, 1.0, num_horizon=p_m.num_horizon,
                max_steps=max_steps, max_laps=8, max_iters=12, tile_rows=8,
                **skw)
            kw_m = dict(num_laps=num_laps, max_steps=max_steps, max_laps=8,
                        max_lm_iters=12, pallas_step_solver=solver_m,
                        **sim_kw)

            def go(seed):
                r = simulate_nlmpc_runs_soa(
                    p_m, limits, scen_m, seed_xs, seed_us, 121, 1.0,
                    jax.random.PRNGKey(seed), **kw_m)
                jax.block_until_ready(r)
                return r

            r0 = go(0)
            ts = []
            for rep in range(1, 1 + reps):
                t0 = time.perf_counter()
                go(rep)
                ts.append(time.perf_counter() - t0)
            tiers[f"nlmpc_{tag}_lap_sims_per_s"] = round(
                batch_m * num_laps / min(ts), 1)
            tiers[f"nlmpc_{tag}_completion"] = round(
                float(np.asarray(r0.lap_done, dtype=np.float32).mean()), 4)

        # timeVarying: advancing-window laps are inherently long (zero-noise
        # host [111, 104, 97]) — per STEP it is the fastest tier
        run_tier("tv", 49152, dict(ss_option="timeVarying"),
                 dict(mode="timeVarying", qsort_skip=True),
                 dict(infeasible_retire=8), reps=2)
        # `all`: every stored point of every window row is a candidate —
        # the reference's widest sweep; HBM-streamed safe set, winner
        # re-solve. Round-5 config: all_rev_skip (strict-descent dominance
        # scan, bitwise) + retile_frac=0.25 (straggler compaction, bitwise)
        # measured 2.31k -> 14.6k lap-sims/s at identical behavior
        # (docs/PERF.md round-5); one timed rep (slow canary row).
        run_tier("all", 8192, dict(all_ss_point=True),
                 dict(mode="all", store_solutions=False,
                      stream_safe_set=True, all_rev_skip=True),
                 dict(retile_frac=0.25, infeasible_retire=8), reps=1)

    # generic-system tier: double integrator through the generic SoA solver
    # (ops/generic_ilqr_soa.py) — the parametric-(n, m) production solver
    from ilqr_iterative_tasks_tpu.models import double_integrator
    from ilqr_iterative_tasks_tpu.ops.generic_ilqr_soa import (
        build_generic_ilqr_soa)

    g_batch = 32768 if on_tpu else 256
    qt = np.asarray(params.matrix_Qterminal, np.float64)
    g_di = build_generic_ilqr_soa(
        double_integrator.step_comps, n=4, m=2, matrix_Q=np.zeros((4, 4)),
        matrix_R=np.asarray(params.matrix_R, np.float64), matrix_Qterminal=qt,
        u_lower=[-float(limits.a_max), -float(limits.delta_max_r)],
        u_upper=[float(limits.a_max), float(limits.delta_max_r)],
        dt=1.0, max_iter=150, num_horizon=6)
    rng = np.random.default_rng(0)
    xts_g = jnp.asarray(rng.uniform(-20, 20, (4, g_batch)), dtype)
    x0_g = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 1.0, 0.0], dtype)[:, None], (4, g_batch))
    u0_g = jnp.zeros((6, 2, g_batch), dtype)
    jax.block_until_ready(g_di(x0_g, xts_g, u0_g, 1.0))
    g_best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(g_di(x0_g, xts_g, u0_g, 1.0))
        g_best = min(g_best, time.perf_counter() - t0)
    tiers["generic_soa_solves_per_s"] = round(g_batch / g_best, 1)

    # robustness metric (BASELINE config 4): randomized moving-obstacle
    # sweep completion at the default (k=8/nsi=1) and rescue (k=32/nsi=4)
    # configs — tracked here so the enlarged-candidate-set rescue of the
    # moving-obstacle brittleness (commit dcc59d6, docs/PERF.md) cannot
    # silently regress. Small batch: this is a fixed-config canary, not a
    # throughput measurement.
    from ilqr_iterative_tasks_tpu.experiments.scenario_sweep import run_sweep
    rb = 4096 if on_tpu else 32
    rob = {}
    # k8_nsi1_sr3: the stall-reseed guard (stall_reseed=3) at the DEFAULT
    # candidate config — rescues most parked lanes (95.3% -> 98.0%
    # completion, final-lap mean 31.6 -> 29.2 measured at rb=4096) without
    # the k32/nsi4 compute cost; behavior-neutral at the fixed-scenario
    # headline config (docs/PERF.md round-4 knob table).
    for tag, nsp, nsi_r, sr in (("k8_nsi1", 8, 1, None),
                                ("k8_nsi1_sr3", 8, 1, 3),
                                ("k32_nsi4", 32, 4, None)):
        r = run_sweep(rb, 4, moving=True, num_ss_points=nsp,
                      num_ss_iter=nsi_r, stall_reseed=sr, quiet=True)
        rob[f"robust_completion_{tag}"] = r["completion_rate"]
        rob[f"robust_final_lap_mean_{tag}"] = r["final_lap_mean"]

    print(json.dumps({
        "metric": "i2lqr_lap_sims_per_s_per_chip",
        "value": round(value, 1),
        "unit": "lap_sims/s",
        "vs_baseline": round(value / 1000.0, 3),
        "extras": {
            "batch": batch,
            "num_laps": num_laps,
            "lap_completion_rate": round(done_frac, 4),
            "backend": jax.default_backend(),
            "solver_backend": solver_backend,
            "seconds_per_batch": round(best, 3),
            "nlmpc_lap_sims_per_s": round(nlmpc_rate, 1),
            "nlmpc_batch": n_batch,
            # < 1.0 under noise is the REFERENCE's own near-goal behavior,
            # surfaced by the exact horizon-shrink semantics: the shrunk
            # h1 reach test (1e-3) is noise-unsatisfiable, the reference
            # pauses forever there (base.py:607-609), we hold the input
            # and the lap times out (host-verified — docs/PERF.md)
            "nlmpc_lap_completion_rate": round(nlmpc_done, 4),
            **tiers,
            **rob,
        },
    }))


if __name__ == "__main__":
    main()
