"""Generic-system production-tier benchmarks (docs/PERF.md).

Two measurements, each printed as one JSON line:

1. ``--throughput``: batched candidate solves/s of the GENERIC SoA solver
   (ops/generic_ilqr_soa.py) on (a) the planar double integrator and (b)
   the kinematic bicycle fed through the generic path, against the
   hand-tuned bicycle parity solver (ops/ilqr_soa.py) at equal dims
   (n=4, m=2, N=6). The parity solver additionally computes its control
   barrier terms, so the comparison brackets the honest overhead of the
   generic path (jvp Jacobian columns carry structural zeros the
   hand-scalarized path folds away).

2. ``--crossover``: wall-time of ONE generic iLQR solve iteration's
   backward pass family — sequential scan (O(N) depth, eig-clamp) vs the
   associative-scan parallel Riccati (O(log N) depth, control-Tikhonov;
   ops/parallel_riccati.py) — across horizons N, batched over a small
   candidate axis. The crossover horizon is where depth starts dominating
   the sequential scan on the accelerator.

Usage:
  python -m ilqr_iterative_tasks_tpu.experiments.generic_bench --throughput
  python -m ilqr_iterative_tasks_tpu.experiments.generic_bench --crossover
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "..", "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import jax.numpy as jnp


def _candidates(batch, rng):
    from ilqr_iterative_tasks_tpu.sim.seed import seed_trajectory
    xcl, _ = seed_trajectory(1.0)
    rows = xcl[rng.integers(4, 30, size=batch)]
    rows = rows + rng.normal(size=rows.shape) * 0.25
    return jnp.asarray(rows.T, jnp.float32)  # (4, batch)


def _time(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def bench_throughput(batch: int = 32768, max_iter: int = 150):
    from ilqr_iterative_tasks_tpu.models import double_integrator
    from ilqr_iterative_tasks_tpu.models.obstacle import Obstacle
    from ilqr_iterative_tasks_tpu.ops.generic_ilqr_soa import (
        build_generic_ilqr_soa)
    from ilqr_iterative_tasks_tpu.ops.ilqr_soa import (ilqr_solve_soa,
                                                       step_soa)
    from ilqr_iterative_tasks_tpu.utils.params import (IlqrParams,
                                                       SystemLimits)

    rng = np.random.default_rng(0)
    params = IlqrParams.make(dtype=jnp.float32)
    limits = SystemLimits.make(dtype=jnp.float32)
    xts = _candidates(batch, rng)
    x0 = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 1.0, 0.0], jnp.float32)[:, None], (4, batch))
    u_init = jnp.zeros((6, 2, batch), jnp.float32)
    lo = [-float(limits.a_max), -float(limits.delta_max_r)]
    hi = [float(limits.a_max), float(limits.delta_max_r)]
    qt = np.asarray(params.matrix_Qterminal, np.float64)

    # (a) hand-tuned bicycle parity solver (incl. barrier terms)
    t_bike = _time(lambda: ilqr_solve_soa(
        params, limits, Obstacle.absent(dtype=jnp.float32), x0, xts, u_init,
        params.lamb, 1.0, num_horizon=6, max_iter=max_iter))

    # (b) the bicycle through the GENERIC SoA solver (same dims, no barriers)
    g_bike = build_generic_ilqr_soa(
        step_soa, n=4, m=2, matrix_Q=np.asarray(params.matrix_Q, np.float64),
        matrix_R=np.asarray(params.matrix_R, np.float64), matrix_Qterminal=qt,
        u_lower=lo, u_upper=hi, dt=1.0, max_iter=max_iter, num_horizon=6)
    t_gen_bike = _time(lambda: g_bike(x0, xts, u_init, 1.0))

    # (c) double integrator through the generic SoA solver (equal dims)
    g_di = build_generic_ilqr_soa(
        double_integrator.step_comps, n=4, m=2,
        matrix_Q=np.zeros((4, 4)), matrix_R=np.asarray(params.matrix_R,
                                                       np.float64),
        matrix_Qterminal=qt, u_lower=lo, u_upper=hi, dt=1.0,
        max_iter=max_iter, num_horizon=6)
    t_di = _time(lambda: g_di(x0, xts, u_init, 1.0))

    print(json.dumps({
        "bench": "generic_soa_throughput", "batch": batch,
        "backend": jax.default_backend(), "max_iter": max_iter,
        "bicycle_parity_solves_per_s": round(batch / t_bike, 1),
        "bicycle_generic_solves_per_s": round(batch / t_gen_bike, 1),
        "double_integrator_generic_solves_per_s": round(batch / t_di, 1),
        "generic_vs_parity_ratio": round(t_gen_bike / t_bike, 3),
    }), flush=True)


def bench_crossover(batch: int = 256):
    from ilqr_iterative_tasks_tpu.models import double_integrator
    from ilqr_iterative_tasks_tpu.ops.generic_ilqr import (
        GenericIlqrConfig, generic_ilqr_solve)

    rng = np.random.default_rng(1)
    rows = {}
    for nh in (16, 64, 256, 1024):
        cfg = GenericIlqrConfig.make(
            matrix_Q=jnp.zeros((4, 4)), matrix_R=0.05 * jnp.eye(2),
            matrix_Qterminal=20.0 * jnp.eye(4),
            u_lower=-2.0 * jnp.ones(2), u_upper=2.0 * jnp.ones(2),
            max_iter=8, dtype=jnp.float32)
        x0 = jnp.zeros(4, jnp.float32)
        xts = jnp.asarray(rng.uniform(-20, 20, (batch, 4)), jnp.float32)
        u_init = jnp.zeros((nh, 2), jnp.float32)
        times = {}
        for mode in ("sequential", "parallel"):
            solve_b = jax.vmap(
                lambda xt: generic_ilqr_solve(
                    double_integrator.step, cfg, x0, xt, u_init, 1.0, 0.1,
                    mode))
            # chain K solves inside ONE jit: a single dispatch over the
            # axon tunnel costs ~25 ms round-trip, which would swamp any
            # per-solve number at small batch (docs/PERF.md latency notes).
            # K=1 (plain dispatch) for large batch*N: the chained
            # AoS/vmap program at batch=256, N=1024 faults the v5e device
            # (the known large-AoS kernel-fault regime — docs/PERF.md)
            K = 10 if batch * nh <= 65536 else 1

            def chained(xts, _solve=solve_b):
                def body(i, acc):
                    out = _solve(xts + 0.0 * acc[:, None])
                    return acc + out.cost
                return jax.lax.fori_loop(
                    0, K, body, jnp.zeros(xts.shape[0], xts.dtype))

            fn = jax.jit(chained)
            times[mode] = _time(fn, xts) / K
        rows[nh] = {m: round(v * 1e3, 2) for m, v in times.items()}
        rows[nh]["speedup"] = round(times["sequential"] / times["parallel"],
                                    2)
    print(json.dumps({
        "bench": "riccati_backward_crossover",
        "backend": jax.default_backend(), "batch": batch,
        "solve_ms_by_horizon": rows,
    }), flush=True)


def bench_pallas(batch: int = 131072, max_iter: int = 150,
                 tile_rows: int = 64):
    """Generic Pallas tile kernel (ops/pallas_generic_ilqr.py) vs the
    hand-scalarized bicycle per-candidate kernel (ops/pallas_ilqr.py) at
    equal dims (n=4, m=2, N=6) — the VERDICT r4 #6 comparison. The bicycle
    kernel additionally computes its control/obstacle barrier stack; the
    generic rows bracket the honest cost of jvp one-hot Jacobians + the
    shared core's generated scalarization."""
    from ilqr_iterative_tasks_tpu.models import double_integrator
    from ilqr_iterative_tasks_tpu.models.obstacle import Obstacle
    from ilqr_iterative_tasks_tpu.ops.ilqr_soa import step_soa
    from ilqr_iterative_tasks_tpu.ops.pallas_generic_ilqr import (
        build_generic_ilqr_pallas)
    from ilqr_iterative_tasks_tpu.ops.pallas_ilqr import (build_fused_ilqr,
                                                          obstacle_to_lanes)
    from ilqr_iterative_tasks_tpu.utils.params import (IlqrParams,
                                                       SystemLimits)

    rng = np.random.default_rng(0)
    params = IlqrParams.make(dtype=jnp.float32)
    limits = SystemLimits.make(dtype=jnp.float32)
    xts = _candidates(batch, rng)
    x0 = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 1.0, 0.0], jnp.float32)[:, None], (4, batch))
    u_init = jnp.zeros((6, 2, batch), jnp.float32)
    lo = [-float(limits.a_max), -float(limits.delta_max_r)]
    hi = [float(limits.a_max), float(limits.delta_max_r)]
    gkw = dict(n=4, m=2, matrix_Q=np.asarray(params.matrix_Q, np.float64),
               matrix_R=np.asarray(params.matrix_R, np.float64),
               matrix_Qterminal=np.asarray(params.matrix_Qterminal,
                                           np.float64),
               u_lower=lo, u_upper=hi, dt=1.0, max_iter=max_iter,
               num_horizon=6, tile_rows=tile_rows)

    # (a) the hand-scalarized bicycle kernel (incl. barrier cost stack)
    bike = build_fused_ilqr(params, limits, 1.0, num_horizon=6,
                            max_iter=max_iter, tile_rows=tile_rows)
    obs_l = obstacle_to_lanes(Obstacle.absent(dtype=jnp.float32), batch)
    t_bike = _time(lambda: bike(x0, xts, u_init, obs_l))

    # (b) the bicycle through the GENERIC Pallas kernel (same dynamics)
    g_bike = build_generic_ilqr_pallas(step_soa, **gkw)
    t_gb = _time(lambda: g_bike(x0, xts, u_init))

    # (c) the double integrator through the generic Pallas kernel
    g_di = build_generic_ilqr_pallas(double_integrator.step_comps, **gkw)
    t_di = _time(lambda: g_di(x0, xts, u_init))

    print(json.dumps({
        "bench": "generic_pallas_vs_bicycle_kernel", "batch": batch,
        "backend": jax.default_backend(), "max_iter": max_iter,
        "tile_rows": tile_rows,
        "bicycle_fused_solves_per_s": round(batch / t_bike, 1),
        "bicycle_generic_pallas_solves_per_s": round(batch / t_gb, 1),
        "double_integrator_generic_pallas_solves_per_s": round(
            batch / t_di, 1),
        "generic_vs_bicycle_kernel_ratio": round(t_gb / t_bike, 3),
    }), flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--throughput", action="store_true")
    ap.add_argument("--crossover", action="store_true")
    ap.add_argument("--pallas", action="store_true")
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--max-iter", type=int, default=None)
    ap.add_argument("--tile-rows", type=int, default=64)
    args = ap.parse_args()
    if args.throughput or not (args.crossover or args.pallas):
        bench_throughput(batch=args.batch or 32768)
    if args.crossover:
        bench_crossover(batch=args.batch or 256)
    if args.pallas:
        bench_pallas(batch=args.batch or 131072,
                     max_iter=args.max_iter or 150,
                     tile_rows=args.tile_rows)
