"""Round-5 measurement probes (one chip). Each subcommand prints JSON lines;
run them individually so a failure doesn't lose the session:

  python -m ilqr_iterative_tasks_tpu.experiments.round5_probe permute
      Cost of permuting batch-trailing state along the LANE axis — the
      primitive behind periodic straggler re-tiling (VERDICT r4 #1). A
      lane-axis permutation is a per-element gather (the documented
      ~1.7 ns/element scalar-core path); the transpose-row-gather-transpose
      form turns it into two layout ops + a contiguous row gather. Measures
      both on the production shapes (safe set, records, small vectors).
  python -m ilqr_iterative_tasks_tpu.experiments.round5_probe retile
      A/B of the lap-boundary straggler re-tiling on the i2LQR headline
      config (see control/batched_soa.py ``retile_frac``).
  python -m ilqr_iterative_tasks_tpu.experiments.round5_probe retile_nlmpc
      Same A/B on the exact-semantics NLMPC headline config.
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


def _chain_time(fn, a, idx, reps=3, k_long=10, k_short=2):
    """Per-application cost of ``fn(a, idx)``: time k data-dependent
    applications chained inside ONE jit ending in a scalar readback, for
    two chain lengths, and difference them — this cancels both the
    ~25-30 ms axon round-trip AND any tunnel-side result memoization
    (inputs additionally vary per rep; identical re-dispatches return
    memoized results; block_until_ready does not reliably block over the
    tunnel, a scalar float() fetch does)."""
    def chained_k(k):
        def chained(a, idx):
            def body(i, acc):
                return fn(acc, idx)
            out = jax.lax.fori_loop(0, k, body, a)
            return jnp.sum(out[(0,) * (a.ndim - 1)])
        return jax.jit(chained)

    walls = {}
    for k in (k_short, k_long):
        jit_fn = chained_k(k)
        variants = []
        for r in range(reps + 1):
            v = a.at[(0,) * (a.ndim - 1)].add(float(k * 100 + r))
            variants.append(jax.block_until_ready(v))
        float(jit_fn(variants[0], idx))  # compile + warm
        best = np.inf
        for r in range(1, reps + 1):
            t0 = time.perf_counter()
            float(jit_fn(variants[r], idx))
            best = min(best, time.perf_counter() - t0)
        walls[k] = best
    return (walls[k_long] - walls[k_short]) / (k_long - k_short)


def cmd_permute():
    b = 49152
    rng = np.random.default_rng(0)
    perm = jnp.asarray(rng.permutation(b), jnp.int32)

    def direct(a, idx):
        return jnp.take(a, idx, axis=-1)

    def via_t(a, idx):
        return jnp.take(a.T, idx, axis=0).T

    out = {"probe": "lane_permute_cost", "batch": b,
           "backend": jax.default_backend()}
    # shapes: safe set (max_laps*T*4 rows), records (T*4 rows), warm starts,
    # and the (B,) vectors the partition itself needs
    for tag, rows in (("safe_set_r2560", 8 * 80 * 4), ("records_r484", 484),
                      ("warm_r12", 12), ("vec_r1", 1)):
        a = jnp.asarray(rng.normal(size=(rows, b)), jnp.float32)
        res = {}
        res["direct_ms"] = round(_chain_time(direct, a, perm) * 1e3, 3)
        res["transpose_ms"] = round(_chain_time(via_t, a, perm) * 1e3, 3)
        mb = rows * b * 4 / 1e6
        res["mb"] = round(mb, 1)
        out[tag] = res
        print(json.dumps({tag: res}), flush=True)
    # the partition/permutation build itself (two cumsums + one scatter),
    # carried as f32 0/1 for the variant-perturbation harness
    from ilqr_iterative_tasks_tpu.control.batched_soa import _stable_partition
    flags = jnp.asarray((rng.random(b) < 0.99), jnp.float32)

    def build(fl, _):
        dst, src, nf = _stable_partition(fl > 0.5)
        return fl + src.astype(jnp.float32) * 1e-9  # data dependency

    out["partition_ms"] = round(_chain_time(build, flags, perm) * 1e3, 3)
    print(json.dumps(out), flush=True)


def _headline_i2lqr(batch, retile_frac):
    from ilqr_iterative_tasks_tpu.control.batched_soa import (
        SoaScenarios, simulate_learning_runs_soa)
    from ilqr_iterative_tasks_tpu.models.obstacle import Obstacle
    from ilqr_iterative_tasks_tpu.ops.pallas_i2lqr_step import (
        build_fused_i2lqr_step)
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
    solver = build_fused_i2lqr_step(
        params, limits, 1.0, num_horizon=params.num_horizon, max_steps=128,
        max_laps=8, max_iter=16, tile_rows=8, dedup=True, qsort_skip=True)
    kw = dict(num_laps=3, max_steps=128, max_laps=8, solver_max_iter=16,
              pallas_step_solver=solver, retile_frac=retile_frac)

    def go(seed):
        res = simulate_learning_runs_soa(
            params, limits, scs, seed_xs, seed_us, 121, 1.0,
            jax.random.PRNGKey(seed), **kw)
        jax.block_until_ready(res)
        return res

    res = go(0)
    times = []
    for rep in (1, 2):
        t0 = time.perf_counter()
        go(rep)
        times.append(time.perf_counter() - t0)
    return res, min(times)


def cmd_retile():
    batch = 49152
    out = {"probe": "i2lqr_retile_ab", "batch": batch}
    fracs = [None] + [float(a) for a in sys.argv[2:]] or [None, 0.125]
    for frac in fracs:
        res, best = _headline_i2lqr(batch, frac)
        tag = "base" if frac is None else f"frac{frac}"
        out[tag] = {
            "lap_sims_per_s": round(batch * 3 / best, 1),
            "completion": round(float(np.asarray(res.lap_done).mean()), 4),
            "mean_lap_steps": [round(float(v), 2) for v in np.asarray(
                res.lap_steps, np.float64).mean(-1)]}
        print(json.dumps({tag: out[tag]}), flush=True)
    print(json.dumps(out), flush=True)


def _headline_nlmpc(batch, retile_frac):
    from ilqr_iterative_tasks_tpu.control.batched_soa import SoaScenarios
    from ilqr_iterative_tasks_tpu.control.batched_nlmpc_soa import (
        simulate_nlmpc_runs_soa)
    from ilqr_iterative_tasks_tpu.models.obstacle import Obstacle
    from ilqr_iterative_tasks_tpu.ops.pallas_nlmpc_step import (
        build_fused_nlmpc_step)
    from ilqr_iterative_tasks_tpu.sim.seed import seed_trajectory
    from ilqr_iterative_tasks_tpu.utils.params import (LmpcParams,
                                                       SystemLimits)

    dtype = jnp.float32
    params = LmpcParams.make(ss_option="spaceVarying")
    limits = SystemLimits.make(dtype=dtype)
    xcl, ucl = seed_trajectory(1.0)
    seed_xs = jnp.zeros((128, 4), dtype).at[:121].set(jnp.asarray(xcl, dtype))
    seed_us = jnp.zeros((128, 2), dtype).at[:120].set(jnp.asarray(ucl, dtype))
    obstacle = Obstacle.make(31.0, -2.0, 8.0, 6.0, dtype=dtype)
    scs = SoaScenarios.broadcast(np.zeros(4), xcl[-1], obstacle, batch,
                                 noise_on=True, dtype=dtype)
    solver = build_fused_nlmpc_step(
        params, limits, 1.0, num_horizon=params.num_horizon, max_steps=128,
        max_laps=8, max_iters=12, tile_rows=8, qsort_skip=True)
    kw = dict(num_laps=3, max_steps=128, max_laps=8, max_lm_iters=12,
              pallas_step_solver=solver, infeasible_retire=8,
              retile_frac=retile_frac)

    def go(seed):
        res = simulate_nlmpc_runs_soa(
            params, limits, scs, seed_xs, seed_us, 121, 1.0,
            jax.random.PRNGKey(seed), **kw)
        jax.block_until_ready(res)
        return res

    res = go(0)
    times = []
    for rep in (1, 2):
        t0 = time.perf_counter()
        go(rep)
        times.append(time.perf_counter() - t0)
    return res, min(times)


def cmd_retile_nlmpc():
    batch = 49152
    out = {"probe": "nlmpc_retile_ab", "batch": batch}
    fracs = [None] + [float(a) for a in sys.argv[2:]] or [None, 0.125]
    for frac in fracs:
        res, best = _headline_nlmpc(batch, frac)
        tag = "base" if frac is None else f"frac{frac}"
        out[tag] = {
            "lap_sims_per_s": round(batch * 3 / best, 1),
            "completion": round(float(np.asarray(res.lap_done).mean()), 4),
            "mean_lap_steps": [round(float(v), 2) for v in np.asarray(
                res.lap_steps, np.float64).mean(-1)]}
        print(json.dumps({tag: out[tag]}), flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    {"permute": cmd_permute, "retile": cmd_retile,
     "retile_nlmpc": cmd_retile_nlmpc}[sys.argv[1]]()
