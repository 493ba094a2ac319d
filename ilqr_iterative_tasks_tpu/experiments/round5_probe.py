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


def _headline_i2lqr(batch, retile_frac, tail_shrink=None):
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
              pallas_step_solver=solver, retile_frac=retile_frac,
              tail_shrink=tail_shrink)

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


def _headline_nlmpc(batch, retile_frac, ordering="qsort",
                    tail_shrink=None):
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
        max_laps=8, max_iters=12, tile_rows=8,
        qsort_skip=(ordering == "qsort"), prox_skip=(ordering == "prox"))
    kw = dict(num_laps=3, max_steps=128, max_laps=8, max_lm_iters=12,
              pallas_step_solver=solver, infeasible_retire=8,
              retile_frac=retile_frac, tail_shrink=tail_shrink)

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


def cmd_prox():
    """A/B the candidate ordering at the NLMPC headline (VERDICT r4 #5):
    qsort_skip (q-ascending + first-feasible dominance) vs prox_skip
    (extraction/proximity order + exact dominance + suffix-min exit),
    optionally with re-tiling. Both are bitwise-exact orderings; the
    question is which skip pattern stays tile-coherent under noise."""
    batch = 49152
    frac = float(sys.argv[2]) if len(sys.argv) > 2 else None
    out = {"probe": "nlmpc_ordering_ab", "batch": batch,
           "retile_frac": frac}
    for ordering in ("qsort", "prox"):
        res, best = _headline_nlmpc(batch, frac, ordering=ordering)
        out[ordering] = {
            "lap_sims_per_s": round(batch * 3 / best, 1),
            "completion": round(float(np.asarray(res.lap_done).mean()), 4),
            "mean_lap_steps": [round(float(v), 2) for v in np.asarray(
                res.lap_steps, np.float64).mean(-1)]}
        print(json.dumps({ordering: out[ordering]}), flush=True)
    print(json.dumps(out), flush=True)


def cmd_tail():
    """A/B the round-5 tail prefix-shrink at both headlines (bitwise):
    ``tail i2lqr`` / ``tail nlmpc`` / ``tail both`` [Bs=4096]."""
    which = sys.argv[2] if len(sys.argv) > 2 else "both"
    bs = int(sys.argv[3]) if len(sys.argv) > 3 else 4096
    batch = 49152
    out = {"probe": "tail_shrink_ab", "batch": batch, "tail_shrink": bs}
    if which in ("i2lqr", "both"):
        res, best = _headline_i2lqr(batch, None, tail_shrink=bs)
        out["i2lqr_ts"] = {
            "lap_sims_per_s": round(batch * 3 / best, 1),
            "completion": round(float(np.asarray(res.lap_done).mean()), 4),
            "mean_lap_steps": [round(float(v), 2) for v in np.asarray(
                res.lap_steps, np.float64).mean(-1)]}
        print(json.dumps({"i2lqr_ts": out["i2lqr_ts"]}), flush=True)
    if which in ("nlmpc", "both"):
        res, best = _headline_nlmpc(batch, 0.25, tail_shrink=bs)
        out["nlmpc_retile_ts"] = {
            "lap_sims_per_s": round(batch * 3 / best, 1),
            "completion": round(float(np.asarray(res.lap_done).mean()), 4),
            "mean_lap_steps": [round(float(v), 2) for v in np.asarray(
                res.lap_steps, np.float64).mean(-1)]}
        print(json.dumps({"nlmpc_retile_ts": out["nlmpc_retile_ts"]}),
              flush=True)
    print(json.dumps(out), flush=True)


def cmd_all_rev():
    """A/B the mode='all' tier (VERDICT r4 #2): forward full position sweep
    vs the strict-descent dominance scan (``all_rev_skip`` — bitwise)."""
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
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    params = LmpcParams.make(all_ss_point=True)
    limits = SystemLimits.make(dtype=dtype)
    xcl, ucl = seed_trajectory(1.0)
    seed_xs = jnp.zeros((128, 4), dtype).at[:121].set(jnp.asarray(xcl, dtype))
    seed_us = jnp.zeros((128, 2), dtype).at[:120].set(jnp.asarray(ucl, dtype))
    obstacle = Obstacle.make(31.0, -2.0, 8.0, 6.0, dtype=dtype)
    scs = SoaScenarios.broadcast(np.zeros(4), xcl[-1], obstacle, batch,
                                 noise_on=True, dtype=dtype)
    out = {"probe": "all_mode_rev_skip_ab", "batch": batch}
    sel = sys.argv[3:]
    for tag, rev, frac in (("forward", False, None),
                           ("rev_skip", True, None),
                           ("rev_retile", True, 0.25)):
        if sel and tag not in sel:
            continue
        solver = build_fused_nlmpc_step(
            params, limits, 1.0, num_horizon=params.num_horizon,
            max_steps=128, max_laps=8, max_iters=12, tile_rows=8,
            mode="all", store_solutions=False, stream_safe_set=True,
            all_rev_skip=rev)
        kw = dict(num_laps=3, max_steps=128, max_laps=8, max_lm_iters=12,
                  pallas_step_solver=solver, retile_frac=frac)

        def go(seed):
            res = simulate_nlmpc_runs_soa(
                params, limits, scs, seed_xs, seed_us, 121, 1.0,
                jax.random.PRNGKey(seed), **kw)
            jax.block_until_ready(res)
            return res

        res = go(0)
        t0 = time.perf_counter()
        go(1)
        best = time.perf_counter() - t0
        out[tag] = {
            "lap_sims_per_s": round(batch * 3 / best, 1),
            "completion": round(float(np.asarray(res.lap_done).mean()), 4),
            "mean_lap_steps": [round(float(v), 2) for v in np.asarray(
                res.lap_steps, np.float64).mean(-1)]}
        print(json.dumps({tag: out[tag]}), flush=True)
    print(json.dumps(out), flush=True)


def cmd_all_mc():
    """Host Monte-Carlo of the ss_option='all' noise behavior (VERDICT r4
    #3, same method as docs/PERF.md "The 0.3%" / "The NLMPC noise tail"):
    run the reference-faithful host controller (control/nlmpc.py,
    all_ss_point=True) over fresh noise seeds and record, per lap, the
    step count, completion, and the per-step feasibility history. The
    batched `all` tier's ~5.9% non-completion is attributed to
    feasible-but-creeping lanes — if that mode is the reference's own,
    host laps must hit the 121-step budget WITH (almost) no
    all-infeasible steps, at a comparable per-lap rate."""
    jax.config.update("jax_platforms", "cpu")  # host controller is eager
    from ilqr_iterative_tasks_tpu.control.nlmpc import NlmpcController
    from ilqr_iterative_tasks_tpu.experiments.runner import (
        default_obstacle, run_closed_loop)
    from ilqr_iterative_tasks_tpu.utils.params import LmpcParams

    args = sys.argv[2:]
    n_seeds = int(args[0]) if args else 12
    laps = int(args[1]) if len(args) > 1 else 3
    per_lap = []
    for sd in range(n_seeds):
        params = LmpcParams.make(all_ss_point=True)
        ctrl = NlmpcController(params, obstacle=default_obstacle(1.0),
                               dtype=jnp.float64)
        rng = np.random.default_rng(1000 + sd)
        res = run_closed_loop(ctrl, lap_number=laps, dt=1.0,
                              zero_noise=False, goal_fixup=None, rng=rng)
        feas_hist = res.plant.diagnostics["feasibility"]
        for li in range(laps):
            fl = np.asarray(feas_hist[li + 0]) if li < len(feas_hist) else \
                np.asarray([])
            row = {
                "seed": sd, "lap": li,
                "steps": int(res.lap_times[li]),
                "finished": bool(res.lap_finished[li]),
                "infeasible_steps": int((fl == 0).sum()),
                "total_steps_rec": int(fl.size),
            }
            per_lap.append(row)
            print(json.dumps(row), flush=True)
    unfinished = [r for r in per_lap if not r["finished"]]
    print(json.dumps({
        "probe": "all_mode_host_mc", "seeds": n_seeds, "laps": laps,
        "lap_count": len(per_lap),
        "unfinished": len(unfinished),
        "unfinished_rate": round(len(unfinished) / max(len(per_lap), 1), 4),
        "unfinished_infeasible_steps": [r["infeasible_steps"]
                                        for r in unfinished],
        "mean_lap_steps": round(float(np.mean([r["steps"]
                                               for r in per_lap])), 2),
    }), flush=True)


def cmd_f32_bisect():
    """TPU-f32 decision-gap bisect (VERDICT r4 #4): the hardware zero-noise
    closed loop converges to [54, 29, 26] vs the CPU/reference [54, 27, 24]
    (docs/PARITY.md). Which op flips the first LM accept/reject? Runs the
    zero-noise closed loop ON THE CHIP through the XLA SoA backend with
    selective f64 islands in the solver (ops/ilqr_soa.py
    ``precision_islands``): trig (dynamics/Jacobian sin/cos), exp (barrier
    exponentials), cost (f64 cost accumulation + LM compares), plus full
    f64 and the f32 baseline. x64 is enabled for the island casts; every
    variant (incl. the baseline) runs under it."""
    jax.config.update("jax_enable_x64", True)
    from ilqr_iterative_tasks_tpu.control.batched_soa import (
        SoaScenarios, simulate_learning_runs_soa)
    from ilqr_iterative_tasks_tpu.models.obstacle import Obstacle
    from ilqr_iterative_tasks_tpu.sim.seed import seed_trajectory
    from ilqr_iterative_tasks_tpu.utils.params import (IlqrParams,
                                                       SystemLimits)

    b = 256
    out = {"probe": "tpu_f32_decision_bisect", "batch": b,
           "backend": jax.default_backend()}
    variants = [("f32_base", jnp.float32, ()),
                ("f64_full", jnp.float64, ()),
                ("f32_trig64", jnp.float32, ("trig",)),
                ("f32_exp64", jnp.float32, ("exp",)),
                ("f32_cost64", jnp.float32, ("cost",)),
                ("f32_all64", jnp.float32, ("trig", "exp", "cost"))]
    sel = sys.argv[2:]
    for tag, dtype, islands in variants:
        if sel and tag not in sel:
            continue
        params = IlqrParams.make(dtype=dtype)
        limits = SystemLimits.make(dtype=dtype)
        xcl, ucl = seed_trajectory(1.0)
        seed_xs = jnp.zeros((128, 4), dtype).at[:121].set(
            jnp.asarray(xcl, dtype))
        seed_us = jnp.zeros((128, 2), dtype).at[:120].set(
            jnp.asarray(ucl, dtype))
        obstacle = Obstacle.make(31.0, -2.0, 8.0, 6.0, dtype=dtype)
        scs = SoaScenarios.broadcast(np.zeros(4), xcl[-1], obstacle, b,
                                     noise_on=False, dtype=dtype)
        res = simulate_learning_runs_soa(
            params, limits, scs, seed_xs, seed_us, 121, 1.0,
            jax.random.PRNGKey(0), num_laps=3, max_steps=128, max_laps=8,
            precision_islands=islands)
        jax.block_until_ready(res)
        steps = np.asarray(res.lap_steps)
        lanes_eq = bool((steps == steps[:, :1]).all())
        out[tag] = {"lap_steps": [int(v) for v in steps[:, 0]],
                    "all_lanes_identical": lanes_eq,
                    "completion": round(
                        float(np.asarray(res.lap_done).mean()), 4)}
        print(json.dumps({tag: out[tag]}), flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    {"permute": cmd_permute, "retile": cmd_retile,
     "retile_nlmpc": cmd_retile_nlmpc, "all_mc": cmd_all_mc,
     "f32_bisect": cmd_f32_bisect, "prox": cmd_prox,
     "all_rev": cmd_all_rev, "tail": cmd_tail}[sys.argv[1]]()
