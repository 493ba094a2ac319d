"""Worker for tests/test_tpu_hardware.py — runs ON THE REAL TPU CHIP.

Launched as a subprocess (plain ``python``, no conftest CPU pin, so the
sitecustomize axon platform applies). Verifies on actual Mosaic-lowered
hardware kernels what the CI interpret-mode tests verify on CPU: the
q-sorted dominance skip (an f32-scalar ``alive`` carry driving a tile-level
early-terminated while_loop with position-indexed stores) is BITWISE neutral
for both whole-step kernels. This is exactly the lowering surface the repo
documents as miscompile-prone (i1 carries, (8, 128) reshape tiling) — CI's
interpret mode cannot catch a Mosaic regression there; this smoke test can.

Usage: python tests/_tpu_qsort_worker.py {i2lqr|nlmpc}
Prints ``TPU_QSORT_PARITY_OK`` on bitwise equality; exits nonzero otherwise.
"""

import os
import sys

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                 ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import jax.numpy as jnp


def main(which: str) -> None:
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    ".."))
    from ilqr_iterative_tasks_tpu.control.batched_soa import SoaScenarios
    from ilqr_iterative_tasks_tpu.models.obstacle import Obstacle
    from ilqr_iterative_tasks_tpu.sim.seed import seed_trajectory

    assert jax.default_backend() == "tpu", (
        f"this worker must run on the TPU chip, got {jax.default_backend()}")
    dtype = jnp.float32
    xcl, ucl = seed_trajectory(1.0)
    max_steps = 128
    seed_xs = jnp.zeros((max_steps, 4), dtype).at[:121].set(
        jnp.asarray(xcl, dtype))
    seed_us = jnp.zeros((max_steps, 2), dtype).at[:120].set(
        jnp.asarray(ucl, dtype))
    obstacle = Obstacle.make(31.0, -2.0, 8.0, 6.0, dtype=dtype)
    b = 1024  # exactly one tile_rows=8 tile: the production launch quantum
    scenarios = SoaScenarios.broadcast(np.zeros(4), xcl[-1], obstacle, b,
                                       noise_on=True, dtype=dtype)
    key = jax.random.PRNGKey(3)

    if which == "i2lqr":
        from ilqr_iterative_tasks_tpu.control.batched_soa import (
            simulate_learning_runs_soa)
        from ilqr_iterative_tasks_tpu.ops.pallas_i2lqr_step import (
            build_fused_i2lqr_step)
        from ilqr_iterative_tasks_tpu.utils.params import (IlqrParams,
                                                           SystemLimits)

        params = IlqrParams.make(dtype=dtype)
        limits = SystemLimits.make(dtype=dtype)
        runs = []
        for qsort in (False, True):
            solver = build_fused_i2lqr_step(
                params, limits, 1.0, num_horizon=params.num_horizon,
                max_steps=max_steps, max_laps=8, max_iter=16, tile_rows=8,
                dedup=True, qsort_skip=qsort)
            res = simulate_learning_runs_soa(
                params, limits, scenarios, seed_xs, seed_us, 121, 1.0, key,
                num_laps=2, max_steps=max_steps, max_laps=8,
                solver_max_iter=16, pallas_step_solver=solver)
            jax.block_until_ready(res)
            runs.append(res)
    elif which == "nlmpc_stats":
        # ADVICE r4: the with_stats qsort path adds a (tile,) f32 vector and
        # an f32 scalar to the Mosaic scf.while carry — exactly the
        # documented miscompile surface. Build it NON-interpret on the chip:
        # the observer must be bitwise-neutral and useful <= executed.
        from ilqr_iterative_tasks_tpu.control.batched_nlmpc_soa import (
            simulate_nlmpc_runs_soa)
        from ilqr_iterative_tasks_tpu.ops.pallas_nlmpc_step import (
            build_fused_nlmpc_step)
        from ilqr_iterative_tasks_tpu.utils.params import (LmpcParams,
                                                           SystemLimits)

        params = LmpcParams.make(ss_option="spaceVarying")
        limits = SystemLimits.make(dtype=dtype)
        runs = []
        for stats in (False, True):
            solver = build_fused_nlmpc_step(
                params, limits, 1.0, num_horizon=params.num_horizon,
                max_steps=max_steps, max_laps=8, max_iters=12, tile_rows=8,
                qsort_skip=True, with_stats=stats)
            res = simulate_nlmpc_runs_soa(
                params, limits, scenarios, seed_xs, seed_us, 121, 1.0, key,
                num_laps=2, max_steps=max_steps, max_laps=8, max_lm_iters=12,
                pallas_step_solver=solver)
            jax.block_until_ready(res)
            runs.append(res)
        base, stat = runs
        np.testing.assert_array_equal(np.asarray(base.lap_steps),
                                      np.asarray(stat.lap_steps))
        np.testing.assert_array_equal(np.asarray(base.lap_done),
                                      np.asarray(stat.lap_done))
        useful = np.asarray(stat.iter_stats[0])
        executed = np.asarray(stat.iter_stats[1])
        assert (useful <= executed).all(), "useful trips exceed executed"
        assert executed.max() > 0, "stats counters never accumulated"
        print("TPU_QSORT_PARITY_OK")
        return
    else:
        from ilqr_iterative_tasks_tpu.control.batched_nlmpc_soa import (
            simulate_nlmpc_runs_soa)
        from ilqr_iterative_tasks_tpu.ops.pallas_nlmpc_step import (
            build_fused_nlmpc_step)
        from ilqr_iterative_tasks_tpu.utils.params import (LmpcParams,
                                                           SystemLimits)

        params = LmpcParams.make(ss_option="spaceVarying")
        limits = SystemLimits.make(dtype=dtype)
        runs = []
        for qsort in (False, True):
            solver = build_fused_nlmpc_step(
                params, limits, 1.0, num_horizon=params.num_horizon,
                max_steps=max_steps, max_laps=8, max_iters=12, tile_rows=8,
                qsort_skip=qsort)
            res = simulate_nlmpc_runs_soa(
                params, limits, scenarios, seed_xs, seed_us, 121, 1.0, key,
                num_laps=2, max_steps=max_steps, max_laps=8, max_lm_iters=12,
                pallas_step_solver=solver)
            jax.block_until_ready(res)
            runs.append(res)

    base, fast = runs
    np.testing.assert_array_equal(np.asarray(base.lap_steps),
                                  np.asarray(fast.lap_steps))
    np.testing.assert_array_equal(np.asarray(base.lap_done),
                                  np.asarray(fast.lap_done))
    for a, c in zip(base.safe_set, fast.safe_set):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
    print("TPU_QSORT_PARITY_OK")


if __name__ == "__main__":
    main(sys.argv[1])
