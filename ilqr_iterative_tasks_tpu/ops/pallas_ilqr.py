"""Fused Pallas TPU kernel for the batched iLQR candidate solve.

Why: the XLA-compiled SoA solver (ops/ilqr_soa.py) is HBM-bound — every LM
iteration round-trips its carry and intermediates (~30x the minimal traffic),
measuring ~7x off VPU speed-of-light. This kernel runs the ENTIRE solve
(rollout, backward Riccati, forward pass, LM accept/reject loop) for a tile
of TILE lanes with all state resident in VMEM: one HBM read of the problem,
one write of the solution.

Design (see /opt/skills/guides/pallas_guide.md):
- grid over batch tiles; each program owns TILE = 8*128 lanes viewed (8, 128)
  (f32 native tile), giving full VPU occupancy per op;
- all hyperparameters are baked as Python-float constants by the factory
  (zero-weight cost terms fold away at trace time — the default matrix_Q = 0
  and matrix_R = 0 cost nothing);
- per-lane obstacle parameters arrive as a (6, B) tensor so scenario batches
  with heterogeneous obstacles work;
- the LM loop is a lax.while_loop inside the kernel with per-lane done
  masking — identical semantics to ops/ilqr_soa.py (and transitively to the
  reference iterative_ilqr.py:7-160).

The kernel is validated against ilqr_solve_soa lane-for-lane (f32) in
tests/test_pallas_ilqr.py and used by the throughput benches when enabled.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ilqr_iterative_tasks_tpu.models.obstacle import Obstacle
from ilqr_iterative_tasks_tpu.ops._pallas_lm_core import (
    bake_consts, make_tile_funcs)
from ilqr_iterative_tasks_tpu.utils.params import IlqrParams, SystemLimits

TILE_ROWS = 128  # default sublane-rows per program (see build_fused_ilqr)
TILE = TILE_ROWS * 128  # default lanes per grid step


def obstacle_to_lanes(obstacle: Obstacle, batch: int) -> jnp.ndarray:
    """Pack per-lane obstacle parameters -> (6, batch):
    [cx, cy, inv_w2*present, inv_h2*present, spd_up, spd_left]."""
    up = (obstacle.moving_option == 1).astype(jnp.float32)
    left = (obstacle.moving_option == 2).astype(jnp.float32)
    rows = [
        obstacle.x, obstacle.y,
        obstacle.present / (obstacle.width ** 2),
        obstacle.present / (obstacle.height ** 2),
        obstacle.spd * up, obstacle.spd * left,
    ]
    out = jnp.stack([jnp.broadcast_to(r.astype(jnp.float32), (batch,))
                     for r in rows])
    return out


def build_fused_ilqr(params: IlqrParams, limits: SystemLimits, dt: float,
                     *, num_horizon: int, max_iter: int = 150,
                     tile_rows: int = TILE_ROWS, interpret: bool = False,
                     with_skip: bool = False):
    """Factory: returns fn(x0 (4,B), x_term (4,B), u_init (N,2,B), obs (6,B))
    -> (us (N,2,B), x_last (4,B), cost (B,), dist (B,)).

    u_init warm-starts the LM loop (pass zeros for the reference's
    zeros-init-per-candidate semantics, iterative_ilqr/utils/base.py:405).

    Hyperparameters are baked as constants (call the factory again on change).
    B must be a multiple of tile_rows*128 (pad the candidate batch).
    Measured on v5e: tile_rows=64 best at B~128k (3.4M solves/s), 128 best at
    B>=512k (5.1M solves/s); Mosaic compile ~10 min per (shape, max_iter),
    persistent-cached.

    with_skip=True adds a 5th input ``skip`` (B,) f32 0/1: lanes with skip=1
    start the LM loop already-done (they execute zero iterations; outputs are
    the rollout of u_init — callers substitute cached results). Because the
    per-tile lockstep loop exits when ALL lanes are done, callers should
    compact skipped lanes to the batch tail so whole tiles exit at iteration
    zero (the duplicate-candidate dedup in control/batched_soa.py does this).
    Per-lane results are tile-membership invariant (done lanes freeze their
    us/lamb), so compaction is bitwise-neutral for fresh lanes.
    """
    tile = tile_rows * 128
    n = num_horizon
    consts = bake_consts(params, limits, dt)

    def kernel(x0_ref, xt_ref, ui_ref, obs_ref, *rest):
        if with_skip:
            skip_ref, us_ref, xl_ref, cost_ref, dist_ref = rest
        else:
            skip_ref = None
            us_ref, xl_ref, cost_ref, dist_ref = rest
        shp = (tile_rows, 128)
        F = make_tile_funcs(consts, n, shp)
        x0c = tuple(x0_ref[i].reshape(shp) for i in range(4))
        xt = tuple(xt_ref[i].reshape(shp) for i in range(4))
        obs = tuple(obs_ref[i].reshape(shp) for i in range(6))

        ui = []
        for i in range(n):
            ui.append(ui_ref[i, 0].reshape(shp))
            ui.append(ui_ref[i, 1].reshape(shp))
        done0 = (skip_ref[...].reshape(shp) if with_skip
                 else jnp.zeros(shp, jnp.float32))
        us, xs, cost, dist = F.lm_solve(x0c, xt, obs, tuple(ui), done0,
                                        max_iter)
        for i in range(n):
            us_ref[i, 0] = us[i][0].reshape(tile)
            us_ref[i, 1] = us[i][1].reshape(tile)
        for i in range(4):
            xl_ref[i] = xs[n][i].reshape(tile)
        cost_ref[...] = cost.reshape(tile)
        dist_ref[...] = dist.reshape(tile)

    def solve(x0, x_term, u_init, obs_lanes, skip=None):
        b = x_term.shape[-1]
        assert b % tile == 0, f"batch {b} must be a multiple of {tile}"
        grid = (b // tile,)
        in_specs = [
            pl.BlockSpec((4, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, 2, tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ]
        args = [x0, x_term, u_init, obs_lanes]
        if with_skip:
            if skip is None:
                skip = jnp.zeros((b,), jnp.float32)
            in_specs.append(pl.BlockSpec((tile,), lambda i: (i,),
                                         memory_space=pltpu.VMEM))
            args.append(skip)
        elif skip is not None:
            raise ValueError("skip passed to a kernel built without "
                             "with_skip=True")
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((n, 2, tile), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((4, tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile,), lambda i: (i,),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile,), lambda i: (i,),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n, 2, b), jnp.float32),
                jax.ShapeDtypeStruct((4, b), jnp.float32),
                jax.ShapeDtypeStruct((b,), jnp.float32),
                jax.ShapeDtypeStruct((b,), jnp.float32),
            ],
            interpret=interpret,
        )(*args)

    solve_jit = jax.jit(solve)

    def solve_api(x0, x_term, u_init, obs_lanes, skip=None):
        return solve_jit(x0, x_term, u_init, obs_lanes, skip)

    # callers (control/batched_soa.py) probe this to know the kernel accepts
    # a skip mask — enables inactive-lane compaction without a new parameter
    solve_api.with_skip = with_skip
    solve_api.tile = tile
    solve_api.max_iter = max_iter
    return solve_api
