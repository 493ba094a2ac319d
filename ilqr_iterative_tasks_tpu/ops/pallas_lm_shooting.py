"""Fused Pallas TPU kernel for the batched NLMPC candidate feasibility solve.

NLMPC counterpart of ops/pallas_ilqr.py: the XLA-compiled SoA LM-shooting
solver (ops/lm_shooting_soa.py) round-trips its carry (12 input components +
intermediates) through HBM every LM iteration; this kernel runs the ENTIRE
projected LM solve — rollout, closed-form residual Jacobian, dual-space
9x9 Cholesky, 5-point line search, lambda adaptation, both multi-starts —
for a tile of lanes with all state resident in VMEM: one HBM read of the
problem, one write of the solution.

Semantics are identical to ops/lm_shooting_soa.py (which documents the parity
mapping against /root/reference/iterative_ilqr/control/nonlinear_lmpc.py:
19-197), with the same two execution-strategy notes as the iLQR kernel:

- hyperparameters are baked as Python-float constants by the factory;
- the LM loop is a lax.while_loop with per-lane done masking carried as f32
  (Mosaic 2026-08 miscompiles i1 (8,128) carries) and tile-wide early exit;
- the two starts (warm, zeros) run sequentially per lane; the final answer
  takes the start with the strictly smaller residual norm (warm wins ties,
  matching argmin-first semantics).

Validated against lm_feasibility_solve_soa lane-for-lane in
tests/test_pallas_lm_shooting.py and used by the batched NLMPC simulator
when enabled.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ilqr_iterative_tasks_tpu.models.obstacle import Obstacle
from ilqr_iterative_tasks_tpu.ops._pallas_nlmpc_core import (
    bake_nlmpc_consts, make_nlmpc_tile_funcs)
from ilqr_iterative_tasks_tpu.utils.params import SystemLimits

# Default sublane-rows per program. The LM kernel carries more live VMEM
# state than the iLQR one (12 input components + Jacobian prefix sums);
# tile_rows=128 overflows the 16M scoped-vmem stack by ~2% on v5e, 64 fits.
TILE_ROWS = 64


def obstacle_to_lanes_nlmpc(obstacle: Obstacle, batch: int) -> jnp.ndarray:
    """Pack per-lane obstacle parameters -> (7, batch):
    [cx, cy, inv_w2, inv_h2, spd_up, spd_left, present]."""
    up = (obstacle.moving_option == 1).astype(jnp.float32)
    left = (obstacle.moving_option == 2).astype(jnp.float32)
    rows = [
        obstacle.x, obstacle.y,
        1.0 / obstacle.width ** 2, 1.0 / obstacle.height ** 2,
        obstacle.spd * up, obstacle.spd * left, obstacle.present,
    ]
    return jnp.stack([jnp.broadcast_to(r.astype(jnp.float32), (batch,))
                      for r in rows])


def build_fused_lm_shooting(limits: SystemLimits, dt: float, *,
                            num_horizon: int, max_iters: int = 60,
                            num_starts: int = 2, w_obs: float = 10.0,
                            g_margin: float = 1e-3, term_tol: float = 1e-4,
                            viol_tol: float = 1e-4,
                            tile_rows: int = TILE_ROWS,
                            interpret: bool = False,
                            with_skip: bool = False,
                            with_hzn: bool = False):
    """Factory: returns fn(x0 (4,B), x_term (4,B), u_warm (N,2,B), obs (7,B))
    -> (us (N,2,B), x_last (4,B), term_err (B,), feasible (B,) f32).

    B must be a multiple of tile_rows*128 (pad the candidate batch).

    with_skip=True adds an input ``skip`` (B,) f32 0/1: lanes with skip=1
    execute zero LM iterations in BOTH multi-starts (outputs are the clipped
    warm-start rollout — callers discard them). The per-tile lockstep loop
    exits when all lanes are done, so callers should compact skipped lanes
    to the batch tail (control/batched_nlmpc_soa.py does). Per-lane results
    are tile-membership invariant (done lanes freeze their u/lam), so the
    compaction is bitwise-neutral for fresh lanes.

    with_hzn=True adds an input ``hzn`` (B,) i32: the per-lane EFFECTIVE
    horizon of the LMPC shrinking-horizon branch (base.py:640-654), clipped
    in-kernel to [2, N] and applied via the exact row/column masking of
    ops/lm_shooting_soa.py ``m_lanes`` (see _pallas_nlmpc_core). The
    ``x_last`` output then reports the per-lane horizon-m state x_m, and
    ``term_err``/``feasible`` are judged at x_m with constraint rows
    k >= m absent.
    """
    n = num_horizon
    if n < 2:
        raise ValueError("horizon-1 is a pure reach check handled by the "
                         "controller (nonlinear_lmpc.py:199-213)")
    tile = tile_rows * 128
    consts = bake_nlmpc_consts(limits, dt, w_obs=w_obs, g_margin=g_margin,
                               term_tol=term_tol, viol_tol=viol_tol)

    def kernel(x0_ref, xt_ref, uw_ref, obs_ref, *rest):
        it = iter(rest)
        skip_ref = next(it) if with_skip else None
        hzn_ref = next(it) if with_hzn else None
        us_ref, xl_ref, te_ref, fe_ref = it
        shp = (tile_rows, 128)
        mm = (jnp.clip(hzn_ref[...].reshape(shp), 2, n) if with_hzn
              else None)
        F = make_nlmpc_tile_funcs(consts, n, shp, mm=mm)
        x0c = tuple(x0_ref[i].reshape(shp) for i in range(4))
        xt = tuple(xt_ref[i].reshape(shp) for i in range(4))
        obs = tuple(obs_ref[i].reshape(shp) for i in range(7))

        done_init = (skip_ref[...].reshape(shp) if with_skip
                     else jnp.zeros(shp, jnp.float32))
        warm = []
        for j in range(n):
            warm.append(F.clip_a(uw_ref[j, 0].reshape(shp)))
            warm.append(F.clip_d(uw_ref[j, 1].reshape(shp)))
        us, xs, term_err, feasible = F.feasibility_solve(
            x0c, xt, obs, warm, done_init, max_iters, num_starts)
        for j in range(n):
            us_ref[j, 0] = us[j][0].reshape(tile)
            us_ref[j, 1] = us[j][1].reshape(tile)
        for i in range(4):
            if with_hzn:
                xl_ref[i] = F.at_m([xs[kk][i]
                                    for kk in range(n + 1)]).reshape(tile)
            else:
                xl_ref[i] = xs[n][i].reshape(tile)
        te_ref[...] = term_err.reshape(tile)
        fe_ref[...] = feasible.reshape(tile)

    def solve(x0, x_term, u_warm, obs_lanes, skip=None, hzn=None):
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
            pl.BlockSpec((7, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ]
        args = [x0, x_term, u_warm, obs_lanes]
        if with_skip:
            if skip is None:
                skip = jnp.zeros((b,), jnp.float32)
            in_specs.append(pl.BlockSpec((tile,), lambda i: (i,),
                                         memory_space=pltpu.VMEM))
            args.append(skip)
        elif skip is not None:
            raise ValueError("skip passed to a kernel built without "
                             "with_skip=True")
        if with_hzn:
            if hzn is None:
                hzn = jnp.full((b,), n, jnp.int32)
            in_specs.append(pl.BlockSpec((tile,), lambda i: (i,),
                                         memory_space=pltpu.VMEM))
            args.append(hzn.astype(jnp.int32))
        elif hzn is not None:
            raise ValueError("hzn passed to a kernel built without "
                             "with_hzn=True")
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

    def solve_api(x0, x_term, u_warm, obs_lanes, skip=None, hzn=None):
        return solve_jit(x0, x_term, u_warm, obs_lanes, skip, hzn)

    # callers (control/batched_nlmpc_soa.py) probe this to know the kernel
    # accepts a skip mask — enables inactive-lane compaction transparently
    solve_api.with_skip = with_skip
    solve_api.with_hzn = with_hzn
    solve_api.tile = tile
    solve_api.max_iters = max_iters
    return solve_api
