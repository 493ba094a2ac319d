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

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ilqr_iterative_tasks_tpu.models.obstacle import Obstacle
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
                            with_skip: bool = False):
    """Factory: returns fn(x0 (4,B), x_term (4,B), u_warm (N,2,B), obs (7,B))
    -> (us (N,2,B), x_last (4,B), term_err (B,), feasible (B,) f32).

    B must be a multiple of tile_rows*128 (pad the candidate batch).

    with_skip=True adds a 5th input ``skip`` (B,) f32 0/1: lanes with skip=1
    execute zero LM iterations in BOTH multi-starts (outputs are the clipped
    warm-start rollout — callers discard them). The per-tile lockstep loop
    exits when all lanes are done, so callers should compact skipped lanes
    to the batch tail (control/batched_nlmpc_soa.py does). Per-lane results
    are tile-membership invariant (done lanes freeze their u/lam), so the
    compaction is bitwise-neutral for fresh lanes.
    """
    n = num_horizon
    if n < 2:
        raise ValueError("horizon-1 is a pure reach check handled by the "
                         "controller (nonlinear_lmpc.py:199-213)")
    m = n + 3
    nvar = 2 * n
    tile = tile_rows * 128
    dtf = float(dt)
    a_max = float(np.asarray(limits.a_max))
    d_max = float(np.asarray(limits.delta_max))  # raw bound, no rounding
    sqrt_w = float(np.sqrt(w_obs))
    margin = float(g_margin)

    def kernel(x0_ref, xt_ref, uw_ref, obs_ref, *rest):
        if with_skip:
            skip_ref, us_ref, xl_ref, te_ref, fe_ref = rest
        else:
            skip_ref = None
            us_ref, xl_ref, te_ref, fe_ref = rest
        shp = (tile_rows, 128)
        x0c = tuple(x0_ref[i].reshape(shp) for i in range(4))
        xt = tuple(xt_ref[i].reshape(shp) for i in range(4))
        ox = obs_ref[0].reshape(shp)
        oy = obs_ref[1].reshape(shp)
        inv_w2 = obs_ref[2].reshape(shp)
        inv_h2 = obs_ref[3].reshape(shp)
        spd_up = obs_ref[4].reshape(shp)
        spd_left = obs_ref[5].reshape(shp)
        present = obs_ref[6].reshape(shp)

        def clip_a(z):
            return jnp.clip(z, -a_max, a_max)

        def clip_d(z):
            return jnp.clip(z, -d_max, d_max)

        def clip_grad(z, mx):
            inside = (jnp.abs(z) < mx).astype(jnp.float32)
            tie = (jnp.abs(z) == mx).astype(jnp.float32)
            return inside + 0.5 * tie

        def relu_grad(z):
            pos = (z > 0).astype(jnp.float32)
            tie = (z == 0).astype(jnp.float32)
            return pos + 0.5 * tie

        def step(x, ua, ud):
            px, py, v, th = x
            arc = v * dtf + 0.5 * ua * dtf * dtf
            return (px + jnp.cos(th) * arc, py + jnp.sin(th) * arc,
                    v + ua * dtf, th + ud * dtf)

        def center_at(k):
            return ox - spd_left * float(k), oy + spd_up * float(k)

        def residual(uf):
            """uf: list of nvar arrays -> (f, rows, xs)."""
            us = [(clip_a(uf[2 * j]), clip_d(uf[2 * j + 1]))
                  for j in range(n)]
            xs = [x0c]
            for j in range(n):
                xs.append(step(xs[-1], us[j][0], us[j][1]))
            rows = [xs[n][i] - xt[i] for i in range(4)]
            for k in range(1, n):
                cx, cy = center_at(k)
                g = 1.0 - ((xs[k][0] - cx) ** 2 * inv_w2
                           + (xs[k][1] - cy) ** 2 * inv_h2)
                rows.append(sqrt_w * present * jnp.maximum(g + margin, 0.0))
            f = rows[0] * rows[0]
            for r in rows[1:]:
                f = f + r * r
            return f, rows, xs

        def _is_zero(e):
            return isinstance(e, float) and e == 0.0

        def jacobian(uf, xs):
            us_a = [clip_a(uf[2 * j]) for j in range(n)]
            cos_t = [jnp.cos(xs[i][3]) for i in range(n)]
            sin_t = [jnp.sin(xs[i][3]) for i in range(n)]
            arc = [xs[i][2] * dtf + 0.5 * us_a[i] * dtf * dtf
                   for i in range(n)]
            zero = jnp.zeros(shp, jnp.float32)
            cum0, cum1, cum2, cum3 = [zero, zero], [zero, zero], \
                [zero, zero], [zero, zero]
            for i in range(1, n):
                cum0.append(cum0[-1] + cos_t[i] * dtf * dtf)
                cum1.append(cum1[-1] + (-arc[i] * sin_t[i]) * dtf)
                cum2.append(cum2[-1] + sin_t[i] * dtf * dtf)
                cum3.append(cum3[-1] + arc[i] * cos_t[i] * dtf)
            b00 = [0.5 * dtf * dtf * cos_t[j] for j in range(n)]
            b10 = [0.5 * dtf * dtf * sin_t[j] for j in range(n)]
            mask_a = [clip_grad(uf[2 * j], a_max) for j in range(n)]
            mask_d = [clip_grad(uf[2 * j + 1], d_max) for j in range(n)]

            def sens(k, j):
                return (b00[j] + cum0[k] - cum0[j + 1],
                        cum1[k] - cum1[j + 1],
                        b10[j] + cum2[k] - cum2[j + 1],
                        cum3[k] - cum3[j + 1])

            jac = []
            row_px, row_py, row_v, row_th = [], [], [], []
            for j in range(n):
                sa0, sd0, sa1, sd1 = sens(n, j)
                row_px += [sa0 * mask_a[j], sd0 * mask_d[j]]
                row_py += [sa1 * mask_a[j], sd1 * mask_d[j]]
                row_v += [dtf * mask_a[j], 0.0]
                row_th += [0.0, dtf * mask_d[j]]
            jac += [row_px, row_py, row_v, row_th]
            for k in range(1, n):
                cx, cy = center_at(k)
                g = 1.0 - ((xs[k][0] - cx) ** 2 * inv_w2
                           + (xs[k][1] - cy) ** 2 * inv_h2)
                gate = sqrt_w * present * relu_grad(g + margin)
                gx = gate * (-2.0) * inv_w2 * (xs[k][0] - cx)
                gy = gate * (-2.0) * inv_h2 * (xs[k][1] - cy)
                row = []
                for j in range(n):
                    if j < k:
                        sa0, sd0, sa1, sd1 = sens(k, j)
                        row += [(gx * sa0 + gy * sa1) * mask_a[j],
                                (gx * sd0 + gy * sd1) * mask_d[j]]
                    else:
                        row += [0.0, 0.0]
                jac.append(row)
            return jac

        def lm_step(uf, rows, xs, lam):
            jac = jacobian(uf, xs)
            gram = [[None] * m for _ in range(m)]
            for r in range(m):
                for c in range(r + 1):
                    acc = None
                    for ea, eb in zip(jac[r], jac[c]):
                        if _is_zero(ea) or _is_zero(eb):
                            continue
                        acc = ea * eb if acc is None else acc + ea * eb
                    gram[r][c] = (jnp.zeros(shp, jnp.float32)
                                  if acc is None else acc)
            low = [[None] * m for _ in range(m)]
            inv_diag = [None] * m
            for c in range(m):
                d = gram[c][c] + lam
                for t in range(c):
                    d = d - low[c][t] * low[c][t]
                ld = jnp.sqrt(jnp.maximum(d, 1e-38))
                low[c][c] = ld
                inv_diag[c] = 1.0 / ld
                for r in range(c + 1, m):
                    v = gram[r][c]
                    for t in range(c):
                        v = v - low[r][t] * low[c][t]
                    low[r][c] = v * inv_diag[c]
            y = [None] * m
            for r in range(m):
                v = rows[r]
                for t in range(r):
                    v = v - low[r][t] * y[t]
                y[r] = v * inv_diag[r]
            z = [None] * m
            for r in range(m - 1, -1, -1):
                v = y[r]
                for t in range(r + 1, m):
                    v = v - low[t][r] * z[t]
                z[r] = v * inv_diag[r]
            du = []
            for c in range(nvar):
                acc = None
                for r in range(m):
                    e = jac[r][c]
                    if _is_zero(e):
                        continue
                    acc = e * z[r] if acc is None else acc + e * z[r]
                du.append(-(jnp.zeros(shp, jnp.float32)
                            if acc is None else acc))
            return du

        alphas = (1.0, 0.5, 0.25, 0.1, 0.02)  # ops/lm_shooting.py:88

        def cond(carry):
            it, done_f = carry[0], carry[1]
            return (it < max_iters) & (jnp.min(done_f) < 0.5)

        def body(carry):
            it, done_f, lam = carry[0], carry[1], carry[2]
            uf = list(carry[3:])
            done = done_f > 0.5
            f0, rows, xs = residual(uf)
            du = lm_step(uf, rows, xs, lam)
            best_f = None
            best_uf = None
            for a in alphas:
                cand = [uf[c] + a * du[c] for c in range(nvar)]
                fc, _, _ = residual(cand)
                if best_f is None:
                    best_f, best_uf = fc, cand
                else:
                    better = fc < best_f
                    best_uf = [jnp.where(better, cn, bn)
                               for cn, bn in zip(cand, best_uf)]
                    best_f = jnp.where(better, fc, best_f)
            accept = best_f < f0
            upd = accept & ~done
            uf_next = tuple(jnp.where(upd, bn, un)
                            for bn, un in zip(best_uf, uf))
            lam_next = jnp.where(
                done, lam, jnp.where(accept, jnp.maximum(lam * 0.33, 1e-12),
                                     lam * 4.0))
            f_new = jnp.where(accept, best_f, f0)
            stop = (f_new < 1e-14) | ((~accept) & (lam_next > 1e10))
            done_next = jnp.maximum(done_f, stop.astype(jnp.float32))
            return (it + 1, done_next, lam_next) + uf_next

        done_init = (skip_ref[...].reshape(shp) if with_skip
                     else jnp.zeros(shp, jnp.float32))

        def solve_from(uf0):
            init = ((jnp.asarray(0), done_init,
                     jnp.full(shp, 1e-3, jnp.float32)) + tuple(uf0))
            final = jax.lax.while_loop(cond, body, init)
            uf = list(final[3:])
            f, _, _ = residual(uf)
            return uf, f

        # start 0: clipped warm start; start 1: zeros (lm_shooting.py:120-123)
        warm = []
        for j in range(n):
            warm.append(clip_a(uw_ref[j, 0].reshape(shp)))
            warm.append(clip_d(uw_ref[j, 1].reshape(shp)))
        uf_best, f_best = solve_from(warm)
        for _ in range(1, num_starts):
            zero_start = [jnp.zeros(shp, jnp.float32) for _ in range(nvar)]
            uf_z, f_z = solve_from(zero_start)
            better = f_z < f_best  # strict: warm wins ties (argmin-first)
            uf_best = [jnp.where(better, a, b)
                       for a, b in zip(uf_z, uf_best)]
            f_best = jnp.where(better, f_z, f_best)

        us = [(clip_a(uf_best[2 * j]), clip_d(uf_best[2 * j + 1]))
              for j in range(n)]
        xs = [x0c]
        for j in range(n):
            xs.append(step(xs[-1], us[j][0], us[j][1]))
        d2 = sum((xs[n][i] - xt[i]) ** 2 for i in range(4))
        term_err = jnp.sqrt(jnp.maximum(d2, 0.0))
        viol = None
        for k in range(1, n):
            cx, cy = center_at(k)
            g = present * (1.0 - ((xs[k][0] - cx) ** 2 * inv_w2
                                  + (xs[k][1] - cy) ** 2 * inv_h2))
            viol = g if viol is None else jnp.maximum(viol, g)
        feasible = ((term_err <= term_tol) & (viol <= viol_tol)).astype(
            jnp.float32)
        for j in range(n):
            us_ref[j, 0] = us[j][0].reshape(tile)
            us_ref[j, 1] = us[j][1].reshape(tile)
        for i in range(4):
            xl_ref[i] = xs[n][i].reshape(tile)
        te_ref[...] = term_err.reshape(tile)
        fe_ref[...] = feasible.reshape(tile)

    def solve(x0, x_term, u_warm, obs_lanes, skip=None):
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

    def solve_api(x0, x_term, u_warm, obs_lanes, skip=None):
        return solve_jit(x0, x_term, u_warm, obs_lanes, skip)

    # callers (control/batched_nlmpc_soa.py) probe this to know the kernel
    # accepts a skip mask — enables inactive-lane compaction transparently
    solve_api.with_skip = with_skip
    solve_api.tile = tile
    return solve_api
