"""Shared tile math for the fused Pallas iLQR kernels.

The LM-regularized iLQR solve body (rollout, scalarized backward Riccati,
clipped forward pass, accept/reject loop) operates on tiles of lanes viewed
``shp = (rows, 128)`` with every small structural dimension unrolled to
per-component arrays. It is used by two kernels:

- ops/pallas_ilqr.py  — one candidate solve per lane (the original fused
  solver, batch = candidates x scenarios);
- ops/pallas_i2lqr_step.py — the whole i2LQR control step per lane (kNN,
  relaxation passes, per-candidate solves, selection).

Semantics mirror ops/ilqr_soa.py (and transitively the reference
iterative_ilqr/control/iterative_ilqr.py:7-160): LM accept/reject with
lambda adaptation, closed-form 2x2 spectral clamp-and-shift regularization,
hard input clipping, no line search. Hyperparameters are baked as Python
floats by ``bake_consts`` so zero-weight cost terms fold away at trace time.
"""

from __future__ import annotations

from types import SimpleNamespace

import numpy as np
import jax
import jax.numpy as jnp


def bake_consts(params, limits, dt) -> SimpleNamespace:
    """Bake hyperparameters to Python floats / symmetrized numpy matrices."""
    f = lambda v: float(np.asarray(v))
    q_m = np.asarray(params.matrix_Q, np.float32)
    r_m = np.asarray(params.matrix_R, np.float32)
    qt_m = np.asarray(params.matrix_Qterminal, np.float32)
    return SimpleNamespace(
        q_m=0.5 * (q_m + q_m.T),
        r_m=0.5 * (r_m + r_m.T),
        qt_m=0.5 * (qt_m + qt_m.T),
        q1c=f(params.tuning_ctrl_q1), q2c=f(params.tuning_ctrl_q2),
        q1o=f(params.tuning_obs_q1), q2o=f(params.tuning_obs_q2),
        margin=f(params.safety_margin),
        eps=f(params.eps),
        lamb0=f(params.lamb),
        lamb_factor=f(params.lamb_factor),
        max_lamb=f(params.max_lamb),
        max_relax_iter=f(params.max_relax_iter),
        a_max=f(limits.a_max),
        d_max=f(limits.delta_max_r),
        param_horizon=float(params.num_horizon),
        dtf=float(dt),
    )


def quad4(m, d):
    acc = 0.0
    for i in range(4):
        for j in range(4):
            if m[i, j] != 0.0:
                acc = acc + float(m[i, j]) * d[i] * d[j]
    return acc


def quad2(m, u):
    acc = 0.0
    for i in range(2):
        for j in range(2):
            if m[i, j] != 0.0:
                acc = acc + float(m[i, j]) * u[i] * u[j]
    return acc


def lin4(m, row, d):
    acc = 0.0
    for j in range(4):
        if m[row, j] != 0.0:
            acc = acc + 2.0 * float(m[row, j]) * d[j]
    return acc


def lex_argmin_tile(rows, shp, cmp_rows=None):
    """In-kernel candidate selection shared by both whole-step kernels.

    rows: list (per safe-set lap) of lists (per kNN slot) of (shp) f32 cost
    arrays. Returns (best_row, best_col, best_cost): the lexicographic
    row-min over laps (mirrors control/batched_soa._lex_argmin_rows, i.e.
    Python min() over per-lap cost lists, reference base.py:462/:605)
    followed by a first-min argmin over the k slots of the winning row.

    ``cmp_rows`` (same structure as rows): optional comparison-only values
    for the ROW-selection stage — the ragged Python-list emulation ranks
    absent tail slots (k > stored lap length) -inf so a strict-prefix list
    ranks below its extension, while ``rows`` keeps real +inf costs for the
    within-row argmin and the all-infeasible test. Valid slots must be a
    per-lane PREFIX of each row (kNN extraction fills selectable rows
    first) for the -inf padding to equal list comparison.

    Boolean accumulators are carried as f32 0/1 — Mosaic cannot materialize
    accumulated i1 vectors on real TPU ('unsupported truncation').
    """
    nsi = len(rows)
    k = len(rows[0])
    if cmp_rows is None:
        cmp_rows = rows
    inf = jnp.float32(jnp.inf)
    best_row = jnp.zeros(shp, jnp.int32)
    for i in range(1, nsi):
        brow = [jnp.zeros(shp, jnp.float32) for _ in range(k)]
        for off in range(nsi):
            sel = best_row == off
            for kk in range(k):
                brow[kk] = jnp.where(sel, cmp_rows[off][kk], brow[kk])
        any_diff = jnp.zeros(shp, jnp.float32)
        a_first = jnp.zeros(shp, jnp.float32)
        b_first = jnp.zeros(shp, jnp.float32)
        for kk in range(k - 1, -1, -1):
            diff = cmp_rows[i][kk] != brow[kk]
            any_diff = jnp.maximum(any_diff, diff.astype(jnp.float32))
            a_first = jnp.where(diff, cmp_rows[i][kk], a_first)
            b_first = jnp.where(diff, brow[kk], b_first)
        less = (any_diff > 0.5) & (a_first < b_first)
        best_row = jnp.where(less, i, best_row)
    best_col = jnp.zeros(shp, jnp.int32)
    best_cost = jnp.full(shp, inf)
    for kk in range(k):
        rck = jnp.zeros(shp, jnp.float32)
        for off in range(nsi):
            rck = jnp.where(best_row == off, rows[off][kk], rck)
        better = rck < best_cost
        best_cost = jnp.where(better, rck, best_cost)
        best_col = jnp.where(better, kk, best_col)
    return best_row, best_col, best_cost


def make_tile_funcs(C: SimpleNamespace, n: int, shp):
    """Tile-shaped solver functions for horizon ``n`` on ``shp`` arrays.

    ``xt`` (terminal candidate) and ``obs`` (6-tuple of per-lane obstacle
    arrays: cx, cy, inv_w2, inv_h2, spd_up, spd_left) are explicit arguments
    so one instance serves many candidates.
    """
    dtf = C.dtf
    q_m, r_m, qt_m = C.q_m, C.r_m, C.qt_m
    q1c, q2c, q1o, q2o = C.q1c, C.q2c, C.q1o, C.q2o

    def clip_u(u):
        return (jnp.clip(u[0], -C.a_max, C.a_max),
                jnp.clip(u[1], -C.d_max, C.d_max))

    def step(x, u):
        px, py, v, th = x
        arc = v * dtf + 0.5 * u[0] * dtf * dtf
        return (px + jnp.cos(th) * arc, py + jnp.sin(th) * arc,
                v + u[0] * dtf, th + u[1] * dtf)

    def rollout(x0c, us):
        xs = [x0c]
        for i in range(n):
            xs.append(step(xs[-1], us[i]))
        return xs

    def cost_of(xs, us, xt):
        acc = jnp.zeros(shp, jnp.float32)
        for i in range(n):
            acc = acc + quad4(q_m, xs[i]) + quad2(r_m, us[i])
        d = tuple(xs[n][i] - xt[i] for i in range(4))
        return acc + quad4(qt_m, d)

    def obs_terms(obs, px, py, off):
        ox, oy, inv_w2, inv_h2, spd_up, spd_left = obs
        cx = ox - spd_left * off
        cy = oy + spd_up * off
        dz = px - cx
        dy = py - cy
        # present-masking is folded into inv_w2/inv_h2 (=0 when absent);
        # gate the barrier magnitude on it so absent lanes contribute 0.
        present = jnp.where(inv_w2 > 0.0, 1.0, 0.0)
        hval = 1.0 + C.margin - (dz * dz * inv_w2 + dy * dy * inv_h2)
        e = present * jnp.exp(q2o * hval)
        hd0 = -2.0 * inv_w2 * dz
        hd1 = -2.0 * inv_h2 * dy
        return q1o * q2o * e, q1o * q2o * q2o * e, hd0, hd1

    def backward(xs, us, lamb, xt, obs):
        dterm = tuple(xs[n][i] - xt[i] for i in range(4))
        ge, he, hd0, hd1 = obs_terms(obs, xs[n][0], xs[n][1], C.param_horizon)
        vx0 = lin4(qt_m, 0, dterm) + ge * hd0
        vx1 = lin4(qt_m, 1, dterm) + ge * hd1
        vx2 = lin4(qt_m, 2, dterm)
        vx3 = lin4(qt_m, 3, dterm)
        z = jnp.zeros(shp, jnp.float32)
        v00 = 2.0 * float(qt_m[0, 0]) + he * hd0 * hd0
        v01 = 2.0 * float(qt_m[0, 1]) + he * hd0 * hd1
        v02 = 2.0 * float(qt_m[0, 2]) + z
        v03 = 2.0 * float(qt_m[0, 3]) + z
        v11 = 2.0 * float(qt_m[1, 1]) + he * hd1 * hd1
        v12 = 2.0 * float(qt_m[1, 2]) + z
        v13 = 2.0 * float(qt_m[1, 3]) + z
        v22 = 2.0 * float(qt_m[2, 2]) + z
        v23 = 2.0 * float(qt_m[2, 3]) + z
        v33 = 2.0 * float(qt_m[3, 3]) + z
        ks = [None] * n
        Ks = [None] * n
        for i in range(n - 1, -1, -1):
            v_nx = xs[i + 1][2]
            th_n = xs[i + 1][3]
            ua, ud = us[i]
            arc = v_nx * dtf + 0.5 * ua * dtf * dtf
            sin_t = jnp.sin(th_n)
            cos_t = jnp.cos(th_n)
            a02 = cos_t * dtf
            a03 = -arc * sin_t
            a12 = sin_t * dtf
            a13 = arc * cos_t
            b00 = 0.5 * dtf * dtf * cos_t
            b10 = 0.5 * dtf * dtf * sin_t
            ea_hi = jnp.exp(q2c * (ua - C.a_max))
            ea_lo = jnp.exp(q2c * (-C.a_max - ua))
            ed_hi = jnp.exp(q2c * (ud - C.d_max))
            ed_lo = jnp.exp(q2c * (-C.d_max - ud))
            lu0 = (2.0 * (float(r_m[0, 0]) * ua + float(r_m[0, 1]) * ud)
                   + q1c * q2c * (ea_hi - ea_lo))
            lu1 = (2.0 * (float(r_m[1, 0]) * ua + float(r_m[1, 1]) * ud)
                   + q1c * q2c * (ed_hi - ed_lo))
            luu00 = 2.0 * float(r_m[0, 0]) + q1c * q2c * q2c * (ea_hi + ea_lo)
            luu01 = 2.0 * float(r_m[0, 1])
            luu11 = 2.0 * float(r_m[1, 1]) + q1c * q2c * q2c * (ed_hi + ed_lo)
            gei, hei, h0, h1 = obs_terms(obs, xs[i][0], xs[i][1], float(i))
            lx0 = lin4(q_m, 0, xs[i]) + gei * h0
            lx1 = lin4(q_m, 1, xs[i]) + gei * h1
            lx2 = lin4(q_m, 2, xs[i])
            lx3 = lin4(q_m, 3, xs[i])
            gn00 = hei * h0 * h0
            gn01 = hei * h0 * h1
            gn11 = hei * h1 * h1
            qx0 = lx0 + vx0
            qx1 = lx1 + vx1
            qx2 = lx2 + a02 * vx0 + a12 * vx1 + vx2
            qx3 = lx3 + a03 * vx0 + a13 * vx1 + vx3
            qu0 = lu0 + b00 * vx0 + b10 * vx1 + dtf * vx2
            qu1 = lu1 + dtf * vx3
            w02 = a02 * v00 + a12 * v01 + v02
            w12 = a02 * v01 + a12 * v11 + v12
            w22 = a02 * v02 + a12 * v12 + v22
            w32 = a02 * v03 + a12 * v13 + v23
            w03 = a03 * v00 + a13 * v01 + v03
            w13 = a03 * v01 + a13 * v11 + v13
            w23 = a03 * v02 + a13 * v12 + v23
            w33 = a03 * v03 + a13 * v13 + v33
            m00 = 2.0 * float(q_m[0, 0]) + gn00 + v00
            m01 = 2.0 * float(q_m[0, 1]) + gn01 + v01
            m02 = 2.0 * float(q_m[0, 2]) + w02
            m03 = 2.0 * float(q_m[0, 3]) + w03
            m11 = 2.0 * float(q_m[1, 1]) + gn11 + v11
            m12 = 2.0 * float(q_m[1, 2]) + w12
            m13 = 2.0 * float(q_m[1, 3]) + w13
            m22 = 2.0 * float(q_m[2, 2]) + a02 * w02 + a12 * w12 + w22
            m23 = 2.0 * float(q_m[2, 3]) + a02 * w03 + a12 * w13 + w23
            m33 = 2.0 * float(q_m[3, 3]) + a03 * w03 + a13 * w13 + w33
            quu00 = (luu00 + b00 * (b00 * v00 + b10 * v01 + dtf * v02)
                     + b10 * (b00 * v01 + b10 * v11 + dtf * v12)
                     + dtf * (b00 * v02 + b10 * v12 + dtf * v22))
            quu01 = luu01 + dtf * (b00 * v03 + b10 * v13 + dtf * v23)
            quu11 = luu11 + dtf * dtf * v33
            qux00 = b00 * v00 + b10 * v01 + dtf * v02
            qux01 = b00 * v01 + b10 * v11 + dtf * v12
            qux02 = b00 * w02 + b10 * w12 + dtf * w22
            qux03 = b00 * w03 + b10 * w13 + dtf * w23
            qux10 = dtf * v03
            qux11 = dtf * v13
            qux12 = dtf * w32
            qux13 = dtf * w33
            # closed-form spectral inverse of 2x2 (clamp-and-shift)
            mean = 0.5 * (quu00 + quu11)
            disc = jnp.sqrt(jnp.maximum(
                0.25 * (quu00 - quu11) ** 2 + quu01 * quu01, 0.0))
            e1 = mean + disc
            e2 = mean - disc
            f1 = 1.0 / (jnp.maximum(e1, 0.0) + lamb)
            f2 = 1.0 / (jnp.maximum(e2, 0.0) + lamb)
            safe = disc > 1e-12
            beta = jnp.where(safe, (f1 - f2)
                             / jnp.where(safe, e1 - e2, 1.0), 0.0)
            alpha = f1 - beta * e1
            i00 = alpha + beta * quu00
            i01 = beta * quu01
            i11 = alpha + beta * quu11
            k0 = -(i00 * qu0 + i01 * qu1)
            k1 = -(i01 * qu0 + i11 * qu1)
            kk00 = -(i00 * qux00 + i01 * qux10)
            kk01 = -(i00 * qux01 + i01 * qux11)
            kk02 = -(i00 * qux02 + i01 * qux12)
            kk03 = -(i00 * qux03 + i01 * qux13)
            kk10 = -(i01 * qux00 + i11 * qux10)
            kk11 = -(i01 * qux01 + i11 * qux11)
            kk12 = -(i01 * qux02 + i11 * qux12)
            kk13 = -(i01 * qux03 + i11 * qux13)
            t0 = quu00 * k0 + quu01 * k1
            t1 = quu01 * k0 + quu11 * k1
            vx0 = qx0 - (kk00 * t0 + kk10 * t1)
            vx1 = qx1 - (kk01 * t0 + kk11 * t1)
            vx2 = qx2 - (kk02 * t0 + kk12 * t1)
            vx3 = qx3 - (kk03 * t0 + kk13 * t1)
            s00 = quu00 * kk00 + quu01 * kk10
            s01 = quu00 * kk01 + quu01 * kk11
            s02 = quu00 * kk02 + quu01 * kk12
            s03 = quu00 * kk03 + quu01 * kk13
            s10 = quu01 * kk00 + quu11 * kk10
            s11 = quu01 * kk01 + quu11 * kk11
            s12 = quu01 * kk02 + quu11 * kk12
            s13 = quu01 * kk03 + quu11 * kk13
            v00 = m00 - (kk00 * s00 + kk10 * s10)
            v01 = m01 - (kk00 * s01 + kk10 * s11)
            v02 = m02 - (kk00 * s02 + kk10 * s12)
            v03 = m03 - (kk00 * s03 + kk10 * s13)
            v11 = m11 - (kk01 * s01 + kk11 * s11)
            v12 = m12 - (kk01 * s02 + kk11 * s12)
            v13 = m13 - (kk01 * s03 + kk11 * s13)
            v22 = m22 - (kk02 * s02 + kk12 * s12)
            v23 = m23 - (kk02 * s03 + kk12 * s13)
            v33 = m33 - (kk03 * s03 + kk13 * s13)
            ks[i] = (k0, k1)
            Ks[i] = ((kk00, kk01, kk02, kk03), (kk10, kk11, kk12, kk13))
        return ks, Ks

    def forward(xs, us, ks, Ks, xt):
        x_new = xs[0]
        us_new = []
        acc = jnp.zeros(shp, jnp.float32)
        for i in range(n):
            dx = tuple(x_new[j] - xs[i][j] for j in range(4))
            kr0, kr1 = Ks[i]
            u0 = (us[i][0] + ks[i][0] + kr0[0] * dx[0] + kr0[1] * dx[1]
                  + kr0[2] * dx[2] + kr0[3] * dx[3])
            u1 = (us[i][1] + ks[i][1] + kr1[0] * dx[0] + kr1[1] * dx[1]
                  + kr1[2] * dx[2] + kr1[3] * dx[3])
            u_new = clip_u((u0, u1))
            dxt = tuple(x_new[j] - xt[j] for j in range(4))
            acc = acc + quad4(q_m, dxt) + quad2(r_m, u_new)
            x_new = step(x_new, u_new)
            us_new.append(u_new)
        dterm = tuple(x_new[j] - xt[j] for j in range(4))
        acc = acc + quad4(qt_m, dterm)
        return us_new, acc

    def flatten_us(us):
        out = []
        for u in us:
            out.extend(u)
        return tuple(out)

    def unflatten_us(flat):
        return [(flat[2 * i], flat[2 * i + 1]) for i in range(n)]

    def lm_solve(x0c, xt, obs, ui_flat, done0, max_iter,
                 with_iter_stats=False):
        """Full LM loop. ui_flat: 2n arrays (shp); done0: f32 0/1 (shp).

        Returns (us list of n 2-tuples, xs list of n+1 4-tuples, cost, dist),
        plus (useful (shp), executed scalar f32) when ``with_iter_stats``:
        ``useful`` is the per-lane iteration count until the lane froze
        (0 for pre-done lanes, the full trip count for never-converged
        lanes), ``executed`` the lockstep trip count every lane of the tile
        paid — the straggler-waste instrumentation of docs/PERF.md.
        NOTE: ``done`` is carried as f32 0/1 — Mosaic (2026-08) miscompiles
        an i1 (8,128) vector in an scf.while carry (layout mismatch crash).
        """
        n_head = 4 if with_iter_stats else 3

        def cond(carry):
            it, done_f = carry[0], carry[1]
            return (it < max_iter) & (jnp.min(done_f) < 0.5)

        def body(carry):
            it, done_f, lamb = carry[0], carry[1], carry[2]
            done = done_f > 0.5
            us = [clip_u(u) for u in unflatten_us(carry[n_head:])]
            xs = rollout(x0c, us)
            cost = cost_of(xs, us, xt)
            ks, Ks = backward(xs, us, lamb, xt, obs)
            us_new, cost_new = forward(xs, us, ks, Ks, xt)
            accept = cost_new < cost
            upd = accept & ~done
            us_next = tuple(
                jnp.where(upd, un, uc)
                for un, uc in zip(flatten_us(us_new), flatten_us(us)))
            lamb_next = jnp.where(
                done, lamb, jnp.where(accept, lamb / C.lamb_factor,
                                      lamb * C.lamb_factor))
            converged = accept & (jnp.abs((cost_new - cost) / cost) < C.eps)
            diverged = (~accept) & (lamb_next > C.max_lamb)
            done_next = jnp.maximum(
                done_f, (converged | diverged).astype(jnp.float32))
            head = (it + 1, done_next, lamb_next)
            if with_iter_stats:
                newly = done_next > done_f
                it_done = jnp.where(
                    newly, jnp.float32(1.0) * (it + 1), carry[3])
                head = head + (it_done,)
            return head + us_next

        head0 = (jnp.asarray(0), done0, jnp.full(shp, C.lamb0, jnp.float32))
        if with_iter_stats:
            head0 = head0 + (jnp.zeros(shp, jnp.float32),)
        final = jax.lax.while_loop(cond, body, head0 + tuple(ui_flat))
        us = [clip_u(u) for u in unflatten_us(final[n_head:])]
        xs = rollout(x0c, us)
        cost = cost_of(xs, us, xt)
        d = tuple(xs[n][i] - xt[i] for i in range(4))
        dist = jnp.sqrt(d[0] * d[0] + d[1] * d[1] + d[2] * d[2] + d[3] * d[3])
        if with_iter_stats:
            executed = jnp.float32(1.0) * final[0]
            it_done = final[3]
            useful = jnp.where(it_done > 0.0, it_done,
                               jnp.where(done0 > 0.5, 0.0, executed))
            return us, xs, cost, dist, useful, executed
        return us, xs, cost, dist

    def lm_solve_multi(x0c, xts, obs, ui_flats, done0s, max_iter):
        """G independent LM solves interleaved in ONE while_loop.

        xts / ui_flats / done0s: length-G lists of (xt 4-tuple, 2n arrays,
        f32 0/1 done mask). The loop runs while ANY instance has an
        unfinished lane, i.e. trips = max over instances — but the G
        per-iteration bodies are INDEPENDENT dataflow, so Mosaic can overlap
        them across VPU issue slots (the single-instance body is partially
        latency-bound on the Riccati dependence chain). Per-instance results
        are BITWISE identical to ``lm_solve``: done lanes freeze (us, lamb,
        done are where-masked), so extra trips on an already-converged
        instance are no-ops — the same lockstep-invariance argument as the
        step kernel's candidate fori_loop.

        Returns a length-G list of (us, xs, cost, dist) tuples.
        """
        g_n = len(xts)
        stride = 2 * n

        def cond(carry):
            it = carry[0]
            alive = jnp.min(carry[1]) < 0.5
            for g in range(1, g_n):
                alive = alive | (jnp.min(carry[1 + g]) < 0.5)
            return (it < max_iter) & alive

        def body(carry):
            it = carry[0]
            dones = list(carry[1:1 + g_n])
            lambs = list(carry[1 + g_n:1 + 2 * g_n])
            base = 1 + 2 * g_n
            new_dones, new_lambs, new_us = [], [], []
            for g in range(g_n):
                done_f, lamb = dones[g], lambs[g]
                done = done_f > 0.5
                us = [clip_u(u) for u in
                      unflatten_us(carry[base + g * stride:
                                         base + (g + 1) * stride])]
                xs = rollout(x0c, us)
                cost = cost_of(xs, us, xts[g])
                ks, Ks = backward(xs, us, lamb, xts[g], obs)
                us_new, cost_new = forward(xs, us, ks, Ks, xts[g])
                accept = cost_new < cost
                upd = accept & ~done
                new_us.extend(
                    jnp.where(upd, un, uc)
                    for un, uc in zip(flatten_us(us_new), flatten_us(us)))
                new_lambs.append(jnp.where(
                    done, lamb, jnp.where(accept, lamb / C.lamb_factor,
                                          lamb * C.lamb_factor)))
                converged = accept & (jnp.abs((cost_new - cost) / cost)
                                      < C.eps)
                diverged = (~accept) & (new_lambs[g] > C.max_lamb)
                new_dones.append(jnp.maximum(
                    done_f, (converged | diverged).astype(jnp.float32)))
            return ((it + 1,) + tuple(new_dones) + tuple(new_lambs)
                    + tuple(new_us))

        init = ((jnp.asarray(0),) + tuple(done0s)
                + tuple(jnp.full(shp, C.lamb0, jnp.float32)
                        for _ in range(g_n)))
        for ui in ui_flats:
            init = init + tuple(ui)
        final = jax.lax.while_loop(cond, body, init)
        base = 1 + 2 * g_n
        out = []
        for g in range(g_n):
            us = [clip_u(u) for u in
                  unflatten_us(final[base + g * stride:
                                     base + (g + 1) * stride])]
            xs = rollout(x0c, us)
            cost = cost_of(xs, us, xts[g])
            d = tuple(xs[n][i] - xts[g][i] for i in range(4))
            dist = jnp.sqrt(d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
                            + d[3] * d[3])
            out.append((us, xs, cost, dist))
        return out

    return SimpleNamespace(clip_u=clip_u, step=step, rollout=rollout,
                           cost_of=cost_of, obs_terms=obs_terms,
                           backward=backward, forward=forward,
                           flatten_us=flatten_us, unflatten_us=unflatten_us,
                           lm_solve=lm_solve, lm_solve_multi=lm_solve_multi)
