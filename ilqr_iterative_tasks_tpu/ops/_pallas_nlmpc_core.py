"""Shared tile math for the fused Pallas NLMPC (LM-shooting) kernels.

The projected LM feasibility solve — rollout, closed-form residual Jacobian
(prefix sums), dual-space (n+3)x(n+3) Cholesky, 5-point line search, lambda
adaptation, multi-starts — on tiles of lanes viewed ``shp = (rows, 128)``.
Used by:

- ops/pallas_lm_shooting.py  — one candidate solve per lane;
- ops/pallas_nlmpc_step.py   — the whole NLMPC control step per lane.

Semantics mirror ops/lm_shooting_soa.py (which documents the parity mapping
against /root/reference/iterative_ilqr/control/nonlinear_lmpc.py:19-197).
``obs`` is the 7-tuple (cx, cy, inv_w2, inv_h2, spd_up, spd_left, present).
"""

from __future__ import annotations

from types import SimpleNamespace

import numpy as np
import jax
import jax.numpy as jnp


def bake_nlmpc_consts(limits, dt, *, w_obs: float = 10.0,
                      g_margin: float = 1e-3, term_tol: float = 1e-4,
                      viol_tol: float = 1e-4) -> SimpleNamespace:
    return SimpleNamespace(
        dtf=float(dt),
        a_max=float(np.asarray(limits.a_max)),
        d_max=float(np.asarray(limits.delta_max)),  # raw bound, no rounding
        sqrt_w=float(np.sqrt(w_obs)),
        margin=float(g_margin),
        term_tol=float(term_tol),
        viol_tol=float(viol_tol),
    )


def make_nlmpc_tile_funcs(C: SimpleNamespace, n: int, shp, mm=None):
    """LM-shooting tile functions for horizon ``n`` on ``shp`` arrays.

    ``mm``: optional per-lane EFFECTIVE horizon ((shp) i32, values in
    [2, n]) — the shrinking-horizon branch of the LMPC bookkeeping
    (base.py:640-654). Mirrors ops/lm_shooting_soa.py ``m_lanes`` exactly:
    terminal residual rows read x_m instead of x_n, obstacle rows k >= m
    and Jacobian columns j >= m are zeroed, and the final feasibility
    verdict tests term_err at x_m with constraint rows k >= m absent.
    Zeroed rows/columns decouple exactly in the damped normal equations,
    so per lane this IS the reduced horizon-m LM iteration. ``mm=None``
    keeps the original full-horizon trace untouched.
    """
    if n < 2:
        raise ValueError("horizon-1 is a pure reach check handled by the "
                         "controller (nonlinear_lmpc.py:199-213)")
    m = n + 3
    nvar = 2 * n
    dtf = C.dtf
    a_max, d_max = C.a_max, C.d_max
    sqrt_w, margin = C.sqrt_w, C.margin

    def _at_m(lst):
        """Per-lane lst[m] for m in [2, n] (lst indexed 0..n)."""
        v = lst[n]
        for kk in range(2, n):
            v = jnp.where(mm == kk, lst[kk], v)
        return v

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

    def center_at(obs, k):
        ox, oy = obs[0], obs[1]
        spd_up, spd_left = obs[4], obs[5]
        return ox - spd_left * float(k), oy + spd_up * float(k)

    def residual(x0c, xt, obs, uf):
        """uf: list of nvar arrays -> (f, rows, xs)."""
        inv_w2, inv_h2, present = obs[2], obs[3], obs[6]
        us = [(clip_a(uf[2 * j]), clip_d(uf[2 * j + 1]))
              for j in range(n)]
        xs = [x0c]
        for j in range(n):
            xs.append(step(xs[-1], us[j][0], us[j][1]))
        if mm is None:
            rows = [xs[n][i] - xt[i] for i in range(4)]
        else:
            # terminal rows read the per-lane effective horizon state x_m
            rows = [_at_m([xs[kk][i] for kk in range(n + 1)]) - xt[i]
                    for i in range(4)]
        for k in range(1, n):
            cx, cy = center_at(obs, k)
            g = 1.0 - ((xs[k][0] - cx) ** 2 * inv_w2
                       + (xs[k][1] - cy) ** 2 * inv_h2)
            r = sqrt_w * present * jnp.maximum(g + margin, 0.0)
            if mm is not None:
                r = jnp.where(k < mm, r, 0.0)  # row absent below horizon m
            rows.append(r)
        f = rows[0] * rows[0]
        for r in rows[1:]:
            f = f + r * r
        return f, rows, xs

    def _is_zero(e):
        return isinstance(e, float) and e == 0.0

    def jacobian(obs, uf, xs):
        inv_w2, inv_h2, present = obs[2], obs[3], obs[6]
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
        if mm is not None:
            # columns j >= m are not decision variables of the horizon-m NLP
            mask_a = [jnp.where(j < mm, mask_a[j], 0.0) for j in range(n)]
            mask_d = [jnp.where(j < mm, mask_d[j], 0.0) for j in range(n)]
            cum_m = [_at_m(c) for c in (cum0, cum1, cum2, cum3)]

        def sens(k, j):
            return (b00[j] + cum0[k] - cum0[j + 1],
                    cum1[k] - cum1[j + 1],
                    b10[j] + cum2[k] - cum2[j + 1],
                    cum3[k] - cum3[j + 1])

        def sens_m(j):
            """Terminal sensitivity at the per-lane horizon m; garbage for
            j >= m, but those columns carry mask 0."""
            return (b00[j] + cum_m[0] - cum0[j + 1],
                    cum_m[1] - cum1[j + 1],
                    b10[j] + cum_m[2] - cum2[j + 1],
                    cum_m[3] - cum3[j + 1])

        jac = []
        row_px, row_py, row_v, row_th = [], [], [], []
        for j in range(n):
            sa0, sd0, sa1, sd1 = sens(n, j) if mm is None else sens_m(j)
            row_px += [sa0 * mask_a[j], sd0 * mask_d[j]]
            row_py += [sa1 * mask_a[j], sd1 * mask_d[j]]
            row_v += [dtf * mask_a[j], 0.0]
            row_th += [0.0, dtf * mask_d[j]]
        jac += [row_px, row_py, row_v, row_th]
        for k in range(1, n):
            cx, cy = center_at(obs, k)
            g = 1.0 - ((xs[k][0] - cx) ** 2 * inv_w2
                       + (xs[k][1] - cy) ** 2 * inv_h2)
            gate = sqrt_w * present * relu_grad(g + margin)
            if mm is not None:
                gate = jnp.where(k < mm, gate, 0.0)
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

    def lm_step(obs, uf, rows, xs, lam):
        jac = jacobian(obs, uf, xs)
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

    def solve_from(x0c, xt, obs, uf0, done_init, max_iters,
                   with_iter_stats=False):
        n_head = 4 if with_iter_stats else 3

        def cond(carry):
            it, done_f = carry[0], carry[1]
            return (it < max_iters) & (jnp.min(done_f) < 0.5)

        def body(carry):
            it, done_f, lam = carry[0], carry[1], carry[2]
            uf = list(carry[n_head:])
            done = done_f > 0.5
            f0, rows, xs = residual(x0c, xt, obs, uf)
            du = lm_step(obs, uf, rows, xs, lam)
            best_f = None
            best_uf = None
            for a in alphas:
                cand = [uf[c] + a * du[c] for c in range(nvar)]
                fc, _, _ = residual(x0c, xt, obs, cand)
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
            head = (it + 1, done_next, lam_next)
            if with_iter_stats:
                # same convention as _pallas_lm_core.lm_solve: per-lane
                # trips until the lane froze; pre-done lanes count 0
                newly = done_next > done_f
                it_done = jnp.where(newly, jnp.float32(1.0) * (it + 1),
                                    carry[3])
                head = head + (it_done,)
            return head + uf_next

        head0 = (jnp.asarray(0), done_init,
                 jnp.full(shp, 1e-3, jnp.float32))
        if with_iter_stats:
            head0 = head0 + (jnp.zeros(shp, jnp.float32),)
        final = jax.lax.while_loop(cond, body, head0 + tuple(uf0))
        uf = list(final[n_head:])
        f, _, _ = residual(x0c, xt, obs, uf)
        if with_iter_stats:
            executed = jnp.float32(1.0) * final[0]
            it_done = final[3]
            useful = jnp.where(it_done > 0.0, it_done,
                               jnp.where(done_init > 0.5, 0.0, executed))
            return uf, f, useful, executed
        return uf, f

    def feasibility_solve(x0c, xt, obs, warm, done_init, max_iters,
                          num_starts, skip_converged_starts=False,
                          with_iter_stats=False):
        """Full multi-start solve + feasibility verdict on the rollout.

        warm: list of nvar arrays (CLIPPED warm start). Returns
        (us list of n 2-tuples, xs, term_err, feasible f32).

        ``skip_converged_starts``: lanes whose warm-start solve already hit
        the global LM convergence threshold (f < 1e-14) enter the zeros
        start pre-done — a tile whose lanes all converged warm skips the
        entire second while_loop. NOT bitwise-neutral: the fully-solved
        zeros start can land at a smaller residual and flip the selected
        input sequence (both solutions are feasible to 1e-7 in state space,
        but the closed-loop trajectory may differ) — gate behind the
        behavior-level parity envelope (docs/PARITY.md, tests/
        test_behavior_envelope.py). Skipped lanes keep the warm solution:
        the unsolved zeros residual is >= 1e-14 > f_best, so ``better``
        stays False.
        """
        inv_w2, inv_h2, present = obs[2], obs[3], obs[6]
        # start 0: clipped warm start; start 1: zeros (lm_shooting.py:120-123)
        if with_iter_stats:
            uf_best, f_best, useful, executed = solve_from(
                x0c, xt, obs, warm, done_init, max_iters,
                with_iter_stats=True)
        else:
            uf_best, f_best = solve_from(x0c, xt, obs, warm, done_init,
                                         max_iters)
        for _ in range(1, num_starts):
            zdone = done_init
            if skip_converged_starts:
                zdone = jnp.maximum(
                    done_init, (f_best < 1e-14).astype(jnp.float32))
            zero_start = [jnp.zeros(shp, jnp.float32) for _ in range(nvar)]
            if with_iter_stats:
                uf_z, f_z, useful_z, executed_z = solve_from(
                    x0c, xt, obs, zero_start, zdone, max_iters,
                    with_iter_stats=True)
                useful = useful + useful_z
                executed = executed + executed_z
            else:
                uf_z, f_z = solve_from(x0c, xt, obs, zero_start, zdone,
                                       max_iters)
            better = f_z < f_best  # strict: warm wins ties (argmin-first)
            uf_best = [jnp.where(better, a, b)
                       for a, b in zip(uf_z, uf_best)]
            f_best = jnp.where(better, f_z, f_best)

        us = [(clip_a(uf_best[2 * j]), clip_d(uf_best[2 * j + 1]))
              for j in range(n)]
        xs = [x0c]
        for j in range(n):
            xs.append(step(xs[-1], us[j][0], us[j][1]))
        if mm is None:
            x_at = [xs[n][i] for i in range(4)]
        else:
            x_at = [_at_m([xs[kk][i] for kk in range(n + 1)])
                    for i in range(4)]
        d2 = sum((x_at[i] - xt[i]) ** 2 for i in range(4))
        term_err = jnp.sqrt(jnp.maximum(d2, 0.0))
        viol = None
        for k in range(1, n):
            cx, cy = center_at(obs, k)
            g = present * (1.0 - ((xs[k][0] - cx) ** 2 * inv_w2
                                  + (xs[k][1] - cy) ** 2 * inv_h2))
            if mm is not None:
                # constraint rows k >= m do not exist in the horizon-m NLP
                g = jnp.where(k < mm, g, -jnp.inf)
            viol = g if viol is None else jnp.maximum(viol, g)
        feasible = ((term_err <= C.term_tol) & (viol <= C.viol_tol)).astype(
            jnp.float32)
        if with_iter_stats:
            return us, xs, term_err, feasible, useful, executed
        return us, xs, term_err, feasible

    return SimpleNamespace(clip_a=clip_a, clip_d=clip_d, step=step,
                           residual=residual, solve_from=solve_from,
                           feasibility_solve=feasibility_solve,
                           at_m=(None if mm is None else _at_m))
