"""Structure-of-arrays (batch-trailing) projected LM shooting solver — the
TPU fast path for the NLMPC candidate feasibility NLP.

Semantics identical to ops/lm_shooting.py (which documents the parity mapping
against /root/reference/iterative_ilqr/control/nonlinear_lmpc.py:19-197); the
differences are purely in execution strategy, mirroring ops/ilqr_soa.py:

1. Batch-trailing layout: the solve batch ``*S`` trails every tensor so XLA
   lays it on the TPU lane dimension (the AoS/vmap layout pads the tiny
   leading dims 4 -> 128 lanes and falls off a cliff past B ~ 4k).
2. Fully scalarized small algebra. The residual Jacobian is computed in
   CLOSED FORM instead of ``jax.jacfwd``: for the kinematic bicycle the
   state-Jacobian rows for (v, theta) are identity rows, so the sensitivity
   of position k to input j telescopes into prefix sums,

       d px_k / d a_j  = b00_j + sum_{i=j+1}^{k-1} cos(th_i) dt^2
       d px_k / d dl_j =         sum_{i=j+1}^{k-1} (-arc_i sin(th_i)) dt
       (and analogously for py; d v_k/d a_j = dt, d th_k/d dl_j = dt),

   i.e. every Jacobian entry is O(1) from four cumulative sums — no 4x4
   matrix propagation at all.
3. The LM normal equations are solved in the DUAL (residual) space:
   du = -J^T (J J^T + lam I_m)^{-1} r with m = 4 + (N-1) residuals, via an
   unrolled scalar Cholesky — algebraically identical to the primal
   (J^T J + lam I_{2N})^{-1} J^T r that ops/lm_shooting.py computes with LU,
   and smaller (m=9 vs 2N=12 at the reference horizon).
4. Input-bound projection (clip inside the residual) contributes the clip
   derivative as a per-column mask, reproducing autodiff-through-clip
   including JAX's 0.5 subgradient convention at exact boundary ties.
5. Multi-start (warm + zeros) is folded in as a leading structural axis of
   size ``num_starts``; the LM loop is one lockstep ``lax.while_loop`` with
   per-lane done masking (semantically identical to vmap-of-while).

Exactness: the iterates differ from ops/lm_shooting.py only by floating-point
reassociation of the linear solve; in f64 the two agree on every feasibility
decision with matching solutions to ~1e-9 (tests/test_lm_shooting_soa.py).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ilqr_iterative_tasks_tpu.models.obstacle import Obstacle
from ilqr_iterative_tasks_tpu.ops.ilqr_soa import step_soa
from ilqr_iterative_tasks_tpu.utils.params import SystemLimits


class LmSoaSolution(NamedTuple):
    us: jnp.ndarray  # (N, 2, *S)
    xs: jnp.ndarray  # (N+1, 4, *S)
    term_err: jnp.ndarray  # (*S)
    max_violation: jnp.ndarray  # (*S)
    feasible: jnp.ndarray  # (*S) bool
    n_iters: jnp.ndarray  # (*S) summed over starts


def _clip_grad(z, m):
    """d/dz clip(z, -m, m) with JAX's 0.5 tie convention at |z| == m."""
    inside = (jnp.abs(z) < m).astype(z.dtype)
    tie = (jnp.abs(z) == m).astype(z.dtype)
    return inside + 0.5 * tie


def _relu_grad(z):
    """d/dz max(z, 0) with JAX's 0.5 tie convention at z == 0."""
    pos = (z > 0).astype(z.dtype)
    tie = (z == 0).astype(z.dtype)
    return pos + 0.5 * tie


@partial(jax.jit, static_argnames=("num_horizon", "max_iters", "num_starts"))
def lm_feasibility_solve_soa(limits: SystemLimits, obstacle: Obstacle,
                             x0, x_terminal, u_init, dt, *, num_horizon: int,
                             max_iters: int = 80, num_starts: int = 2,
                             w_obs: float = 10.0, g_margin: float = 1e-3,
                             term_tol: float = 1e-4,
                             viol_tol: float = 1e-4,
                             m_lanes=None) -> LmSoaSolution:
    """Batched candidate-feasibility solve, batch-trailing layout.

    x0: (4, *S) or (4,); x_terminal: (4, *S); u_init: (N, 2, *S). Obstacle
    leaves must be scalars or trailing-broadcastable against ``*S``. Per-lane
    semantics identical to ops.lm_shooting.lm_feasibility_solve.

    ``m_lanes``: optional per-lane EFFECTIVE horizon ((*S,) i32, values in
    [2, num_horizon]) for the shrinking-horizon branch of the LMPC warm-start
    bookkeeping (reference base.py:640-654 re-solves with num_horizon-1 after
    selecting a lap's final point). The solve is traced at the full horizon;
    lanes with m < N get the horizon-m NLP by masking: terminal residual rows
    read x_m instead of x_N, obstacle rows k >= m and Jacobian columns
    j >= m are zeroed. Zeroed rows/columns decouple exactly in the damped
    normal equations (their Cholesky pivots become lam alone and contribute
    nothing to du), so per lane this IS the reduced horizon-m LM iteration —
    not an approximation. With ``m_lanes=None`` the original full-horizon
    code path is taken untouched.
    """
    if num_horizon < 2:
        raise ValueError("horizon-1 is a pure reach check handled by the "
                         "controller (nonlinear_lmpc.py:199-213)")
    n = num_horizon
    nvar = 2 * n
    m = 4 + (n - 1)
    dtype = x_terminal.dtype
    s_shape = x_terminal.shape[1:]
    dt = jnp.asarray(dt, dtype)
    sqrt_w = jnp.sqrt(jnp.asarray(w_obs, dtype))
    a_max = limits.a_max
    d_max = limits.delta_max  # raw bound (no rounding), nonlinear_lmpc.py:123
    if x0.ndim == 1:
        x0 = jnp.broadcast_to(x0.reshape((4,) + (1,) * len(s_shape)),
                              (4,) + s_shape)

    # fold the multi-start axis in as a leading structural dim
    s2 = (num_starts,) + s_shape
    x0c = tuple(jnp.broadcast_to(x0[i], s2) for i in range(4))
    xt = tuple(jnp.broadcast_to(x_terminal[i], s2) for i in range(4))
    mm = (None if m_lanes is None
          else jnp.broadcast_to(jnp.asarray(m_lanes, jnp.int32), s2))

    def _at_m(lst):
        """Per-lane lst[m] for m in [2, n] (lst indexed 0..n)."""
        v = lst[n]
        for kk in range(2, n):
            v = jnp.where(mm == kk, lst[kk], v)
        return v
    inv_w2 = 1.0 / obstacle.width ** 2
    inv_h2 = 1.0 / obstacle.height ** 2
    margin = jnp.asarray(g_margin, dtype)

    def clip_comp(uf, j):
        return (jnp.clip(uf[2 * j], -a_max, a_max),
                jnp.clip(uf[2 * j + 1], -d_max, d_max))

    def rollout_c(us):
        xs = [x0c]
        for i in range(n):
            xs.append(step_soa(xs[-1], us[i], dt))
        return xs

    def g_at(xs, k):
        cx, cy = obstacle.center_at(float(k))
        return 1.0 - ((xs[k][0] - cx) ** 2 * inv_w2
                      + (xs[k][1] - cy) ** 2 * inv_h2), cx, cy

    def residual(uf):
        """-> (f = |r|^2, r rows, xs); uf: (nvar, *S2)."""
        us = [clip_comp(uf, j) for j in range(n)]
        xs = rollout_c(us)
        if mm is None:
            rows = [xs[n][i] - xt[i] for i in range(4)]
        else:
            # terminal rows read the per-lane effective horizon state x_m
            rows = [_at_m([xs[kk][i] for kk in range(n + 1)]) - xt[i]
                    for i in range(4)]
        for k in range(1, n):
            g, _, _ = g_at(xs, k)
            r = sqrt_w * obstacle.present * jnp.maximum(g + margin, 0.0)
            if mm is not None:
                r = jnp.where(k < mm, r, 0.0)  # row absent below horizon m
            rows.append(r)
        f = rows[0] * rows[0]
        for r in rows[1:]:
            f = f + r * r
        return f, rows, xs

    zero_s2 = jnp.zeros(s2, dtype)

    def jacobian(uf, xs, rows):
        """Closed-form J (m x nvar) as a row-major list of lists.

        Entries are (*S2) arrays or the Python float 0.0 (structural zeros,
        skipped in downstream accumulations).
        """
        us = [clip_comp(uf, j) for j in range(n)]
        # per-step A-row coefficients evaluated at (x_i, u_i) — exact rollout
        # Jacobian (NOT the iLQR successor-state quirk)
        cos_t = [jnp.cos(xs[i][3]) for i in range(n)]
        sin_t = [jnp.sin(xs[i][3]) for i in range(n)]
        arc = [xs[i][2] * dt + 0.5 * us[i][0] * dt * dt for i in range(n)]
        # cumulative propagation sums: cum[k] = sum_{i=1}^{k-1} coeff_i
        cum0 = [zero_s2, zero_s2]  # d px / d a   (k = 0, 1)
        cum1 = [zero_s2, zero_s2]  # d px / d dl
        cum2 = [zero_s2, zero_s2]  # d py / d a
        cum3 = [zero_s2, zero_s2]  # d py / d dl
        for i in range(1, n):
            cum0.append(cum0[-1] + cos_t[i] * dt * dt)
            cum1.append(cum1[-1] + (-arc[i] * sin_t[i]) * dt)
            cum2.append(cum2[-1] + sin_t[i] * dt * dt)
            cum3.append(cum3[-1] + arc[i] * cos_t[i] * dt)
        b00 = [0.5 * dt * dt * cos_t[j] for j in range(n)]
        b10 = [0.5 * dt * dt * sin_t[j] for j in range(n)]
        mask_a = [_clip_grad(uf[2 * j], a_max) for j in range(n)]
        mask_d = [_clip_grad(uf[2 * j + 1], d_max) for j in range(n)]
        if mm is not None:
            # columns j >= m are not decision variables of the horizon-m NLP
            mask_a = [jnp.where(j < mm, mask_a[j], 0.0) for j in range(n)]
            mask_d = [jnp.where(j < mm, mask_d[j], 0.0) for j in range(n)]
            cum_m = [_at_m(c) for c in (cum0, cum1, cum2, cum3)]

        def sens(k, j):
            """d (px_k, py_k) / d (a_j, dl_j); valid for j < k."""
            sa0 = b00[j] + cum0[k] - cum0[j + 1]
            sd0 = cum1[k] - cum1[j + 1]
            sa1 = b10[j] + cum2[k] - cum2[j + 1]
            sd1 = cum3[k] - cum3[j + 1]
            return sa0, sd0, sa1, sd1

        def sens_m(j):
            """d (px_m, py_m) / d (a_j, dl_j) at the per-lane horizon m;
            garbage for j >= m, but those columns carry mask 0."""
            sa0 = b00[j] + cum_m[0] - cum0[j + 1]
            sd0 = cum_m[1] - cum1[j + 1]
            sa1 = b10[j] + cum_m[2] - cum2[j + 1]
            sd1 = cum_m[3] - cum3[j + 1]
            return sa0, sd0, sa1, sd1

        jac = []
        # terminal rows: d (x_N - xt) / d u  (x_m when m_lanes is given)
        row_px, row_py, row_v, row_th = [], [], [], []
        for j in range(n):
            sa0, sd0, sa1, sd1 = sens(n, j) if mm is None else sens_m(j)
            row_px += [sa0 * mask_a[j], sd0 * mask_d[j]]
            row_py += [sa1 * mask_a[j], sd1 * mask_d[j]]
            row_v += [dt * mask_a[j], 0.0]
            row_th += [0.0, dt * mask_d[j]]
        jac += [row_px, row_py, row_v, row_th]
        # obstacle rows: d (sqrt_w * present * max(g_k + margin, 0)) / d u
        for k in range(1, n):
            g, cx, cy = g_at(xs, k)
            gate = (sqrt_w * obstacle.present * _relu_grad(g + margin))
            if mm is not None:
                gate = jnp.where(k < mm, gate, 0.0)
            gx = gate * (-2.0 * inv_w2) * (xs[k][0] - cx)
            gy = gate * (-2.0 * inv_h2) * (xs[k][1] - cy)
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

    def _is_zero(e):
        return isinstance(e, float) and e == 0.0

    def _dot_rows(ra, rb):
        acc = None
        for ea, eb in zip(ra, rb):
            if _is_zero(ea) or _is_zero(eb):
                continue
            acc = ea * eb if acc is None else acc + ea * eb
        return zero_s2 if acc is None else acc

    def lm_step(uf, rows, xs, lam):
        """du = -J^T (J J^T + lam I)^{-1} r, unrolled scalar Cholesky."""
        jac = jacobian(uf, xs, rows)
        gram = [[None] * m for _ in range(m)]
        for r in range(m):
            for c in range(r + 1):
                gram[r][c] = _dot_rows(jac[r], jac[c])
        # Cholesky of gram + lam I (PD: lam > 0)
        low = [[None] * m for _ in range(m)]
        inv_diag = [None] * m
        for c in range(m):
            d = gram[c][c] + lam
            for t in range(c):
                d = d - low[c][t] * low[c][t]
            ld = jnp.sqrt(jnp.maximum(d, 1e-300 if dtype == jnp.float64
                                      else 1e-38))
            low[c][c] = ld
            inv_diag[c] = 1.0 / ld
            for r in range(c + 1, m):
                v = gram[r][c]
                for t in range(c):
                    v = v - low[r][t] * low[c][t]
                low[r][c] = v * inv_diag[c]
        # forward/backward substitution on r
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
        # du = -J^T z
        du = []
        for c in range(nvar):
            acc = None
            for r in range(m):
                e = jac[r][c]
                if _is_zero(e):
                    continue
                acc = e * z[r] if acc is None else acc + e * z[r]
            du.append(-(zero_s2 if acc is None else acc))
        return jnp.stack(du)

    alphas = (1.0, 0.5, 0.25, 0.1, 0.02)  # ops/lm_shooting.py:88

    def cond(c):
        uf, lam, it_g, it_lane, done = c
        return (it_g < max_iters) & jnp.any(~done)

    def body(c):
        uf, lam, it_g, it_lane, done = c
        f0, rows, xs = residual(uf)
        du = lm_step(uf, rows, xs, lam)
        # line search: first strictly-better candidate semantics of argmin
        best_f = None
        best_uf = None
        for a in alphas:
            cand = uf + jnp.asarray(a, dtype) * du
            fc, _, _ = residual(cand)
            if best_f is None:
                best_f, best_uf = fc, cand
            else:
                better = fc < best_f
                best_f = jnp.where(better, fc, best_f)
                best_uf = jnp.where(better[None], cand, best_uf)
        accept = best_f < f0
        upd = accept & ~done
        uf_next = jnp.where(upd[None], best_uf, uf)
        lam_next = jnp.where(done, lam,
                             jnp.where(accept,
                                       jnp.maximum(lam * 0.33, 1e-12),
                                       lam * 4.0))
        f_new = jnp.where(accept, best_f, f0)
        stop = (f_new < 1e-14) | ((~accept) & (lam_next > 1e10))
        done_next = done | stop
        it_lane = it_lane + (~done).astype(jnp.int32)
        return uf_next, lam_next, it_g + 1, it_lane, done_next

    # starts: clipped warm, zeros (ops/lm_shooting.py:120-123)
    warm = jnp.stack([
        jnp.clip(u_init[j // 2, j % 2], -a_max if j % 2 == 0 else -d_max,
                 a_max if j % 2 == 0 else d_max)
        for j in range(nvar)])  # (nvar, *S)
    start_list = [warm, jnp.zeros((nvar,) + s_shape, dtype)][:num_starts]
    uf0 = jnp.stack(start_list, axis=1)  # (nvar, num_starts, *S)
    uf0 = jnp.broadcast_to(uf0, (nvar,) + s2)

    lam0 = jnp.full(s2, 1e-3, dtype)
    it_lane0 = jnp.zeros(s2, jnp.int32)
    done0 = jnp.zeros(s2, bool)
    uf, _, _, it_lane, _ = jax.lax.while_loop(
        cond, body, (uf0, lam0, jnp.asarray(0), it_lane0, done0))

    f_fin, _, _ = residual(uf)
    best = jnp.argmin(f_fin, axis=0)  # (*S,) first-tie, as AoS argmin
    pick = lambda a: jnp.take_along_axis(a, best[None], axis=0)[0]
    uf_best = jnp.stack([pick(uf[c]) for c in range(nvar)])  # (nvar, *S)
    us = [(jnp.clip(uf_best[2 * j], -a_max, a_max),
           jnp.clip(uf_best[2 * j + 1], -d_max, d_max)) for j in range(n)]
    x0s = tuple(x0[i] for i in range(4))
    xs = [x0s]
    for i in range(n):
        xs.append(step_soa(xs[-1], us[i], dt))
    if m_lanes is None:
        x_at_m = [xs[n][i] for i in range(4)]
    else:
        mm_s = jnp.asarray(m_lanes, jnp.int32)
        x_at_m = []
        for i in range(4):
            v = xs[n][i]
            for kk in range(2, n):
                v = jnp.where(mm_s == kk, xs[kk][i], v)
            x_at_m.append(v)
    d2 = sum((x_at_m[i] - x_terminal[i]) ** 2 for i in range(4))
    term_err = jnp.sqrt(jnp.maximum(d2, 0.0))
    viol = None
    for k in range(1, n):
        cx, cy = obstacle.center_at(float(k))
        g = obstacle.present * (1.0 - ((xs[k][0] - cx) ** 2 * inv_w2
                                       + (xs[k][1] - cy) ** 2 * inv_h2))
        if m_lanes is not None:
            # constraint rows k >= m do not exist in the horizon-m NLP
            g = jnp.where(k < mm_s, g, -jnp.inf)
        viol = g if viol is None else jnp.maximum(viol, g)
    feasible = (term_err <= term_tol) & (viol <= viol_tol)
    return LmSoaSolution(
        us=jnp.stack([jnp.stack(u) for u in us]),
        xs=jnp.stack([jnp.stack(x) for x in xs]),
        term_err=term_err, max_violation=viol, feasible=feasible,
        n_iters=jnp.sum(it_lane, axis=0))
