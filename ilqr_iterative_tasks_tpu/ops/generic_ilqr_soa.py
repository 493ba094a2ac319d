"""Generic-system SoA (batch-trailing, scalarized) iLQR — the production
tier for arbitrary (state_dim, input_dim) systems.

ops/generic_ilqr.py opened the solver family to any dynamics via vmap +
jacfwd, but in the AoS/vmap layout this repo's own measurements put 30-60x
below the SoA path at scale (docs/PERF.md "Solver throughput ladder"): the
batch-leading layout pads the tiny state dims onto the 128 TPU lanes and
einsums on batch-trailing operands lower to transposes. This module applies
the layout lesson generically:

- the solve batch ``*S`` TRAILS every tensor (state components are a Python
  tuple of (*S) arrays — structure lives in Python, data rides the lanes);
- all small matrix algebra (Riccati recursion, gain solves) is scalarized
  into unrolled per-component expressions, exactly like ops/ilqr_soa.py but
  generated for parametric (n, m) by Python loops at trace time;
- per-step Jacobians come from ``jax.jvp`` with one-hot tangents — one
  column per state/input component, evaluated on the component tuples so
  every entry is an O(1) (*S) array (no (B, n, n) tensors anywhere);
- cost matrices are baked as NUMPY constants by the factory so structural
  zeros fold out of the trace (the reference's default Q = 0 makes most
  running-cost terms vanish).

Semantics mirror the reference LM loop (control/iterative_ilqr.py:7-85 via
ops/ilqr.py): clip inputs, rollout + quadratic cost about x_terminal,
backward Riccati with spectral clamp-and-shift Quu regularization
(closed-form for m <= 2, the reference's only regime; Cholesky-damped for
m > 2 — a documented generalization, the reference has no m > 2 system),
full-step clipped forward pass, accept/reject lambda ladder, |dcost/cost| <
eps convergence. Jacobians are evaluated at the pre-step state (standard
point; the bicycle path's successor-state quirk is reference-parity detail).

Validated against ops/generic_ilqr.py per system in
tests/test_generic_ilqr.py; benched against the bicycle SoA path at equal
dims in experiments/generic_bench.py (docs/PERF.md).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import numpy as np
import jax
import jax.numpy as jnp


class GenericSoaSolution(NamedTuple):
    us: jnp.ndarray  # (N, m, *S) optimized (clipped) inputs
    xs: jnp.ndarray  # (N+1, n, *S) rollout of ``us`` from x0
    cost: jnp.ndarray  # (*S,)
    n_iters: jnp.ndarray  # scalar lockstep trip count


def _quu_inv_1x1(q00, lamb):
    return (1.0 / (jnp.maximum(q00, 0.0) + lamb),)


def _quu_inv_2x2(q00, q01, q11, lamb):
    """Closed-form spectral f(Quu), f(e) = 1/(max(e,0)+lamb) — same
    clamp-and-shift as the reference eig regularization
    (iterative_ilqr.py:118-123); mirrors ops/ilqr_soa._quu_inv_comps."""
    mean = 0.5 * (q00 + q11)
    disc = jnp.sqrt(jnp.maximum(0.25 * (q00 - q11) ** 2 + q01 * q01, 0.0))
    e1 = mean + disc
    e2 = mean - disc
    f1 = 1.0 / (jnp.maximum(e1, 0.0) + lamb)
    f2 = 1.0 / (jnp.maximum(e2, 0.0) + lamb)
    safe = disc > 1e-12
    beta = jnp.where(safe, (f1 - f2) / jnp.where(safe, e1 - e2, 1.0), 0.0)
    alpha = f1 - beta * e1
    return (alpha + beta * q00, beta * q01, alpha + beta * q11)


class _GenericCore(NamedTuple):
    """Shape-polymorphic solver pieces shared by the XLA SoA wrapper below
    and the Pallas tile kernel (ops/pallas_generic_ilqr.py): every function
    operates on tuples of per-component arrays of ANY shape (the batch is
    whatever shape the components carry — (*S,) lanes for XLA, the
    (tile_rows, 128) tile for Pallas)."""
    clip_u: Callable
    step_t: Callable
    rollout: Callable
    cost_of: Callable
    backward: Callable
    forward: Callable
    flatten: Callable
    unflatten: Callable


def make_generic_core(step_comps: Callable, *, n: int, m: int,
                      matrix_Q, matrix_R, matrix_Qterminal,
                      u_lower, u_upper, dt,
                      num_horizon: int = 6) -> _GenericCore:
    """Build the shared scalarized solver core for a user system.

    ``step_comps(x_tuple, u_tuple, dt) -> x_tuple`` operates on tuples of
    per-component batch arrays (write it exactly like a scalar step; jnp
    broadcasting makes it batched). Cost matrices / bounds / dt are baked
    as Python/numpy constants (a config change builds a new solver).
    """
    q_np = 0.5 * (np.asarray(matrix_Q, np.float64)
                  + np.asarray(matrix_Q, np.float64).T)
    r_np = 0.5 * (np.asarray(matrix_R, np.float64)
                  + np.asarray(matrix_R, np.float64).T)
    qt_np = 0.5 * (np.asarray(matrix_Qterminal, np.float64)
                   + np.asarray(matrix_Qterminal, np.float64).T)
    u_lo = [float(v) for v in np.asarray(u_lower).reshape(m)]
    u_hi = [float(v) for v in np.asarray(u_upper).reshape(m)]
    dtf = float(dt)
    nh = num_horizon

    def quad(mat, d):
        acc = 0.0
        for i in range(mat.shape[0]):
            for j in range(mat.shape[0]):
                if mat[i, j] != 0.0:
                    acc = acc + float(mat[i, j]) * d[i] * d[j]
        return acc

    def lin_row(mat, row, d):
        acc = 0.0
        for j in range(mat.shape[0]):
            if mat[row, j] != 0.0:
                acc = acc + 2.0 * float(mat[row, j]) * d[j]
        return acc

    def clip_u(u):
        return tuple(jnp.clip(u[a], u_lo[a], u_hi[a]) for a in range(m))

    def step_t(x, u):
        out = step_comps(x, u, dtf)
        return tuple(out)

    def jacobians(x, u):
        """A[i][j] = d x'_i / d x_j, Bm[i][a] = d x'_i / d u_a via one-hot
        jvp columns on the component tuples — every entry an O(1) array."""
        def f(xu):
            return step_t(tuple(xu[:n]), tuple(xu[n:]))

        primals = tuple(x) + tuple(u)
        one = jnp.ones_like(x[0])
        zero = jnp.zeros_like(x[0])
        A = [[None] * n for _ in range(n)]
        Bm = [[None] * m for _ in range(n)]
        for j in range(n + m):
            tangent = tuple(one if jj == j else zero
                            for jj in range(n + m))
            _, col = jax.jvp(f, (primals,), (tangent,))
            for i in range(n):
                if j < n:
                    A[i][j] = col[i]
                else:
                    Bm[i][j - n] = col[i]
        return A, Bm

    def rollout(x0c, us):
        xs = [tuple(x0c)]
        for i in range(nh):
            xs.append(step_t(xs[-1], us[i]))
        return xs

    def cost_of(xs, us, xt):
        acc = 0.0
        for i in range(nh):
            d = tuple(xs[i][c] - xt[c] for c in range(n))
            acc = acc + quad(q_np, d) + quad(r_np, us[i])
        dterm = tuple(xs[nh][c] - xt[c] for c in range(n))
        acc = acc + quad(qt_np, dterm)
        return acc if not isinstance(acc, float) else jnp.asarray(acc)

    def quu_solve(quu, lamb, rhs_list):
        """[Quu_reg^{-1} r for r in rhs_list]; quu: dict[(a,b)] upper-tri.

        m <= 2: closed-form spectral clamp-and-shift (reference semantics).
        m > 2: scalar Cholesky of (Quu + lamb I) with clamped pivots — LM
        damping without the eigen clamp (documented generalization)."""
        if m == 1:
            (i00,) = _quu_inv_1x1(quu[(0, 0)], lamb)
            return [(i00 * r[0],) for r in rhs_list]
        if m == 2:
            i00, i01, i11 = _quu_inv_2x2(quu[(0, 0)], quu[(0, 1)],
                                         quu[(1, 1)], lamb)
            return [(i00 * r[0] + i01 * r[1], i01 * r[0] + i11 * r[1])
                    for r in rhs_list]
        low = {}
        inv_d = [None] * m
        for c in range(m):
            dv = quu[(c, c)] + lamb
            for t in range(c):
                dv = dv - low[(c, t)] * low[(c, t)]
            ld = jnp.sqrt(jnp.maximum(dv, 1e-30))
            low[(c, c)] = ld
            inv_d[c] = 1.0 / ld
            for r in range(c + 1, m):
                v = quu[(c, r)]
                for t in range(c):
                    v = v - low[(r, t)] * low[(c, t)]
                low[(r, c)] = v * inv_d[c]
        outs = []
        for rhs in rhs_list:
            y = [None] * m
            for r in range(m):
                v = rhs[r]
                for t in range(r):
                    v = v - low[(r, t)] * y[t]
                y[r] = v * inv_d[r]
            z = [None] * m
            for r in range(m - 1, -1, -1):
                v = y[r]
                for t in range(r + 1, m):
                    v = v - low[(t, r)] * z[t]
                z[r] = v * inv_d[r]
            outs.append(tuple(z))
        return outs

    def backward(xs, us, lamb, xt):
        dterm = tuple(xs[nh][c] - xt[c] for c in range(n))
        v_x = [lin_row(qt_np, i, dterm) for i in range(n)]
        v_xx = {(i, j): 2.0 * float(qt_np[i, j])
                for i in range(n) for j in range(i, n)}

        def vxx(i, j):
            e = v_xx[(min(i, j), max(i, j))]
            return e

        ks = [None] * nh
        Ks = [None] * nh
        for i in range(nh - 1, -1, -1):
            A, Bm = jacobians(xs[i], us[i])
            dx = tuple(xs[i][c] - xt[c] for c in range(n))
            l_x = [lin_row(q_np, c, dx) for c in range(n)]
            l_u = [lin_row(r_np, a, us[i]) for a in range(m)]
            # q_x = l_x + A' v_x ; q_u = l_u + B' v_x
            q_x = [l_x[j] + sum_nonzero([A[i2][j] * v_x[i2]
                                         for i2 in range(n)])
                   for j in range(n)]
            q_u = [l_u[a] + sum_nonzero([Bm[i2][a] * v_x[i2]
                                         for i2 in range(n)])
                   for a in range(m)]
            # W = V_xx A  (n x n), then q_xx = l_xx + A' W
            W = [[sum_nonzero([vxx(i2, k2) * A[k2][j] for k2 in range(n)])
                  for j in range(n)] for i2 in range(n)]
            q_xx = {}
            for i2 in range(n):
                for j2 in range(i2, n):
                    q_xx[(i2, j2)] = (2.0 * float(q_np[i2, j2])
                                      + sum_nonzero([A[k2][i2] * W[k2][j2]
                                                     for k2 in range(n)]))
            # Wu = V_xx B (n x m); q_uu = l_uu + B' Wu ; q_ux = B' W
            Wu = [[sum_nonzero([vxx(i2, k2) * Bm[k2][a] for k2 in range(n)])
                   for a in range(m)] for i2 in range(n)]
            q_uu = {}
            for a in range(m):
                for bq in range(a, m):
                    q_uu[(a, bq)] = (2.0 * float(r_np[a, bq])
                                     + sum_nonzero([Bm[k2][a] * Wu[k2][bq]
                                                    for k2 in range(n)]))
            q_ux = [[sum_nonzero([Bm[k2][a] * W[k2][j] for k2 in range(n)])
                     for j in range(n)] for a in range(m)]
            # gains
            sols = quu_solve(q_uu, lamb,
                            [tuple(q_u)]
                            + [tuple(q_ux[a][j] for a in range(m))
                               for j in range(n)])
            k_t = tuple(-sols[0][a] for a in range(m))
            K_t = [[-sols[1 + j][a] for j in range(n)] for a in range(m)]
            # value update: V_x = q_x - K' Quu k ; V_xx = q_xx - K' Quu K
            qk = [sum_nonzero([_quu(q_uu, a, bq) * k_t[bq]
                               for bq in range(m)]) for a in range(m)]
            qK = [[sum_nonzero([_quu(q_uu, a, bq) * K_t[bq][j]
                                for bq in range(m)]) for j in range(n)]
                  for a in range(m)]
            v_x = [q_x[j] - sum_nonzero([K_t[a][j] * qk[a]
                                         for a in range(m)])
                   for j in range(n)]
            v_xx = {}
            for i2 in range(n):
                for j2 in range(i2, n):
                    v_xx[(i2, j2)] = (q_xx[(i2, j2)]
                                      - sum_nonzero([K_t[a][i2] * qK[a][j2]
                                                     for a in range(m)]))
            ks[i] = k_t
            Ks[i] = K_t
        return ks, Ks

    def _quu(q_uu, a, b):
        return q_uu[(min(a, b), max(a, b))]

    def sum_nonzero(terms):
        acc = None
        for t in terms:
            if isinstance(t, float) and t == 0.0:
                continue
            acc = t if acc is None else acc + t
        return 0.0 if acc is None else acc

    def forward(xs, us, ks, Ks, xt):
        x_new = xs[0]
        us_new = []
        acc = 0.0
        for i in range(nh):
            dx = tuple(x_new[c] - xs[i][c] for c in range(n))
            u = tuple(
                us[i][a] + ks[i][a]
                + sum_nonzero([Ks[i][a][j] * dx[j] for j in range(n)])
                for a in range(m))
            u = clip_u(u)
            dxt = tuple(x_new[c] - xt[c] for c in range(n))
            acc = acc + quad(q_np, dxt) + quad(r_np, u)
            x_new = step_t(x_new, u)
            us_new.append(u)
        dterm = tuple(x_new[c] - xt[c] for c in range(n))
        acc = acc + quad(qt_np, dterm)
        return us_new, acc

    def flatten(us):
        out = []
        for u in us:
            out.extend(u)
        return tuple(out)

    def unflatten(flat):
        return [tuple(flat[i * m + a] for a in range(m))
                for i in range(nh)]

    return _GenericCore(clip_u=clip_u, step_t=step_t, rollout=rollout,
                        cost_of=cost_of, backward=backward, forward=forward,
                        flatten=flatten, unflatten=unflatten)


def build_generic_ilqr_soa(step_comps: Callable, *, n: int, m: int,
                           matrix_Q, matrix_R, matrix_Qterminal,
                           u_lower, u_upper, dt,
                           eps: float = 1e-2, lamb_factor: float = 10.0,
                           max_lamb: float = 1000.0, max_iter: int = 150,
                           num_horizon: int = 6):
    """Factory: returns a jitted
    ``solve(x0 (n,*S), x_terminal (n,*S), u_init (N,m,*S), lamb0)``
    -> GenericSoaSolution for the user system (core math shared with the
    Pallas tile kernel via ``make_generic_core``)."""
    core = make_generic_core(step_comps, n=n, m=m, matrix_Q=matrix_Q,
                             matrix_R=matrix_R,
                             matrix_Qterminal=matrix_Qterminal,
                             u_lower=u_lower, u_upper=u_upper, dt=dt,
                             num_horizon=num_horizon)
    clip_u, rollout, cost_of = core.clip_u, core.rollout, core.cost_of
    backward, forward = core.backward, core.forward
    flatten, unflatten = core.flatten, core.unflatten
    nh = num_horizon

    def solve(x0, x_terminal, u_init, lamb0):
        dtype = x_terminal.dtype
        s_shape = x_terminal.shape[1:]
        x0c = tuple(jnp.broadcast_to(x0[c], s_shape) for c in range(n))
        xt = tuple(x_terminal[c] for c in range(n))
        ui = [clip_u(tuple(u_init[i, a] for a in range(m)))
              for i in range(nh)]
        zero = jnp.zeros(s_shape, dtype)

        def cond(carry):
            it, done = carry[0], carry[1]
            return (it < max_iter) & jnp.any(done < 0.5)

        def body(carry):
            it, done_f, lamb = carry[0], carry[1], carry[2]
            done = done_f > 0.5
            us = [clip_u(u) for u in unflatten(carry[3:])]
            xs = rollout(x0c, us)
            cost = cost_of(xs, us, xt)
            ks, Ks = backward(xs, us, lamb, xt)
            us_new, cost_new = forward(xs, us, ks, Ks, xt)
            accept = cost_new < cost
            upd = accept & ~done
            us_next = tuple(jnp.where(upd, a, b)
                            for a, b in zip(flatten(us_new), flatten(us)))
            lamb_next = jnp.where(
                done, lamb, jnp.where(accept, lamb / lamb_factor,
                                      lamb * lamb_factor))
            converged = accept & (jnp.abs((cost_new - cost) / cost) < eps)
            diverged = (~accept) & (lamb_next > max_lamb)
            done_next = jnp.maximum(done_f,
                                    (converged | diverged).astype(dtype))
            return (it + 1, done_next, lamb_next) + us_next

        lam0 = jnp.full(s_shape, lamb0, dtype)
        init = ((jnp.asarray(0), jnp.zeros(s_shape, dtype) + zero, lam0)
                + flatten(ui))
        final = jax.lax.while_loop(cond, body, init)
        us = [clip_u(u) for u in unflatten(final[3:])]
        xs = rollout(x0c, us)
        cost = cost_of(xs, us, xt)
        return GenericSoaSolution(
            us=jnp.stack([jnp.stack(u) for u in us]),
            xs=jnp.stack([jnp.stack(x) for x in xs]),
            cost=cost, n_iters=final[0])

    return jax.jit(solve)
