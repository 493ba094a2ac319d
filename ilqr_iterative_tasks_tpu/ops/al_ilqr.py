"""Augmented-Lagrangian constrained iLQR — the TPU-native equivalent of the
reference's CasADi/IPOPT NLP solve.

Problem parity: /root/reference/iterative_ilqr/control/nonlinear_lmpc.py:6-214.
The reference builds, per safe-set candidate, an NLP:
  - multiple-shooting dynamics equalities            (:26-53)
  - obstacle ellipse keep-out for states x_1..x_{N-1} with slack in [1, 1e5]
    (i.e. ellipse value >= 1)                        (:54-84, :140-163)
  - HARD terminal equality x_N = x_term              (:92-95)
  - input box bounds                                 (:123,132,147,157)
  - minimum-time cost  sum_i 1  (constant!)          (:97-99)
and declares the solve feasible iff IPOPT succeeds and
||x_N - x_term||_2 <= 1e-4 (:186-196); candidate cost = N + Qfun(x_term), else
Inf (:197).  The cost being constant makes this a pure *feasibility* problem.

TPU-native redesign: instead of porting an interior-point method, we solve the
same feasibility problem with an augmented-Lagrangian outer loop around the
shared single-shooting iLQR core (ops/ilqr.py machinery):
  - terminal equality  ->  lam^T d + (mu/2)||d||^2,  d = x_N - x_term
  - ellipse keep-out   ->  AL inequality terms (mu_g/2) max(0, g + lam_g/mu_g)^2
                           with g_i = 1 - ((x-cx_i)^2/w^2 + (y-cy_i)^2/h^2),
                           applied to x_1..x_{N-1} with the same moving-obstacle
                           extrapolation as the reference (:58-84)
  - input bounds       ->  hard clipping inside the forward pass (projection),
                           identical to the reference iLQR's treatment
  - tiny control regularization (default 1e-6) for Quu conditioning; its effect
    is orders of magnitude below the 1e-4 feasibility tolerance.
Everything runs in ONE jitted lax.while_loop (outer AL) around the inner LM
iLQR while_loop — no host round-trips, vmappable across candidates.

Solver selection guidance: for reference-scale horizons (N <= ~16) prefer
ops/lm_shooting.py — measured markedly more robust on warm- and cold-started
candidate feasibility problems. This module is the O(N) Riccati-structured
path for long horizons. The exact 2x2 boxQP (control-limited DDP building
block) lives here as `_boxqp_2x2`/`_free_gains`; empirically the smooth
clip-projected gains converge better inside the AL loop on this problem, so
the AL backward uses those, and boxQP remains available for future
long-horizon constrained variants.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ilqr_iterative_tasks_tpu.models import kinetic_bicycle as dyn
from ilqr_iterative_tasks_tpu.models.obstacle import Obstacle
from ilqr_iterative_tasks_tpu.ops.ilqr import _reg_inv_2x2, rollout
from ilqr_iterative_tasks_tpu.utils.params import SystemLimits


def _reg_pd_2x2(quu: jnp.ndarray, lamb) -> jnp.ndarray:
    """Spectral clamp-and-shift: eigenvalues e -> max(e, 0) + lamb, keeping
    eigenvectors (same closed form as ops.ilqr._reg_inv_2x2 but returning the
    regularized matrix itself, which boxQP needs)."""
    a = quu[..., 0, 0]
    b = 0.5 * (quu[..., 0, 1] + quu[..., 1, 0])
    c = quu[..., 1, 1]
    mean = 0.5 * (a + c)
    disc = jnp.sqrt(jnp.maximum(0.25 * (a - c) ** 2 + b * b, 0.0))
    e1, e2 = mean + disc, mean - disc
    f1 = jnp.maximum(e1, 0.0) + lamb
    f2 = jnp.maximum(e2, 0.0) + lamb
    tiny = jnp.asarray(1e-12, dtype=quu.dtype)
    safe = disc > tiny
    beta = jnp.where(safe, (f1 - f2) / jnp.where(safe, e1 - e2, 1.0), 1.0)
    alpha = f1 - beta * e1
    eye = jnp.eye(2, dtype=quu.dtype)
    sym = quu.at[..., 0, 1].set(b).at[..., 1, 0].set(b)
    return alpha[..., None, None] * eye + beta[..., None, None] * sym


def _boxqp_2x2(quu: jnp.ndarray, qu: jnp.ndarray, lo: jnp.ndarray,
               hi: jnp.ndarray):
    """Exact box-constrained 2x2 QP:  min 0.5 du'Quu du + qu'du,
    lo <= du <= hi, Quu PD — by closed-form active-set enumeration
    (control-limited DDP, Tassa et al. 2014, specialized to U_DIM = 2).

    The minimizer is either interior, on one of the 4 faces (with the 1-D
    face minimizer), or at one of the 4 corners; all 9 candidates are
    evaluated and the feasible one with least objective wins. Returns
    (du (2,), free (2,) bool mask of unclamped dims).
    """
    a = quu[0, 0]
    b = 0.5 * (quu[0, 1] + quu[1, 0])
    c = quu[1, 1]
    det = a * c - b * b
    du_ff = jnp.stack([(-qu[0] * c + qu[1] * b) / det,
                       (qu[0] * b - qu[1] * a) / det])
    f10 = lambda d1: -(qu[0] + b * d1) / a  # dim0 free given dim1 clamped
    f01 = lambda d0: -(qu[1] + b * d0) / c  # dim1 free given dim0 clamped
    cand = jnp.stack([
        du_ff,
        jnp.stack([lo[0], f01(lo[0])]), jnp.stack([hi[0], f01(hi[0])]),
        jnp.stack([f10(lo[1]), lo[1]]), jnp.stack([f10(hi[1]), hi[1]]),
        jnp.stack([lo[0], lo[1]]), jnp.stack([lo[0], hi[1]]),
        jnp.stack([hi[0], lo[1]]), jnp.stack([hi[0], hi[1]]),
    ])  # (9, 2)
    free = jnp.asarray([[1, 1], [0, 1], [0, 1], [1, 0], [1, 0],
                        [0, 0], [0, 0], [0, 0], [0, 0]], dtype=bool)
    tol = 1e-9
    feas = jnp.all((cand >= lo - tol) & (cand <= hi + tol), axis=1)
    obj = 0.5 * jnp.einsum("ki,ij,kj->k", cand, quu, cand) + cand @ qu
    obj = jnp.where(feas, obj, jnp.inf)
    best = jnp.argmin(obj)
    return cand[best], free[best]


def _free_gains(quu: jnp.ndarray, qux: jnp.ndarray, free: jnp.ndarray):
    """Feedback gains restricted to the free (unclamped) input dims:
    K_free = -inv(Quu_ff) @ Qux_f, zero rows for clamped dims."""
    a = quu[0, 0]
    b = 0.5 * (quu[0, 1] + quu[1, 0])
    c = quu[1, 1]
    det = a * c - b * b
    inv_both = jnp.array([[c, -b], [-b, a]]) / det
    inv_0 = jnp.array([[1.0, 0.0], [0.0, 0.0]]) / a
    inv_1 = jnp.array([[0.0, 0.0], [0.0, 1.0]]) / c
    f0 = free[0].astype(quu.dtype)
    f1 = free[1].astype(quu.dtype)
    both = f0 * f1
    inv_eff = (both * inv_both + f0 * (1 - f1) * inv_0
               + (1 - f0) * f1 * inv_1)
    return -inv_eff @ qux


class AlIlqrSolution(NamedTuple):
    us: jnp.ndarray          # (N, 2)
    xs: jnp.ndarray          # (N+1, 4)
    term_err: jnp.ndarray    # ||x_N - x_term||_2
    max_violation: jnp.ndarray  # max obstacle constraint violation (<=0 ok)
    feasible: jnp.ndarray    # bool: reference's 1e-4 terminal test + keep-out
    n_outer: jnp.ndarray


def _obstacle_g(xs_mid, obstacle: Obstacle):
    """g_i = 1 - ellipse value at states x_1..x_{N-1}; present-masked.

    xs_mid: (N-1, 4) states at steps 1..N-1; extrapolation offsets are the
    step indices i (nonlinear_lmpc.py:58-84 uses obstacle.y + spd*i).
    """
    n_mid = xs_mid.shape[0]
    offs = jnp.arange(1, n_mid + 1, dtype=xs_mid.dtype)
    cx, cy = obstacle.center_at(offs)
    val = ((xs_mid[:, 0] - cx) ** 2 / obstacle.width ** 2
           + (xs_mid[:, 1] - cy) ** 2 / obstacle.height ** 2)
    return obstacle.present * (1.0 - val)


def _al_terms(xs, x_terminal, lam_eq, mu_eq, lam_g, mu_g, obstacle):
    """AL objective pieces given a rollout. Returns (scalar objective,)"""
    d = xs[-1] - x_terminal
    term = lam_eq @ d + 0.5 * mu_eq * (d @ d)
    g = _obstacle_g(xs[1:-1], obstacle)
    act = jnp.maximum(g + lam_g / mu_g, 0.0)
    ineq = 0.5 * mu_g * jnp.sum(act * act)
    return term + ineq


@partial(jax.jit, static_argnames=("num_horizon", "max_outer", "max_inner"))
def al_ilqr_solve(limits: SystemLimits, obstacle: Obstacle, x0: jnp.ndarray,
                  x_terminal: jnp.ndarray, u_init: jnp.ndarray, dt,
                  *, num_horizon: int, max_outer: int = 25,
                  max_inner: int = 60, u_reg: float = 1e-6,
                  term_tol: float = 1e-4, viol_tol: float = 1e-6,
                  mu0: float = 10.0, mu_factor: float = 8.0,
                  mu_max: float = 1e8) -> AlIlqrSolution:
    """Solve the reference NLP (nonlinear_lmpc.py:19-197) via AL-iLQR."""
    if num_horizon < 2:
        raise ValueError("al_ilqr_solve requires num_horizon >= 2; the "
                         "horizon-1 case is a pure reach check handled by the "
                         "controller (nonlinear_lmpc.py:199-213).")
    n = num_horizon
    dtype = x0.dtype
    dt = jnp.asarray(dt, dtype)
    n_mid = max(n - 1, 1)  # obstacle-constrained interior states

    def clip_u(us):
        # raw delta_max bound, per nonlinear_lmpc.py:123,147 (no rounding)
        a = jnp.clip(us[..., 0], -limits.a_max, limits.a_max)
        d = jnp.clip(us[..., 1], -limits.delta_max, limits.delta_max)
        return jnp.stack([a, d], axis=-1)

    def al_objective(us, lam_eq, mu_eq, lam_g, mu_g):
        xs = rollout(x0, us, dt)
        obj = _al_terms(xs, x_terminal, lam_eq, mu_eq, lam_g, mu_g, obstacle)
        return obj + u_reg * jnp.sum(us * us), xs

    def backward(xs, us, lam_eq, mu_eq, lam_g, mu_g, lamb):
        # Jacobians at the successor states, consistent with the shared core.
        f_x = dyn.jacobian_A(xs[1:, 2], xs[1:, 3], us[:, 0], dt)
        f_u = dyn.jacobian_B(xs[1:, 3], dt)
        # Stage cost derivatives: AL obstacle terms on x_1..x_{N-1}. We index
        # stages by the state they start from (x_0..x_{N-1}); the obstacle
        # term for x_i (i>=1) is charged to stage i.
        offs = jnp.arange(n, dtype=dtype)  # state indices 0..N-1
        cx, cy = obstacle.center_at(offs)
        dz = xs[:-1, 0] - cx
        dy_ = xs[:-1, 1] - cy
        inv_w2 = 1.0 / obstacle.width ** 2
        inv_h2 = 1.0 / obstacle.height ** 2
        g = obstacle.present * (1.0 - (dz * dz * inv_w2 + dy_ * dy_ * inv_h2))
        lam_full = jnp.concatenate([jnp.zeros((1,), dtype), lam_g])  # stage 0 off
        mask = jnp.concatenate(
            [jnp.zeros((1,), dtype), jnp.ones((n - 1,), dtype)]) * obstacle.present
        act = jnp.maximum(g + lam_full / mu_g, 0.0) * mask
        g_x = jnp.stack([-2.0 * inv_w2 * dz, -2.0 * inv_h2 * dy_,
                         jnp.zeros_like(dz), jnp.zeros_like(dz)], axis=-1)
        l_x = (mu_g * act)[:, None] * g_x
        l_xx = (mu_g * (act > 0))[:, None, None] * (
            g_x[:, :, None] * g_x[:, None, :])  # Gauss-Newton
        l_u = 2.0 * u_reg * us
        l_uu = jnp.broadcast_to(2.0 * u_reg * jnp.eye(2, dtype=dtype), (n, 2, 2))
        # terminal AL equality
        d = xs[-1] - x_terminal
        v_x = lam_eq + mu_eq * d
        v_xx = mu_eq * jnp.eye(4, dtype=dtype)

        def body(carry, inp):
            v_x, v_xx = carry
            fx, fu, lu, luu, lx, lxx = inp
            q_x = lx + fx.T @ v_x
            q_u = lu + fu.T @ v_x
            q_xx = lxx + fx.T @ v_xx @ fx
            q_uu = luu + fu.T @ v_xx @ fu
            q_ux = fu.T @ v_xx @ fx
            quu_inv = _reg_inv_2x2(q_uu, lamb)
            k_t = -quu_inv @ q_u
            big_k = -quu_inv @ q_ux
            v_x_n = q_x - big_k.T @ q_uu @ k_t
            v_xx_n = q_xx - big_k.T @ q_uu @ big_k
            return (v_x_n, v_xx_n), (k_t, big_k)

        (_, _), (ks, big_ks) = jax.lax.scan(
            body, (v_x, v_xx), (f_x, f_u, l_u, l_uu, l_x, l_xx),
            reverse=True)
        return ks, big_ks

    def forward(xs, us, ks, big_ks, alpha):
        """Line-searched closed-loop rollout: u + alpha*k + K(x_new - x)."""

        def body(x_new, inp):
            x_old, u_old, k_t, big_k = inp
            u_new = clip_u(u_old + alpha * k_t + big_k @ (x_new - x_old))
            return dyn.step(x_new, u_new, dt), u_new

        _, us_new = jax.lax.scan(body, xs[0], (xs[:-1], us, ks, big_ks))
        return us_new

    # Candidate step sizes, evaluated as one batched rollout (vmap over alpha)
    # — a TPU-friendly backtracking line search the reference solver lacks.
    alphas = jnp.asarray([1.0, 0.5, 0.25, 0.0625, 0.015625], dtype)

    def inner_solve(us, lam_eq, mu_eq, lam_g, mu_g):
        """LM-regularized iLQR on the AL objective."""

        def cond(c):
            _, _, it, done = c
            return (it < max_inner) & ~done

        def body(c):
            us, lamb, it, _ = c
            obj, xs = al_objective(us, lam_eq, mu_eq, lam_g, mu_g)
            ks, big_ks = backward(xs, us, lam_eq, mu_eq, lam_g, mu_g, lamb)
            us_cands = jax.vmap(lambda a: forward(xs, us, ks, big_ks, a))(alphas)
            objs = jax.vmap(
                lambda u: al_objective(u, lam_eq, mu_eq, lam_g, mu_g)[0]
            )(us_cands)
            best = jnp.argmin(objs)
            us_new = us_cands[best]
            obj_new = objs[best]
            accept = obj_new < obj
            us_next = jnp.where(accept, us_new, us)
            lamb_next = jnp.where(accept, lamb * 0.5, lamb * 4.0)
            rel = jnp.abs(obj_new - obj) / jnp.maximum(jnp.abs(obj), 1e-12)
            done = (accept & (rel < 1e-9)) | ((~accept) & (lamb_next > 1e8))
            return us_next, lamb_next, it + 1, done

        us_out, _, _, _ = jax.lax.while_loop(
            cond, body, (us, jnp.asarray(1.0, dtype), jnp.asarray(0),
                         jnp.asarray(False)))
        return us_out

    def metrics(us):
        xs = rollout(x0, us, dt)
        d = xs[-1] - x_terminal
        term_err = jnp.sqrt(jnp.maximum(d @ d, 0.0))
        g = _obstacle_g(xs[1:-1], obstacle) if n > 1 else jnp.zeros((1,), dtype)
        return xs, term_err, jnp.max(g)

    def constraint_norm(us):
        xs = rollout(x0, us, dt)
        d = xs[-1] - x_terminal
        g = _obstacle_g(xs[1:-1], obstacle)
        return jnp.sqrt(d @ d + jnp.sum(jnp.maximum(g, 0.0) ** 2))

    def outer_cond(c):
        us, lam_eq, mu_eq, lam_g, mu_g, prev_norm, k = c
        _, term_err, viol = metrics(us)
        solved = (term_err <= 0.5 * term_tol) & (viol <= viol_tol)
        return (k < max_outer) & ~solved

    def outer_body(c):
        us, lam_eq, mu_eq, lam_g, mu_g, prev_norm, k = c
        us = inner_solve(us, lam_eq, mu_eq, lam_g, mu_g)
        xs = rollout(x0, us, dt)
        d = xs[-1] - x_terminal
        g = _obstacle_g(xs[1:-1], obstacle)
        lam_eq = lam_eq + mu_eq * d
        lam_g = jnp.maximum(lam_g + mu_g * g, 0.0)
        # Standard AL schedule: grow the penalty only when the constraint norm
        # did not shrink enough; pure multiplier steps otherwise.
        norm = constraint_norm(us)
        grow = norm > 0.25 * prev_norm
        factor = jnp.where(grow, mu_factor, 1.0)
        mu_eq = jnp.minimum(mu_eq * factor, mu_max)
        mu_g = jnp.minimum(mu_g * factor, mu_max)
        return us, lam_eq, mu_eq, lam_g, mu_g, norm, k + 1

    us0 = clip_u(u_init)
    init = (us0, jnp.zeros((4,), dtype), jnp.asarray(mu0, dtype),
            jnp.zeros((n_mid,), dtype), jnp.asarray(mu0, dtype),
            jnp.asarray(jnp.inf, dtype), jnp.asarray(0))
    us, _, _, _, _, _, n_outer = jax.lax.while_loop(outer_cond, outer_body, init)
    xs, term_err, viol = metrics(us)
    feasible = (term_err <= term_tol) & (viol <= 1e-4)
    return AlIlqrSolution(us=us, xs=xs, term_err=term_err,
                          max_violation=viol, feasible=feasible,
                          n_outer=n_outer)


@partial(jax.jit, static_argnames=("num_horizon", "max_outer", "max_inner"))
def al_ilqr_solve_candidates(limits: SystemLimits, obstacle: Obstacle,
                             x0: jnp.ndarray, x_terminals: jnp.ndarray,
                             u_inits: jnp.ndarray, dt, *, num_horizon: int,
                             max_outer: int = 25,
                             max_inner: int = 60) -> AlIlqrSolution:
    """vmap over candidate terminal states (+ per-candidate warm starts).

    Replaces the reference's per-candidate NLP rebuild + IPOPT re-JIT
    (base.py:580-595 -> nonlinear_lmpc.py:20-116), which dominates its cost.
    """
    solve = lambda xt, ui: al_ilqr_solve(
        limits, obstacle, x0, xt, ui, dt, num_horizon=num_horizon,
        max_outer=max_outer, max_inner=max_inner)
    return jax.vmap(solve)(x_terminals, u_inits)
