"""Projected Levenberg-Marquardt shooting solver for the NLMPC feasibility
problem — primary candidate solver for short horizons.

Solves the same NLP as ops/al_ilqr.py (parity mapping documented there, from
/root/reference/iterative_ilqr/control/nonlinear_lmpc.py:19-197): find
bounded inputs whose rollout hits x_terminal exactly (<= 1e-4) while keeping
states x_1..x_{N-1} outside the obstacle ellipse.

Why LM shooting: the min-time cost is constant, so this is a pure zero-residual
nonlinear least-squares problem
    r(u) = [ x_N(u) - x_term ;  sqrt(w) * max(0, g(u) + margin) ]
with only N*U_DIM (= 12 at N=6) decision variables. Gauss-Newton/LM on the
flat problem has quadratic local convergence at zero residual and, unlike
penalty-AL Riccati, no multiplier scheduling to stall (validated: it solves
warm-started candidates the AL formulation plateaus on). Input bounds are
handled by projection (clip inside the residual: autodiff then freezes
clamped dims automatically). Multi-start (warm + zeros) escapes wrong-side-of-
obstacle local minima; everything is one jitted while_loop, vmappable over
candidates.

Complexity: O((N*U)^3) per iteration for the normal-equation solve — ideal at
reference horizons (N <= 6); use ops/al_ilqr.py for long horizons where the
O(N) Riccati structure wins.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ilqr_iterative_tasks_tpu.models.obstacle import Obstacle
from ilqr_iterative_tasks_tpu.ops.ilqr import rollout
from ilqr_iterative_tasks_tpu.utils.params import SystemLimits


class LmSolution(NamedTuple):
    us: jnp.ndarray
    xs: jnp.ndarray
    term_err: jnp.ndarray
    max_violation: jnp.ndarray
    feasible: jnp.ndarray
    n_iters: jnp.ndarray


@partial(jax.jit, static_argnames=("num_horizon", "max_iters", "num_starts"))
def lm_feasibility_solve(limits: SystemLimits, obstacle: Obstacle,
                         x0: jnp.ndarray, x_terminal: jnp.ndarray,
                         u_init: jnp.ndarray, dt, *, num_horizon: int,
                         max_iters: int = 80, num_starts: int = 2,
                         w_obs: float = 10.0, g_margin: float = 1e-3,
                         term_tol: float = 1e-4,
                         viol_tol: float = 1e-4) -> LmSolution:
    """Solve the candidate-feasibility NLP; feasibility test mirrors
    nonlinear_lmpc.py:186-196 (terminal 1e-4) plus obstacle keep-out."""
    if num_horizon < 2:
        raise ValueError("horizon-1 is a pure reach check handled by the "
                         "controller (nonlinear_lmpc.py:199-213)")
    n = num_horizon
    dtype = x0.dtype
    dt = jnp.asarray(dt, dtype)
    nvar = n * 2

    def clip_u(us):
        # raw bounds, per nonlinear_lmpc.py:123,147 (no delta rounding)
        a = jnp.clip(us[..., 0], -limits.a_max, limits.a_max)
        d = jnp.clip(us[..., 1], -limits.delta_max, limits.delta_max)
        return jnp.stack([a, d], axis=-1)

    def g_of(xs):
        mid = xs[1:n]
        offs = jnp.arange(1, n, dtype=dtype)
        cx, cy = obstacle.center_at(offs)
        return 1.0 - ((mid[:, 0] - cx) ** 2 / obstacle.width ** 2
                      + (mid[:, 1] - cy) ** 2 / obstacle.height ** 2)

    sqrt_w = jnp.sqrt(jnp.asarray(w_obs, dtype))

    def resid(uf):
        us = clip_u(uf.reshape(n, 2))
        xs = rollout(x0, us, dt)
        d = xs[-1] - x_terminal
        act = obstacle.present * jnp.maximum(g_of(xs) + g_margin, 0.0)
        return jnp.concatenate([d, sqrt_w * act])

    alphas = jnp.asarray([1.0, 0.5, 0.25, 0.1, 0.02], dtype)
    eye = jnp.eye(nvar, dtype=dtype)

    def solve_one(uf0):
        def cond(c):
            uf, lam, it, done = c
            return (it < max_iters) & ~done

        def body(c):
            uf, lam, it, done = c
            r = resid(uf)
            f0 = r @ r
            jac = jax.jacfwd(resid)(uf)
            h = jac.T @ jac + lam * eye
            du = -jnp.linalg.solve(h, jac.T @ r)
            cand = uf[None, :] + alphas[:, None] * du[None, :]
            fc = jax.vmap(lambda z: (lambda rr: rr @ rr)(resid(z)))(cand)
            best = jnp.argmin(fc)
            accept = fc[best] < f0
            uf_next = jnp.where(accept, cand[best], uf)
            lam_next = jnp.where(accept, jnp.maximum(lam * 0.33, 1e-12),
                                 lam * 4.0)
            f_new = jnp.where(accept, fc[best], f0)
            done = (f_new < 1e-14) | ((~accept) & (lam_next > 1e10))
            return uf_next, lam_next, it + 1, done

        uf, _, n_it, _ = jax.lax.while_loop(
            cond, body, (uf0, jnp.asarray(1e-3, dtype), jnp.asarray(0),
                         jnp.asarray(False)))
        r = resid(uf)
        return uf, r @ r, n_it

    starts = jnp.stack([
        clip_u(u_init).reshape(nvar),
        jnp.zeros((nvar,), dtype),
    ][:num_starts])
    ufs, fs, its = jax.vmap(solve_one)(starts)
    best = jnp.argmin(fs)
    us = clip_u(ufs[best].reshape(n, 2))
    xs = rollout(x0, us, dt)
    d = xs[-1] - x_terminal
    term_err = jnp.sqrt(jnp.maximum(d @ d, 0.0))
    viol = jnp.max(obstacle.present * g_of(xs))
    feasible = (term_err <= term_tol) & (viol <= viol_tol)
    return LmSolution(us=us, xs=xs, term_err=term_err, max_violation=viol,
                      feasible=feasible, n_iters=jnp.sum(its))


@partial(jax.jit, static_argnames=("num_horizon", "max_iters", "num_starts"))
def lm_feasibility_solve_candidates(limits: SystemLimits, obstacle: Obstacle,
                                    x0: jnp.ndarray, x_terminals: jnp.ndarray,
                                    u_inits: jnp.ndarray, dt, *,
                                    num_horizon: int, max_iters: int = 80,
                                    num_starts: int = 2) -> LmSolution:
    """vmap over candidate terminal states — replaces the reference's
    per-candidate NLP rebuild + IPOPT call (base.py:580-595)."""
    solve = lambda xt, ui: lm_feasibility_solve(
        limits, obstacle, x0, xt, ui, dt, num_horizon=num_horizon,
        max_iters=max_iters, num_starts=num_starts)
    return jax.vmap(solve)(x_terminals, u_inits)
