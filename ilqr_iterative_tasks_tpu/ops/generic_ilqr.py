"""Generic-system iLQR: the solver family opened up to arbitrary dynamics.

The reference framework is single-system — every solver path hard-codes the
4-state kinematic bicycle (`/root/reference/iterative_ilqr/systems/
kinetic_bicycle.py:10-52` is the only model, and `control/iterative_ilqr.py`
imports it directly). This module is a *beyond-the-reference* capability: the
same LM-regularized iLQR loop (accept/reject, lambda ladder, eps convergence —
`control/iterative_ilqr.py:7-85` semantics) for ANY user-supplied discrete
dynamics `step(x, u, dt) -> x_next` with arbitrary state/input dimensions.

TPU-native design notes:
- Jacobians come from `jax.jacfwd` of the user's step function, vectorized
  over the horizon with `vmap` — one fused linearization, no per-step Python.
- Quu regularization generalizes the parity solver's closed-form 2x2 spectral
  clamp (`ops/ilqr.py::_reg_inv_2x2`) to m x m via `jnp.linalg.eigh` (m is the
  input dim, tiny — XLA lowers small eigh to an on-device kernel).
- Everything is one jitted `lax.while_loop` around two `lax.scan`s, so solves
  vmap over candidate batches exactly like the bicycle path
  (`ops/ilqr.py::ilqr_solve_candidates`).

The parity-tested bicycle path (`ops/ilqr.py`, `ops/ilqr_soa.py`,
`ops/pallas_ilqr.py`) is untouched; this module is additive API surface.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


class GenericIlqrConfig(NamedTuple):
    """Quadratic-cost iLQR problem data for an arbitrary system.

    All arrays are traced (vmap/jit friendly); only shapes are static.
    """

    matrix_Q: jnp.ndarray  # (n, n) running state cost (about x_terminal)
    matrix_R: jnp.ndarray  # (m, m) running input cost
    matrix_Qterminal: jnp.ndarray  # (n, n) terminal cost
    u_lower: jnp.ndarray  # (m,) input box lower bounds
    u_upper: jnp.ndarray  # (m,) input box upper bounds
    eps: jnp.ndarray  # relative-cost convergence tolerance
    lamb_factor: jnp.ndarray  # LM ladder factor (reference: 10)
    max_lamb: jnp.ndarray  # LM divergence abort (reference: 1000)
    max_iter: int  # static: iteration cap (reference: 150)

    @classmethod
    def make(cls, matrix_Q, matrix_R, matrix_Qterminal, u_lower, u_upper,
             eps=1e-2, lamb_factor=10.0, max_lamb=1000.0, max_iter=150,
             dtype=jnp.float32):
        f = lambda v: jnp.asarray(v, dtype=dtype)
        return cls(f(matrix_Q), f(matrix_R), f(matrix_Qterminal), f(u_lower),
                   f(u_upper), f(eps), f(lamb_factor), f(max_lamb),
                   int(max_iter))


class GenericIlqrSolution(NamedTuple):
    us: jnp.ndarray  # (N, m) optimized (clipped) inputs
    xs: jnp.ndarray  # (N+1, n) rollout of ``us`` from x0
    lamb: jnp.ndarray  # final LM regularization
    n_iters: jnp.ndarray  # iterations executed
    cost: jnp.ndarray  # cost of the returned trajectory


def _reg_inv_sym(quu: jnp.ndarray, lamb) -> jnp.ndarray:
    """Spectral f(Quu), f(e) = 1/(max(e,0) + lamb), for symmetric m x m.

    Same clamp-and-shift semantics as the reference's eig regularization
    (`control/iterative_ilqr.py:118-123`), generalized beyond 2x2.
    """
    sym = 0.5 * (quu + jnp.swapaxes(quu, -1, -2))
    evals, evecs = jnp.linalg.eigh(sym)
    f = 1.0 / (jnp.maximum(evals, 0.0) + lamb)
    return (evecs * f[..., None, :]) @ jnp.swapaxes(evecs, -1, -2)


@partial(jax.jit, static_argnames=("step_fn", "backward"))
def generic_ilqr_solve(step_fn: Callable, cfg: GenericIlqrConfig,
                       x0: jnp.ndarray, x_terminal: jnp.ndarray,
                       u_init: jnp.ndarray, lamb0, dt,
                       backward: str = "sequential"
                       ) -> GenericIlqrSolution:
    """LM-regularized iLQR for a user dynamics ``step_fn(x, u, dt) -> x'``.

    Mirrors the reference solve semantics (`control/iterative_ilqr.py:7-85`):
    clip inputs, rollout + quadratic cost about ``x_terminal``, backward
    Riccati pass with eigenvalue-clamp Quu regularization, full-step clipped
    forward pass (no line search), accept/reject with the lambda-ladder, stop
    on |dcost/cost| < eps or lambda > max_lamb. Jacobians are autodiffed at
    the pre-step state (standard evaluation point; the bicycle path's
    successor-state quirk is a reference-parity detail of `ops/ilqr.py`).

    ``backward``: "sequential" (default) = the O(N)-depth Riccati scan with
    the reference's eigenvalue-clamp regularization; "parallel" = the
    O(log N)-depth associative-scan Riccati of ops/parallel_riccati.py for
    LONG horizons (SURVEY.md §5 long-context row). The parallel path uses
    control-Tikhonov regularization (U + lamb I) instead of the eig clamp —
    the standard LM variant compatible with a fixed element algebra; both
    recover the Newton step as lamb -> 0 (see parallel_riccati module
    docstring). Crossover vs N is measured in
    experiments/generic_bench.py (docs/PERF.md).
    """
    if backward not in ("sequential", "parallel"):
        raise ValueError(f"unknown backward mode {backward!r}")
    backward_mode = backward
    dtype = x0.dtype
    dt = jnp.asarray(dt, dtype=dtype)
    lamb0 = jnp.asarray(lamb0, dtype=dtype)

    def clip_u(us):
        return jnp.clip(us, cfg.u_lower, cfg.u_upper)

    def rollout(us):
        def body(x, u):
            x_next = step_fn(x, u, dt)
            return x_next, x_next

        _, xs_tail = jax.lax.scan(body, x0, us)
        return jnp.concatenate([x0[None, :], xs_tail], axis=0)

    def traj_cost(xs, us):
        dxs = xs[:-1] - x_terminal
        run = jnp.sum((dxs @ cfg.matrix_Q) * dxs) + jnp.sum(
            (us @ cfg.matrix_R) * us)
        dterm = xs[-1] - x_terminal
        return run + dterm @ cfg.matrix_Qterminal @ dterm

    jac_x = jax.vmap(jax.jacfwd(step_fn, argnums=0), in_axes=(0, 0, None))
    jac_u = jax.vmap(jax.jacfwd(step_fn, argnums=1), in_axes=(0, 0, None))

    def backward_sequential(xs, us, lamb):
        f_x = jac_x(xs[:-1], us, dt)  # (N, n, n)
        f_u = jac_u(xs[:-1], us, dt)  # (N, n, m)
        dxs = xs[:-1] - x_terminal
        l_x = 2.0 * dxs @ cfg.matrix_Q  # (N, n)
        l_xx = jnp.broadcast_to(2.0 * cfg.matrix_Q,
                                (us.shape[0],) + cfg.matrix_Q.shape)
        l_u = 2.0 * us @ cfg.matrix_R  # (N, m)
        l_uu = jnp.broadcast_to(2.0 * cfg.matrix_R,
                                (us.shape[0],) + cfg.matrix_R.shape)
        v_x = 2.0 * cfg.matrix_Qterminal @ (xs[-1] - x_terminal)
        v_xx = 2.0 * cfg.matrix_Qterminal

        def body(carry, inp):
            v_x, v_xx = carry
            fx, fu, lu, luu, lx, lxx = inp
            q_x = lx + fx.T @ v_x
            q_u = lu + fu.T @ v_x
            q_xx = lxx + fx.T @ v_xx @ fx
            q_uu = luu + fu.T @ v_xx @ fu
            q_ux = fu.T @ v_xx @ fx
            quu_inv = _reg_inv_sym(q_uu, lamb)
            k_t = -quu_inv @ q_u
            big_k = -quu_inv @ q_ux
            v_x_new = q_x - big_k.T @ q_uu @ k_t
            v_xx_new = q_xx - big_k.T @ q_uu @ big_k
            return (v_x_new, v_xx_new), (k_t, big_k)

        (_, _), (ks, big_ks) = jax.lax.scan(
            body, (v_x, v_xx), (f_x, f_u, l_u, l_uu, l_x, l_xx), reverse=True)
        return ks, big_ks

    def backward_parallel(xs, us, lamb):
        """O(log N)-depth backward via the associative-scan Riccati.

        iLQR linearizes about the rollout, so the deviation dynamics have
        zero drift (b = 0); stage data maps directly onto the
        parallel_riccati element convention (V = 0.5 x'Px + p'x)."""
        from ilqr_iterative_tasks_tpu.ops.parallel_riccati import (
            parallel_lqr_gains)

        f_x = jac_x(xs[:-1], us, dt)  # (N, n, n)
        f_u = jac_u(xs[:-1], us, dt)  # (N, n, m)
        nsteps = us.shape[0]
        dxs = xs[:-1] - x_terminal
        l_x = 2.0 * dxs @ cfg.matrix_Q
        l_xx = jnp.broadcast_to(2.0 * cfg.matrix_Q,
                                (nsteps,) + cfg.matrix_Q.shape)
        l_u = 2.0 * us @ cfg.matrix_R
        l_uu = jnp.broadcast_to(2.0 * cfg.matrix_R,
                                (nsteps,) + cfg.matrix_R.shape)
        v_x = 2.0 * cfg.matrix_Qterminal @ (xs[-1] - x_terminal)
        v_xx = 2.0 * cfg.matrix_Qterminal
        kff, big_k, _P, _p = parallel_lqr_gains(
            f_x, jnp.zeros_like(l_x), f_u, l_xx, l_x, l_uu, l_u,
            v_xx, v_x, lamb=lamb)
        return kff, big_k

    def forward(xs, us, ks, big_ks):
        def body(x_new, inp):
            x_old, u_old, k_t, big_k = inp
            u_new = clip_u(u_old + k_t + big_k @ (x_new - x_old))
            x_next = step_fn(x_new, u_new, dt)
            return x_next, (x_next, u_new)

        _, (xs_tail, us_new) = jax.lax.scan(
            body, xs[0], (xs[:-1], us, ks, big_ks))
        xs_new = jnp.concatenate([xs[0][None, :], xs_tail], axis=0)
        return xs_new, us_new, traj_cost(xs_new, us_new)

    def cond(carry):
        us, lamb, it, done = carry
        return jnp.logical_and(it < cfg.max_iter, jnp.logical_not(done))

    bw = (backward_sequential if backward_mode == "sequential"
          else backward_parallel)

    def body(carry):
        us, lamb, it, done = carry
        us_c = clip_u(us)
        xs = rollout(us_c)
        cost = traj_cost(xs, us_c)
        ks, big_ks = bw(xs, us_c, lamb)
        xs_new, us_new, cost_new = forward(xs, us_c, ks, big_ks)
        accept = cost_new < cost
        us_next = jnp.where(accept, us_new, us_c)
        lamb_next = jnp.where(accept, lamb / cfg.lamb_factor,
                              lamb * cfg.lamb_factor)
        converged = accept & (jnp.abs((cost_new - cost) / cost) < cfg.eps)
        diverged = (~accept) & (lamb_next > cfg.max_lamb)
        return us_next, lamb_next, it + 1, converged | diverged

    init = (clip_u(u_init), lamb0, jnp.asarray(0), jnp.asarray(False))
    us, lamb, n_iters, _ = jax.lax.while_loop(cond, body, init)
    us = clip_u(us)
    xs = rollout(us)
    return GenericIlqrSolution(us=us, xs=xs, lamb=lamb, n_iters=n_iters,
                               cost=traj_cost(xs, us))


@partial(jax.jit, static_argnames=("step_fn", "backward"))
def generic_ilqr_solve_candidates(step_fn: Callable, cfg: GenericIlqrConfig,
                                  x0: jnp.ndarray, x_terminals: jnp.ndarray,
                                  u_init: jnp.ndarray, lamb0, dt,
                                  backward: str = "sequential"
                                  ) -> GenericIlqrSolution:
    """vmap of ``generic_ilqr_solve`` over terminal-state candidates.

    ``x_terminals``: (k, n); ``u_init``: (N, m) shared across candidates —
    the same candidate-sweep shape as the i2LQR controller's bicycle path
    (`ops/ilqr.py::ilqr_solve_candidates`).
    """
    return jax.vmap(
        lambda xt: generic_ilqr_solve(step_fn, cfg, x0, xt, u_init, lamb0,
                                      dt, backward)
    )(x_terminals)
