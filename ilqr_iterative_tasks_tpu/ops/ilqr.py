"""Core iLQR trajectory-optimization solver, TPU-native.

Behavioral parity: /root/reference/iterative_ilqr/control/iterative_ilqr.py:
- ilqr()          (:7-85):  Levenberg-Marquardt outer loop — clip inputs,
  rollout + cost, backward Riccati pass, full-step forward pass, accept/reject
  with lambda /= 10 on improvement (convergence when |dcost/cost| < eps) and
  lambda *= 10 on rejection (abort when lambda > max_lamb).
- backward_pass() (:88-130): Q-derivatives, eigenvalue-clamp regularization of
  Quu (negative eigenvalues -> 0, + lambda, invert), gains k = -Quu^-1 Qu,
  K = -Quu^-1 Qux.  NOTE the reference evaluates the dynamics Jacobians at the
  *successor* state's (v, theta) with the current input's accel
  (iterative_ilqr.py:92-99) — reproduced here.
- forward_pass()  (:133-160): rollout with u + k + K(x_new - x), hard clip to
  input bounds, no line search.

TPU-first redesign (not a translation):
- The whole solve is one jitted ``lax.while_loop`` around two ``lax.scan``s;
  no Python-level iteration, so the entire candidate batch stays on device and
  vmaps over (x_terminal, u_init) for the i2LQR candidate sweep.
- ``np.linalg.eig`` on the 2x2 Quu is replaced by a closed-form symmetric
  spectral function: for 2x2 symmetric A, f(A) = alpha*I + beta*A with
  alpha/beta interpolating f on the two eigenvalues — bitwise-equivalent
  clamp-and-shift semantics, no LAPACK, fully vectorizable.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ilqr_iterative_tasks_tpu.models import kinetic_bicycle as dyn
from ilqr_iterative_tasks_tpu.models.obstacle import Obstacle
from ilqr_iterative_tasks_tpu.ops import costs
from ilqr_iterative_tasks_tpu.utils.params import IlqrParams, SystemLimits


class IlqrSolution(NamedTuple):
    us: jnp.ndarray  # (N, 2) optimized (clipped) inputs
    xs: jnp.ndarray  # (N+1, 4) rollout of ``us`` from x0
    lamb: jnp.ndarray  # final LM regularization
    n_iters: jnp.ndarray  # iterations executed
    cost: jnp.ndarray  # cost of the returned trajectory


def clip_inputs(us: jnp.ndarray, limits: SystemLimits) -> jnp.ndarray:
    """Hard input clip (iterative_ilqr.py:33-39; delta uses round(delta_max,2))."""
    a = jnp.clip(us[..., 0], -limits.a_max, limits.a_max)
    d = jnp.clip(us[..., 1], -limits.delta_max_r, limits.delta_max_r)
    return jnp.stack([a, d], axis=-1)


def rollout(x0: jnp.ndarray, us: jnp.ndarray, dt) -> jnp.ndarray:
    """Open-loop rollout: (4,), (N,2) -> (N+1, 4)."""

    def body(x, u):
        x_next = dyn.step(x, u, dt)
        return x_next, x_next

    _, xs_tail = jax.lax.scan(body, x0, us)
    return jnp.concatenate([x0[None, :], xs_tail], axis=0)


def _reg_inv_2x2(quu: jnp.ndarray, lamb) -> jnp.ndarray:
    """Spectral f(Quu) with f(e) = 1 / (max(e, 0) + lamb), for symmetric 2x2.

    Parity with iterative_ilqr.py:118-123 without np.linalg.eig: any analytic
    (here: spectral) function of a 2x2 symmetric matrix is alpha*I + beta*A.
    """
    a = quu[..., 0, 0]
    b = 0.5 * (quu[..., 0, 1] + quu[..., 1, 0])
    c = quu[..., 1, 1]
    mean = 0.5 * (a + c)
    disc = jnp.sqrt(jnp.maximum(0.25 * (a - c) ** 2 + b * b, 0.0))
    e1 = mean + disc
    e2 = mean - disc
    f1 = 1.0 / (jnp.maximum(e1, 0.0) + lamb)
    f2 = 1.0 / (jnp.maximum(e2, 0.0) + lamb)
    tiny = jnp.asarray(1e-12, dtype=quu.dtype)
    safe = disc > tiny
    beta = jnp.where(safe, (f1 - f2) / jnp.where(safe, e1 - e2, 1.0), 0.0)
    alpha = f1 - beta * e1
    eye = jnp.eye(2, dtype=quu.dtype)
    sym = quu.at[..., 0, 1].set(b).at[..., 1, 0].set(b)
    return alpha[..., None, None] * eye + beta[..., None, None] * sym


def backward_pass(xs, us, x_terminal, xtarget, lamb, obstacle: Obstacle,
                  params: IlqrParams, limits: SystemLimits, dt):
    """Riccati recursion (iterative_ilqr.py:88-130). Returns k (N,2), K (N,2,4)."""
    # Jacobians at successor (v, theta) with current accel — reference quirk.
    f_x = dyn.jacobian_A(xs[1:, 2], xs[1:, 3], us[:, 0], dt)  # (N,4,4)
    f_u = dyn.jacobian_B(xs[1:, 3], dt)  # (N,4,2)
    l_u, l_uu, l_x, l_xx = costs.stage_cost_derivs(
        xs[:-1], us, xtarget, obstacle, params, limits)
    v_x, v_xx = costs.terminal_cost_derivs(xs[-1], x_terminal, obstacle, params)

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
        v_x_new = q_x - big_k.T @ q_uu @ k_t
        v_xx_new = q_xx - big_k.T @ q_uu @ big_k
        return (v_x_new, v_xx_new), (k_t, big_k)

    (_, _), (ks, big_ks) = jax.lax.scan(
        body, (v_x, v_xx), (f_x, f_u, l_u, l_uu, l_x, l_xx), reverse=True)
    return ks, big_ks


def forward_pass(xs, us, ks, big_ks, x_terminal, params: IlqrParams,
                 limits: SystemLimits, dt):
    """Clipped full-step rollout (iterative_ilqr.py:133-160).

    NOTE the running state cost here is measured against ``x_terminal``
    (iterative_ilqr.py:151-155), while the loop-top cost uses ``xtarget`` —
    an asymmetry in the reference, faithfully kept (moot for the default
    matrix_Q = 0).
    """

    def body(x_new, inp):
        x_old, u_old, k_t, big_k = inp
        u_new = u_old + k_t + big_k @ (x_new - x_old)
        u_new = clip_inputs(u_new, limits)
        dx = x_new - x_terminal
        l_state = dx @ params.matrix_Q @ dx
        l_ctrl = u_new @ params.matrix_R @ u_new
        x_next = dyn.step(x_new, u_new, dt)
        return x_next, (x_next, u_new, l_state + l_ctrl)

    x_last, (xs_tail, us_new, stage_costs) = jax.lax.scan(
        body, xs[0], (xs[:-1], us, ks, big_ks))
    xs_new = jnp.concatenate([xs[0][None, :], xs_tail], axis=0)
    dterm = x_last - x_terminal
    cost_new = jnp.sum(stage_costs) + dterm @ params.matrix_Qterminal @ dterm
    return xs_new, us_new, cost_new


@partial(jax.jit, static_argnames=("num_horizon",))
def ilqr_solve(params: IlqrParams, limits: SystemLimits, obstacle: Obstacle,
               x0: jnp.ndarray, x_terminal: jnp.ndarray, u_init: jnp.ndarray,
               lamb0, dt, xtarget=None, *, num_horizon: int) -> IlqrSolution:
    """Full LM-regularized iLQR solve (iterative_ilqr.py:7-85), jitted.

    ``num_horizon`` is static (sets scan lengths); everything else is traced,
    so candidate sweeps vmap over (x_terminal, u_init, lamb0) with one trace.
    """
    del num_horizon  # encoded in u_init.shape[0]
    if xtarget is None:
        xtarget = jnp.zeros_like(x0)
    dt = jnp.asarray(dt, dtype=x0.dtype)

    def loop_cost(xs, us):
        return costs.trajectory_cost(xs, us, x_terminal, xtarget, params)

    def cond(carry):
        us, lamb, it, done = carry
        return jnp.logical_and(it < params.max_ilqr_iter, jnp.logical_not(done))

    def body(carry):
        us, lamb, it, done = carry
        us_c = clip_inputs(us, limits)
        xs = rollout(x0, us_c, dt)
        cost = loop_cost(xs, us_c)
        ks, big_ks = backward_pass(
            xs, us_c, x_terminal, xtarget, lamb, obstacle, params, limits, dt)
        xs_new, us_new, cost_new = forward_pass(
            xs, us_c, ks, big_ks, x_terminal, params, limits, dt)
        accept = cost_new < cost
        us_next = jnp.where(accept, us_new, us_c)
        lamb_next = jnp.where(accept, lamb / params.lamb_factor,
                              lamb * params.lamb_factor)
        converged = accept & (jnp.abs((cost_new - cost) / cost) < params.eps)
        diverged = (~accept) & (lamb_next > params.max_lamb)
        return us_next, lamb_next, it + 1, converged | diverged

    us0 = clip_inputs(u_init, limits)
    init = (us0, jnp.asarray(lamb0, dtype=x0.dtype), jnp.asarray(0), jnp.asarray(False))
    us, lamb, n_iters, _ = jax.lax.while_loop(cond, body, init)
    us = clip_inputs(us, limits)
    xs = rollout(x0, us, dt)
    return IlqrSolution(us=us, xs=xs, lamb=lamb, n_iters=n_iters,
                        cost=loop_cost(xs, us))


@partial(jax.jit, static_argnames=("num_horizon",))
def ilqr_solve_candidates(params: IlqrParams, limits: SystemLimits,
                          obstacle: Obstacle, x0: jnp.ndarray,
                          x_terminals: jnp.ndarray, u_init: jnp.ndarray,
                          lamb0, dt, *, num_horizon: int) -> IlqrSolution:
    """vmap of ``ilqr_solve`` over a batch of terminal-state candidates.

    x_terminals: (B, 4); u_init: (N, 2) shared. This is the i2LQR candidate
    sweep (base.py:403-426) — embarrassingly parallel on device, replacing the
    reference's sequential Python loop. (Deviation: the reference threads the
    final LM lambda of candidate j into candidate j+1, base.py:393,414-426; we
    reset lambda per candidate for clean parallel semantics.)
    """
    solve = lambda xt: ilqr_solve(params, limits, obstacle, x0, xt, u_init,
                                  lamb0, dt, num_horizon=num_horizon)
    return jax.vmap(solve)(x_terminals)


@partial(jax.jit, static_argnames=("num_horizon",))
def ilqr_solve_candidates_seq(params: IlqrParams, limits: SystemLimits,
                              obstacle: Obstacle, x0: jnp.ndarray,
                              x_terminals: jnp.ndarray, u_init: jnp.ndarray,
                              lamb0, dt, *, num_horizon: int) -> IlqrSolution:
    """Sequential-lambda candidate sweep — the reference's exact threading.

    base.py:393,414-426: within one lap's kNN candidates the LM lambda of
    candidate j (as returned by ilqr(), including the post-accept division
    or the past-max_lamb inflation) seeds candidate j+1; lambda resets to
    ``lamb0`` at the start of each (relaxation pass, lap) pair — the caller
    owns that reset by passing params.lamb per call. One lax.scan instance
    keeps this parity mode fully compiled: candidates are serialized by the
    true lambda data dependence, not by Python dispatch. Stacked outputs
    match ``ilqr_solve_candidates`` layout.
    """
    def step(lamb, xt):
        sol = ilqr_solve(params, limits, obstacle, x0, xt, u_init, lamb, dt,
                         num_horizon=num_horizon)
        return sol.lamb, sol

    _, sols = jax.lax.scan(step, jnp.asarray(lamb0, dtype=x0.dtype),
                           x_terminals)
    return sols
