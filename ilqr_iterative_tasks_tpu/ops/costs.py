"""Cost stack: quadratic terms + exponential repelling barriers, vectorized
over the whole horizon (no per-step Python loop).

Behavioral parity: /root/reference/iterative_ilqr/control/ilqr_helper.py:
- repelling_cost_function  (:59-64):  b = q1*e^{q2 c}, grad q1*q2*e^{q2 c}*c_dot,
  Gauss-Newton Hessian q1*q2^2*e^{q2 c}*c_dot c_dot^T (no c_ddot term).
- add_control_constraint   (:83-103): 4 barriers on [accel, delta] box bounds.
- get_cost_derivation      (:9-56):   per-step l_u, l_uu, l_x, l_xx with the
  obstacle ellipse barrier at the horizon-extrapolated obstacle center.
- get_cost_final           (:106-150): terminal quadratic + obstacle barrier
  extrapolated by the *param* horizon (not the current shrunk horizon).

All functions broadcast over leading batch dims; the horizon axis is just
another batch axis here. dtype follows the inputs (f32 on TPU; tests may run
f64 on CPU for parity against the f64 reference).
"""

from __future__ import annotations

import jax.numpy as jnp

from ilqr_iterative_tasks_tpu.models.obstacle import Obstacle
from ilqr_iterative_tasks_tpu.utils.params import IlqrParams, SystemLimits


def control_barrier_derivs(u: jnp.ndarray, params: IlqrParams,
                           limits: SystemLimits):
    """Gradient/Hessian of the 4 input-bound barriers (ilqr_helper.py:83-103).

    u: (..., 2) -> (b_dot (..., 2), b_ddot (..., 2, 2)).
    The barrier axis directions are the coordinate axes, so the Hessian is
    diagonal: accel barriers only touch [0,0], steering only [1,1].
    """
    q1, q2 = params.tuning_ctrl_q1, params.tuning_ctrl_q2
    a, d = u[..., 0], u[..., 1]
    ea_hi = jnp.exp(q2 * (a - limits.a_max))
    ea_lo = jnp.exp(q2 * (-limits.a_max - a))
    ed_hi = jnp.exp(q2 * (d - limits.delta_max_r))
    ed_lo = jnp.exp(q2 * (-limits.delta_max_r - d))
    g = q1 * q2
    h = q1 * q2 * q2
    b_dot = jnp.stack([g * (ea_hi - ea_lo), g * (ed_hi - ed_lo)], axis=-1)
    z = jnp.zeros_like(a)
    b_ddot = jnp.stack(
        [
            jnp.stack([h * (ea_hi + ea_lo), z], axis=-1),
            jnp.stack([z, h * (ed_hi + ed_lo)], axis=-1),
        ],
        axis=-2,
    )
    return b_dot, b_ddot


def obstacle_barrier_derivs(px, py, step_offset, obstacle: Obstacle,
                            params: IlqrParams):
    """Gradient/Hessian of the ellipse obstacle barrier at horizon offset(s).

    px, py: (...,) positions; step_offset: (...,) extrapolation steps.
    Returns (b_dot (..., 4), b_ddot (..., 4, 4)), scaled by obstacle.present.

    Mirrors ilqr_helper.py:32-51: h = 1 + margin - diff^T P diff with
    P = diag(1/a^2, 1/b^2, 0, 0); h_dot = -2 P diff; Gauss-Newton Hessian.
    """
    q1, q2 = params.tuning_obs_q1, params.tuning_obs_q2
    cx, cy = obstacle.center_at(step_offset)
    dz = px - cx
    dy = py - cy
    inv_a2 = 1.0 / (obstacle.width ** 2)
    inv_b2 = 1.0 / (obstacle.height ** 2)
    hval = 1.0 + params.safety_margin - (dz * dz * inv_a2 + dy * dy * inv_b2)
    e = obstacle.present * jnp.exp(q2 * hval)
    hd0 = -2.0 * inv_a2 * dz
    hd1 = -2.0 * inv_b2 * dy
    z = jnp.zeros_like(dz)
    h_dot = jnp.stack([hd0, hd1, z, z], axis=-1)  # (..., 4)
    b_dot = (q1 * q2 * e)[..., None] * h_dot
    b_ddot = (q1 * q2 * q2 * e)[..., None, None] * (
        h_dot[..., :, None] * h_dot[..., None, :]
    )
    return b_dot, b_ddot


def stage_cost_derivs(xs, us, xtarget, obstacle: Obstacle, params: IlqrParams,
                      limits: SystemLimits):
    """Per-step cost derivatives for steps 0..N-1 (ilqr_helper.py:9-56).

    xs: (N, 4) states x_0..x_{N-1}; us: (N, 2) inputs (already clipped by the
    caller, as in the reference loop). Returns l_u (N,2), l_uu (N,2,2),
    l_x (N,4), l_xx (N,4,4).
    """
    n = us.shape[-2]
    dX = xs - xtarget
    bd_u, bdd_u = control_barrier_derivs(us, params, limits)
    l_u = 2.0 * (us @ params.matrix_R.T) + bd_u
    l_uu = 2.0 * params.matrix_R + bdd_u
    offsets = jnp.arange(n, dtype=xs.dtype)
    bd_x, bdd_x = obstacle_barrier_derivs(
        xs[..., 0], xs[..., 1], offsets, obstacle, params)
    l_x = 2.0 * (dX @ params.matrix_Q.T) + bd_x
    l_xx = 2.0 * params.matrix_Q + bdd_x
    return l_u, l_uu, l_x, l_xx


def terminal_cost_derivs(x_last, x_terminal, obstacle: Obstacle,
                         params: IlqrParams):
    """Terminal value-function seed (ilqr_helper.py:106-150).

    Obstacle extrapolation uses the *param* horizon ``params.num_horizon``
    regardless of any shrunk solve horizon — reference quirk at
    ilqr_helper.py:136-138.
    """
    diff = x_last - x_terminal
    v_x = 2.0 * (diff @ params.matrix_Qterminal.T)
    v_xx = 2.0 * params.matrix_Qterminal + jnp.zeros(
        diff.shape[:-1] + (4, 4), dtype=diff.dtype)
    off = jnp.asarray(params.num_horizon, dtype=x_last.dtype)
    bd, bdd = obstacle_barrier_derivs(
        x_last[..., 0], x_last[..., 1], off, obstacle, params)
    return v_x + bd, v_xx + bdd


def trajectory_cost(xs, us, x_terminal, xtarget, params: IlqrParams):
    """Scalar rollout cost (iterative_ilqr.py:41-48, 151-159).

    xs: (N+1, 4), us: (N, 2). Running cost uses x_0..x_{N-1} against
    ``xtarget`` plus u^T R u; terminal quadratic against ``x_terminal``.
    (Barriers are *not* part of the accept/reject cost in the reference —
    they only shape the derivatives.)
    """
    dxs = xs[..., :-1, :] - xtarget
    l_state = jnp.einsum("...ni,ij,...nj->...", dxs, params.matrix_Q, dxs)
    l_ctrl = jnp.einsum("...ni,ij,...nj->...", us, params.matrix_R, us)
    dterm = xs[..., -1, :] - x_terminal
    l_term = jnp.einsum("...i,ij,...j->...", dterm, params.matrix_Qterminal, dterm)
    return l_state + l_ctrl + l_term
