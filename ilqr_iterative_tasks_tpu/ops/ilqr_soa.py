"""Structure-of-arrays (batch-trailing) iLQR solver — the TPU fast path.

Semantics identical to ops/ilqr.py (which mirrors the reference
iterative_ilqr.py:7-160; see that module for the parity map). Differences are
purely in *execution strategy*:

1. Batch-trailing layout: every tensor keeps tiny structural dims leading and
   the solve batch trailing, so XLA lays the batch on the TPU lane dimension
   instead of padding a trailing 4 -> 128 (a 32x memory blowup measured to cap
   the AoS path at ~20k solves/s/chip).
2. Fully scalarized small algebra: the 4x4/2x4/2x2 Riccati recursion is
   written out per-component ((B,)-shaped arrays, symmetric value matrix as
   its 10 unique components) — no einsum/dot on batch-trailing operands, which
   XLA would otherwise implement with batch-to-front transposes that fall off
   a performance cliff past B ~ 4k.
3. Horizon loops Python-unrolled (N static, small); the LM accept/reject loop
   is one lax.while_loop with per-lane `done` masking — semantically identical
   to vmap-of-while (each lane freezes at its own convergence).

Exactness: matches ops.ilqr.ilqr_solve per-lane to ~1e-11 in f64 (see
tests/test_ilqr_soa.py); f32 outputs can diverge on accept/reject boundaries
by design of LM (rounding-order cascades), with equal closed-loop behavior.

Batch shape *S is arbitrary, e.g. (K,) candidates or (K, B) candidates x
scenarios inside the batch-native simulator.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ilqr_iterative_tasks_tpu.models.obstacle import Obstacle
from ilqr_iterative_tasks_tpu.utils.params import IlqrParams, SystemLimits


def step_soa(x, u, dt):
    """x: tuple of 4 (*S) arrays, u: tuple of 2 -> tuple of 4."""
    px, py, v, th = x
    ua, ud = u
    arc = v * dt + 0.5 * ua * dt * dt
    return (px + jnp.cos(th) * arc, py + jnp.sin(th) * arc,
            v + ua * dt, th + ud * dt)


def _quu_inv_comps(q00, q01, q11, lamb):
    """Closed-form spectral f(Quu), f(e) = 1/(max(e,0)+lamb); component form."""
    mean = 0.5 * (q00 + q11)
    disc = jnp.sqrt(jnp.maximum(0.25 * (q00 - q11) ** 2 + q01 * q01, 0.0))
    e1, e2 = mean + disc, mean - disc
    f1 = 1.0 / (jnp.maximum(e1, 0.0) + lamb)
    f2 = 1.0 / (jnp.maximum(e2, 0.0) + lamb)
    safe = disc > 1e-12
    beta = jnp.where(safe, (f1 - f2) / jnp.where(safe, e1 - e2, 1.0), 0.0)
    alpha = f1 - beta * e1
    return alpha + beta * q00, beta * q01, alpha + beta * q11


class IlqrSoaSolution(NamedTuple):
    us: jnp.ndarray  # (N, 2, *S)
    xs: jnp.ndarray  # (N+1, 4, *S)
    lamb: jnp.ndarray  # (*S)
    n_iters: jnp.ndarray  # scalar (global lockstep iterations)
    cost: jnp.ndarray  # (*S)


@partial(jax.jit, static_argnames=("num_horizon", "max_iter",
                                   "precision_islands"))
def ilqr_solve_soa(params: IlqrParams, limits: SystemLimits,
                   obstacle: Obstacle, x0, x_terminal, u_init, lamb0, dt,
                   *, num_horizon: int,
                   max_iter: int | None = None,
                   precision_islands: tuple = ()) -> IlqrSoaSolution:
    """Batched iLQR solve, batch-trailing layout.

    x0: (4, *S) or (4,); x_terminal: (4, *S); u_init: (N, 2, *S); lamb0:
    scalar or (*S). Per-lane semantics identical to ops.ilqr.ilqr_solve.
    ``max_iter`` optionally caps params.max_ilqr_iter for throughput paths.

    ``precision_islands`` (parity tooling for the TPU-f32 decision-gap
    bisect, docs/PARITY.md): a subset of {"trig", "exp", "cost"} evaluated
    in f64 inside the otherwise-f32 solve (requires jax_enable_x64) —
    "trig" = the dynamics/Jacobian sin/cos, "exp" = the barrier
    exponentials, "cost" = f64 cost accumulation (which also makes the LM
    accept/convergence compares f64). Empty (default) = production f32.
    """
    n = num_horizon
    dtype = x_terminal.dtype
    bshape = x_terminal.shape[1:]
    dt = jnp.asarray(dt, dtype)
    if max_iter is None:
        max_iter = params.max_ilqr_iter
    hi_trig = "trig" in precision_islands
    hi_exp = "exp" in precision_islands
    hi_cost = "cost" in precision_islands

    def _sincos(th):
        if hi_trig:
            t64 = th.astype(jnp.float64)
            return jnp.sin(t64).astype(dtype), jnp.cos(t64).astype(dtype)
        return jnp.sin(th), jnp.cos(th)

    def _exp(z):
        if hi_exp:
            return jnp.exp(z.astype(jnp.float64)).astype(dtype)
        return jnp.exp(z)

    def _step_l(x, u):
        px, py, v, th = x
        ua, ud = u
        arc = v * dt + 0.5 * ua * dt * dt
        s_t, c_t = _sincos(th)
        return (px + c_t * arc, py + s_t * arc, v + ua * dt, th + ud * dt)
    if x0.ndim == 1:
        x0 = jnp.broadcast_to(x0.reshape((4,) + (1,) * len(bshape)),
                              (4,) + bshape)
    x0c = tuple(x0[i] for i in range(4))
    xt = tuple(x_terminal[i] for i in range(4))

    # Cost weights as Python-indexed scalars (symmetrized: all reference
    # configs are symmetric; the symmetric-components recursion requires it).
    q_m = 0.5 * (params.matrix_Q + params.matrix_Q.T)
    r_m = 0.5 * (params.matrix_R + params.matrix_R.T)
    qt_m = 0.5 * (params.matrix_Qterminal + params.matrix_Qterminal.T)
    q1c, q2c = params.tuning_ctrl_q1, params.tuning_ctrl_q2
    q1o, q2o = params.tuning_obs_q1, params.tuning_obs_q2
    inv_a2 = obstacle.present / (obstacle.width ** 2)
    inv_b2 = obstacle.present / (obstacle.height ** 2)

    cost_dtype = jnp.float64 if hi_cost else dtype

    def quad4(m, d):
        acc = 0.0
        for i in range(4):
            for j in range(4):
                acc = acc + (m[i, j].astype(cost_dtype)
                             * d[i].astype(cost_dtype)
                             * d[j].astype(cost_dtype))
        return acc

    def quad2(m, u):
        acc = 0.0
        for i in range(2):
            for j in range(2):
                acc = acc + (m[i, j].astype(cost_dtype)
                             * u[i].astype(cost_dtype)
                             * u[j].astype(cost_dtype))
        return acc

    def clip_u(u):
        return (jnp.clip(u[0], -limits.a_max, limits.a_max),
                jnp.clip(u[1], -limits.delta_max_r, limits.delta_max_r))

    def rollout(us):
        xs = [x0c]
        for i in range(n):
            xs.append(_step_l(xs[-1], us[i]))
        return xs

    def loop_cost(xs, us):
        cost = jnp.zeros(bshape, cost_dtype)
        for i in range(n):
            cost = cost + quad4(q_m, xs[i]) + quad2(r_m, us[i])
        dterm = tuple(xs[n][i] - xt[i] for i in range(4))
        return cost + quad4(qt_m, dterm)

    def obs_terms(px, py, off):
        """(e_scaled_grad, e_scaled_hess, hd0, hd1) at extrapolation ``off``."""
        up = (obstacle.moving_option == 1).astype(dtype)
        left = (obstacle.moving_option == 2).astype(dtype)
        cx = obstacle.x - left * obstacle.spd * off
        cy = obstacle.y + up * obstacle.spd * off
        dz = px - cx
        dy = py - cy
        hval = (1.0 + params.safety_margin
                - (dz * dz * inv_a2 + dy * dy * inv_b2))
        e = obstacle.present * _exp(q2o * hval)
        hd0 = -2.0 * inv_a2 * dz
        hd1 = -2.0 * inv_b2 * dy
        return q1o * q2o * e, q1o * q2o * q2o * e, hd0, hd1

    def backward(xs, us, lamb):
        # terminal value seed (obstacle extrapolated by the PARAM horizon —
        # reference quirk, ilqr_helper.py:136-138)
        dterm = tuple(xs[n][i] - xt[i] for i in range(4))
        ge, he, hd0, hd1 = obs_terms(
            xs[n][0], xs[n][1], jnp.asarray(params.num_horizon, dtype))
        vx = [sum(2.0 * qt_m[i, j] * dterm[j] for j in range(4))
              for i in range(4)]
        vx[0] = vx[0] + ge * hd0
        vx[1] = vx[1] + ge * hd1
        v00 = 2.0 * qt_m[0, 0] + he * hd0 * hd0
        v01 = 2.0 * qt_m[0, 1] + he * hd0 * hd1
        v02 = 2.0 * qt_m[0, 2] + jnp.zeros(bshape, dtype)
        v03 = 2.0 * qt_m[0, 3] + jnp.zeros(bshape, dtype)
        v11 = 2.0 * qt_m[1, 1] + he * hd1 * hd1
        v12 = 2.0 * qt_m[1, 2] + jnp.zeros(bshape, dtype)
        v13 = 2.0 * qt_m[1, 3] + jnp.zeros(bshape, dtype)
        v22 = 2.0 * qt_m[2, 2] + jnp.zeros(bshape, dtype)
        v23 = 2.0 * qt_m[2, 3] + jnp.zeros(bshape, dtype)
        v33 = 2.0 * qt_m[3, 3] + jnp.zeros(bshape, dtype)
        vx0, vx1, vx2, vx3 = vx

        ks = []
        big_ks = []
        for i in range(n - 1, -1, -1):
            # Jacobian entries at the successor state (reference quirk)
            v_nx = xs[i + 1][2]
            th_n = xs[i + 1][3]
            ua, ud = us[i]
            arc = v_nx * dt + 0.5 * ua * dt * dt
            sin_t, cos_t = _sincos(th_n)
            a02 = cos_t * dt
            a03 = -arc * sin_t
            a12 = sin_t * dt
            a13 = arc * cos_t
            b00 = 0.5 * dt * dt * cos_t
            b10 = 0.5 * dt * dt * sin_t

            # stage cost derivatives at (x_i, u_i)
            ea_hi = _exp(q2c * (ua - limits.a_max))
            ea_lo = _exp(q2c * (-limits.a_max - ua))
            ed_hi = _exp(q2c * (ud - limits.delta_max_r))
            ed_lo = _exp(q2c * (-limits.delta_max_r - ud))
            lu0 = (2.0 * (r_m[0, 0] * ua + r_m[0, 1] * ud)
                   + q1c * q2c * (ea_hi - ea_lo))
            lu1 = (2.0 * (r_m[1, 0] * ua + r_m[1, 1] * ud)
                   + q1c * q2c * (ed_hi - ed_lo))
            luu00 = 2.0 * r_m[0, 0] + q1c * q2c * q2c * (ea_hi + ea_lo)
            luu01 = 2.0 * r_m[0, 1] + jnp.zeros(bshape, dtype)
            luu11 = 2.0 * r_m[1, 1] + q1c * q2c * q2c * (ed_hi + ed_lo)
            gei, hei, h0, h1 = obs_terms(xs[i][0], xs[i][1],
                                         jnp.asarray(float(i), dtype))
            dx_i = xs[i]  # dX vs xtarget=0 (base.py:374)
            lx0 = sum(2.0 * q_m[0, j] * dx_i[j] for j in range(4)) + gei * h0
            lx1 = sum(2.0 * q_m[1, j] * dx_i[j] for j in range(4)) + gei * h1
            lx2 = sum(2.0 * q_m[2, j] * dx_i[j] for j in range(4))
            lx3 = sum(2.0 * q_m[3, j] * dx_i[j] for j in range(4))
            gn00 = hei * h0 * h0
            gn01 = hei * h0 * h1
            gn11 = hei * h1 * h1

            # q_x = l_x + A^T v_x
            qx0 = lx0 + vx0
            qx1 = lx1 + vx1
            qx2 = lx2 + a02 * vx0 + a12 * vx1 + vx2
            qx3 = lx3 + a03 * vx0 + a13 * vx1 + vx3
            # q_u = l_u + B^T v_x
            qu0 = lu0 + b00 * vx0 + b10 * vx1 + dt * vx2
            qu1 = lu1 + dt * vx3
            # W = V A (V symmetric); columns 2,3 are the nontrivial ones
            w02 = a02 * v00 + a12 * v01 + v02
            w12 = a02 * v01 + a12 * v11 + v12
            w22 = a02 * v02 + a12 * v12 + v22
            w32 = a02 * v03 + a12 * v13 + v23
            w03 = a03 * v00 + a13 * v01 + v03
            w13 = a03 * v01 + a13 * v11 + v13
            w23 = a03 * v02 + a13 * v12 + v23
            w33 = a03 * v03 + a13 * v13 + v33
            # q_xx = l_xx + A^T V A  (symmetric components)
            m00 = 2.0 * q_m[0, 0] + gn00 + v00
            m01 = 2.0 * q_m[0, 1] + gn01 + v01
            m02 = 2.0 * q_m[0, 2] + w02
            m03 = 2.0 * q_m[0, 3] + w03
            m11 = 2.0 * q_m[1, 1] + gn11 + v11
            m12 = 2.0 * q_m[1, 2] + w12
            m13 = 2.0 * q_m[1, 3] + w13
            m22 = 2.0 * q_m[2, 2] + a02 * w02 + a12 * w12 + w22
            m23 = 2.0 * q_m[2, 3] + a02 * w03 + a12 * w13 + w23
            m33 = 2.0 * q_m[3, 3] + a03 * w03 + a13 * w13 + w33
            # q_uu = l_uu + B^T V B
            quu00 = (luu00 + b00 * (b00 * v00 + b10 * v01 + dt * v02)
                     + b10 * (b00 * v01 + b10 * v11 + dt * v12)
                     + dt * (b00 * v02 + b10 * v12 + dt * v22))
            quu01 = luu01 + dt * (b00 * v03 + b10 * v13 + dt * v23)
            quu11 = luu11 + dt * dt * v33
            # q_ux = B^T W  (2 x 4)
            qux00 = b00 * v00 + b10 * v01 + dt * v02
            qux01 = b00 * v01 + b10 * v11 + dt * v12
            qux02 = b00 * w02 + b10 * w12 + dt * w22
            qux03 = b00 * w03 + b10 * w13 + dt * w23
            qux10 = dt * v03
            qux11 = dt * v13
            qux12 = dt * w32
            qux13 = dt * w33
            # gains
            i00, i01, i11 = _quu_inv_comps(quu00, quu01, quu11, lamb)
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
            # value updates: V_x = q_x - K^T (Quu k); V = q_xx - K^T Quu K
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
            ks.append((k0, k1))
            big_ks.append(((kk00, kk01, kk02, kk03),
                           (kk10, kk11, kk12, kk13)))
        return ks[::-1], big_ks[::-1]

    def forward(xs, us, ks, big_ks):
        x_new = xs[0]
        us_new = []
        xs_new = [x_new]
        cost = jnp.zeros(bshape, cost_dtype)
        for i in range(n):
            dx = tuple(x_new[j] - xs[i][j] for j in range(4))
            krow0, krow1 = big_ks[i]
            u0 = (us[i][0] + ks[i][0]
                  + krow0[0] * dx[0] + krow0[1] * dx[1]
                  + krow0[2] * dx[2] + krow0[3] * dx[3])
            u1 = (us[i][1] + ks[i][1]
                  + krow1[0] * dx[0] + krow1[1] * dx[1]
                  + krow1[2] * dx[2] + krow1[3] * dx[3])
            u_new = clip_u((u0, u1))
            dxt = tuple(x_new[j] - xt[j] for j in range(4))
            cost = cost + quad4(q_m, dxt) + quad2(r_m, u_new)
            x_new = _step_l(x_new, u_new)
            us_new.append(u_new)
            xs_new.append(x_new)
        dterm = tuple(x_new[j] - xt[j] for j in range(4))
        cost = cost + quad4(qt_m, dterm)
        return xs_new, us_new, cost

    def pack_us(us_list):
        return jnp.stack([jnp.stack(u) for u in us_list])

    def unpack_us(us_arr):
        return [(us_arr[i, 0], us_arr[i, 1]) for i in range(n)]

    def cond(carry):
        us, lamb, it, done = carry
        return (it < max_iter) & jnp.any(~done)

    def body(carry):
        us_arr, lamb, it, done = carry
        us = [clip_u(u) for u in unpack_us(us_arr)]
        xs = rollout(us)
        cost = loop_cost(xs, us)
        ks, big_ks = backward(xs, us, lamb)
        xs_new, us_new, cost_new = forward(xs, us, ks, big_ks)
        accept = cost_new < cost
        upd = accept & ~done
        us_next = jnp.where(upd, pack_us(us_new), pack_us(us))
        lamb_next = jnp.where(done, lamb,
                              jnp.where(accept, lamb / params.lamb_factor,
                                        lamb * params.lamb_factor))
        converged = accept & (jnp.abs((cost_new - cost) / cost) < params.eps)
        diverged = (~accept) & (lamb_next > params.max_lamb)
        done_next = done | converged | diverged
        return us_next, lamb_next, it + 1, done_next

    lamb0 = jnp.broadcast_to(jnp.asarray(lamb0, dtype), bshape)
    done0 = jnp.zeros(bshape, dtype=bool)
    us_arr, lamb, n_iters, _ = jax.lax.while_loop(
        cond, body, (u_init, lamb0, jnp.asarray(0), done0))
    us = [clip_u(u) for u in unpack_us(us_arr)]
    xs = rollout(us)
    cost = loop_cost(xs, us)
    return IlqrSoaSolution(
        us=pack_us(us),
        xs=jnp.stack([jnp.stack(x) for x in xs]),
        lamb=lamb, n_iters=n_iters, cost=cost.astype(dtype))
