"""Fused Pallas TPU kernel for the GENERIC-system iLQR solver.

The framework's fusion thesis — a VMEM-resident whole-solve kernel beats
the XLA-glued SoA path ~3x (docs/PERF.md solver ladder) — proven for the
hand-scalarized bicycle solver by ops/pallas_ilqr.py, extended here to
arbitrary (n, m) systems: the kernel body IS the shared scalarized core of
ops/generic_ilqr_soa.py (``make_generic_core``), whose functions operate on
tuples of per-component arrays of any shape. Inside the kernel those
components are (tile_rows, 128) tiles, so the whole LM loop (jvp one-hot
Jacobians, scalarized Riccati with the m<=2 closed-form spectral clamp /
m>2 damped Cholesky, clipped forward pass, accept/reject lambda ladder)
runs VMEM-resident per tile with one early-terminating while_loop instance
— the same structure that keeps the bicycle step kernels' Mosaic compiles
at ~15 s instead of ~10 min.

Semantics: identical trace to build_generic_ilqr_soa's while body (same
core functions, same carry layout), so decisions match the XLA path at the
decision level (f32 LM accept/reject cascades preclude cross-compilation
bitwise equality — docs/PARITY.md convention; parity is asserted on costs
and rollouts in tests/test_generic_ilqr.py).

Reference scope: the reference's only solver is the bicycle iLQR
(control/iterative_ilqr.py:7-85); the generic tier is this framework's
extension (SURVEY.md §7 step 3), so parity here is against this repo's own
XLA generic solver, not the reference.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ilqr_iterative_tasks_tpu.ops.generic_ilqr_soa import make_generic_core


def build_generic_ilqr_pallas(step_comps: Callable, *, n: int, m: int,
                              matrix_Q, matrix_R, matrix_Qterminal,
                              u_lower, u_upper, dt,
                              eps: float = 1e-2, lamb_factor: float = 10.0,
                              max_lamb: float = 1000.0, max_iter: int = 150,
                              num_horizon: int = 6, tile_rows: int = 8,
                              lamb0: float = 1.0,
                              interpret: bool = False):
    """Factory: returns a jitted
    ``solve(x0 (n,B), x_terminal (n,B), u_init (N,m,B))``
    -> (us (N,m,B), x_last (n,B), cost (B,), n_iters (B,)).

    B must be a multiple of tile_rows*128. ``lamb0`` is baked (the
    reference's fixed initial lambda, base.py:260). Hyperparameters and
    the dynamics are baked at build time exactly like the bicycle kernels.
    """
    core = make_generic_core(step_comps, n=n, m=m, matrix_Q=matrix_Q,
                             matrix_R=matrix_R,
                             matrix_Qterminal=matrix_Qterminal,
                             u_lower=u_lower, u_upper=u_upper, dt=dt,
                             num_horizon=num_horizon)
    nh = num_horizon
    tile = tile_rows * 128
    shp = (tile_rows, 128)

    def kernel(x_ref, xt_ref, u_ref, us_ref, xl_ref, cost_ref, it_ref):
        x0c = tuple(x_ref[c].reshape(shp) for c in range(n))
        xt = tuple(xt_ref[c].reshape(shp) for c in range(n))
        ui = [core.clip_u(tuple(u_ref[i, a].reshape(shp)
                                for a in range(m)))
              for i in range(nh)]

        def cond(carry):
            it, done = carry[0], carry[1]
            return (it < max_iter) & (jnp.max(1.0 - done) > 0.5)

        def body(carry):
            it, done_f, lamb = carry[0], carry[1], carry[2]
            done = done_f > 0.5
            us = [core.clip_u(u) for u in core.unflatten(carry[3:])]
            xs = core.rollout(x0c, us)
            cost = core.cost_of(xs, us, xt)
            ks, Ks = core.backward(xs, us, lamb, xt)
            us_new, cost_new = core.forward(xs, us, ks, Ks, xt)
            accept = cost_new < cost
            upd = accept & ~done
            us_next = tuple(jnp.where(upd, a, b)
                            for a, b in zip(core.flatten(us_new),
                                            core.flatten(us)))
            lamb_next = jnp.where(
                done, lamb, jnp.where(accept, lamb / lamb_factor,
                                      lamb * lamb_factor))
            converged = accept & (jnp.abs((cost_new - cost) / cost) < eps)
            diverged = (~accept) & (lamb_next > max_lamb)
            done_next = jnp.maximum(
                done_f, (converged | diverged).astype(jnp.float32))
            return (it + 1, done_next, lamb_next) + us_next

        init = ((jnp.int32(0), jnp.zeros(shp, jnp.float32),
                 jnp.full(shp, float(lamb0), jnp.float32))
                + core.flatten(ui))
        final = jax.lax.while_loop(cond, body, init)
        us = [core.clip_u(u) for u in core.unflatten(final[3:])]
        xs = core.rollout(x0c, us)
        cost = core.cost_of(xs, us, xt)
        for i in range(nh):
            for a in range(m):
                us_ref[i, a] = us[i][a].reshape(tile)
        for c in range(n):
            xl_ref[c] = xs[nh][c].reshape(tile)
        cost_ref[...] = cost.reshape(tile)
        it_ref[...] = (final[0].astype(jnp.float32)
                       * jnp.ones((tile,), jnp.float32))

    def solve(x0, x_terminal, u_init):
        b = x_terminal.shape[-1]
        assert b % tile == 0, f"batch {b} must be a multiple of {tile}"
        grid = (b // tile,)
        lane_spec = lambda lead: pl.BlockSpec(
            lead + (tile,), (lambda i: (0,) * len(lead) + (i,)))
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[lane_spec((n,)), lane_spec((n,)),
                      lane_spec((nh, m))],
            out_specs=[lane_spec((nh, m)), lane_spec((n,)),
                       pl.BlockSpec((tile,), lambda i: (i,)),
                       pl.BlockSpec((tile,), lambda i: (i,))],
            out_shape=[
                jax.ShapeDtypeStruct((nh, m, b), jnp.float32),
                jax.ShapeDtypeStruct((n, b), jnp.float32),
                jax.ShapeDtypeStruct((b,), jnp.float32),
                jax.ShapeDtypeStruct((b,), jnp.float32),
            ],
            interpret=interpret,
        )(jnp.broadcast_to(x0, (n, b)).astype(jnp.float32),
          x_terminal.astype(jnp.float32), u_init.astype(jnp.float32))

    solve_jit = jax.jit(solve)

    def solve_api(x0, x_terminal, u_init):
        return solve_jit(x0, x_terminal, u_init)

    solve_api.tile = tile
    solve_api.n = n
    solve_api.m = m
    solve_api.num_horizon = nh
    solve_api.max_iter = max_iter
    return solve_api
