"""Batch-native (structure-of-arrays) NLMPC learning simulator — the
production throughput path for the constrained-MPC controller family on TPU.

Same closed-loop semantics as control/batched_nlmpc.py (which documents the
parity map against /root/reference/iterative_ilqr/utils/base.py:514-655 and
control/nonlinear_lmpc.py:6-214), but the scenario batch B is an explicit
TRAILING axis of every tensor instead of a vmapped leading axis, and every
candidate NLP is solved by ops/lm_shooting_soa.py (batch-trailing scalarized
LM shooting) instead of vmapped jacfwd + LU. The layout rationale is the same
as control/batched_soa.py: the batch must ride the TPU lane dimension.

Batch-relevant semantics (as in the AoS version):
- spaceVarying safe-set option: L1-kNN around the per-lane terminal guess
  (base.py:548-555).
- candidate cost N + Qfun if feasible else Inf (nonlinear_lmpc.py:197),
  lexicographic selection across safe-set iterations (base.py:605).
- terminal-guess advance to the successor safe-set point + warm-start shift
  (base.py:619-639); an all-infeasible step holds the previous input.
- no horizon shrink (base.py:640-654): laps end by goal proximity, which
  fires before a shrink would (validated against the host controller).
- all B scenarios run in lockstep with done-freezing, lap counting global.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ilqr_iterative_tasks_tpu.control.batched_soa import (
    SoaScenarios, _lex_argmin_rows, _stable_partition, _step_solver_inputs,
    _topk_select)
from ilqr_iterative_tasks_tpu.ops.ilqr_soa import step_soa
from ilqr_iterative_tasks_tpu.ops.lm_shooting_soa import (
    lm_feasibility_solve_soa)
from ilqr_iterative_tasks_tpu.utils.params import LmpcParams, SystemLimits


class NlmpcSoaRunResult(NamedTuple):
    lap_steps: jnp.ndarray  # (num_laps, B)
    lap_done: jnp.ndarray  # (num_laps, B)
    final_x: jnp.ndarray  # (4, B)
    # checkpoint state (see control/batched_soa.py / utils/checkpoint.py):
    # pass (safe_set, lap_count, final_key) back via ``resume_from``
    safe_set: tuple = ()  # (states, inputs, qfun, valid, lap_len)
    lap_count: jnp.ndarray = None
    final_key: jnp.ndarray = None


@partial(jax.jit, static_argnames=("num_laps", "max_steps", "max_laps",
                                   "goal_append", "sim_step_budget",
                                   "max_lm_iters", "pallas_solver",
                                   "pallas_step_solver"))
def simulate_nlmpc_runs_soa(params: LmpcParams, limits: SystemLimits,
                            scenarios: SoaScenarios, seed_xs, seed_us,
                            seed_len, dt, key, *, num_laps: int,
                            max_steps: int = 128, max_laps: int = 16,
                            goal_append: bool = False,
                            sim_step_budget: int = 121,
                            max_lm_iters: int = 60,
                            pallas_solver=None,
                            pallas_step_solver=None,
                            resume_from=None) -> NlmpcSoaRunResult:
    """Seed + ``num_laps`` NLMPC learning laps for B scenarios, batch-trailing.

    seed_xs: (max_steps, 4) shared seed lap (padded); seed_us: (max_steps, 2);
    seed_len: scalar count of seed states. ``pallas_solver``: optional fused
    kernel from ops.pallas_lm_shooting.build_fused_lm_shooting (build with the
    SAME limits/dt/horizon and matching max_iters); k*B must be a multiple of
    its tile size. Static arg: a new factory function triggers a retrace.
    """
    n = params.num_horizon
    k = params.num_ss_points
    nsi = params.num_ss_iter
    dtype = seed_xs.dtype
    b = scenarios.x0.shape[-1]
    dt = jnp.asarray(dt, dtype)
    goal_tol = 0.8
    if pallas_solver is not None:
        built = getattr(pallas_solver, "max_iters", max_lm_iters)
        if built != max_lm_iters:
            raise ValueError(
                f"pallas_solver was built with max_iters={built}; the "
                f"simulator's lockstep cap is max_lm_iters={max_lm_iters}")
    if pallas_step_solver is not None:
        if pallas_solver is not None:
            raise ValueError("pallas_step_solver replaces pallas_solver — "
                             "pass only one backend")
        s = pallas_step_solver
        if (s.k != k or s.nsi != nsi or s.num_horizon != n
                or s.max_steps != max_steps or s.max_laps != max_laps):
            raise ValueError(
                "pallas_step_solver was built for (k, nsi, n, max_steps, "
                f"max_laps)=({s.k}, {s.nsi}, {s.num_horizon}, {s.max_steps}, "
                f"{s.max_laps}); the simulator was called with "
                f"({k}, {nsi}, {n}, {max_steps}, {max_laps})")
        # the LM iteration cap is baked into the kernel at build time; a
        # builder/simulator mismatch would diverge silently (cap 12 is the
        # behavior knee — docs/PERF.md cap ladder)
        if s.max_iters != max_lm_iters:
            raise ValueError(
                f"pallas_step_solver was built with max_iters={s.max_iters}; "
                f"the simulator's lockstep cap is max_lm_iters={max_lm_iters}")
    # record scatters write row t_next == sim_step_budget on the final step
    # of a budget-exhausted lane, and goal_append one row past that — require
    # room so no scatter ever goes out of bounds
    if max_steps < sim_step_budget + (2 if goal_append else 1):
        raise ValueError(
            f"max_steps={max_steps} too small for sim_step_budget="
            f"{sim_step_budget} (+{2 if goal_append else 1} recorded rows)")

    # ---- safe set, batch-trailing (states + inputs for warm starts) ----
    ss_states = jnp.zeros((max_laps, max_steps, 4, b), dtype)
    ss_inputs = jnp.zeros((max_laps, max_steps, 2, b), dtype)
    ss_qfun = jnp.zeros((max_laps, max_steps, b), dtype)
    ss_valid = jnp.zeros((max_laps, max_steps, b), dtype=bool)
    ss_lap_len = jnp.zeros((max_laps, b), jnp.int32)

    t_idx = jnp.arange(max_steps)

    def add_lap(ss, slot, xs_rec, us_rec, n_valid):
        states, inputs, qfun, valid, lap_len = ss
        valid_row = t_idx[:, None] < n_valid[None, :]
        qfun_row = jnp.maximum(
            n_valid[None, :].astype(dtype) - 1.0
            - t_idx[:, None].astype(dtype), 0.0)
        return (states.at[slot].set(xs_rec),
                inputs.at[slot].set(us_rec),
                qfun.at[slot].set(qfun_row),
                valid.at[slot].set(valid_row),
                lap_len.at[slot].set(n_valid.astype(jnp.int32)))

    if resume_from is None:
        seed_rec = jnp.broadcast_to(seed_xs[:, :, None], (max_steps, 4, b))
        seed_urec = jnp.broadcast_to(seed_us[:, :, None], (max_steps, 2, b))
        ss0 = add_lap((ss_states, ss_inputs, ss_qfun, ss_valid, ss_lap_len),
                      0, seed_rec, seed_urec,
                      jnp.full((b,), seed_len, jnp.int32))
        lap0 = jnp.asarray(1, jnp.int32)
    else:
        ss0, lap0, key = resume_from
        lap0 = jnp.asarray(lap0, jnp.int32)

    use_skip = (pallas_solver is not None
                and getattr(pallas_solver, "with_skip", False))

    def solve_step(ss, lap_count, x, guess, u_warm, obstacle, inactive=None):
        """One NLMPC calc_input for all B lanes.

        x, guess: (4, B); u_warm: (N, 2, B). Returns
        (u (2, B), feasible_any (B,), new_guess (4, B), u_warm_new).

        ``inactive``: (B,) bool — finished lanes whose result the caller
        discards. With a ``with_skip`` fused kernel, actives are stably
        compacted to the batch front and inactive lanes enter the kernel
        pre-done, so whole tiles past the active count exit at iteration
        zero (bitwise-neutral for active lanes — see batched_soa.solve_step).
        """
        states, inputs, qfun, valid, lap_len = ss
        if pallas_step_solver is not None:
            # fused whole-step kernel (ops/pallas_nlmpc_step.py): kNN on the
            # terminal guess, nsi*k LM feasibility solves, lexicographic
            # selection and the successor-guess advance all in-kernel.
            from ilqr_iterative_tasks_tpu.ops.pallas_lm_shooting import (
                obstacle_to_lanes_nlmpc)
            obs_l = obstacle_to_lanes_nlmpc(obstacle, b)
            lap_ids, lap_ok, skip = _step_solver_inputs(
                lap_count, nsi, max_laps, inactive, b)
            us_sel, feas_f, new_guess = pallas_step_solver(
                x, guess, u_warm, states, qfun, lap_len, lap_ids, lap_ok,
                obs_l, skip)
            u_warm_new = jnp.concatenate([us_sel[1:], us_sel[-1:]], axis=0)
            return us_sel[0], feas_f > 0.5, new_guess, u_warm_new

        rows_cost, rows_us, rows_idx, rows_lap = [], [], [], []
        x0b = jnp.broadcast_to(x[:, None, :], (4, k, b))
        u_warm_kb = jnp.broadcast_to(u_warm[:, :, None, :], (n, 2, k, b))
        if use_skip and inactive is not None:
            lane_dst, lane_src, n_act = _stable_partition(inactive)
            skip_sorted = (jnp.arange(b) >= n_act).astype(jnp.float32)
            skip_kb = jnp.broadcast_to(skip_sorted[None, :],
                                       (k, b)).reshape(k * b)
            x0b_p = jnp.broadcast_to(
                jnp.take(x, lane_src, axis=-1)[:, None, :], (4, k, b))
            u_warm_p = jnp.broadcast_to(
                jnp.take(u_warm, lane_src, axis=-1)[:, :, None, :],
                (n, 2, k, b))
        else:
            lane_dst = lane_src = None
        for off in range(nsi):
            lap_id = lap_count - nsi + off
            lap_ok = lap_id >= 0
            lap_id_c = jnp.clip(lap_id, 0, max_laps - 1)
            st = states[lap_id_c]  # (T, 4, B)
            dist = (jnp.abs(st[:, 0] - guess[0][None])
                    + jnp.abs(st[:, 1] - guess[1][None])
                    + jnp.abs(st[:, 2] - guess[2][None])
                    + jnp.abs(st[:, 3] - guess[3][None]))  # (T, B)
            dist = jnp.where(valid[lap_id_c], dist, jnp.inf)
            # kNN + candidate extraction in one gather-free sweep (element
            # gathers run on the TPU scalar core — see batched_soa); overflow
            # candidates when k exceeds the stored lap length carry dval=inf
            idx_kb_sel, dval, (x0s, x1s, x2s, x3s, q_terms) = _topk_select(
                dist, k, [st[:, 0], st[:, 1], st[:, 2], st[:, 3],
                          qfun[lap_id_c]])
            cand_ok = jnp.isfinite(dval)  # (K, B)
            x_terms = jnp.stack([x0s, x1s, x2s, x3s])  # (4, K, B)
            if pallas_solver is not None:
                from ilqr_iterative_tasks_tpu.ops.pallas_lm_shooting import (
                    obstacle_to_lanes_nlmpc)
                obs_l = obstacle_to_lanes_nlmpc(obstacle, b)  # (7, B)
                if lane_src is not None:
                    xt_p = jnp.take(x_terms, lane_src, axis=-1)
                    obs_p = jnp.take(obs_l, lane_src, axis=-1)
                    obs_kb_p = jnp.broadcast_to(
                        obs_p[:, None, :], (7, k, b)).reshape(7, k * b)
                    us_f, _xl, _te, fe_f = pallas_solver(
                        x0b_p.reshape(4, k * b), xt_p.reshape(4, k * b),
                        u_warm_p.reshape(n, 2, k * b), obs_kb_p, skip_kb)
                    sol_us = jnp.take(us_f.reshape(n, 2, k, b), lane_dst,
                                      axis=-1)
                    feasible = jnp.take(fe_f.reshape(k, b), lane_dst,
                                        axis=-1) > 0.5
                else:
                    obs_kb = jnp.broadcast_to(
                        obs_l[:, None, :], (7, k, b)).reshape(7, k * b)
                    us_f, _xl, _te, fe_f = pallas_solver(
                        x0b.reshape(4, k * b), x_terms.reshape(4, k * b),
                        u_warm_kb.reshape(n, 2, k * b), obs_kb)
                    sol_us = us_f.reshape(n, 2, k, b)
                    feasible = fe_f.reshape(k, b) > 0.5
            else:
                sol = lm_feasibility_solve_soa(
                    limits, obstacle, x0b, x_terms, u_warm_kb, dt,
                    num_horizon=n, max_iters=max_lm_iters)
                sol_us = sol.us
                feasible = sol.feasible
            cost = jnp.where(feasible & cand_ok & lap_ok,
                             float(n) + q_terms, jnp.inf)
            rows_cost.append(cost)
            rows_us.append(sol_us)  # (N, 2, K, B)
            rows_idx.append(idx_kb_sel)  # (K, B)
            rows_lap.append(jnp.full((b,), lap_id_c, jnp.int32))
        cost_rows = jnp.stack(rows_cost)  # (L, K, B)
        best_row = _lex_argmin_rows(cost_rows)  # (B,)
        row_cost = jnp.take_along_axis(
            cost_rows, best_row[None, None, :].astype(jnp.int32), axis=0)[0]
        best_col = jnp.argmin(row_cost, axis=0)  # (B,)

        def pick(stacked):
            r = jnp.take_along_axis(
                stacked,
                best_row.reshape((1,) * (stacked.ndim - 1) + (b,)).astype(
                    jnp.int32), axis=0)[0]  # (..., K, B)
            return jnp.take_along_axis(
                r, best_col.reshape((1,) * (r.ndim - 2) + (1, b)).astype(
                    jnp.int32), axis=-2)[..., 0, :]

        us_sel = pick(jnp.stack(rows_us))  # (N, 2, B)
        idx_sel = pick(jnp.stack(rows_idx))  # (B,)
        lap_sel = jnp.take_along_axis(
            jnp.stack(rows_lap), best_row[None, :].astype(jnp.int32),
            axis=0)[0]  # (B,)
        feasible_any = jnp.isfinite(
            jnp.take_along_axis(row_cost, best_col[None, :], axis=0)[0])
        # terminal guess -> successor safe-set point (base.py:621-622)
        chosen_len = jnp.take_along_axis(lap_len, lap_sel[None, :], axis=0)[0]
        nxt = jnp.clip(idx_sel + 1, 0, chosen_len - 1)  # (B,)
        st_sel = jnp.take_along_axis(
            states, lap_sel[None, None, None, :].astype(jnp.int32),
            axis=0)[0]  # (T, 4, B)
        new_guess = jnp.take_along_axis(
            st_sel, nxt[None, None, :].astype(jnp.int32), axis=0)[0]  # (4, B)
        # warm start: shift the chosen solution, repeat its last input
        u_warm_new = jnp.concatenate([us_sel[1:], us_sel[-1:]], axis=0)
        return us_sel[0], feasible_any, new_guess, u_warm_new

    def run_lap(ss, lap_count, guess0, u_warm0, key):
        def step_cond(c):
            x, t, done, *_ = c
            return jnp.any((t < sim_step_budget) & ~done)

        def step_body(c):
            (x, t, done, obstacle, guess, u_warm, u_prev, xs_rec, us_rec,
             key) = c
            u_solve, feas, guess_new, u_warm_new = solve_step(
                ss, lap_count, x, guess, u_warm, obstacle, inactive=done)
            u = jnp.where(feas[None, :], u_solve, u_prev)
            x_next = jnp.stack(step_soa(tuple(x[i] for i in range(4)),
                                        (u[0], u[1]), dt))
            key, k1, k2 = jax.random.split(key, 3)
            noise_v = jnp.clip(jax.random.normal(k1, (b,), dtype) * 0.01,
                               -0.05, 0.05)
            noise_th = jnp.clip(jax.random.normal(k2, (b,), dtype) * 0.005,
                                -0.05, 0.05)
            x_next = x_next.at[2].add(0.5 * noise_v * scenarios.noise_on)
            x_next = x_next.at[3].add(0.5 * noise_th * scenarios.noise_on)
            obstacle_next = obstacle.advance(dt)
            # freeze finished lanes
            x_next = jnp.where(done[None, :], x, x_next)
            obstacle_next = jax.tree_util.tree_map(
                lambda a, bo: jnp.where(done, a, bo), obstacle, obstacle_next)
            t_next = jnp.where(done, t, t + 1)
            guess_next = jnp.where(done[None, :], guess, guess_new)
            u_warm_next = jnp.where(done[None, None, :], u_warm, u_warm_new)
            u_prev_next = jnp.where(done[None, :], u_prev, u)
            # record writes via (T, ·, B) onehot-selects: a per-lane scatter
            # looks cheaper on paper (T/1 less traffic) but lowers to the TPU
            # scalar core at ~80 ns/row — measured 5.4 ms/step at B=64k vs
            # ~0.4 ms for the full-tensor select on the VPU. Done lanes: row
            # t of us_rec was never written (stays 0) so the value is masked
            # to 0; row t_next(=t) of xs_rec already holds the frozen x, so
            # the rewrite is a no-op. In-bounds by the max_steps entry check.
            onehot_t = t_idx[:, None] == t[None, :]  # (T, B)
            us_rec = jnp.where(onehot_t[:, None, :],
                               jnp.where(done[None, :], 0.0, u)[None],
                               us_rec)
            onehot_tn = t_idx[:, None] == t_next[None, :]
            xs_rec = jnp.where(onehot_tn[:, None, :], x_next[None], xs_rec)
            reach = jnp.sqrt(sum((x_next[i] - scenarios.goal[i]) ** 2
                                 for i in range(4))) <= goal_tol
            done_next = done | ((~done) & reach)
            return (x_next, t_next, done_next, obstacle_next, guess_next,
                    u_warm_next, u_prev_next, xs_rec, us_rec, key)

        xs_rec = jnp.zeros((max_steps, 4, b), dtype).at[0].set(scenarios.x0)
        us_rec = jnp.zeros((max_steps, 2, b), dtype)
        init = (scenarios.x0, jnp.zeros((b,), jnp.int32),
                jnp.zeros((b,), bool), scenarios.obstacle, guess0, u_warm0,
                jnp.zeros((2, b), dtype), xs_rec, us_rec, key)
        (x, t, done, _obs, _g, _uw, _up, xs_rec, us_rec, key) = (
            jax.lax.while_loop(step_cond, step_body, init))
        return xs_rec, us_rec, t, done, x, key

    def _set_goal(xs_rec, pos, goal):
        onehot = (t_idx[:, None] == pos[None, :])
        return jnp.where(onehot[:, None, :], goal[None, :, :], xs_rec)

    def lap_loop(lap_i, carry):
        ss, key, lap_steps, lap_done, final_x = carry
        lap_count = lap_i + lap0  # laps stored so far (seed + learned)
        newest = lap_count - 1
        # per-lap warm start from the newest lap (base.py:661-675)
        st_new = jnp.take(ss[0], newest, axis=0)  # (T, 4, B)
        in_new = jnp.take(ss[1], newest, axis=0)  # (T, 2, B)
        guess0 = st_new[n]  # (4, B)
        u_warm0 = in_new[:n]  # (N, 2, B)
        xs_rec, us_rec, t, done, x_fin, key = run_lap(ss, lap_count, guess0,
                                                      u_warm0, key)
        if goal_append:
            pos, n_valid = t + 1, t + 2
        else:
            pos, n_valid = t, t + 1
        xs_rec = _set_goal(xs_rec, pos, scenarios.goal)
        ss = add_lap(ss, lap_count, xs_rec, us_rec, n_valid)
        return (ss, key, lap_steps.at[lap_i].set(t),
                lap_done.at[lap_i].set(done), x_fin)

    init = (ss0, key, jnp.zeros((num_laps, b), jnp.int32),
            jnp.zeros((num_laps, b), bool), scenarios.x0)
    ss, key, lap_steps, lap_done, final_x = jax.lax.fori_loop(
        0, num_laps, lap_loop, init)
    return NlmpcSoaRunResult(lap_steps=lap_steps, lap_done=lap_done,
                             final_x=final_x, safe_set=ss,
                             lap_count=lap0 + num_laps, final_key=key)
