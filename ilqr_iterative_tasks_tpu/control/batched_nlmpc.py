"""Fully-jitted batched NLMPC lap simulation (vmapped scenarios).

NLMPC counterpart of control/batched.py: the complete learning run (seed ->
L laps of closed-loop constrained MPC with safe-set growth) as one compiled
program, vmappable over scenarios. Per control step it mirrors the host
controller (control/nlmpc.py, itself mirroring base.py:514-655) with the
spaceVarying safe-set option:

- L1-kNN around the terminal guess (base.py:548-555),
- one LM-shooting feasibility solve per candidate (ops/lm_shooting.py), warm
  started from the shifted previous solution,
- candidate cost N + Qfun if feasible else Inf (nonlinear_lmpc.py:197),
  lexicographic selection across laps (base.py:605) with ragged-list
  comparison semantics,
- terminal-guess advance to the successor safe-set point and warm-start
  shift with the chosen point's STORED input appended (base.py:619-639);
  all-infeasible steps freeze guess/warm advances and hold the previous
  input (base.py:605-611 — the reference pauses forever there).

Documented deviation from the host path (fixed-shape requirement): the
horizon never shrinks (base.py:640-654); laps end by goal proximity, which
in practice fires before a shrink would (validated in tests; the SoA
simulator's general path represents the shrink exactly).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ilqr_iterative_tasks_tpu.control.batched import (
    ScenarioSpec, lexicographic_argmin)
from ilqr_iterative_tasks_tpu.control.safe_set import DeviceSafeSet
from ilqr_iterative_tasks_tpu.models import kinetic_bicycle as dyn
from ilqr_iterative_tasks_tpu.ops.lm_shooting import lm_feasibility_solve
from ilqr_iterative_tasks_tpu.utils.params import LmpcParams, SystemLimits


class NlmpcRunResult(NamedTuple):
    lap_steps: jnp.ndarray
    lap_done: jnp.ndarray
    safe_set: DeviceSafeSet


@partial(jax.jit, static_argnames=("num_laps", "max_steps", "max_laps",
                                   "goal_append", "sim_step_budget",
                                   "max_lm_iters"))
def simulate_nlmpc_run(params: LmpcParams, limits: SystemLimits,
                       scenario: ScenarioSpec, seed_xs, seed_us, seed_len,
                       dt, *, num_laps: int, max_steps: int = 128,
                       max_laps: int = 16, goal_append: bool = False,
                       sim_step_budget: int = 121,
                       max_lm_iters: int = 60) -> NlmpcRunResult:
    """One scenario's NLMPC learning run; vmap for batches."""
    n = params.num_horizon
    k = params.num_ss_points
    nsi = params.num_ss_iter
    dtype = seed_xs.dtype
    dt = jnp.asarray(dt, dtype)
    goal_tol = 0.8

    ss0 = DeviceSafeSet.empty(max_laps, max_steps, dtype=dtype)
    ss0 = ss0.add_lap(seed_xs, seed_us, seed_len)

    def solve_step(ss: DeviceSafeSet, x, x_term_guess, u_warm, obstacle):
        """Returns (u (2,), feasible_any, new terminal guess, new u_warm)."""
        it = ss.num_laps
        rows_cost, rows_cmp, rows_us, rows_idx, rows_lap, rows_ok = (
            [], [], [], [], [], [])
        for off in range(nsi):
            lap_id = it - nsi + off
            lap_ok = lap_id >= 0
            lap_id_c = jnp.clip(lap_id, 0, max_laps - 1)
            idx, x_terms, q_terms = ss.knn(lap_id_c, x_term_guess, k)
            sols = jax.vmap(lambda xt: lm_feasibility_solve(
                limits, obstacle, x, xt, u_warm, dt, num_horizon=n,
                max_iters=max_lm_iters))(x_terms)
            cost = jnp.where(sols.feasible & lap_ok,
                             float(n) + q_terms, jnp.inf)
            # ragged list-min comparison row (base.py:605): overflow slots
            # (k > lap length, q poisoned +inf by knn) are absent from the
            # reference's list — rank them -inf so a strict-prefix list
            # beats its extension (see control/batched.py one_pass)
            rows_cmp.append(jnp.where(jnp.isfinite(q_terms), cost,
                                      -jnp.inf))
            rows_cost.append(cost)
            rows_us.append(sols.us)  # (K, N, 2)
            rows_idx.append(idx)
            rows_lap.append(lap_id_c)
            rows_ok.append(lap_ok)
        cost_rows = jnp.stack(rows_cost)  # (L, K)
        row_valid = jnp.stack([jnp.asarray(v) for v in rows_ok])
        best_row = lexicographic_argmin(jnp.stack(rows_cmp), row_valid)
        best_col = jnp.argmin(cost_rows[best_row])
        us_sel = jnp.stack(rows_us)[best_row, best_col]  # (N, 2)
        idx_sel = jnp.stack(rows_idx)[best_row, best_col]
        lap_sel = jnp.stack(rows_lap)[best_row]
        feasible_any = jnp.isfinite(cost_rows[best_row, best_col])
        # terminal guess -> successor safe-set point (base.py:621-622);
        # fall back to the chosen point when it is the lap's last state
        nxt = jnp.clip(idx_sel + 1, 0, ss.lap_len[lap_sel] - 1)
        new_guess = ss.states[lap_sel, nxt]
        # faithful warm-start shift (base.py:630-639): append the CHOSEN
        # point's STORED input when a successor exists, else repeat the last
        # predicted input (the shrink branch — represented exactly only in
        # the SoA simulator, batched_nlmpc_soa._advance_tail)
        succ = (idx_sel + 1) <= (ss.lap_len[lap_sel] - 1)
        u_app = ss.inputs[lap_sel, idx_sel]  # (2,)
        u_last = jnp.where(succ, u_app, us_sel[-1])
        u_warm_new = jnp.concatenate([us_sel[1:], u_last[None]], axis=0)
        # all-infeasible: freeze guess/warm advances (base.py:605-611)
        new_guess = jnp.where(feasible_any, new_guess, x_term_guess)
        u_warm_new = jnp.where(feasible_any, u_warm_new, u_warm)
        return us_sel[0], feasible_any, new_guess, u_warm_new

    def run_lap(ss, key, x_term_guess0, u_warm0):
        def cond(c):
            x, t, done, *_ = c
            return (t < sim_step_budget) & ~done

        def body(c):
            (x, t, done, obstacle, guess, u_warm, u_prev, xs_rec, us_rec,
             key) = c
            u, feas, guess_new, u_warm_new = solve_step(
                ss, x, guess, u_warm, obstacle)
            u = jnp.where(feas, u, u_prev)  # hold input when all-infeasible
            us_rec = us_rec.at[t].set(u)
            x_next = dyn.step(x, u, dt)
            key, k1, k2 = jax.random.split(key, 3)
            noise_v = jnp.clip(jax.random.normal(k1, dtype=dtype) * 0.01,
                               -0.05, 0.05)
            noise_th = jnp.clip(jax.random.normal(k2, dtype=dtype) * 0.005,
                                -0.05, 0.05)
            x_next = x_next.at[2].add(0.5 * noise_v * scenario.noise_on)
            x_next = x_next.at[3].add(0.5 * noise_th * scenario.noise_on)
            obstacle = obstacle.advance(dt)
            t1 = t + 1
            xs_rec = xs_rec.at[t1].set(x_next)
            done1 = jnp.linalg.norm(x_next - scenario.goal) <= goal_tol
            return (x_next, t1, done1, obstacle, guess_new, u_warm_new, u,
                    xs_rec, us_rec, key)

        xs_rec = jnp.zeros((max_steps, 4), dtype).at[0].set(scenario.x0)
        us_rec = jnp.zeros((max_steps, 2), dtype)
        init = (scenario.x0, jnp.asarray(0), jnp.asarray(False),
                scenario.obstacle, x_term_guess0, u_warm0,
                jnp.zeros((2,), dtype), xs_rec, us_rec, key)
        (x, t, done, _obs, guess, u_warm, _up, xs_rec, us_rec, key) = (
            jax.lax.while_loop(cond, body, init))
        return xs_rec, us_rec, t, done, key

    def lap_loop(lap_i, carry):
        ss, key, lap_steps, lap_done = carry
        # per-lap warm start from the newest lap (base.py:661-675)
        newest = ss.num_laps - 1
        guess0 = ss.states[newest, n]
        u_warm0 = ss.inputs[newest, :n]
        xs_rec, us_rec, t, done, key = run_lap(ss, key, guess0, u_warm0)
        if goal_append:
            pos = t + 1
            n_valid = t + 2
        else:
            pos = t
            n_valid = t + 1
        onehot = jnp.arange(max_steps) == pos
        xs_rec = jnp.where(onehot[:, None], scenario.goal[None, :], xs_rec)
        ss = ss.add_lap(xs_rec, us_rec, n_valid)
        return (ss, key, lap_steps.at[lap_i].set(t),
                lap_done.at[lap_i].set(done))

    init = (ss0, scenario.noise_key, jnp.zeros((num_laps,), jnp.int32),
            jnp.zeros((num_laps,), bool))
    ss, key, lap_steps, lap_done = jax.lax.fori_loop(0, num_laps, lap_loop,
                                                     init)
    return NlmpcRunResult(lap_steps=lap_steps, lap_done=lap_done, safe_set=ss)


def simulate_nlmpc_batch(params, limits, scenarios: ScenarioSpec, seed_xs,
                         seed_us, seed_len, dt, **kw) -> NlmpcRunResult:
    fn = lambda sc: simulate_nlmpc_run(params, limits, sc, seed_xs, seed_us,
                                       seed_len, dt, **kw)
    return jax.vmap(fn)(scenarios)
