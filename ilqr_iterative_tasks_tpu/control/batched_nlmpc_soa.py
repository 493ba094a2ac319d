"""Batch-native (structure-of-arrays) NLMPC learning simulator — the
production throughput path for the constrained-MPC controller family on TPU.

Same closed-loop semantics as control/batched_nlmpc.py (which documents the
parity map against /root/reference/iterative_ilqr/utils/base.py:514-655 and
control/nonlinear_lmpc.py:6-214), but the scenario batch B is an explicit
TRAILING axis of every tensor instead of a vmapped leading axis, and every
candidate NLP is solved by ops/lm_shooting_soa.py (batch-trailing scalarized
LM shooting) or its fused Pallas kernels. The layout rationale is the same
as control/batched_soa.py: the batch must ride the TPU lane dimension.

EXACT reference semantics on every route (since round 4 — the former fast
path's two ±1-step shortcuts are retired):
- candidate cost = current_horizon + Qfun if feasible else Inf
  (nonlinear_lmpc.py:197), lexicographic selection across safe-set lap rows
  (base.py:605) with ragged Python-list comparison semantics (absent slots
  rank -inf in a comparison-only tensor);
- warm start = shifted winner solution with the CHOSEN point's STORED input
  appended at slot horizon-1 when a successor exists (base.py:630-639);
- PER-LANE SHRINKING HORIZONS: selecting a lap's final point decrements the
  lane's horizon (base.py:640-654) — the host controller does this ~5 times
  at the END OF EVERY LAP, so it is core behavior, not a corner case. The
  horizon-m NLP is solved exactly at the traced full horizon via the
  ``m_lanes`` row/column masking of ops/lm_shooting_soa.py (bitwise equal
  to a reduced-horizon solve; same masking in the Pallas kernels via
  ops/_pallas_nlmpc_core ``mm``), with the horizon-1 pure reach check of
  nonlinear_lmpc.py:199-213 at the floor;
- an all-infeasible step freezes guess/warm/horizon advances and holds the
  previous input (the reference raises before any bookkeeping,
  base.py:605-611).
Validated EXACT against the host controller at f64 zero-noise for every
safe-set mode (tests/test_batched_nlmpc_soa.py).

All three reference safe-set options are supported (base.py:569-571
selection dispatch), resolved statically from the params struct:
- ``ss_option="spaceVarying"`` (default): L1-kNN around the per-lane
  terminal guess (base.py:548-555);
- ``ss_option="timeVarying"``: advancing per-lap index windows
  (base.py:537-546): window base = lap_cost - min_cost + N at lap start
  (base.py:679-690), advanced one index per control step, validity
  0 < idx < lap_len, falling back to the lap's last point when the window
  passes the end;
- ``all_ss_point=True``: every stored point of each lap is a candidate
  (base.py:569-571); ``all_ss_iter=True`` widens the lap window to every
  stored lap (base.py:564-567).

Batch semantics: all B scenarios run in lockstep with done-freezing; lap
counting is global; plant noise is iid per lane per step.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ilqr_iterative_tasks_tpu.control.batched_soa import (
    SoaScenarios, _lex_argmin_rows, _permute_lanes, _stable_partition,
    _step_solver_inputs, _take_lanes, _topk_select, _unpermute_idx)
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
    # (recovered (L, B), terminal (L, B)) all-infeasible streak maxima,
    # present only under with_streak_stats=True (see infeasible_retire)
    streaks: tuple = ()
    # (useful (B,), executed (B,)) summed LM trip counters, present only
    # when the step solver was built with with_stats=True — the
    # straggler-waste accounting of docs/PERF.md (same convention as
    # SoaRunResult.iter_stats)
    iter_stats: tuple = ()


@partial(jax.jit, static_argnames=("num_laps", "max_steps", "max_laps",
                                   "goal_append", "sim_step_budget",
                                   "max_lm_iters", "pallas_solver",
                                   "pallas_step_solver",
                                   "infeasible_retire",
                                   "with_streak_stats", "retile_frac",
                                   "tail_shrink"))
def simulate_nlmpc_runs_soa(params: LmpcParams, limits: SystemLimits,
                            scenarios: SoaScenarios, seed_xs, seed_us,
                            seed_len, dt, key, *, num_laps: int,
                            max_steps: int = 128, max_laps: int = 16,
                            goal_append: bool = False,
                            sim_step_budget: int = 121,
                            max_lm_iters: int = 60,
                            pallas_solver=None,
                            pallas_step_solver=None,
                            infeasible_retire: int | None = None,
                            with_streak_stats: bool = False,
                            retile_frac: float | None = None,
                            tail_shrink: int | None = None,
                            resume_from=None) -> NlmpcSoaRunResult:
    """Seed + ``num_laps`` NLMPC learning laps for B scenarios, batch-trailing.

    seed_xs: (max_steps, 4) shared seed lap (padded); seed_us: (max_steps, 2);
    seed_len: scalar count of seed states.

    ``pallas_solver``: optional per-candidate fused kernel from
    ops.pallas_lm_shooting.build_fused_lm_shooting — MUST be built with
    ``with_skip=True, with_hzn=True`` and the same limits/dt/horizon and
    matching max_iters; it replaces the XLA candidate solves (phase 1) and
    the winner re-solve (phase 2), so big_k*B and B must be multiples of
    its tile. ``pallas_step_solver``: the whole-control-step fused kernel
    (ops.pallas_nlmpc_step.build_fused_nlmpc_step), which subsumes kNN,
    solves, selection and the guess advance per lane. Static args: a new
    factory function triggers a retrace.

    ``infeasible_retire=S``: retire a lane from the SOLVER after S
    consecutive all-infeasible steps (the plant keeps integrating the
    held-input creep and the goal check, so records/completion stay exact
    unless feasibility would have returned after >= S streak steps —
    envelope-gated, docs/PERF.md "The NLMPC noise tail"). Default None
    (exact). ``with_streak_stats``: populate ``result.streaks`` with per
    lane-lap (max recovered streak, terminal streak) — the measurement
    that sizes S. A step solver built with ``with_stats=True`` populates
    ``result.iter_stats`` (useful/executed LM trips per lane).

    ``retile_frac``: periodic straggler re-tiling — same semantics and
    bitwise guarantee as ``simulate_learning_runs_soa(retile_frac=...)``
    (control/batched_soa.py): whenever the solver-inactive (done | retired)
    count grew by >= f*B since the last permutation, ALL per-lane state is
    stably partitioned active-first so straggler lanes share kernel tiles.
    Outputs return in original lane order; results are BITWISE identical
    to retile off (tests/test_batched_nlmpc_soa.py).
    """
    n = params.num_horizon
    k = params.num_ss_points
    nsi = params.num_ss_iter
    dtype = seed_xs.dtype
    b = scenarios.x0.shape[-1]
    dt = jnp.asarray(dt, dtype)
    goal_tol = 0.8
    perm_on = (retile_frac is not None) or (tail_shrink is not None)
    if tail_shrink is not None:
        if tail_shrink >= b:
            raise ValueError(f"tail_shrink={tail_shrink} must be < batch {b}")
        if pallas_step_solver is not None and (
                tail_shrink % pallas_step_solver.tile != 0):
            raise ValueError(
                f"tail_shrink={tail_shrink} must be a multiple of the "
                f"step kernel tile {pallas_step_solver.tile}")
    # safe-set option dispatch (base.py:564-575): all_ss_point overrides
    # ss_option; all_ss_iter widens the lap window to every stored lap.
    # All are static struct fields, so each combination is its own trace.
    all_point = bool(params.all_ss_point)
    all_iter = bool(params.all_ss_iter)
    mode = "all" if all_point else str(params.ss_option)
    if mode not in ("all", "timeVarying", "spaceVarying"):
        raise ValueError(f"unknown ss_option {mode!r}")
    if pallas_solver is not None:
        built = getattr(pallas_solver, "max_iters", max_lm_iters)
        if built != max_lm_iters:
            raise ValueError(
                f"pallas_solver was built with max_iters={built}; the "
                f"simulator's lockstep cap is max_lm_iters={max_lm_iters}")
        if not (getattr(pallas_solver, "with_skip", False)
                and getattr(pallas_solver, "with_hzn", False)):
            raise ValueError(
                "pallas_solver must be built with with_skip=True and "
                "with_hzn=True (per-lane shrinking horizons are core "
                "reference behavior, base.py:640-654)")
    if pallas_step_solver is not None:
        if pallas_solver is not None:
            raise ValueError("pallas_step_solver replaces pallas_solver — "
                             "pass only one backend")
        s = pallas_step_solver
        if getattr(s, "mode", "spaceVarying") != mode or (
                all_iter and not getattr(s, "all_iter", False)):
            raise ValueError(
                f"pallas_step_solver was built for mode="
                f"{getattr(s, 'mode', 'spaceVarying')!r}; the simulator "
                f"was called with ss mode {mode!r} (all_ss_iter={all_iter})")
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
    kernel_stats = (pallas_step_solver is not None
                    and getattr(pallas_step_solver, "with_stats", False))
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

    def _lap_window(lap_count, off):
        """(lap_id_c, lap_ok) for safe-set row ``off`` under the lap-window
        mode: last-nsi (base.py:564-567) or every stored lap."""
        if all_iter:
            return jnp.asarray(off, jnp.int32), off < lap_count
        lap_id = lap_count - nsi + off
        return jnp.clip(lap_id, 0, max_laps - 1).astype(jnp.int32), lap_id >= 0

    n_offs = max_laps if all_iter else nsi

    def _advance_tail(us_w, u_app, new_guess0, succ, h1, hzn, feasible_any,
                      guess, u_warm):
        """Shared post-selection bookkeeping — reference base.py:619-654 +
        the all-infeasible freeze (:605-611). Used op-for-op by BOTH the XLA
        general path and the whole-step-kernel path, so the two stay
        bitwise-locked on everything outside the solves themselves.

        us_w: (n, 2, B) winner solution at the per-lane horizon m;
        u_app: (2, B) chosen point's stored input; new_guess0: (4, B)
        pre-freeze guess advance (successor point when succ, else the
        horizon-m prediction, xt for h1 lanes)."""
        u_sel = jnp.where(h1[None, :], u_warm[0], us_w[0])  # (2, B)
        # warm shift; branch A overwrites slot hzn-1 with the chosen point's
        # stored input (base.py:630-639). Slots >= hzn are never read at
        # horizons <= hzn (the horizon never grows within a lap).
        u_shift = jnp.concatenate([us_w[1:], us_w[-1:]], axis=0)
        pos = jnp.clip(hzn - 1, 0, n - 1)
        oh_pos = (jnp.arange(n, dtype=jnp.int32)[:, None]
                  == pos[None, :])  # (N, B)
        u_warm_a = jnp.where(oh_pos[:, None, :], u_app[None], u_shift)
        u_warm_new = jnp.where(succ[None, None, :], u_warm_a, u_shift)
        # horizon-1 floor without successor: the host keeps the warm vector
        # (the reference would decrement into an unrepresentable horizon-0
        # NLP — see control/nlmpc.py:216-224)
        u_warm_new = jnp.where((h1 & ~succ)[None, None, :], u_warm,
                               u_warm_new)
        hzn_next = jnp.where(succ, hzn, jnp.maximum(hzn - 1, 1))
        # all-infeasible: the host raises before any bookkeeping — freeze
        # every advance (the plant-side input hold lives in step_body)
        new_guess = jnp.where(feasible_any[None, :], new_guess0, guess)
        u_warm_new = jnp.where(feasible_any[None, None, :], u_warm_new,
                               u_warm)
        hzn_next = jnp.where(feasible_any, hzn_next, hzn)
        return u_sel, new_guess, u_warm_new, hzn_next

    def solve_step_general(ss, lap_count, x, guess, u_warm, t, hzn,
                           obstacle, inactive=None):
        """One NLMPC calc_input for all B lanes (any safe-set mode), with
        per-lane shrinking horizons. Returns
        (u (2,B), feasible_any (B,), new_guess (4,B), u_warm_new (n,2,B),
        hzn_next (B,)).

        Exactly faithful to the host controller (see module docstring).
        Candidate solves run on XLA (lm_feasibility_solve_soa) or, when
        ``pallas_solver`` is given, on the fused per-candidate kernel
        (with_skip+with_hzn). ``inactive`` lanes (done) enter the kernel
        pre-done; their outputs are discarded by the caller's done-masking.
        """
        states, inputs, qfun, valid, lap_len = ss
        m2 = jnp.clip(hzn, 2, n)  # solver horizon (h==1 lanes use the
        m_f = hzn.astype(dtype)   # reach check; their solve is discarded)
        h1 = hzn <= 1
        # horizon-1 reach state: one dynamics step from the first warm input
        x1 = jnp.stack(step_soa(tuple(x[i] for i in range(4)),
                                (u_warm[0, 0], u_warm[0, 1]), dt))  # (4, B)
        slot_ids = jnp.arange(max_laps)
        # min stored lap cost over ALL laps (base.py:683: min(iter_cost))
        min_cost = jnp.min(jnp.where(slot_ids[:, None] < lap_count,
                                     lap_len - 1, 1 << 30), axis=0)  # (B,)
        big_k = max_steps if mode == "all" else k
        if pallas_solver is not None:
            from ilqr_iterative_tasks_tpu.ops.pallas_lm_shooting import (
                obstacle_to_lanes_nlmpc)
            obs_l = obstacle_to_lanes_nlmpc(obstacle, b)  # (7, B)
            obs_kb = jnp.broadcast_to(
                obs_l[:, None, :], (7, big_k, b)).reshape(7, big_k * b)
            skip_b = (inactive.astype(jnp.float32) if inactive is not None
                      else jnp.zeros((b,), jnp.float32))
            # h1 lanes never consume a solve output (reach-check feasibility,
            # u_sel = u_warm[0], succ warm slot 0 = stored input, guess from
            # xt) — entering their solves pre-done is exact. Mirrors the
            # step kernel's solve_skip_f.
            skip_b = jnp.maximum(skip_b, h1.astype(jnp.float32))
            skip_kb = jnp.broadcast_to(skip_b[None, :],
                                       (big_k, b)).reshape(big_k * b)
            hzn_kb = jnp.broadcast_to(m2[None, :],
                                      (big_k, b)).reshape(big_k * b)

        rows_cost, rows_cmp, rows_idx = [], [], []
        for off in range(n_offs):
            lap_id_c, lap_ok = _lap_window(lap_count, off)
            st = states[lap_id_c]   # (T, 4, B)
            qf = qfun[lap_id_c]     # (T, B)
            vd = valid[lap_id_c]    # (T, B)
            ll = lap_len[lap_id_c]  # (B,)
            if mode == "all":
                # every stored point is a candidate (base.py:569-571)
                idx_kb = jnp.broadcast_to(t_idx[:, None],
                                          (max_steps, b)).astype(jnp.int32)
                struct = vd
                x_terms = jnp.moveaxis(st, 1, 0)  # (4, T, B)
                q_terms = qf
            elif mode == "timeVarying":
                # advancing window (base.py:537-546): base index at lap
                # start = lap_cost - min_cost + N (base.py:685-690), +1 per
                # control step (= +t), entries valid iff 0 < idx < lap_len,
                # falling back to [lap_len-1] when no entry is valid
                start = (ll - 1) - min_cost + n + t  # (B,) i32
                idx_js, ok_js = [], []
                any_v = None
                for j in range(big_k):
                    ij = start + j
                    vj = (ij > 0) & (ij < ll)
                    idx_js.append(ij)
                    ok_js.append(vj)
                    any_v = vj if any_v is None else (any_v | vj)
                idx_js[0] = jnp.where(any_v, idx_js[0], ll - 1)
                ok_js[0] = ok_js[0] | ~any_v
                xs_l, qs_l = [], []
                for j in range(big_k):
                    ij = jnp.clip(idx_js[j], 0, max_steps - 1)
                    # window indices can run past the stored rows; those
                    # slots carry struct=False and are never read
                    oh = (t_idx[:, None] == ij[None, :]) & ok_js[j][None, :]
                    xs_l.append(jnp.stack([
                        jnp.sum(jnp.where(oh, st[:, c], 0.0), axis=0)
                        for c in range(4)]))
                    qs_l.append(jnp.sum(jnp.where(oh, qf, 0.0), axis=0))
                idx_kb = jnp.stack([jnp.clip(i, 0, max_steps - 1)
                                    for i in idx_js]).astype(jnp.int32)
                struct = jnp.stack(ok_js)  # (K, B)
                x_terms = jnp.stack(xs_l, axis=1)  # (4, K, B)
                q_terms = jnp.stack(qs_l)  # (K, B)
            else:  # spaceVarying kNN (base.py:548-555)
                dist = (jnp.abs(st[:, 0] - guess[0][None])
                        + jnp.abs(st[:, 1] - guess[1][None])
                        + jnp.abs(st[:, 2] - guess[2][None])
                        + jnp.abs(st[:, 3] - guess[3][None]))
                dist = jnp.where(vd, dist, jnp.inf)
                idx_kb, dval, (x0s, x1s, x2s, x3s, qsel) = _topk_select(
                    dist, big_k, [st[:, 0], st[:, 1], st[:, 2], st[:, 3],
                                  qf])
                struct = jnp.isfinite(dval)
                x_terms = jnp.stack([x0s, x1s, x2s, x3s])
                q_terms = qsel

            # phase 1: candidate COSTS only (memory: the `all` regime would
            # need (L, N, 2, T, B) solution storage; the winner is re-solved
            # once after selection instead — same pure function, same result)
            x0b = jnp.broadcast_to(x[:, None, :], (4, big_k, b))
            u_b = jnp.broadcast_to(u_warm[:, :, None, :], (n, 2, big_k, b))
            m_b = jnp.broadcast_to(m2[None, :], (big_k, b))
            if pallas_solver is not None:
                _us, _xl, _te, fe_f = pallas_solver(
                    x0b.reshape(4, big_k * b), x_terms.reshape(4, big_k * b),
                    u_b.reshape(n, 2, big_k * b), obs_kb, skip_kb, hzn_kb)
                feasible = fe_f.reshape(big_k, b) > 0.5
            else:
                sol = lm_feasibility_solve_soa(
                    limits, obstacle, x0b, x_terms, u_b, dt, num_horizon=n,
                    max_iters=max_lm_iters, m_lanes=m_b)
                feasible = sol.feasible
            reach = jnp.sqrt(sum((x1[i][None, :] - x_terms[i]) ** 2
                                 for i in range(4))) <= 1e-3  # (K, B)
            feas = jnp.where(h1[None, :], reach, feasible)
            cost = jnp.where(feas & struct & lap_ok,
                             m_f[None, :] + q_terms, jnp.inf)
            # ragged Python-list comparison: absent tail slots rank BELOW
            # any present value (a strict-prefix list is the smaller one);
            # rows of non-existent laps rank above everything.
            # INVARIANT: this -inf padding is equivalent to Python list
            # comparison only because invalid slots are a per-lane SUFFIX of
            # each row — timeVarying starts at lap_cost - min_cost + N + t
            # >= N > 0 and invalidates only past the lap end; kNN/all modes
            # fill valid slots first. A mode with a leading or interior
            # invalid slot would rank its row below all others and silently
            # diverge; assert prefix-validity before reusing this emulation.
            cmp = jnp.where(lap_ok,
                            jnp.where(struct, cost, -jnp.inf), jnp.inf)
            rows_cost.append(cost)
            rows_cmp.append(cmp)
            rows_idx.append(idx_kb)

        cmp_rows = jnp.stack(rows_cmp)  # (L, K, B)
        best_row = _lex_argmin_rows(cmp_rows)  # (B,)
        cost_rows = jnp.stack(rows_cost)
        row_cost = jnp.take_along_axis(
            cost_rows, best_row[None, None, :].astype(jnp.int32), axis=0)[0]
        best_col = jnp.argmin(row_cost, axis=0)  # (B,)
        feasible_any = jnp.isfinite(
            jnp.take_along_axis(row_cost, best_col[None, :], axis=0)[0])

        def pick(stacked):
            r = jnp.take_along_axis(
                stacked,
                best_row.reshape((1,) * (stacked.ndim - 1) + (b,)).astype(
                    jnp.int32), axis=0)[0]
            return jnp.take_along_axis(
                r, best_col.reshape((1,) * (r.ndim - 2) + (1, b)).astype(
                    jnp.int32), axis=-2)[..., 0, :]

        idx_sel = pick(jnp.stack(rows_idx))  # (B,) i32

        # winner terminal state, its stored input (base.py:630-639), the
        # successor point (base.py:621-622), and the chosen lap's length —
        # re-extracted via one-hot row sums per lap row
        oh_w = t_idx[:, None] == jnp.clip(idx_sel, 0, max_steps - 1)[None, :]
        oh_s = t_idx[:, None] == jnp.clip(idx_sel + 1, 0,
                                          max_steps - 1)[None, :]
        xt_w = [jnp.zeros((b,), dtype) for _ in range(4)]
        x_succ = [jnp.zeros((b,), dtype) for _ in range(4)]
        u_app = [jnp.zeros((b,), dtype) for _ in range(2)]
        len_sel = jnp.zeros((b,), jnp.int32)
        for off in range(n_offs):
            lap_id_c, _ = _lap_window(lap_count, off)
            sel_off = best_row == off
            st = states[lap_id_c]
            inp = inputs[lap_id_c]
            for c in range(4):
                xt_w[c] = jnp.where(
                    sel_off,
                    jnp.sum(jnp.where(oh_w, st[:, c], 0.0), axis=0), xt_w[c])
                x_succ[c] = jnp.where(
                    sel_off,
                    jnp.sum(jnp.where(oh_s, st[:, c], 0.0), axis=0),
                    x_succ[c])
            for c in range(2):
                u_app[c] = jnp.where(
                    sel_off,
                    jnp.sum(jnp.where(oh_w, inp[:, c], 0.0), axis=0),
                    u_app[c])
            len_sel = jnp.where(sel_off, lap_len[lap_id_c], len_sel)

        # phase 2: one re-solve of the per-lane winner (pure function of
        # (x, winner terminal, warm start, m) — identical to its phase-1
        # solve; per-lane done-masking makes iterates lockstep-invariant)
        if pallas_solver is not None:
            us_w, xl_w, _te_w, _fe_w = pallas_solver(
                x, jnp.stack(xt_w), u_warm, obs_l,
                skip_b, m2)
            x_pred_m = [xl_w[i] for i in range(4)]
        else:
            sol_w = lm_feasibility_solve_soa(
                limits, obstacle, x, jnp.stack(xt_w), u_warm, dt,
                num_horizon=n, max_iters=max_lm_iters, m_lanes=m2)
            us_w = sol_w.us  # (n, 2, B)
            x_pred_m = [sol_w.xs[n, i] for i in range(4)]
            for kk in range(2, n):
                for i in range(4):
                    x_pred_m[i] = jnp.where(m2 == kk, sol_w.xs[kk, i],
                                            x_pred_m[i])
        # horizon-1 lanes: input = first warm entry, prediction = [x, xt]
        # (nonlinear_lmpc.py:199-213)
        x_pred_m = [jnp.where(h1, xt_w[i], x_pred_m[i]) for i in range(4)]

        succ = (idx_sel + 1) <= (len_sel - 1)
        new_guess0 = jnp.where(succ[None, :], jnp.stack(x_succ),
                               jnp.stack(x_pred_m))
        u_sel, new_guess, u_warm_new, hzn_next = _advance_tail(
            us_w, jnp.stack(u_app), new_guess0, succ, h1, hzn, feasible_any,
            guess, u_warm)
        return u_sel, feasible_any, new_guess, u_warm_new, hzn_next

    def solve_step_kernel(ss, lap_count, x, guess, u_warm, t, hzn, obstacle,
                          inactive=None, compacted=None):
        """Whole-step fused kernel route (ops/pallas_nlmpc_step.py):
        candidate enumeration (kNN or timeVarying window), m-masked
        candidate solves, h1 reach check, lexicographic selection and the
        pre-freeze guess advance all happen in-kernel; the winner identity
        comes back so this caller composes the EXACT bookkeeping via the
        same ``_advance_tail`` as the general path."""
        states, inputs, qfun, valid, lap_len = ss
        from ilqr_iterative_tasks_tpu.ops.pallas_lm_shooting import (
            obstacle_to_lanes_nlmpc)
        obs_l = obstacle_to_lanes_nlmpc(obstacle, b)
        if all_iter:
            # every stored lap is a window row (base.py:564-567)
            lap_ids = jnp.arange(max_laps, dtype=jnp.int32)
            lap_ok = (lap_ids < lap_count).astype(jnp.int32)
            skip = (inactive.astype(jnp.float32) if inactive is not None
                    else jnp.zeros((b,), jnp.float32))
        else:
            lap_ids, lap_ok, skip = _step_solver_inputs(
                lap_count, nsi, max_laps, inactive, b)
        extra = {}
        if mode == "timeVarying":
            slot_ids = jnp.arange(max_laps)
            min_cost = jnp.min(jnp.where(slot_ids[:, None] < lap_count,
                                         lap_len - 1, 1 << 30), axis=0)
            extra = dict(t=t, min_cost=min_cost)

        # Idle-step kernel skip (bitwise-neutral — see batched_soa.py):
        # once every lane is done | retired the kernel's outputs equal its
        # zero-init, so skip the launch (its cost is the 48-tile block-DMA
        # floor). Fires through the post-retire budget tail.
        def _run_kernel(xa):
            x_, g_, uw_, skip_, hzn_ = xa
            return tuple(pallas_step_solver(
                x_, g_, uw_, states, qfun, lap_len, lap_ids, lap_ok,
                obs_l, skip_, hzn_, **extra))

        def _idle(xa):
            z = (jnp.zeros((n, 2, b), jnp.float32),
                 jnp.zeros((b,), jnp.float32),
                 jnp.zeros((4, b), jnp.float32),
                 jnp.zeros((b,), jnp.int32),
                 jnp.zeros((b,), jnp.int32),
                 jnp.zeros((b,), jnp.float32))
            if kernel_stats:
                z = z + (jnp.zeros((b,), jnp.float32),) * 2
            return z

        if tail_shrink is not None:
            # tail prefix-shrink (round 5, bitwise — see batched_soa.py):
            # after compaction all not-done lanes sit in the first
            # tail_shrink columns, so the kernel runs on that prefix and
            # the padding equals the zeros skip lanes produce anyway
            _Bs = tail_shrink

            def _run_small(xa):
                x_, g_, uw_, skip_, hzn_ = xa
                ex = {kk: v[..., :_Bs] for kk, v in extra.items()}
                o = pallas_step_solver(
                    x_[:, :_Bs], g_[:, :_Bs], uw_[..., :_Bs],
                    states[..., :_Bs], qfun[..., :_Bs], lap_len[..., :_Bs],
                    lap_ids, lap_ok, obs_l[..., :_Bs], skip_[:_Bs],
                    hzn_[:_Bs], **ex)
                pads = _idle(xa)
                return tuple(jnp.concatenate([a, pz[..., _Bs:]], axis=-1)
                             for a, pz in zip(o, pads))

            def _run_active(xa):
                return jax.lax.cond(compacted > 0.5, _run_small,
                                    _run_kernel, xa)
        else:
            _run_active = _run_kernel
        out = jax.lax.cond(jnp.min(skip) < 0.5, _run_active, _idle,
                           (x, guess, u_warm, skip, hzn))
        (us_w, feas_f, new_guess0, idx_sel, row_sel, succ_f) = out[:6]
        it_stats = out[6:8] if kernel_stats else ()
        feas = feas_f > 0.5
        succ = succ_f > 0.5
        h1 = hzn <= 1
        # chosen point's stored input, one-hot row extraction per lap row
        # (identical math to the general path's u_app loop)
        oh_w = t_idx[:, None] == jnp.clip(idx_sel, 0, max_steps - 1)[None, :]
        u_app = [jnp.zeros((b,), dtype) for _ in range(2)]
        for off in range(lap_ids.shape[0]):
            inp = inputs[lap_ids[off]]  # (T, 2, B)
            sel_off = row_sel == off
            for c in range(2):
                u_app[c] = jnp.where(
                    sel_off,
                    jnp.sum(jnp.where(oh_w, inp[:, c], 0.0), axis=0),
                    u_app[c])
        u_sel, new_guess, u_warm_new, hzn_next = _advance_tail(
            us_w, jnp.stack(u_app), new_guess0, succ, h1, hzn, feas,
            guess, u_warm)
        return u_sel, feas, new_guess, u_warm_new, hzn_next, it_stats

    retile_block = (None if retile_frac is None
                    else max(1, int(round(retile_frac * b))))

    def run_lap(ss, lap_count, guess0, u_warm0, key, scen_p, orig_id,
                it_acc0):
        def step_cond(c):
            x, t, done, *_ = c
            return jnp.any((t < sim_step_budget) & ~done)

        def step_body(c):
            if perm_on:
                (x, t, done, obstacle, guess, u_warm, hzn, u_prev, xs_rec,
                 us_rec, streak, retired, rec_max, it_acc, key, ss_c,
                 scen_c, oid, skip_base, compacted) = c
                # periodic straggler re-tiling / tail compaction (see
                # simulate docstring and control/batched_soa.py): stably
                # partition ALL per-lane state active-first — on the retile
                # trigger and/or ONCE when the not-done count first fits
                # the tail_shrink prefix
                skipf = done | retired
                n_skip = jnp.sum(skipf.astype(jnp.int32)).astype(jnp.int32)
                if tail_shrink is not None:
                    n_notdone = jnp.sum((~done).astype(jnp.int32)).astype(
                        jnp.int32)
                    tail_cond = (compacted < 0.5) & (n_notdone <= tail_shrink)
                else:
                    tail_cond = jnp.asarray(False)
                if retile_frac is not None:
                    trigger = tail_cond | (
                        (n_skip - skip_base) >= retile_block)
                else:
                    trigger = tail_cond
                P = (x, t, done, obstacle, guess, u_warm, hzn, u_prev,
                     xs_rec, us_rec, streak, retired, rec_max, it_acc,
                     ss_c, scen_c, oid)

                def do_perm(args):
                    P_in, _sb = args
                    if tail_shrink is None:
                        _dst, src, _nf = _stable_partition(skipf)
                    else:
                        # 3-way stable order: solver-active, then retired
                        # (not done — still integrating and recording),
                        # then done (see batched_soa.py)
                        key3 = (skipf.astype(jnp.int32)
                                + done.astype(jnp.int32))
                        src = jnp.argsort(key3, stable=True).astype(
                            jnp.int32)
                    return _permute_lanes(P_in, src), n_skip

                P, skip_base = jax.lax.cond(
                    trigger, do_perm, lambda args: args, (P, skip_base))
                (x, t, done, obstacle, guess, u_warm, hzn, u_prev, xs_rec,
                 us_rec, streak, retired, rec_max, it_acc, ss_c, scen_c,
                 oid) = P
                if tail_shrink is not None:
                    compacted = jnp.maximum(
                        compacted, tail_cond.astype(jnp.float32))
            else:
                (x, t, done, obstacle, guess, u_warm, hzn, u_prev, xs_rec,
                 us_rec, streak, retired, rec_max, it_acc, key) = c
                ss_c, scen_c, oid, skip_base = ss, scenarios, None, None
                compacted = None
            # ``infeasible_retire``: during an all-infeasible streak the
            # applied input is u_prev and every solver-side state (guess,
            # u_warm, hzn) is frozen — the solves only matter as the binary
            # "did any candidate become feasible again". (The freeze is this
            # framework's documented sane-ification of the reference's
            # degenerate all-infeasible path: base.py:605-611 continues
            # after the failed ``pause`` and applies the FAILED solve's
            # first input — inf for horizon-1 lanes. See docs/PARITY.md.)
            # After S consecutive all-infeasible steps the lane
            # retires from the SOLVER ONLY: the plant keeps integrating
            # (the held-input creep and the goal-reach check are exact),
            # so the recorded lap, lap_steps and completion stay identical
            # UNLESS the lane would have regained feasibility after >= S
            # streak steps. NOT bitwise-safe — gated by the behavior
            # envelope (tests/test_behavior_envelope.py); default OFF.
            inact = done | retired
            if pallas_step_solver is not None:
                (u_solve, feas, guess_new, u_warm_new, hzn_new,
                 it_stats) = solve_step_kernel(ss_c, lap_count, x, guess,
                                               u_warm, t, hzn, obstacle,
                                               inactive=inact,
                                               compacted=compacted)
                if kernel_stats:
                    it_acc = (it_acc[0] + it_stats[0],
                              it_acc[1] + it_stats[1])
            else:
                (u_solve, feas, guess_new, u_warm_new,
                 hzn_new) = solve_step_general(ss_c, lap_count, x, guess,
                                               u_warm, t, hzn, obstacle,
                                               inactive=inact)
            # retired lanes: solver outputs are skip-lane garbage — hold
            # the all-infeasible freeze explicitly
            feas = feas & ~retired
            guess_new = jnp.where(retired[None, :], guess, guess_new)
            u_warm_new = jnp.where(retired[None, None, :], u_warm,
                                   u_warm_new)
            hzn_new = jnp.where(retired, hzn, hzn_new)
            streak_next = jnp.where(done, streak,
                                    jnp.where(feas, 0, streak + 1))
            if with_streak_stats:
                rec_max = jnp.where((~done) & feas & (streak > 0),
                                    jnp.maximum(rec_max, streak), rec_max)
            if infeasible_retire is not None:
                retired = retired | ((streak_next >= infeasible_retire)
                                     & ~done)
            u = jnp.where(feas[None, :], u_solve, u_prev)
            x_next = jnp.stack(step_soa(tuple(x[i] for i in range(4)),
                                        (u[0], u[1]), dt))
            key, k1, k2 = jax.random.split(key, 3)
            noise_v = jnp.clip(jax.random.normal(k1, (b,), dtype) * 0.01,
                               -0.05, 0.05)
            noise_th = jnp.clip(jax.random.normal(k2, (b,), dtype) * 0.005,
                                -0.05, 0.05)
            if perm_on:
                # draws are positional in the ORIGINAL lane order; route
                # them to the permuted lanes (bitwise vs retile off)
                nz = _take_lanes(jnp.stack([noise_v, noise_th]), oid)
                noise_v, noise_th = nz[0], nz[1]
            x_next = x_next.at[2].add(0.5 * noise_v * scen_c.noise_on)
            x_next = x_next.at[3].add(0.5 * noise_th * scen_c.noise_on)
            obstacle_next = obstacle.advance(dt)
            # freeze finished lanes
            x_next = jnp.where(done[None, :], x, x_next)
            obstacle_next = jax.tree_util.tree_map(
                lambda a, bo: jnp.where(done, a, bo), obstacle, obstacle_next)
            t_next = jnp.where(done, t, t + 1)
            guess_next = jnp.where(done[None, :], guess, guess_new)
            u_warm_next = jnp.where(done[None, None, :], u_warm, u_warm_new)
            hzn_next = jnp.where(done, hzn, hzn_new)
            u_prev_next = jnp.where(done[None, :], u_prev, u)
            # record writes via (T, ·, B) onehot-selects: a per-lane scatter
            # looks cheaper on paper (T/1 less traffic) but lowers to the TPU
            # scalar core at ~80 ns/row — measured 5.4 ms/step at B=64k vs
            # ~0.4 ms for the full-tensor select on the VPU. Done lanes: row
            # t of us_rec was never written (stays 0) so the value is masked
            # to 0; row t_next(=t) of xs_rec already holds the frozen x, so
            # the rewrite is a no-op. In-bounds by the max_steps entry check.
            if tail_shrink is not None:
                # record prefix-writes (bitwise — full-width writes are
                # no-ops for done lanes; see batched_soa.py)
                _Bs = tail_shrink

                def _recs_small(args):
                    xs_r, us_r, x_n, u_n, t_c, t_n, done_c = args
                    oh_t = t_idx[:, None] == t_c[None, :_Bs]
                    us_head = jnp.where(
                        oh_t[:, None, :],
                        jnp.where(done_c[None, :_Bs], 0.0,
                                  u_n[:, :_Bs])[None],
                        us_r[:, :, :_Bs])
                    us_out = jnp.concatenate([us_head, us_r[:, :, _Bs:]],
                                             axis=-1)
                    oh_tn = t_idx[:, None] == t_n[None, :_Bs]
                    xs_head = jnp.where(oh_tn[:, None, :],
                                        x_n[None, :, :_Bs],
                                        xs_r[:, :, :_Bs])
                    xs_out = jnp.concatenate([xs_head, xs_r[:, :, _Bs:]],
                                             axis=-1)
                    return xs_out, us_out

                def _recs_full(args):
                    xs_r, us_r, x_n, u_n, t_c, t_n, done_c = args
                    oh_t = t_idx[:, None] == t_c[None, :]
                    us_out = jnp.where(
                        oh_t[:, None, :],
                        jnp.where(done_c[None, :], 0.0, u_n)[None], us_r)
                    oh_tn = t_idx[:, None] == t_n[None, :]
                    xs_out = jnp.where(oh_tn[:, None, :], x_n[None], xs_r)
                    return xs_out, us_out

                xs_rec, us_rec = jax.lax.cond(
                    compacted > 0.5, _recs_small, _recs_full,
                    (xs_rec, us_rec, x_next, u, t, t_next, done))
            else:
                onehot_t = t_idx[:, None] == t[None, :]  # (T, B)
                us_rec = jnp.where(onehot_t[:, None, :],
                                   jnp.where(done[None, :], 0.0, u)[None],
                                   us_rec)
                onehot_tn = t_idx[:, None] == t_next[None, :]
                xs_rec = jnp.where(onehot_tn[:, None, :], x_next[None],
                                   xs_rec)
            reach = jnp.sqrt(sum((x_next[i] - scen_c.goal[i]) ** 2
                                 for i in range(4))) <= goal_tol
            done_next = done | ((~done) & reach)
            core = (x_next, t_next, done_next, obstacle_next, guess_next,
                    u_warm_next, hzn_next, u_prev_next, xs_rec, us_rec,
                    streak_next, retired, rec_max, it_acc, key)
            if perm_on:
                cmp_f = (compacted if tail_shrink is not None
                         else jnp.float32(0.0))
                return core + (ss_c, scen_c, oid, skip_base, cmp_f)
            return core

        xs_rec = jnp.zeros((max_steps, 4, b), dtype).at[0].set(scen_p.x0)
        us_rec = jnp.zeros((max_steps, 2, b), dtype)
        # per-lap horizon reset (base.py:660: num_horizon = param horizon)
        init = (scen_p.x0, jnp.zeros((b,), jnp.int32),
                jnp.zeros((b,), bool), scen_p.obstacle, guess0, u_warm0,
                jnp.full((b,), n, jnp.int32),
                jnp.zeros((2, b), dtype), xs_rec, us_rec,
                jnp.zeros((b,), jnp.int32), jnp.zeros((b,), bool),
                jnp.zeros((b,), jnp.int32), it_acc0, key)
        if perm_on:
            init = init + (ss, scen_p, orig_id, jnp.asarray(0, jnp.int32),
                           jnp.float32(0.0))
            (x, t, done, _obs, _g, _uw, _hz, _up, xs_rec, us_rec, streak,
             _ret, rec_max, it_acc, key, ss_o, scen_o, oid_o,
             _sb, _cp) = jax.lax.while_loop(step_cond, step_body, init)
            return (xs_rec, us_rec, t, done, x, (rec_max, streak), it_acc,
                    key, ss_o, scen_o, oid_o)
        (x, t, done, _obs, _g, _uw, _hz, _up, xs_rec, us_rec, streak,
         _ret, rec_max, it_acc, key) = (
            jax.lax.while_loop(step_cond, step_body, init))
        return (xs_rec, us_rec, t, done, x, (rec_max, streak), it_acc, key,
                ss, scen_p, orig_id)

    def _set_goal(xs_rec, pos, goal):
        onehot = (t_idx[:, None] == pos[None, :])
        return jnp.where(onehot[:, None, :], goal[None, :, :], xs_rec)

    def lap_loop(lap_i, carry):
        (ss, key, lap_steps, lap_done, final_x, streak_rec, it_sum,
         scen_p, orig_id) = carry
        lap_count = lap_i + lap0  # laps stored so far (seed + learned)
        newest = lap_count - 1
        # per-lap warm start from the newest lap (base.py:661-675)
        st_new = jnp.take(ss[0], newest, axis=0)  # (T, 4, B)
        in_new = jnp.take(ss[1], newest, axis=0)  # (T, 2, B)
        guess0 = st_new[n]  # (4, B)
        u_warm0 = in_new[:n]  # (N, 2, B)
        if kernel_stats and perm_on:
            # the running total rides the while carry so each permutation
            # moves the partial sums with their lanes
            it_acc0 = it_sum
        elif kernel_stats:
            it_acc0 = (jnp.zeros((b,), jnp.float32),
                       jnp.zeros((b,), jnp.float32))
        else:
            it_acc0 = ()
        (xs_rec, us_rec, t, done, x_fin, streaks, it_lap, key, ss, scen_p,
         orig_id) = run_lap(ss, lap_count, guess0, u_warm0, key, scen_p,
                            orig_id, it_acc0)
        if kernel_stats:
            if perm_on:
                it_sum = it_lap
            else:
                it_sum = (it_sum[0] + it_lap[0], it_sum[1] + it_lap[1])
        if goal_append:
            pos, n_valid = t + 1, t + 2
        else:
            pos, n_valid = t, t + 1
        xs_rec = _set_goal(xs_rec, pos, scen_p.goal)
        ss = add_lap(ss, lap_count, xs_rec, us_rec, n_valid)
        if perm_on:
            # per-lap rows are reported in ORIGINAL lane order (the
            # permutation can differ between laps — scatter back per lap)
            unperm = lambda a: jnp.zeros_like(a).at[orig_id].set(a)
            t = unperm(t)
            done = unperm(done)
            streaks = (unperm(streaks[0]), unperm(streaks[1]))
        if with_streak_stats:
            streak_rec = (streak_rec[0].at[lap_i].set(streaks[0]),
                          streak_rec[1].at[lap_i].set(streaks[1]))
        return (ss, key, lap_steps.at[lap_i].set(t),
                lap_done.at[lap_i].set(done), x_fin, streak_rec, it_sum,
                scen_p, orig_id)

    streak_rec0 = ((jnp.zeros((num_laps, b), jnp.int32),
                    jnp.zeros((num_laps, b), jnp.int32))
                   if with_streak_stats else ())
    it_sum0 = ((jnp.zeros((b,), jnp.float32),
                jnp.zeros((b,), jnp.float32)) if kernel_stats else ())
    init = (ss0, key, jnp.zeros((num_laps, b), jnp.int32),
            jnp.zeros((num_laps, b), bool), scenarios.x0, streak_rec0,
            it_sum0, scenarios, jnp.arange(b, dtype=jnp.int32))
    (ss, key, lap_steps, lap_done, final_x, streak_rec, it_sum, _scen,
     orig_id) = jax.lax.fori_loop(0, num_laps, lap_loop, init)
    if perm_on:
        # restore ORIGINAL lane order on the lane-permuted outputs
        inv = _unpermute_idx(orig_id, b)
        ss = _permute_lanes(ss, inv)
        final_x = _take_lanes(final_x, inv)
        if kernel_stats:
            it_sum = _permute_lanes(it_sum, inv)
    return NlmpcSoaRunResult(lap_steps=lap_steps, lap_done=lap_done,
                             final_x=final_x, safe_set=ss,
                             lap_count=lap0 + num_laps, final_key=key,
                             streaks=streak_rec, iter_stats=it_sum)
