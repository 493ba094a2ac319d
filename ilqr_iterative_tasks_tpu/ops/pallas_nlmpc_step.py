"""Fused Pallas TPU kernel for the ENTIRE NLMPC control step.

NLMPC counterpart of ops/pallas_i2lqr_step.py: one whole calc_input
(reference iterative_ilqr/utils/base.py:557-655) per scenario lane —

    for each of the last num_ss_iter laps:
        L1-kNN of the terminal guess in the stored states (base.py:548-555)
        extract the k candidate terminal states + Qfun
    solve all nsi*k candidates by projected LM shooting   (base.py:583-595)
    at the PER-LANE shrinking horizon m (base.py:640-654), judged by the
    horizon-1 pure reach check when hzn <= 1 (nonlinear_lmpc.py:199-213)
    cost hzn + Qfun if feasible else Inf                  (nonlinear_lmpc.py:197)
    lexicographic row-min + argmin selection              (base.py:605-611)
    terminal guess -> successor safe-set point, or the horizon-m
    prediction when the chosen point is the lap's last    (base.py:619-654)

— fused into a single VMEM-resident kernel per tile of ``tile_rows * 128``
lanes. Safe-set lap slices stream from HBM via scalar-prefetch block indices;
candidates are solved sequentially by ONE multi-start LM while_loop instance
inside a fori_loop (per-lane lockstep-invariant, bitwise-neutral vs the
per-candidate kernel — validated in tests/test_pallas_nlmpc_step.py).
Skip lanes enter every LM loop pre-done; all-skip tiles bypass the body.

Per-lane horizons ride as an ``hzn`` (B,) i32 input; the solver applies the
exact ``m_lanes`` row/column masking of ops/lm_shooting_soa.py (see
_pallas_nlmpc_core ``mm``), so a shrunk lane gets the reduced horizon-m NLP
bit-for-bit, not an approximation. The host controller shrinks ~5 times at
the end of EVERY lap, so this is core behavior.

Outputs: the winner's input sequence us (n, 2, B), feasible_any (B,) f32,
the pre-freeze guess advance new_guess (4, B) (successor point when one
exists, else the horizon-m prediction; xt for h1 lanes), and the winner
identity (idx_sel (B,) i32 safe-set row, row_sel (B,) i32 lap row,
succ (B,) f32) — from which the caller composes the faithful warm-start
append (the chosen point's stored input, base.py:630-639), the
all-infeasible advance freeze (base.py:605-611) and the horizon decrement,
via the same ``_advance_tail`` as the XLA general path
(control/batched_nlmpc_soa.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ilqr_iterative_tasks_tpu.ops._pallas_lm_core import lex_argmin_tile
from ilqr_iterative_tasks_tpu.ops._pallas_nlmpc_core import (
    bake_nlmpc_consts, make_nlmpc_tile_funcs)
from ilqr_iterative_tasks_tpu.utils.params import LmpcParams, SystemLimits


def build_fused_nlmpc_step(params: LmpcParams, limits: SystemLimits, dt,
                           *, num_horizon: int, max_steps: int,
                           max_laps: int, max_iters: int = 60,
                           num_starts: int = 2, tile_rows: int = 8,
                           store_solutions: bool = True,
                           zeros_skip: bool = False,
                           qsort_skip: bool = False,
                           mode: str = "spaceVarying",
                           all_iter: bool = False,
                           all_rev_skip: bool = False,
                           prox_skip: bool = False,
                           stream_safe_set: bool = False,
                           with_stats: bool = False,
                           interpret: bool = False):
    """Factory: returns
    fn(x (4,B), guess (4,B), u_warm (n,2,B), states (max_laps,T,4,B),
       qfun (max_laps,T,B), lap_len (max_laps,B) i32, lap_ids (nsi,) i32
       [pre-clipped], lap_ok (nsi,) i32, obs (7,B), skip (B,) f32,
       hzn (B,) i32[, t (B,) i32, min_cost (B,) i32 — timeVarying only])
    -> (us (n,2,B), feasible_any (B,) f32, new_guess (4,B),
        idx_sel (B,) i32, row_sel (B,) i32, succ (B,) f32).

    B must be a multiple of tile_rows*128.

    ``mode``: candidate enumeration per safe-set lap row —
    "spaceVarying" = L1-kNN around the terminal guess (base.py:548-555);
    "timeVarying" = the advancing index window (base.py:537-546): base
    index = lap_cost - min_cost + N + t, k consecutive entries, validity
    0 < idx < lap_len (a per-lane suffix — the ragged -inf emulation
    requires prefix-valid rows), falling back to the lap's last point when
    no entry is valid;
    "all" = EVERY stored point of each lap row is a candidate
    (base.py:569-571): per lap row the kernel solves all max_steps
    positions in one fori_loop (invalid rows enter the LM loop pre-done,
    so the padded tail past the lap length costs iteration-zero exits),
    maintains the running lexicographic-best row's full cost list in two
    (T, tile) scratches (real costs + ragged -inf comparison values), and
    re-solves the per-lane winner (``store_solutions=False`` is required —
    T*L solution storage cannot fit VMEM). ``all_iter=True`` widens the
    lap window from the last nsi laps to EVERY stored lap
    (base.py:564-567; lap_ids/lap_ok then carry max_laps rows) and
    requires ``stream_safe_set``.
    Everything downstream of extraction (m-masked solves, h1 reach check,
    selection, guess advance) is mode-invariant.

    ``stream_safe_set``: the safe set and Qfun stay HBM-resident and each
    lap row's (T, 4/1, tile) slice is DMA'd into one reused VMEM scratch
    per (row, tile) — VMEM cost independent of the lap-window size (the
    same trade as ops/pallas_i2lqr_step.py; required for the
    max_laps-row ``all_iter`` window, whose double-buffered blocks would
    need ~40 MB).

    ``store_solutions=False``: candidate solves write only their cost; the
    per-lane WINNER is re-solved once after selection (a pure function of
    (x0, extracted x_term, clipped warm start, m) — bitwise the same
    solution). Saves the nc*2n-lane solution scratch: nsi=2 overflows the
    16 MB scoped VMEM by 52 KB with storage, and fits without (the
    multi-start LM body carries more live state than the iLQR kernel's).

    ``zeros_skip``: lanes whose warm-start solve already converged
    (f < 1e-14) skip the zeros multi-start (see
    _pallas_nlmpc_core.feasibility_solve). NOT bitwise-neutral — gated by
    the behavior-level parity envelope (docs/PARITY.md,
    tests/test_behavior_envelope.py).

    ``qsort_skip`` (nsi=1 only): the NLMPC candidate cost hzn + Qfun is
    known BEFORE the solve (the solve only gates feasibility,
    nonlinear_lmpc.py:186-197), so candidates are solved in per-lane
    Q-ASCENDING order (stable 8-wide rank network on the VPU) with a
    running-best dominance skip: once any candidate is feasible, every
    later position has hzn + q >= best and enters the LM while_loop
    pre-done — the expected number of real solves per lane drops from k to
    ~1 + #(infeasible q-prefix). BITWISE-neutral for nsi=1: the selection
    argmin is first-min over (cost, original slot); the stable rank puts
    equal-q candidates in original-slot order (hzn is lane-constant, so
    cost ties iff q ties), so the first feasible position IS the argmin, a
    skipped position can never beat it, and when no candidate is feasible
    every finite-q candidate still solves (skip requires a finite best),
    reproducing the baseline's slot-0 fallback exactly. The position loop
    terminates at tile level once every active lane is skipped (the skip
    predicate is monotone in position). Validated bit-for-bit in
    tests/test_pallas_nlmpc_step.py.

    ``prox_skip`` (nsi=1, block modes; mutually exclusive with
    ``qsort_skip``): temporal-coherence candidate ordering (VERDICT r4 #5)
    in its EXACT form. Candidates solve in EXTRACTION order — for
    spaceVarying that is ascending L1 distance from the terminal guess,
    which is proximity to the PREVIOUS winner (the guess advance re-centers
    on it each step), so position 0 is usually feasible immediately — with
    the exact per-candidate dominance skip (a candidate whose known cost
    hzn + q is >= the running best enters the LM loop pre-done; ties keep
    the earlier slot, so the non-strict skip is selection-exact) and a
    SUFFIX-MIN-q tile exit (the position loop ends once every active
    lane's remaining candidates are dominated — q is not monotone in
    extraction order, so the exit tests min over the remaining suffix).
    BITWISE-neutral (tests/test_pallas_nlmpc_step.py); the A/B against
    qsort_skip under noise is docs/PERF.md round-5.

    ``all_rev_skip`` (mode='all', nsi=1, no all_iter): strict-descent
    dominance scan for the widest candidate sweep. With a single lap row
    the lexicographic row comparison is vacuous and the candidate cost
    hzn + Qfun is STRICTLY decreasing in stored position (Qfun =
    lap_len-1-t, base.py:346) — the first-min argmin is therefore the
    LAST feasible position and no cost ties exist. The kernel scans
    positions DESCENDING: once a lane has a feasible candidate, every
    remaining (earlier) position is strictly dominated and enters the LM
    loop pre-done; a rigorous reachability bound additionally pre-skips
    the far field (the projected-LM rollout clips |a| <= a_max, so the
    xy displacement over <= n steps is bounded by n*|v0|*dt +
    a_max*dt^2*n^2/2; any candidate beyond that +1.0 margin must fail
    the 1e-4 terminal equality on the verification rollout, so its
    verdict is KNOWN infeasible without solving — valid for the h1 reach
    check too since its 1e-3 tolerance < the margin). The position loop
    terminates at tile level once every active lane has found its winner
    (all-infeasible lanes keep it alive through position 0, preserving
    the slot-0 fallback). BITWISE-neutral vs the forward scan — validated
    in tests/test_pallas_nlmpc_step.py.
    """
    tile = tile_rows * 128
    n = num_horizon
    if n < 2:
        raise ValueError("horizon-1 is a pure reach check handled by the "
                         "controller (nonlinear_lmpc.py:199-213)")
    if mode not in ("spaceVarying", "timeVarying", "all"):
        raise ValueError(f"unsupported step-kernel mode {mode!r}")
    time_varying = mode == "timeVarying"
    all_mode = mode == "all"
    if all_mode and store_solutions:
        raise ValueError("mode='all' requires store_solutions=False "
                         "(T*L candidate solutions cannot fit VMEM; the "
                         "winner is re-solved)")
    if all_mode and qsort_skip:
        raise ValueError("qsort_skip is not defined for mode='all' (the "
                         "lexicographic row comparison needs every "
                         "position's cost)")
    if all_mode and with_stats:
        raise ValueError("with_stats is instrumented for the block modes "
                         "(spaceVarying/timeVarying) only")
    if prox_skip:
        if qsort_skip:
            raise ValueError("prox_skip and qsort_skip are alternative "
                             "candidate orderings — enable one")
        if all_mode:
            raise ValueError("prox_skip orders the extracted candidate "
                             "block; mode='all' has its own dominance scan "
                             "(all_rev_skip)")
        if int(params.num_ss_iter) != 1:
            raise ValueError("prox_skip requires nsi=1 (the lexicographic "
                             "row comparison needs every candidate's cost)")
        if with_stats:
            raise ValueError("with_stats is not instrumented for prox_skip")
    if all_rev_skip:
        if not all_mode:
            raise ValueError("all_rev_skip is the mode='all' dominance scan")
        if all_iter or int(params.num_ss_iter) != 1:
            raise ValueError(
                "all_rev_skip requires a SINGLE lap row (nsi=1, no "
                "all_iter): the lexicographic row comparison across laps "
                "needs every position's cost, which the dominance scan "
                "skips")
    if all_iter and not all_mode:
        raise ValueError("all_iter widens the lap window of mode='all'")
    if all_mode and not stream_safe_set:
        raise ValueError("mode='all' needs stream_safe_set=True (the "
                         "per-position loop reads candidate rows via "
                         "dynamic leading-index loads on the streamed VMEM "
                         "scratch; for all_iter the max_laps-row block "
                         "window would also overflow VMEM)")
    if stream_safe_set and not all_mode:
        raise ValueError("stream_safe_set is currently built for "
                         "mode='all' (other modes fit their nsi blocks)")
    k = int(params.num_ss_points)
    nsi = int(params.num_ss_iter)
    if qsort_skip and nsi != 1:
        raise ValueError(
            "qsort_skip reorders candidates within the single safe-set lap; "
            "with nsi > 1 the lexicographic ROW comparison depends on every "
            "candidate's cost, so skipped solves would change selection")
    t_rows = max_steps
    # all_rev_skip reachability bound (see docstring): xy displacement over
    # m <= n steps of the |a| <= a_max-clipped rollout is bounded by
    # n*|v0|*dt + a_max*dt^2*n^2/2; +1.0 margin dominates both the 1e-4
    # terminal tolerance and the h1 reach check's 1e-3 (f32 rounding ≪).
    _rb_v = float(n) * float(dt)
    _rb_c = float(limits.a_max) * float(dt) ** 2 * n * n / 2.0 + 1.0
    consts = bake_nlmpc_consts(limits, dt)
    shp = (tile_rows, 128)
    nc = nsi * k

    n_offs = max_laps if all_iter else nsi

    def kernel(s_ref, *refs):
        it_refs = iter(refs)
        nxt_ref = lambda: next(it_refs)
        if stream_safe_set:
            st_hbm, qf_hbm, lane0_ref = nxt_ref(), nxt_ref(), nxt_ref()
            st_refs = qf_refs = None
        else:
            st_refs = [nxt_ref() for _ in range(n_offs)]
            qf_refs = [nxt_ref() for _ in range(n_offs)]
        ll_ref = nxt_ref()
        x_ref, g_ref, uw_ref, obs_ref, skip_ref = (
            nxt_ref(), nxt_ref(), nxt_ref(), nxt_ref(), nxt_ref())
        hzn_ref = nxt_ref()
        if time_varying:
            t_ref, mc_ref = nxt_ref(), nxt_ref()
        us_ref, fe_ref, ng_ref, idx_ref, row_ref, succ_ref = (
            nxt_ref(), nxt_ref(), nxt_ref(), nxt_ref(), nxt_ref(),
            nxt_ref())
        if with_stats:
            useful_ref, exec_ref = nxt_ref(), nxt_ref()
        if all_mode:
            cost_cur, cost_best, cmp_best = (nxt_ref(), nxt_ref(),
                                             nxt_ref())
        else:
            cand_xt, cand_q, cand_ok, cand_idx = (
                nxt_ref(), nxt_ref(), nxt_ref(), nxt_ref())
            if store_solutions:
                sol_us = nxt_ref()
            cost_sc = nxt_ref()
        if stream_safe_set:
            st_vmem, qf_vmem, dma_sem = nxt_ref(), nxt_ref(), nxt_ref()

        def load_lap(off):
            """(st components, qf) for lap row ``off`` as (T, tile) arrays.

            Streaming mode DMAs the lap's lane slice from the HBM-resident
            safe set into ONE reused VMEM scratch (ops/pallas_i2lqr_step.py
            machinery); block mode reads the double-buffered input block."""
            if stream_safe_set:
                lane0 = pl.multiple_of(lane0_ref[0], tile)
                cp_st = pltpu.make_async_copy(
                    st_hbm.at[s_ref[off], :, :, pl.ds(lane0, tile)],
                    st_vmem, dma_sem.at[0])
                cp_qf = pltpu.make_async_copy(
                    qf_hbm.at[s_ref[off], :, pl.ds(lane0, tile)],
                    qf_vmem, dma_sem.at[1])
                cp_st.start()
                cp_qf.start()
                cp_st.wait()
                cp_qf.wait()
                return [st_vmem[:, c, :] for c in range(4)], qf_vmem[...]
            return ([st_refs[off][0, :, c, :] for c in range(4)],
                    qf_refs[off][0])

        skip_f = skip_ref[...].reshape(shp)
        m2 = jnp.clip(hzn_ref[...].reshape(shp), 2, n)  # (shp) i32
        hzn_f = hzn_ref[...].reshape(shp).astype(jnp.float32)
        h1 = hzn_ref[...].reshape(shp) <= 1
        # h1 lanes never consume a solve output: feasibility is the pure
        # reach check, the applied input is the raw warm input
        # (_advance_tail: u_sel = u_warm[0]), the succ warm-update writes
        # only slot 0 = the STORED input, and the guess advance uses
        # xt_sel — so entering every solve pre-done for h1 lanes is
        # bitwise-exact. This is the noise-tail fix: shrink-cascade
        # stragglers sit at h=1 running the 121-step budget, and without
        # the skip each paid k full (discarded) max_iters LM solves per
        # step, keeping every straggler tile at worst-case cost
        # (docs/PERF.md "The NLMPC noise tail").
        solve_skip_f = jnp.maximum(skip_f, h1.astype(jnp.float32))
        F = make_nlmpc_tile_funcs(consts, n, shp, mm=m2)
        us_ref[...] = jnp.zeros((n, 2, tile), jnp.float32)
        fe_ref[...] = jnp.zeros((tile,), jnp.float32)
        ng_ref[...] = jnp.zeros((4, tile), jnp.float32)
        idx_ref[...] = jnp.zeros((tile,), jnp.int32)
        row_ref[...] = jnp.zeros((tile,), jnp.int32)
        succ_ref[...] = jnp.zeros((tile,), jnp.float32)
        if with_stats:
            useful_ref[...] = jnp.zeros((tile,), jnp.float32)
            exec_ref[...] = jnp.zeros((tile,), jnp.float32)

        @pl.when(jnp.max(1.0 - skip_f) > 0.5)
        def _():
            x0c = tuple(x_ref[i].reshape(shp) for i in range(4))
            gg = [g_ref[i].reshape(tile) for i in range(4)]
            obs = tuple(obs_ref[i].reshape(shp) for i in range(7))
            t_iota = jax.lax.broadcasted_iota(jnp.int32, (t_rows, tile), 0)
            inf = jnp.float32(jnp.inf)
            warm = []
            for j in range(n):
                warm.append(F.clip_a(uw_ref[j, 0].reshape(shp)))
                warm.append(F.clip_d(uw_ref[j, 1].reshape(shp)))
            # horizon-1 reach state: one dynamics step from the RAW first
            # warm input (the general path uses the unclipped u_warm[0],
            # control/batched_nlmpc_soa.py)
            x1 = F.step(x0c, uw_ref[0, 0].reshape(shp),
                        uw_ref[0, 1].reshape(shp))

            def feas_of(xt, feasible_f):
                """h1 lanes are judged by the pure reach check
                (nonlinear_lmpc.py:199-213), others by the solve verdict.
                Carried as f32 0/1 — Mosaic cannot materialize a select of
                i1 vectors ('unsupported truncation')."""
                d2 = sum((x1[c] - xt[c]) ** 2 for c in range(4))
                reach_f = (jnp.sqrt(jnp.maximum(d2, 0.0))
                           <= 1e-3).astype(jnp.float32)
                return jnp.where(h1, reach_f, feasible_f)

            # --- candidate extraction per safe-set lap row (kNN and
            # window modes; mode='all' iterates positions directly below) ---
            for off in range(0 if all_mode else nsi):
                st, qf = load_lap(off)  # (T, tile) components
                ll = ll_ref[s_ref[off]]  # (tile,) i32
                lap_ok = s_ref[n_offs + off] > 0
                if time_varying:
                    # advancing index window (base.py:537-546): base index
                    # = lap_cost - min_cost + N + t (always > 0), entries
                    # valid iff idx < lap_len (a SUFFIX invalidation —
                    # prefix-validity holds for the ragged -inf emulation),
                    # fallback to the lap's last point when none is valid.
                    # Mirrors batched_nlmpc_soa.solve_step_general op-for-op.
                    start = ((ll - 1) - mc_ref[...] + n
                             + t_ref[...])  # (tile,) i32
                    ijs, vjs = [], []
                    any_v = jnp.zeros((tile,), jnp.float32)
                    for kk in range(k):
                        ij = start + kk
                        vj = (ij > 0) & (ij < ll)
                        ijs.append(ij)
                        vjs.append(vj)
                        any_v = jnp.maximum(any_v, vj.astype(jnp.float32))
                    ijs[0] = jnp.where(any_v > 0.5, ijs[0], ll - 1)
                    vjs[0] = vjs[0] | (any_v <= 0.5)
                    for kk in range(k):
                        ci = off * k + kk
                        ijc = jnp.clip(ijs[kk], 0, t_rows - 1)
                        oh = ((t_iota == ijc[None, :])
                              & vjs[kk][None, :])
                        for c in range(4):
                            cand_xt[ci, c] = jnp.sum(
                                jnp.where(oh, st[c], 0.0), axis=0)
                        cand_q[ci] = jnp.sum(jnp.where(oh, qf, 0.0), axis=0)
                        cand_idx[ci] = ijc
                        cand_ok[ci] = (vjs[kk] & lap_ok).astype(jnp.float32)
                else:
                    # L1-kNN around the terminal guess (base.py:548-555)
                    dist = (jnp.abs(st[0] - gg[0][None, :])
                            + jnp.abs(st[1] - gg[1][None, :])
                            + jnp.abs(st[2] - gg[2][None, :])
                            + jnp.abs(st[3] - gg[3][None, :]))
                    valid = (t_iota < ll[None, :]) & lap_ok
                    d = jnp.where(valid, dist, inf)
                    for kk in range(k):
                        dmin = jnp.min(d, axis=0)
                        # first-min index == jnp.argmin (matches
                        # _topk_select)
                        j = jnp.min(jnp.where(d == dmin[None, :], t_iota,
                                              t_rows), axis=0)
                        m = t_iota == j[None, :]
                        ci = off * k + kk
                        for c in range(4):
                            cand_xt[ci, c] = jnp.sum(
                                jnp.where(m, st[c], 0.0), axis=0)
                        cand_q[ci] = jnp.sum(jnp.where(m, qf, 0.0), axis=0)
                        cand_idx[ci] = j
                        cand_ok[ci] = jnp.isfinite(dmin).astype(jnp.float32)
                        d = jnp.where(m, inf, d)

            if all_mode and all_rev_skip:
                # --- mode='all', nsi=1: strict-descent dominance scan (see
                # docstring). Single lap row; cost = hzn + Qfun strictly
                # decreases in position, so the first-min argmin is the
                # LAST feasible position and no ties exist: scan positions
                # DESCENDING; found lanes pre-skip every remaining
                # (strictly dominated) position, the reachability bound
                # pre-skips the far field, and the loop ends at tile level
                # once every active lane has found its winner. ---
                load_lap(0)
                ll = ll_ref[s_ref[0]]  # (tile,) i32
                lap_ok = s_ref[n_offs] > 0
                best_row = jnp.zeros(shp, jnp.int32)
                len_sel = jnp.broadcast_to(ll.reshape(shp), shp)
                inf_t = jnp.full(shp, jnp.inf, jnp.float32)
                rbound = _rb_v * jnp.abs(x0c[2]) + _rb_c  # (shp) f32
                rbound2 = rbound * rbound

                def solve_rev(state):
                    # alive is the tile-level early-termination flag (f32
                    # scalar — Mosaic miscompiles i1 while carries)
                    p, alive, best_cost, best_pos = state
                    tt = t_rows - 1 - p
                    st_row = st_vmem[pl.ds(tt, 1)]  # (1, 4, tile)
                    xt = tuple(st_row[0, c].reshape(shp) for c in range(4))
                    qv = qf_vmem[pl.ds(tt, 1)][0].reshape(shp)
                    ok_f = ((tt < ll) & lap_ok).astype(
                        jnp.float32).reshape(shp)
                    found = best_cost < inf
                    dxy2 = ((xt[0] - x0c[0]) ** 2 + (xt[1] - x0c[1]) ** 2)
                    lane_skip = found | (dxy2 > rbound2)
                    done0 = jnp.maximum(
                        jnp.maximum(solve_skip_f, 1.0 - ok_f),
                        lane_skip.astype(jnp.float32))
                    _us, _xs, _te, feasible = F.feasibility_solve(
                        x0c, xt, obs, warm, done0, max_iters, num_starts,
                        skip_converged_starts=zeros_skip)
                    feas = feas_of(xt, feasible)
                    cost = jnp.where((feas > 0.5) & (ok_f > 0.5)
                                     & ~lane_skip, hzn_f + qv, inf)
                    upd = cost < best_cost
                    best_cost = jnp.where(upd, cost, best_cost)
                    best_pos = jnp.where(upd, tt, best_pos)
                    # all-infeasible lanes keep the loop alive through
                    # position 0 (their fallback is best_pos = 0, cost inf)
                    alive_nxt = jnp.max(
                        (1.0 - skip_f)
                        * (best_cost >= inf).astype(jnp.float32))
                    return p + 1, alive_nxt, best_cost, best_pos

                fin_r = jax.lax.while_loop(
                    lambda s: (s[0] < t_rows) & (s[1] > 0.5), solve_rev,
                    (jnp.int32(0), jnp.float32(1.0), inf_t,
                     jnp.zeros(shp, jnp.int32)))
                _p_r, _a_r, best_cost, best_pos = fin_r
                idx_sel = best_pos
                best_idx = best_pos.reshape(tile)
            elif all_mode:
                # --- mode='all': every stored point of each lap row is a
                # candidate (base.py:569-571). Per row: solve all T
                # positions in one fori_loop (positions past the lap length
                # enter the LM loop pre-done), then fold the row into the
                # running lexicographic best via the ragged -inf comparison
                # lists kept in (T, tile) scratch. ---
                best_row = jnp.zeros(shp, jnp.int32)
                idx_sel = jnp.zeros(shp, jnp.int32)
                len_sel = jnp.zeros(shp, jnp.int32)
                for off in range(n_offs):
                    load_lap(off)  # DMA the row into st_vmem / qf_vmem
                    ll = ll_ref[s_ref[off]]  # (tile,) i32
                    lap_ok = s_ref[n_offs + off] > 0

                    def solve_t(tt, _, ll=ll, lap_ok=lap_ok):
                        # dynamic LEADING-index loads on the VMEM scratch
                        # refs (Mosaic lowers these; dynamic_index_in_dim on
                        # a materialized (T, tile) VALUE does not — it
                        # raised 'Unimplemented: dynamic_slice' on hardware)
                        st_row = st_vmem[pl.ds(tt, 1)]  # (1, 4, tile)
                        xt = tuple(st_row[0, c].reshape(shp)
                                   for c in range(4))
                        qv = qf_vmem[pl.ds(tt, 1)][0].reshape(shp)
                        ok_f = ((tt < ll) & lap_ok).astype(
                            jnp.float32).reshape(shp)
                        done0 = jnp.maximum(solve_skip_f, 1.0 - ok_f)
                        _us, _xs, _te, feasible = F.feasibility_solve(
                            x0c, xt, obs, warm, done0, max_iters,
                            num_starts, skip_converged_starts=zeros_skip)
                        feas = feas_of(xt, feasible)
                        cost = jnp.where((feas > 0.5) & (ok_f > 0.5),
                                         hzn_f + qv, inf)
                        cost_cur[tt] = cost.reshape(tile)
                        return 0

                    jax.lax.fori_loop(0, t_rows, solve_t, 0)
                    cur_v = cost_cur[...]  # (T, tile)
                    struct = t_iota < ll[None, :]
                    cmp_cur = jnp.where(struct, cur_v, -inf)
                    cmp_cur = jnp.where(lap_ok, cmp_cur, inf)
                    if off == 0:
                        cost_best[...] = cur_v
                        cmp_best[...] = cmp_cur
                        len_sel = jnp.broadcast_to(ll.reshape(shp), shp)
                    else:
                        bb = cmp_best[...]
                        any_diff = jnp.zeros((tile,), jnp.float32)
                        a_first = jnp.zeros((tile,), jnp.float32)
                        b_first = jnp.zeros((tile,), jnp.float32)
                        for tt in range(t_rows - 1, -1, -1):
                            diff = cmp_cur[tt] != bb[tt]
                            any_diff = jnp.maximum(
                                any_diff, diff.astype(jnp.float32))
                            a_first = jnp.where(diff, cmp_cur[tt], a_first)
                            b_first = jnp.where(diff, bb[tt], b_first)
                        less = (any_diff > 0.5) & (a_first < b_first)
                        best_row = jnp.where(less.reshape(shp), off,
                                             best_row)
                        len_sel = jnp.where(less.reshape(shp),
                                            ll.reshape(shp), len_sel)
                        lm = less[None, :]
                        cost_best[...] = jnp.where(lm, cur_v, cost_best[...])
                        cmp_best[...] = jnp.where(lm, cmp_cur,
                                                  cmp_best[...])
                # first-min argmin over the winning row's REAL cost list
                bc = cost_best[...]
                best_cost_f = jnp.full((tile,), jnp.inf, jnp.float32)
                best_idx = jnp.zeros((tile,), jnp.int32)
                for tt in range(t_rows):
                    better = bc[tt] < best_cost_f
                    best_cost_f = jnp.where(better, bc[tt], best_cost_f)
                    best_idx = jnp.where(better, tt, best_idx)
                idx_sel = best_idx.reshape(shp)
                best_cost = best_cost_f.reshape(shp)
            if all_mode:
                # second pass (shared by both all-mode scan variants):
                # winner terminal + successor extraction
                xt_sel = [jnp.zeros(shp, jnp.float32) for _ in range(4)]
                x_succ = [jnp.zeros(shp, jnp.float32) for _ in range(4)]
                for off in range(n_offs):
                    st, _qf = load_lap(off)
                    ll = ll_ref[s_ref[off]]
                    sel_off = best_row == off
                    oh_w = t_iota == best_idx[None, :]
                    nxt_off = jnp.clip(best_idx + 1, 0, ll - 1)
                    oh_s = t_iota == nxt_off[None, :]
                    for c in range(4):
                        xt_sel[c] = jnp.where(
                            sel_off,
                            jnp.sum(jnp.where(oh_w, st[c], 0.0),
                                    axis=0).reshape(shp), xt_sel[c])
                        x_succ[c] = jnp.where(
                            sel_off,
                            jnp.sum(jnp.where(oh_s, st[c], 0.0),
                                    axis=0).reshape(shp), x_succ[c])
                # winner re-solve (store_solutions=False is required)
                us_w, _xs_w, _te_w, _fe_w = F.feasibility_solve(
                    x0c, tuple(xt_sel), obs, warm, solve_skip_f, max_iters,
                    num_starts, skip_converged_starts=zeros_skip)
                us_sel = []
                for i in range(n):
                    us_sel.append(us_w[i][0])
                    us_sel.append(us_w[i][1])
            else:
                if qsort_skip:
                    # --- q-sorted candidate solves with dominance skip ---
                    # stable per-lane rank by (q, original slot); invalid
                    # candidates (q -> +inf) rank last
                    inf_t = jnp.full(shp, jnp.inf, jnp.float32)
                    qe = [jnp.where(cand_ok[j].reshape(shp) > 0.5,
                                    cand_q[j].reshape(shp), inf_t)
                          for j in range(k)]
                    rank = []
                    for j in range(k):
                        r = jnp.zeros(shp, jnp.int32)
                        for i in range(k):
                            if i == j:
                                continue
                            ahead = (qe[i] < qe[j]) | ((qe[i] == qe[j])
                                                       & (i < j))
                            r = r + ahead.astype(jnp.int32)
                        rank.append(r)

                    def solve_pos(state):
                        # alive is the tile-level early-termination flag (f32
                        # scalar — Mosaic miscompiles i1 while carries)
                        if with_stats:
                            (p, alive, best_cost, best_slot, best_pos,
                             u_acc, e_acc) = state
                        else:
                            p, alive, best_cost, best_slot, best_pos = state
                        sel = [rank[j] == p for j in range(k)]
                        xt, q_p, ok_p = [], inf_t, jnp.zeros(shp, jnp.float32)
                        slot_p = jnp.zeros(shp, jnp.int32)
                        for c in range(4):
                            v = jnp.zeros(shp, jnp.float32)
                            for j in range(k):
                                v = jnp.where(sel[j], cand_xt[j, c].reshape(shp),
                                              v)
                            xt.append(v)
                        for j in range(k):
                            q_p = jnp.where(sel[j], cand_q[j].reshape(shp), q_p)
                            ok_p = jnp.where(sel[j], cand_ok[j].reshape(shp),
                                             ok_p)
                            slot_p = jnp.where(sel[j], j, slot_p)
                        q_eff = jnp.where(ok_p > 0.5, q_p, inf_t)
                        # positions are q-ascending: once best is finite, this
                        # and every later candidate has hzn + q >= best and can
                        # only tie with a LARGER original slot (stable rank) —
                        # pre-done is selection-invariant. Position 0 always
                        # solves (the all-infeasible slot-0 fallback).
                        lane_skip = (hzn_f + q_eff >= best_cost) & (p > 0)
                        skip_all = jnp.maximum(solve_skip_f,
                                               lane_skip.astype(jnp.float32))
                        if with_stats:
                            (us, _xs, _te, feasible, useful_s,
                             executed_s) = F.feasibility_solve(
                                x0c, tuple(xt), obs, warm, skip_all,
                                max_iters, num_starts,
                                skip_converged_starts=zeros_skip,
                                with_iter_stats=True)
                            u_acc = u_acc + useful_s.reshape(tile)
                            e_acc = e_acc + executed_s
                        else:
                            us, _xs, _te, feasible = F.feasibility_solve(
                                x0c, tuple(xt), obs, warm, skip_all,
                                max_iters, num_starts,
                                skip_converged_starts=zeros_skip)
                        if store_solutions:
                            for i in range(n):
                                sol_us[p, i, 0] = us[i][0].reshape(tile)
                                sol_us[p, i, 1] = us[i][1].reshape(tile)
                        feas = feas_of(tuple(xt), feasible)
                        cost = jnp.where((feas > 0.5) & (ok_p > 0.5)
                                         & ~lane_skip, hzn_f + q_p, inf)
                        upd = cost < best_cost  # ties keep the earlier position
                        # tile-level early termination: lane_skip is MONOTONE in
                        # position (q ascends per lane; a skipped position never
                        # lowers the running best), so once every ACTIVE lane is
                        # skipped at p, every later position is too — stop
                        # paying the per-position body for the tail. Sim-skip
                        # lanes must not hold the loop open.
                        alive_nxt = jnp.max(
                            (1.0 - skip_f) * (1.0 - lane_skip.astype(jnp.float32)))
                        out = (p + 1, alive_nxt,
                               jnp.where(upd, cost, best_cost),
                               jnp.where(upd, slot_p, best_slot),
                               jnp.where(upd, p, best_pos))
                        if with_stats:
                            out = out + (u_acc, e_acc)
                        return out

                    # all-infeasible fallback = original slot 0 (its position is
                    # solved then: skip requires a FINITE best)
                    init_q = (jnp.int32(0), jnp.float32(1.0), inf_t,
                              jnp.zeros(shp, jnp.int32), rank[0])
                    if with_stats:
                        init_q = init_q + (jnp.zeros((tile,), jnp.float32),
                                           jnp.float32(0.0))
                    fin_q = jax.lax.while_loop(
                        lambda s: (s[0] < k) & (s[1] > 0.5),
                        solve_pos, init_q)
                    _p_fin, _a_fin, best_cost, best_slot, best_pos = \
                        fin_q[:5]
                    if with_stats:
                        useful_ref[...] = useful_ref[...] + fin_q[5]
                        exec_ref[...] = exec_ref[...] + fin_q[6]
                    best_row = jnp.zeros(shp, jnp.int32)
                    best_col = best_slot
                    ci_sel = best_slot
                    store_sel = best_pos  # solutions are stored by POSITION
                elif prox_skip:
                    # --- proximity-order dominance skip (exact; see
                    # factory docstring). Candidate index == position ==
                    # original slot, so dynamic scratch loads replace the
                    # qsort branch's per-lane rank selects, ties resolve
                    # naturally in slot order, and the all-infeasible
                    # fallback is the always-solved slot 0. ---
                    inf_t = jnp.full(shp, jnp.inf, jnp.float32)
                    qe = [jnp.where(cand_ok[j].reshape(shp) > 0.5,
                                    cand_q[j].reshape(shp), inf_t)
                          for j in range(k)]
                    sufmin = [None] * (k + 1)
                    sufmin[k] = inf_t
                    for j in range(k - 1, -1, -1):
                        sufmin[j] = jnp.minimum(qe[j], sufmin[j + 1])

                    def solve_prox(state):
                        # alive is the tile-level early-termination flag
                        # (f32 scalar — Mosaic miscompiles i1 while carries)
                        p, alive, best_cost, best_slot = state
                        row = cand_xt[pl.ds(p, 1)]  # (1, 4, tile)
                        xt = tuple(row[0, c].reshape(shp) for c in range(4))
                        q_p = cand_q[pl.ds(p, 1)][0].reshape(shp)
                        ok_p = cand_ok[pl.ds(p, 1)][0].reshape(shp)
                        q_eff = jnp.where(ok_p > 0.5, q_p, inf_t)
                        # non-strict dominance is selection-exact here: a
                        # tie (hzn + q == best) cannot update the first-min
                        # argmin (upd is strict <, earlier slot wins)
                        lane_skip = (hzn_f + q_eff >= best_cost) & (p > 0)
                        skip_all = jnp.maximum(
                            solve_skip_f, lane_skip.astype(jnp.float32))
                        us, _xs, _te, feasible = F.feasibility_solve(
                            x0c, xt, obs, warm, skip_all, max_iters,
                            num_starts, skip_converged_starts=zeros_skip)
                        if store_solutions:
                            for i in range(n):
                                sol_us[p, i, 0] = us[i][0].reshape(tile)
                                sol_us[p, i, 1] = us[i][1].reshape(tile)
                        feas = feas_of(xt, feasible)
                        cost = jnp.where((feas > 0.5) & (ok_p > 0.5)
                                         & ~lane_skip, hzn_f + q_p, inf)
                        upd = cost < best_cost
                        best_next = jnp.where(upd, cost, best_cost)
                        slot_next = jnp.where(upd, p, best_slot)
                        # suffix-min tile exit: a lane is finished once
                        # every REMAINING candidate is dominated
                        # (hzn + min_{j>p} q_j >= best; an all-inf suffix
                        # retires the lane too — those solves would be
                        # pre-done no-ops)
                        suf_next = inf_t
                        for j in range(k):
                            suf_next = jnp.where(p == j, sufmin[j + 1],
                                                 suf_next)
                        lane_alive = hzn_f + suf_next < best_next
                        alive_nxt = jnp.max(
                            (1.0 - skip_f)
                            * lane_alive.astype(jnp.float32))
                        return (p + 1, alive_nxt, best_next, slot_next)

                    fin_p = jax.lax.while_loop(
                        lambda s: (s[0] < k) & (s[1] > 0.5), solve_prox,
                        (jnp.int32(0), jnp.float32(1.0), inf_t,
                         jnp.zeros(shp, jnp.int32)))
                    _pf, _af, best_cost, best_slot = fin_p
                    best_row = jnp.zeros(shp, jnp.int32)
                    best_col = best_slot
                    ci_sel = best_slot
                    store_sel = best_slot
                else:
                    # --- solve all candidates (one while_loop instance) ---
                    def solve_ci(ci, _):
                        xt = tuple(cand_xt[ci, c].reshape(shp) for c in range(4))
                        if with_stats:
                            (us, _xs, _te, feasible, useful_s,
                             executed_s) = F.feasibility_solve(
                                x0c, xt, obs, warm, solve_skip_f, max_iters,
                                num_starts, skip_converged_starts=zeros_skip,
                                with_iter_stats=True)
                            useful_ref[...] = (useful_ref[...]
                                               + useful_s.reshape(tile))
                            exec_ref[...] = exec_ref[...] + executed_s
                        else:
                            us, _xs, _te, feasible = F.feasibility_solve(
                                x0c, xt, obs, warm, solve_skip_f, max_iters,
                                num_starts, skip_converged_starts=zeros_skip)
                        if store_solutions:
                            for i in range(n):
                                sol_us[ci, i, 0] = us[i][0].reshape(tile)
                                sol_us[ci, i, 1] = us[i][1].reshape(tile)
                        q = cand_q[ci].reshape(shp)
                        okc = cand_ok[ci].reshape(shp) > 0.5
                        feas = feas_of(xt, feasible)
                        cost = jnp.where((feas > 0.5) & okc, hzn_f + q, inf)
                        cost_sc[ci] = cost.reshape(tile)
                        return 0

                    jax.lax.fori_loop(0, nc, solve_ci, 0)

                    # --- lexicographic row-min + argmin over k (base.py:605-611;
                    # ragged list-min: absent slots rank -inf in the comparison
                    # copy, mirroring the simulator's rows_cmp; shared helper) ---
                    rows = [[cost_sc[off * k + kk].reshape(shp)
                             for kk in range(k)] for off in range(nsi)]
                    cmp_rows = []
                    for off in range(nsi):
                        lap_ok_s = s_ref[n_offs + off] > 0
                        crow = []
                        for kk in range(k):
                            okf = cand_ok[off * k + kk].reshape(shp) > 0.5
                            c = jnp.where(okf, rows[off][kk], -inf)
                            crow.append(jnp.where(lap_ok_s, c, inf))
                        cmp_rows.append(crow)
                    best_row, best_col, best_cost = lex_argmin_tile(
                        rows, shp, cmp_rows=cmp_rows)
                    ci_sel = best_row * k + best_col
                    store_sel = ci_sel
                idx_sel = jnp.zeros(shp, jnp.int32)
                len_sel = jnp.zeros(shp, jnp.int32)
                xt_sel = [jnp.zeros(shp, jnp.float32) for _ in range(4)]
                if store_solutions:
                    us_sel = [jnp.zeros(shp, jnp.float32) for _ in range(2 * n)]
                    for ci in range(nc):
                        sel = ci_sel == ci
                        s_sel = store_sel == ci
                        for i in range(n):
                            us_sel[2 * i] = jnp.where(
                                s_sel, sol_us[ci, i, 0].reshape(shp),
                                us_sel[2 * i])
                            us_sel[2 * i + 1] = jnp.where(
                                s_sel, sol_us[ci, i, 1].reshape(shp),
                                us_sel[2 * i + 1])
                        idx_sel = jnp.where(sel, cand_idx[ci].reshape(shp),
                                            idx_sel)
                        for c in range(4):
                            xt_sel[c] = jnp.where(
                                sel, cand_xt[ci, c].reshape(shp), xt_sel[c])
                else:
                    # re-solve the per-lane winner (identical pure solve of the
                    # same extracted terminal state and warm start — bitwise
                    # the stored solution)
                    for ci in range(nc):
                        sel = ci_sel == ci
                        for c in range(4):
                            xt_sel[c] = jnp.where(
                                sel, cand_xt[ci, c].reshape(shp), xt_sel[c])
                        idx_sel = jnp.where(sel, cand_idx[ci].reshape(shp),
                                            idx_sel)
                    if with_stats:
                        (us_w, _xs_w, _te_w, _fe_w, useful_w,
                         executed_w) = F.feasibility_solve(
                            x0c, tuple(xt_sel), obs, warm, solve_skip_f,
                            max_iters, num_starts,
                            skip_converged_starts=zeros_skip,
                            with_iter_stats=True)
                        useful_ref[...] = (useful_ref[...]
                                           + useful_w.reshape(tile))
                        exec_ref[...] = exec_ref[...] + executed_w
                    else:
                        us_w, _xs_w, _te_w, _fe_w = F.feasibility_solve(
                            x0c, tuple(xt_sel), obs, warm, solve_skip_f,
                            max_iters, num_starts,
                            skip_converged_starts=zeros_skip)
                    us_sel = []
                    for i in range(n):
                        us_sel.append(us_w[i][0])
                        us_sel.append(us_w[i][1])
                for off in range(nsi):
                    len_sel = jnp.where(best_row == off,
                                        ll_ref[s_ref[off]].reshape(shp),
                                        len_sel)
            feasible_any = jnp.isfinite(best_cost).astype(jnp.float32)
            succ_m = (idx_sel + 1) <= (len_sel - 1)

            # --- pre-freeze guess advance (base.py:619-654): successor
            # safe-set point when one exists, else the horizon-m prediction
            # of the winner solution (xt for h1 lanes) ---
            xs_w = [x0c]
            for i in range(n):
                xs_w.append(F.step(xs_w[-1], us_sel[2 * i],
                                   us_sel[2 * i + 1]))
            x_pred = [F.at_m([xs_w[kk][c] for kk in range(n + 1)])
                      for c in range(4)]
            x_pred = [jnp.where(h1, xt_sel[c], x_pred[c]) for c in range(4)]
            nxt = jnp.clip(idx_sel + 1, 0, len_sel - 1)  # (shp) i32
            nxt_flat = nxt.reshape(tile)
            if all_mode:
                new_guess = list(x_succ)  # extracted in the second pass
            else:
                new_guess = [jnp.zeros(shp, jnp.float32) for _ in range(4)]
                for off in range(nsi):
                    st, _qf = load_lap(off)
                    m = t_iota == nxt_flat[None, :]
                    sel_off = best_row == off
                    for c in range(4):
                        val = jnp.sum(jnp.where(m, st[c], 0.0),
                                      axis=0).reshape(shp)
                        new_guess[c] = jnp.where(sel_off, val, new_guess[c])
            new_guess = [jnp.where(succ_m, new_guess[c], x_pred[c])
                         for c in range(4)]

            for i in range(n):
                us_ref[i, 0] = us_sel[2 * i].reshape(tile)
                us_ref[i, 1] = us_sel[2 * i + 1].reshape(tile)
            fe_ref[...] = feasible_any.reshape(tile)
            for c in range(4):
                ng_ref[c] = new_guess[c].reshape(tile)
            # winner identity for the caller's faithful warm-start append
            # (chosen point's STORED input, base.py:630-639) and the
            # successor / horizon-decrement branch (base.py:640-654)
            idx_ref[...] = idx_sel.reshape(tile)
            row_ref[...] = best_row.reshape(tile)
            succ_ref[...] = succ_m.astype(jnp.float32).reshape(tile)

    def solve(x, guess, u_warm, states, qfun, lap_len, lap_ids, lap_ok,
              obs_lanes, skip, hzn, t=None, min_cost=None):
        b = x.shape[-1]
        assert b % tile == 0, f"batch {b} must be a multiple of {tile}"
        grid = (b // tile,)
        sargs = jnp.concatenate([lap_ids.astype(jnp.int32),
                                 lap_ok.astype(jnp.int32)])

        def st_map(off):
            return lambda i, s: (s[off], 0, 0, i)

        def qf_map(off):
            return lambda i, s: (s[off], 0, i)

        if stream_safe_set:
            # pin the safe set to HBM (interpret mode has no memory spaces)
            space = pl.ANY if interpret else pltpu.HBM
            ss_specs = [pl.BlockSpec(memory_space=space),
                        pl.BlockSpec(memory_space=space),
                        pl.BlockSpec((tile,), lambda i, s: (i,))]
            ss_args = [states, qfun, jnp.arange(b, dtype=jnp.int32)]
        else:
            ss_specs = (
                [pl.BlockSpec((1, t_rows, 4, tile), st_map(off))
                 for off in range(n_offs)]
                + [pl.BlockSpec((1, t_rows, tile), qf_map(off))
                   for off in range(n_offs)])
            ss_args = [states] * n_offs + [qfun] * n_offs
        in_specs = (
            ss_specs
            + [pl.BlockSpec((max_laps, tile), lambda i, s: (0, i)),
               pl.BlockSpec((4, tile), lambda i, s: (0, i)),
               pl.BlockSpec((4, tile), lambda i, s: (0, i)),
               pl.BlockSpec((n, 2, tile), lambda i, s: (0, 0, i)),
               pl.BlockSpec((7, tile), lambda i, s: (0, i)),
               pl.BlockSpec((tile,), lambda i, s: (i,)),
               pl.BlockSpec((tile,), lambda i, s: (i,))]
            + ([pl.BlockSpec((tile,), lambda i, s: (i,)),
                pl.BlockSpec((tile,), lambda i, s: (i,))]
               if time_varying else []))
        if all_mode:
            mode_scratch = [
                pltpu.VMEM((t_rows, tile), jnp.float32),    # cost_cur
                pltpu.VMEM((t_rows, tile), jnp.float32),    # cost_best
                pltpu.VMEM((t_rows, tile), jnp.float32),    # cmp_best
            ]
        else:
            mode_scratch = [
                pltpu.VMEM((nc, 4, tile), jnp.float32),     # cand_xt
                pltpu.VMEM((nc, tile), jnp.float32),        # cand_q
                pltpu.VMEM((nc, tile), jnp.float32),        # cand_ok
                pltpu.VMEM((nc, tile), jnp.int32),          # cand_idx
            ] + ([
                pltpu.VMEM((nc, n, 2, tile), jnp.float32),  # sol_us
            ] if store_solutions else []) + [
                pltpu.VMEM((nc, tile), jnp.float32),        # cost_sc
            ]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((n, 2, tile), lambda i, s: (0, 0, i)),
                pl.BlockSpec((tile,), lambda i, s: (i,)),
                pl.BlockSpec((4, tile), lambda i, s: (0, i)),
                pl.BlockSpec((tile,), lambda i, s: (i,)),
                pl.BlockSpec((tile,), lambda i, s: (i,)),
                pl.BlockSpec((tile,), lambda i, s: (i,)),
            ] + ([pl.BlockSpec((tile,), lambda i, s: (i,)),
                  pl.BlockSpec((tile,), lambda i, s: (i,))]
                 if with_stats else []),
            scratch_shapes=mode_scratch + ([
                pltpu.VMEM((t_rows, 4, tile), jnp.float32),  # st_vmem
                pltpu.VMEM((t_rows, tile), jnp.float32),     # qf_vmem
                pltpu.SemaphoreType.DMA((2,)),               # dma_sem
            ] if stream_safe_set else []),
        )
        args = [sargs] + ss_args \
            + [lap_len, x, guess, u_warm, obs_lanes, skip,
               hzn.astype(jnp.int32)]
        if time_varying:
            if t is None or min_cost is None:
                raise ValueError("timeVarying step kernel needs t and "
                                 "min_cost inputs")
            args += [t.astype(jnp.int32), min_cost.astype(jnp.int32)]
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((n, 2, b), jnp.float32),
                jax.ShapeDtypeStruct((b,), jnp.float32),
                jax.ShapeDtypeStruct((4, b), jnp.float32),
                jax.ShapeDtypeStruct((b,), jnp.int32),
                jax.ShapeDtypeStruct((b,), jnp.int32),
                jax.ShapeDtypeStruct((b,), jnp.float32),
            ] + ([jax.ShapeDtypeStruct((b,), jnp.float32),
                  jax.ShapeDtypeStruct((b,), jnp.float32)]
                 if with_stats else []),
            interpret=interpret,
        )(*args)

    solve_jit = jax.jit(solve)

    def solve_api(x, guess, u_warm, states, qfun, lap_len, lap_ids, lap_ok,
                  obs_lanes, skip, hzn, t=None, min_cost=None):
        return solve_jit(x, guess, u_warm, states, qfun, lap_len, lap_ids,
                         lap_ok, obs_lanes, skip, hzn, t, min_cost)

    solve_api.tile = tile
    solve_api.nsi = nsi
    solve_api.k = k
    solve_api.num_horizon = n
    solve_api.max_steps = max_steps
    solve_api.max_laps = max_laps
    solve_api.max_iters = max_iters
    solve_api.store_solutions = store_solutions
    solve_api.zeros_skip = zeros_skip
    solve_api.qsort_skip = qsort_skip
    solve_api.with_stats = with_stats
    solve_api.mode = mode
    solve_api.all_iter = all_iter
    solve_api.all_rev_skip = all_rev_skip
    solve_api.prox_skip = prox_skip
    solve_api.stream_safe_set = stream_safe_set
    return solve_api
