"""Fused Pallas TPU kernel for the ENTIRE NLMPC control step.

NLMPC counterpart of ops/pallas_i2lqr_step.py: one whole calc_input
(reference iterative_ilqr/utils/base.py:557-655) per scenario lane —

    for each of the last num_ss_iter laps:
        L1-kNN of the terminal guess in the stored states (base.py:548-555)
        extract the k candidate terminal states + Qfun
    solve all nsi*k candidates by projected LM shooting   (base.py:583-595)
    cost N + Qfun if feasible else Inf                    (nonlinear_lmpc.py:197)
    lexicographic row-min + argmin selection              (base.py:605-611)
    terminal guess -> successor safe-set point            (base.py:621-622)

— fused into a single VMEM-resident kernel per tile of ``tile_rows * 128``
lanes. Safe-set lap slices stream from HBM via scalar-prefetch block indices;
candidates are solved sequentially by ONE multi-start LM while_loop instance
inside a fori_loop (per-lane lockstep-invariant, bitwise-neutral vs the
per-candidate kernel — validated in tests/test_pallas_nlmpc_step.py).
Skip lanes enter every LM loop pre-done; all-skip tiles bypass the body.

Outputs: the selected input sequence us (n, 2, B) (the caller applies us[0]
and shifts the rest into the warm start, base.py:619-639), feasible_any
(B,) f32, and the advanced terminal guess (4, B).
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
                           interpret: bool = False):
    """Factory: returns
    fn(x (4,B), guess (4,B), u_warm (n,2,B), states (max_laps,T,4,B),
       qfun (max_laps,T,B), lap_len (max_laps,B) i32, lap_ids (nsi,) i32
       [pre-clipped], lap_ok (nsi,) i32, obs (7,B), skip (B,) f32)
    -> (us (n,2,B), feasible_any (B,) f32, new_guess (4,B)).

    B must be a multiple of tile_rows*128.

    ``store_solutions=False``: candidate solves write only their cost; the
    per-lane WINNER is re-solved once after selection (a pure function of
    (x0, extracted x_term, clipped warm start) — bitwise the same solution).
    Saves the nc*2n-lane solution scratch: nsi=2 overflows the 16 MB scoped
    VMEM by 52 KB with storage, and fits without (the multi-start LM body
    carries more live state than the iLQR kernel's).

    ``zeros_skip``: lanes whose warm-start solve already converged
    (f < 1e-14) skip the zeros multi-start (see
    _pallas_nlmpc_core.feasibility_solve). NOT bitwise-neutral — gated by
    the behavior-level parity envelope (docs/PARITY.md,
    tests/test_behavior_envelope.py).

    ``qsort_skip`` (nsi=1 only): the NLMPC candidate cost n + Qfun is known
    BEFORE the solve (the solve only gates feasibility, nonlinear_lmpc.py:
    186-197), so candidates are solved in per-lane Q-ASCENDING order
    (stable 8-wide rank network on the VPU) with a running-best dominance
    skip: once any candidate is feasible, every later position has
    n + q >= best and enters the LM while_loop pre-done — the expected
    number of real solves per lane drops from k to ~1 + #(infeasible
    q-prefix). BITWISE-neutral for nsi=1: the selection argmin is first-min
    over (cost, original slot); the stable rank puts equal-q candidates in
    original-slot order, so the first feasible position IS the argmin, a
    skipped position can never beat it (cost >= best with a larger original
    slot on ties), and when no candidate is feasible every finite-q
    candidate still solves (skip requires a finite best), reproducing the
    baseline's slot-0 fallback exactly. The position loop terminates at
    tile level once every active lane is skipped: the skip predicate is
    monotone in position (q ascends per lane and a skipped position never
    lowers the running best), so the remaining tail cannot change any
    lane's selection and its per-position body overhead is not paid.
    Validated bit-for-bit in tests/test_pallas_nlmpc_step.py.
    """
    tile = tile_rows * 128
    n = num_horizon
    if n < 2:
        raise ValueError("horizon-1 is a pure reach check handled by the "
                         "controller (nonlinear_lmpc.py:199-213)")
    k = int(params.num_ss_points)
    nsi = int(params.num_ss_iter)
    if qsort_skip and nsi != 1:
        raise ValueError(
            "qsort_skip reorders candidates within the single safe-set lap; "
            "with nsi > 1 the lexicographic ROW comparison depends on every "
            "candidate's cost, so skipped solves would change selection")
    t_rows = max_steps
    consts = bake_nlmpc_consts(limits, dt)
    shp = (tile_rows, 128)
    nc = nsi * k

    def kernel(s_ref, *refs):
        st_refs = refs[0:nsi]
        qf_refs = refs[nsi:2 * nsi]
        ll_ref = refs[2 * nsi]
        x_ref, g_ref, uw_ref, obs_ref, skip_ref = refs[2 * nsi + 1:
                                                       2 * nsi + 6]
        us_ref, fe_ref, ng_ref = refs[2 * nsi + 6:2 * nsi + 9]
        if store_solutions:
            (cand_xt, cand_q, cand_ok, cand_idx,
             sol_us, cost_sc) = refs[2 * nsi + 9:]
        else:
            (cand_xt, cand_q, cand_ok, cand_idx,
             cost_sc) = refs[2 * nsi + 9:]

        F = make_nlmpc_tile_funcs(consts, n, shp)
        skip_f = skip_ref[...].reshape(shp)
        us_ref[...] = jnp.zeros((n, 2, tile), jnp.float32)
        fe_ref[...] = jnp.zeros((tile,), jnp.float32)
        ng_ref[...] = jnp.zeros((4, tile), jnp.float32)

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

            # --- kNN + candidate extraction per safe-set lap ---
            for off in range(nsi):
                st = [st_refs[off][0, :, c, :] for c in range(4)]  # (T, tile)
                qf = qf_refs[off][0]  # (T, tile)
                ll = ll_ref[s_ref[off]]  # (tile,) i32
                lap_ok = s_ref[nsi + off] > 0
                dist = (jnp.abs(st[0] - gg[0][None, :])
                        + jnp.abs(st[1] - gg[1][None, :])
                        + jnp.abs(st[2] - gg[2][None, :])
                        + jnp.abs(st[3] - gg[3][None, :]))
                valid = (t_iota < ll[None, :]) & lap_ok
                d = jnp.where(valid, dist, inf)
                for kk in range(k):
                    dmin = jnp.min(d, axis=0)
                    # first-min index == jnp.argmin (matches _topk_select)
                    j = jnp.min(jnp.where(d == dmin[None, :], t_iota, t_rows),
                                axis=0)
                    m = t_iota == j[None, :]
                    ci = off * k + kk
                    for c in range(4):
                        cand_xt[ci, c] = jnp.sum(
                            jnp.where(m, st[c], 0.0), axis=0)
                    cand_q[ci] = jnp.sum(jnp.where(m, qf, 0.0), axis=0)
                    cand_idx[ci] = j
                    cand_ok[ci] = jnp.isfinite(dmin).astype(jnp.float32)
                    d = jnp.where(m, inf, d)

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
                    # and every later candidate has n + q >= best and can
                    # only tie with a LARGER original slot (stable rank) —
                    # pre-done is selection-invariant. Position 0 always
                    # solves (the all-infeasible slot-0 fallback).
                    lane_skip = (float(n) + q_eff >= best_cost) & (p > 0)
                    skip_all = jnp.maximum(skip_f,
                                           lane_skip.astype(jnp.float32))
                    us, _xs, _te, feasible = F.feasibility_solve(
                        x0c, tuple(xt), obs, warm, skip_all, max_iters,
                        num_starts, skip_converged_starts=zeros_skip)
                    if store_solutions:
                        for i in range(n):
                            sol_us[p, i, 0] = us[i][0].reshape(tile)
                            sol_us[p, i, 1] = us[i][1].reshape(tile)
                    cost = jnp.where((feasible > 0.5) & (ok_p > 0.5)
                                     & ~lane_skip, float(n) + q_p, inf)
                    upd = cost < best_cost  # ties keep the earlier position
                    # tile-level early termination: lane_skip is MONOTONE in
                    # position (q ascends per lane; a skipped position never
                    # lowers the running best), so once every ACTIVE lane is
                    # skipped at p, every later position is too — stop
                    # paying the per-position body for the tail. Sim-skip
                    # lanes must not hold the loop open.
                    alive_nxt = jnp.max(
                        (1.0 - skip_f) * (1.0 - lane_skip.astype(jnp.float32)))
                    return (p + 1, alive_nxt,
                            jnp.where(upd, cost, best_cost),
                            jnp.where(upd, slot_p, best_slot),
                            jnp.where(upd, p, best_pos))

                # all-infeasible fallback = original slot 0 (its position is
                # solved then: skip requires a FINITE best)
                _p_fin, _a_fin, best_cost, best_slot, best_pos = \
                    jax.lax.while_loop(
                        lambda s: (s[0] < k) & (s[1] > 0.5),
                        solve_pos,
                        (jnp.int32(0), jnp.float32(1.0), inf_t,
                         jnp.zeros(shp, jnp.int32), rank[0]))
                best_row = jnp.zeros(shp, jnp.int32)
                best_col = best_slot
                ci_sel = best_slot
                store_sel = best_pos  # solutions are stored by POSITION
            else:
                # --- solve all candidates (one while_loop instance) ---
                def solve_ci(ci, _):
                    xt = tuple(cand_xt[ci, c].reshape(shp) for c in range(4))
                    us, _xs, _te, feasible = F.feasibility_solve(
                        x0c, xt, obs, warm, skip_f, max_iters, num_starts,
                        skip_converged_starts=zeros_skip)
                    if store_solutions:
                        for i in range(n):
                            sol_us[ci, i, 0] = us[i][0].reshape(tile)
                            sol_us[ci, i, 1] = us[i][1].reshape(tile)
                    q = cand_q[ci].reshape(shp)
                    okc = cand_ok[ci].reshape(shp) > 0.5
                    cost = jnp.where((feasible > 0.5) & okc,
                                     float(n) + q, inf)
                    cost_sc[ci] = cost.reshape(tile)
                    return 0

                jax.lax.fori_loop(0, nc, solve_ci, 0)

                # --- lexicographic row-min + argmin over k (base.py:605-611;
                # shared tile helper) ---
                rows = [[cost_sc[off * k + kk].reshape(shp)
                         for kk in range(k)] for off in range(nsi)]
                best_row, best_col, best_cost = lex_argmin_tile(rows, shp)
                ci_sel = best_row * k + best_col
                store_sel = ci_sel
            idx_sel = jnp.zeros(shp, jnp.int32)
            len_sel = jnp.zeros(shp, jnp.int32)
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
            else:
                # re-solve the per-lane winner (identical pure solve of the
                # same extracted terminal state and warm start — bitwise
                # the stored solution)
                xt_sel = [jnp.zeros(shp, jnp.float32) for _ in range(4)]
                for ci in range(nc):
                    sel = ci_sel == ci
                    for c in range(4):
                        xt_sel[c] = jnp.where(
                            sel, cand_xt[ci, c].reshape(shp), xt_sel[c])
                    idx_sel = jnp.where(sel, cand_idx[ci].reshape(shp),
                                        idx_sel)
                us_w, _xs_w, _te_w, _fe_w = F.feasibility_solve(
                    x0c, tuple(xt_sel), obs, warm, skip_f, max_iters,
                    num_starts, skip_converged_starts=zeros_skip)
                us_sel = []
                for i in range(n):
                    us_sel.append(us_w[i][0])
                    us_sel.append(us_w[i][1])
            for off in range(nsi):
                len_sel = jnp.where(best_row == off,
                                    ll_ref[s_ref[off]].reshape(shp), len_sel)
            feasible_any = jnp.isfinite(best_cost).astype(jnp.float32)

            # --- terminal guess -> successor safe-set point of the chosen
            # lap (base.py:621-622): one-hot row extraction per lap ---
            nxt = jnp.clip(idx_sel + 1, 0, len_sel - 1)  # (shp) i32
            nxt_flat = nxt.reshape(tile)
            new_guess = [jnp.zeros(shp, jnp.float32) for _ in range(4)]
            for off in range(nsi):
                st = [st_refs[off][0, :, c, :] for c in range(4)]
                t_iota2 = jax.lax.broadcasted_iota(jnp.int32, (t_rows, tile),
                                                   0)
                m = t_iota2 == nxt_flat[None, :]
                sel_off = best_row == off
                for c in range(4):
                    val = jnp.sum(jnp.where(m, st[c], 0.0),
                                  axis=0).reshape(shp)
                    new_guess[c] = jnp.where(sel_off, val, new_guess[c])

            for i in range(n):
                us_ref[i, 0] = us_sel[2 * i].reshape(tile)
                us_ref[i, 1] = us_sel[2 * i + 1].reshape(tile)
            fe_ref[...] = feasible_any.reshape(tile)
            for c in range(4):
                ng_ref[c] = new_guess[c].reshape(tile)

    def solve(x, guess, u_warm, states, qfun, lap_len, lap_ids, lap_ok,
              obs_lanes, skip):
        b = x.shape[-1]
        assert b % tile == 0, f"batch {b} must be a multiple of {tile}"
        grid = (b // tile,)
        sargs = jnp.concatenate([lap_ids.astype(jnp.int32),
                                 lap_ok.astype(jnp.int32)])

        def st_map(off):
            return lambda i, s: (s[off], 0, 0, i)

        def qf_map(off):
            return lambda i, s: (s[off], 0, i)

        in_specs = (
            [pl.BlockSpec((1, t_rows, 4, tile), st_map(off))
             for off in range(nsi)]
            + [pl.BlockSpec((1, t_rows, tile), qf_map(off))
               for off in range(nsi)]
            + [pl.BlockSpec((max_laps, tile), lambda i, s: (0, i)),
               pl.BlockSpec((4, tile), lambda i, s: (0, i)),
               pl.BlockSpec((4, tile), lambda i, s: (0, i)),
               pl.BlockSpec((n, 2, tile), lambda i, s: (0, 0, i)),
               pl.BlockSpec((7, tile), lambda i, s: (0, i)),
               pl.BlockSpec((tile,), lambda i, s: (i,))])
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((n, 2, tile), lambda i, s: (0, 0, i)),
                pl.BlockSpec((tile,), lambda i, s: (i,)),
                pl.BlockSpec((4, tile), lambda i, s: (0, i)),
            ],
            scratch_shapes=[
                pltpu.VMEM((nc, 4, tile), jnp.float32),     # cand_xt
                pltpu.VMEM((nc, tile), jnp.float32),        # cand_q
                pltpu.VMEM((nc, tile), jnp.float32),        # cand_ok
                pltpu.VMEM((nc, tile), jnp.int32),          # cand_idx
            ] + ([
                pltpu.VMEM((nc, n, 2, tile), jnp.float32),  # sol_us
            ] if store_solutions else []) + [
                pltpu.VMEM((nc, tile), jnp.float32),        # cost_sc
            ],
        )
        args = [sargs] + [states] * nsi + [qfun] * nsi \
            + [lap_len, x, guess, u_warm, obs_lanes, skip]
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((n, 2, b), jnp.float32),
                jax.ShapeDtypeStruct((b,), jnp.float32),
                jax.ShapeDtypeStruct((4, b), jnp.float32),
            ],
            interpret=interpret,
        )(*args)

    solve_jit = jax.jit(solve)

    def solve_api(x, guess, u_warm, states, qfun, lap_len, lap_ids, lap_ok,
                  obs_lanes, skip):
        return solve_jit(x, guess, u_warm, states, qfun, lap_len, lap_ids,
                         lap_ok, obs_lanes, skip)

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
    return solve_api
