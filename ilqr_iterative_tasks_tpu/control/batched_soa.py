"""Batch-native (structure-of-arrays) i2LQR learning simulator — the
production throughput path for TPU.

Same closed-loop semantics as control/batched.py (which documents the parity
map against /root/reference/iterative_ilqr/utils/base.py:305-479, :693-726),
but the scenario batch B is an explicit TRAILING axis of every tensor instead
of a vmapped leading axis. Combined with ops/ilqr_soa.py this keeps the TPU
lane dimension filled by the batch (vmap's leading-axis layout pads the tiny
trailing state dims 4 -> 128 and was measured 60x slower at scale).

Batch-relevant semantics:
- All B scenarios run in lockstep; a lane that finishes its lap freezes (done
  masking) until every lane finishes or the step budget runs out.
- Lap counting is global (every lane records a lap each lap round, as in the
  reference driver loop, tests/ilqr_test.py:56-60).
- Plant noise: iid per lane per step from one PRNG stream (clipped Gaussian,
  base.py:197-213), gated by scenarios.noise_on.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from ilqr_iterative_tasks_tpu.models.obstacle import Obstacle
from ilqr_iterative_tasks_tpu.ops.ilqr_soa import ilqr_solve_soa, step_soa
from ilqr_iterative_tasks_tpu.utils.params import IlqrParams, SystemLimits


@struct.dataclass
class SoaScenarios:
    """Scenario batch, batch-trailing: x0/goal (4, B); obstacle leaves (B,)."""

    x0: jnp.ndarray
    goal: jnp.ndarray
    obstacle: Obstacle
    noise_on: jnp.ndarray  # (B,)

    @classmethod
    def broadcast(cls, x0, goal, obstacle: Obstacle, batch: int,
                  noise_on=False, dtype=jnp.float32):
        rep = lambda v: jnp.broadcast_to(jnp.asarray(v, dtype), (batch,))
        obs_b = jax.tree_util.tree_map(rep, obstacle)
        return cls(
            x0=jnp.broadcast_to(jnp.asarray(x0, dtype)[:, None], (4, batch)),
            goal=jnp.broadcast_to(jnp.asarray(goal, dtype)[:, None], (4, batch)),
            obstacle=obs_b,
            noise_on=jnp.full((batch,), 1.0 if noise_on else 0.0, dtype),
        )

    @classmethod
    def randomized(cls, base_x0, goal, obstacle: Obstacle, batch: int, key,
                   *, x0_jitter: float = 0.5, obs_pos_jitter: float = 4.0,
                   obs_spd_jitter: float = 0.0, noise_on=True,
                   dtype=jnp.float32):
        """Per-lane randomized scenarios (BASELINE config 4): jittered
        initial states and heterogeneous obstacle positions/speeds. Every
        lane carries its own obstacle — the SoA sims and both Pallas kernels
        take per-lane obstacle parameters, so this is retrace-free.

        ``x0_jitter``: scalar or per-component (4,) scale. NOTE: i2LQR (the
        reference algorithm, reproduced faithfully) is brittle to initial
        HEADING/VELOCITY offsets: at sigma 0.5 on theta_0 ~18% of lanes
        park at a stationary point by lap 3-4 (verified identical in the
        host controller). Position-only jitter is robust (99%+)."""
        base = cls.broadcast(base_x0, goal, obstacle, batch,
                             noise_on=noise_on, dtype=dtype)
        k1, k2, k3, k4 = jax.random.split(key, 4)
        scale = jnp.broadcast_to(
            jnp.asarray(x0_jitter, dtype).reshape(-1, 1), (4, batch))
        x0 = base.x0 + scale * jax.random.normal(k1, (4, batch), dtype)
        obs = base.obstacle.replace(
            x=base.obstacle.x
            + obs_pos_jitter * jax.random.normal(k2, (batch,), dtype),
            y=base.obstacle.y
            + obs_pos_jitter * jax.random.normal(k3, (batch,), dtype),
            spd=jnp.maximum(
                base.obstacle.spd
                + obs_spd_jitter * jax.random.normal(k4, (batch,), dtype),
                0.0),
        )
        return base.replace(x0=x0, obstacle=obs)


class SoaRunResult(NamedTuple):
    lap_steps: jnp.ndarray  # (num_laps, B)
    lap_done: jnp.ndarray  # (num_laps, B)
    final_x: jnp.ndarray  # (4, B)
    # checkpoint state: pass (safe_set, lap_count, final_key) back in via
    # ``resume_from`` to continue the sweep exactly where it stopped
    safe_set: tuple = ()  # (states, qfun, valid, lap_len) batch-trailing
    lap_count: jnp.ndarray = None  # scalar: laps stored incl. seed
    final_key: jnp.ndarray = None
    # straggler instrumentation (step solver built with_stats=True only):
    # (iters_useful (B,), iters_executed (B,), queue_floor (B,)) summed over
    # the whole run — see build_fused_i2lqr_step(with_stats=True)
    iter_stats: tuple = ()


def _stable_partition(to_tail):
    """Stable-partition permutation: entries with ``to_tail`` False first.

    to_tail: (M,) bool. Returns (dst, src, n_front) where dst[i] is the
    destination of entry i, src[j] is the source of destination j
    (so ``A_perm = take(A, src, -1)`` and ``A[..., i] == A_perm[..., dst[i]]``),
    and n_front counts the False entries. Two cumsums + one scatter — cheaper
    than argsort on TPU. Shared by the inactive-lane compaction of both SoA
    simulators and the dedup-pass compaction below.
    """
    keep = (~to_tail).astype(jnp.int32)
    c_keep = jnp.cumsum(keep)
    n_front = c_keep[-1]
    m = to_tail.shape[0]
    dst = jnp.where(~to_tail, c_keep - 1,
                    n_front + jnp.cumsum(1 - keep) - 1)  # (M,)
    src = jnp.zeros((m,), jnp.int32).at[dst].set(
        jnp.arange(m, dtype=jnp.int32))
    return dst, src, n_front


def _take_lanes(a, idx):
    """Permute the trailing LANE axis: a[..., idx] for any-rank a.

    Lowered as transpose -> row gather -> transpose: a direct trailing-axis
    gather with per-lane indices runs on the TPU scalar core (~1.7 ns per
    element — CLAUDE.md layout rules), while rows of the transposed array
    are contiguous slices the gather handles at near memory bandwidth.
    Measured on v5e at the production shapes (round5_probe permute): the
    503 MB safe-set block permutes in ~3.9 ms either way (XLA lowers the
    large 2-D lane gather at ~250 GB/s — the scalar-core cliff applies to
    the small-row shapes of the layout rules, not here); the transpose
    form is ~2x faster on the mid-size record blocks and never slower.
    """
    if a.ndim == 1:
        return jnp.take(a, idx, axis=0)
    flat = a.reshape((-1, a.shape[-1]))
    return jnp.take(flat.T, idx, axis=0).T.reshape(a.shape)


def _permute_lanes(tree, idx):
    """Apply ``_take_lanes`` to every array leaf of a pytree (all leaves
    must be lane-trailing)."""
    return jax.tree_util.tree_map(lambda a: _take_lanes(a, idx), tree)


def _unpermute_idx(orig_id, b):
    """Inverse-permutation indices: take(A_perm, inv, -1) restores original
    lane order (inv[j] = current position of original lane j)."""
    return jnp.zeros((b,), jnp.int32).at[orig_id].set(
        jnp.arange(b, dtype=jnp.int32))


def _step_solver_inputs(lap_count, nsi, max_laps, inactive, b):
    """Prefetch lap ids / validity flags + skip mask for the whole-step
    fused kernels (shared by both SoA simulators)."""
    offs = jnp.arange(nsi, dtype=jnp.int32)
    lap_id = lap_count - nsi + offs  # (nsi,)
    lap_ok = (lap_id >= 0).astype(jnp.int32)
    lap_ids = jnp.clip(lap_id, 0, max_laps - 1).astype(jnp.int32)
    skip = (inactive.astype(jnp.float32) if inactive is not None
            else jnp.zeros((b,), jnp.float32))
    return lap_ids, lap_ok, skip


def _topk_select(dist, k, arrs):
    """k smallest-distance rows per lane + row extraction, gather-free.

    dist: (T, B) with +inf on invalid rows; arrs: list of (T, B) arrays to
    read at the selected rows. Returns (idx (K, B) i32, dval (K, B),
    [sel (K, B) per arr]).

    Matches ``lax.top_k(-dist.T, k)`` ordering exactly for selectable rows:
    ascending distance, ties broken toward the lower row index (argmin is
    first-min). Once every remaining row is +inf (k exceeds the valid count)
    argmin repeats row 0 where top_k would emit distinct padded indices —
    callers mask those candidates via ``isfinite(dval)`` in both schemes, so
    closed-loop behavior is identical.

    WHY: XLA lowers take_along_axis/top_k on these shapes to per-ELEMENT
    gathers on the TPU scalar core (~10 ns/element — the fifteen (8, B)
    gathers were 1.34 ms EACH at B=16k, ~85% of a control step). The
    argmin + one-hot mask-reduce forms below stay on the VPU with the batch
    riding the lane dimension. (Selection-by-sum flips a stored -0.0 to
    +0.0; nothing downstream is sign-of-zero sensitive.)
    """
    rows = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 0)
    d = dist
    idxs, dvals, sels = [], [], [[] for _ in arrs]
    for _ in range(k):
        j = jnp.argmin(d, axis=0).astype(jnp.int32)  # (B,) first-min
        m = rows == j[None, :]
        dvals.append(jnp.min(d, axis=0))
        idxs.append(j)
        for a_i, a in enumerate(arrs):
            sels[a_i].append(jnp.sum(jnp.where(m, a, 0.0), axis=0))
        d = jnp.where(m, jnp.inf, d)
    return (jnp.stack(idxs), jnp.stack(dvals),
            [jnp.stack(s) for s in sels])


def _lex_argmin_rows(cost_rows):
    """Per-lane lexicographic row argmin. cost_rows: (L, K, B) -> (B,) int.

    Mirrors Python's min() over a list of per-lap cost lists (base.py:462).
    """
    num_rows = cost_rows.shape[0]
    best = jnp.zeros(cost_rows.shape[-1], dtype=jnp.int32)

    def row(i_arr):
        # gather row per lane: (K, B) given per-lane row indices (B,)
        return jnp.take_along_axis(
            cost_rows, i_arr[None, None, :].astype(jnp.int32), axis=0)[0]

    for i in range(1, num_rows):
        a = cost_rows[i]  # (K, B)
        b = row(best)  # (K, B)
        diff = a != b
        any_diff = jnp.any(diff, axis=0)
        first = jnp.argmax(diff, axis=0)  # (B,)
        a_first = jnp.take_along_axis(a, first[None, :], axis=0)[0]
        b_first = jnp.take_along_axis(b, first[None, :], axis=0)[0]
        less = jnp.where(any_diff, a_first < b_first, False)
        best = jnp.where(less, i, best)
    return best


@partial(jax.jit, static_argnames=("num_laps", "max_steps", "max_laps",
                                   "goal_append", "sim_step_budget",
                                   "solver_max_iter", "pallas_solver",
                                   "pallas_step_solver", "dedup_passes",
                                   "stall_reseed", "retile_frac",
                                   "tail_shrink", "precision_islands"))
def simulate_learning_runs_soa(params: IlqrParams, limits: SystemLimits,
                               scenarios: SoaScenarios, seed_xs, seed_us,
                               seed_len, dt, key, *, num_laps: int,
                               max_steps: int = 128, max_laps: int = 16,
                               goal_append: bool = True,
                               sim_step_budget: int = 121,
                               solver_max_iter: int | None = None,
                               pallas_solver=None,
                               pallas_step_solver=None,
                               dedup_passes: bool = False,
                               stall_reseed: int | None = None,
                               retile_frac: float | None = None,
                               tail_shrink: int | None = None,
                               precision_islands: tuple = (),
                               resume_from=None) -> SoaRunResult:
    """Seed + ``num_laps`` learning laps for B scenarios, batch-trailing.

    seed_xs: (max_steps, 4) shared seed lap (padded); seed_us: (max_steps, 2);
    seed_len: scalar count of seed states. ``solver_max_iter`` caps the
    lockstep LM iterations of the candidate solver (None = reference's 150).
    ``pallas_solver``: optional fused-kernel backend from
    ops.pallas_ilqr.build_fused_ilqr (build it with the SAME params/limits/dt
    and matching max_iter); k*B must be a multiple of its tile size. Static
    arg: a new factory function triggers a retrace.

    ``resume_from``: optional (safe_set, lap_count, key) checkpoint from a
    previous result — the run continues with the stored safe set (the seed
    args are ignored) and runs ``num_laps`` FURTHER laps; exact resume
    requires passing the checkpointed key (utils.checkpoint.save_soa_run).
    (``dedup_passes`` requires a pallas_solver.)

    ``dedup_passes``: skip candidate solves in relaxation passes 2/3 that are
    exact duplicates of a pass-1/2 solve (same safe-set index for the same
    scenario ⇒ same x0/x_term/u_init/lamb ⇒ bitwise-identical pure solve) by
    substituting the cached result. Duplicate lanes are compacted to the
    batch tail and enter the fused kernel pre-done, so whole tiles exit at
    iteration zero. Bitwise-neutral by construction (validated in
    tests/test_batched.py). Requires ``pallas_solver`` built with
    ``with_skip=True``.

    MEASURED NEGATIVE on v5e at the headline config (k=8, nsi=1): 3.2k
    lap-sims/s at B=16384 vs ~5.6k without — the per-pass cache gathers and
    lane compaction on batch-trailing tensors cost more than the whole-tile
    early exits save, and B=65536 hit a device fault. Keep OFF for the
    headline; revisit for enlarged-candidate configs (k=32, nsi=4) where the
    duplicate mass per pass is much larger.

    ``retile_frac`` (periodic straggler re-tiling, default OFF): the step
    kernel runs each (tile_rows, 128)-lane tile to its slowest lane, and
    near lap ends ~0.3% straggler lanes scattered uniformly keep ~95% of
    tiles hot while >99% of lanes are done-frozen (docs/PERF.md roofline).
    With ``retile_frac=f``, whenever the number of solver-inactive lanes
    (done | replay) has grown by >= f*B since the last permutation, the
    ENTIRE per-lane simulation state (solver carry, records, safe set,
    scenario leaves) is stably partitioned so active lanes share tiles —
    straggler tiles compact together and the rest go all-skip. Per-lane
    plant-noise streams follow their lane (draws are generated in original
    lane order and routed by the carried ``orig_id``), and all outputs are
    returned in ORIGINAL lane order, so the transformation is a pure
    schedule change: results are BITWISE identical to ``retile_frac=None``
    (validated in tests/test_batched.py). The permutation itself uses the
    transpose-row-gather form (~5 ms for the full state at B=49k, measured)
    and fires a bounded number of times per lap (<= 1/f).

    ``stall_reseed`` (robustness guard, default OFF — behavior then matches
    the reference exactly): the i2LQR parked-lane failure mode (docs/PERF.md
    "Randomized scenario sweeps") is a lane whose kNN keeps selecting an
    in-place candidate: the winner's time-to-go Qfun stops decreasing and
    the vehicle sits at a stationary point off the track. With
    ``stall_reseed=S``, a lane whose chosen candidate's Qfun has not
    strictly decreased for S consecutive control steps gets its PASS-0 kNN
    guess re-seeded to the GOAL (instead of the current state,
    base.py:398), pulling the candidate set toward goal-ward safe-set
    points; the relaxed-reach tiers (80/10^pass, base.py:427-437) make
    distant candidates selectable, so the solver drives out of the parking
    orbit. Within-envelope on nominal scenarios (the winner's q decreases
    nearly every step, so S=3+ almost never fires —
    tests/test_behavior_envelope.py); measured effect on the randomized
    moving-obstacle canary in docs/PERF.md.
    """
    if dedup_passes and pallas_solver is None:
        raise ValueError("dedup_passes requires a pallas_solver "
                         "(built with with_skip=True)")
    if pallas_solver is not None:
        cap = 150 if solver_max_iter is None else solver_max_iter
        built = getattr(pallas_solver, "max_iter", cap)
        if built != cap:
            raise ValueError(
                f"pallas_solver was built with max_iter={built}; the "
                f"simulator's lockstep cap is solver_max_iter={cap}")
    if pallas_step_solver is not None:
        # the whole-control-step fused kernel replaces the per-candidate
        # solver AND all of the selection glue — mutually exclusive backends
        if pallas_solver is not None or dedup_passes:
            raise ValueError("pallas_step_solver replaces pallas_solver/"
                             "dedup_passes — pass only one backend")
        s = pallas_step_solver
        if (s.k != params.num_ss_points or s.nsi != params.num_ss_iter
                or s.num_horizon != params.num_horizon
                or s.max_steps != max_steps or s.max_laps != max_laps):
            raise ValueError(
                "pallas_step_solver was built for (k, nsi, n, max_steps, "
                f"max_laps)=({s.k}, {s.nsi}, {s.num_horizon}, {s.max_steps}, "
                f"{s.max_laps}); the simulator was called with "
                f"({params.num_ss_points}, {params.num_ss_iter}, "
                f"{params.num_horizon}, {max_steps}, {max_laps})")
        # the LM iteration cap is baked into the kernel at build time; a
        # builder/simulator mismatch would diverge silently (the cap is
        # behavior-relevant — see the cap ladder in docs/PERF.md)
        cap = 150 if solver_max_iter is None else solver_max_iter
        if s.max_iter != cap:
            raise ValueError(
                f"pallas_step_solver was built with max_iter={s.max_iter}; "
                f"the simulator's lockstep cap is solver_max_iter={cap}")
    # the record scatter writes row t_next == sim_step_budget on the final
    # step of a budget-exhausted lane, and goal_append writes one row past
    # that — require room so no scatter ever goes out of bounds
    if max_steps < sim_step_budget + (2 if goal_append else 1):
        raise ValueError(
            f"max_steps={max_steps} too small for sim_step_budget="
            f"{sim_step_budget} (+{2 if goal_append else 1} recorded rows)")
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
        if stall_reseed is not None:
            raise ValueError("tail_shrink with stall_reseed is not "
                             "supported (the stall extraction reads "
                             "full-width per-step sweeps)")
        if pallas_step_solver is not None and (
                tail_shrink % pallas_step_solver.tile != 0):
            raise ValueError(
                f"tail_shrink={tail_shrink} must be a multiple of the "
                f"step kernel tile {pallas_step_solver.tile}")

    # ---- safe set, batch-trailing ----
    ss_states = jnp.zeros((max_laps, max_steps, 4, b), dtype)
    ss_qfun = jnp.zeros((max_laps, max_steps, b), dtype)
    ss_valid = jnp.zeros((max_laps, max_steps, b), dtype=bool)
    ss_lap_len = jnp.zeros((max_laps, b), jnp.int32)

    t_idx = jnp.arange(max_steps)

    def add_lap(ss, slot, xs_rec, n_valid):
        """xs_rec: (max_steps, 4, B); n_valid: (B,)."""
        states, qfun, valid, lap_len = ss
        valid_row = t_idx[:, None] < n_valid[None, :]
        qfun_row = jnp.maximum(
            n_valid[None, :].astype(dtype) - 1.0
            - t_idx[:, None].astype(dtype), 0.0)
        return (states.at[slot].set(xs_rec),
                qfun.at[slot].set(qfun_row),
                valid.at[slot].set(valid_row),
                lap_len.at[slot].set(n_valid.astype(jnp.int32)))

    if resume_from is None:
        seed_rec = jnp.broadcast_to(seed_xs[:, :, None], (max_steps, 4, b))
        ss0 = add_lap((ss_states, ss_qfun, ss_valid, ss_lap_len), 0, seed_rec,
                      jnp.full((b,), seed_len, jnp.int32))
        lap0 = jnp.asarray(1, jnp.int32)  # safe set holds the seed lap
    else:
        ss0, lap0, key = resume_from
        lap0 = jnp.asarray(lap0, jnp.int32)

    use_skip = (pallas_solver is not None and not dedup_passes
                and getattr(pallas_solver, "with_skip", False))
    stats_on = (pallas_step_solver is not None
                and getattr(pallas_step_solver, "with_stats", False))

    def solve_step(ss, lap_count, x, g0, obstacle, inactive=None,
                   compacted=None):
        """One i2LQR calc_input for all B lanes.

        x: (4, B); g0: (4, B) pass-0 kNN guess (normally x, base.py:398;
        the stall-reseed guard substitutes the goal). Returns
        (u (2, B), u_old (N, 2, B), shrink (B,), idx_sel (B,) i32,
        row_sel (B,) i32, stats).

        ``inactive``: (B,) bool — lanes whose solve result the caller will
        discard (finished-lap and replay-mode lanes). When the fused kernel
        was built ``with_skip=True``, active lanes are stably compacted to the
        batch front and inactive lanes enter the kernel pre-done, so whole
        tiles past the active count exit at iteration zero. Bitwise-neutral
        for active lanes (per-lane results are tile-membership invariant);
        inactive-lane outputs are the u_init rollout, discarded by the
        caller's masking. Measured ~2.9x on the learning run at B=16k
        (stragglers drag every lap to the 121-step budget; late steps are
        >99% done lanes).

        NOTE: candidate solves are zeros-initialized per candidate, as in the
        reference (base.py:405). Warm-starting from the carried plan was
        measured to TRAP the LM in the previous local solution (laps stall at
        ~30 steps vs 24) with no throughput win — do not "optimize" this.
        """
        if pallas_step_solver is not None:
            # fused whole-step kernel (ops/pallas_i2lqr_step.py): kNN,
            # 3 relaxation passes, nsi*k candidate solves, lexicographic
            # selection and the shrink trigger all happen in-kernel; the
            # safe-set lap slices stream via scalar-prefetch block indices.
            # No lane compaction: skipped lanes enter pre-done and all-skip
            # tiles bypass the body, without any scalar-core gathers.
            from ilqr_iterative_tasks_tpu.ops.pallas_ilqr import (
                obstacle_to_lanes)
            states, qfun, valid, lap_len = ss
            obs_l = obstacle_to_lanes(obstacle, b)
            lap_ids, lap_ok, skip = _step_solver_inputs(
                lap_count, nsi, max_laps, inactive, b)

            # Idle-step kernel skip (bitwise-neutral): once every lane is
            # solver-inactive (done | replay — the ENTIRE budget tail of a
            # lap: the 0.3% creep lanes replay, they don't solve), the
            # kernel's outputs are exactly its zero-init (all-skip tiles
            # never run the body), so the launch — whose per-step cost is
            # the 48-tile block-DMA floor, ~0.76 ms at B=49k — is pure
            # waste. lax.cond returns the same zeros directly. Measured
            # ~neutral at B=49152 (134.5k vs 131.4k, within run variance —
            # one active lane anywhere in the batch keeps the launch) but
            # free, and it fires through fully-idle phases (small batches,
            # zero-noise tails). docs/PERF.md round-5.
            def _run_kernel(xa):
                x_, g0_, skip_ = xa
                return tuple(pallas_step_solver(
                    x_, g0_, states, qfun, lap_len, lap_ids, lap_ok, obs_l,
                    skip_))

            def _idle(xa):
                z = (jnp.zeros((n, 2, b), jnp.float32),
                     jnp.zeros((b,), jnp.float32),
                     jnp.zeros((b,), jnp.int32),
                     jnp.zeros((b,), jnp.int32))
                if stats_on:
                    z = z + (jnp.zeros((b,), jnp.float32),) * 3
                return z

            if tail_shrink is not None:
                # tail prefix-shrink (round 5): once the not-done lanes sit
                # in the first ``tail_shrink`` columns (the 3-way compaction
                # permute guarantees it, and done-ness is monotone within a
                # lap), the kernel runs on that static prefix only; the
                # padded columns return the zeros skip lanes produce anyway
                # — bitwise-identical, but the 48-tile block-DMA floor
                # shrinks to the prefix's tiles.
                _Bs = tail_shrink

                def _run_small(xa):
                    x_, g0_, skip_ = xa
                    o = pallas_step_solver(
                        x_[:, :_Bs], g0_[:, :_Bs], states[..., :_Bs],
                        qfun[..., :_Bs], lap_len[..., :_Bs], lap_ids,
                        lap_ok, obs_l[..., :_Bs], skip_[:_Bs])
                    pads = _idle(xa)
                    return tuple(
                        jnp.concatenate([a, pz[..., _Bs:]], axis=-1)
                        for a, pz in zip(o, pads))

                def _run_active(xa):
                    return jax.lax.cond(compacted > 0.5, _run_small,
                                        _run_kernel, xa)
            else:
                _run_active = _run_kernel
            out = jax.lax.cond(jnp.min(skip) < 0.5, _run_active, _idle,
                               (x, g0, skip))
            us_sel, shrink_f, idx_o, row_o = out[0], out[1], out[2], out[3]
            stats = tuple(out[4:7]) if stats_on else None
            u = us_sel[0]
            u_old = jnp.concatenate(
                [us_sel[1:], jnp.zeros((1, 2, b), dtype)], axis=0)
            return u, u_old, shrink_f > 0.5, idx_o, row_o, stats

        states, qfun, valid, lap_len = ss
        zeros_ws = jnp.zeros((n, 2, b), dtype)
        if use_skip and inactive is not None:
            lane_dst, lane_src, n_act = _stable_partition(inactive)
            skip_sorted = (jnp.arange(b) >= n_act).astype(jnp.float32)
            skip_kb = jnp.broadcast_to(skip_sorted[None, :],
                                       (k, b)).reshape(k * b)
            x_perm = jnp.take(x, lane_src, axis=-1)
        else:
            lane_dst = lane_src = skip_kb = x_perm = None

        def one_pass(outer: int, x_guess, cache=None):
            u_ws = zeros_ws
            rows_cost, rows_sol_us, rows_sol_xN, rows_idx, rows_lap = \
                [], [], [], [], []
            rows_cmp = []
            row_ok = []
            new_cache = []
            for off in range(nsi):
                lap_id = lap_count - nsi + off
                lap_ok = lap_id >= 0
                lap_id_c = jnp.clip(lap_id, 0, max_laps - 1)
                st = states[lap_id_c]  # (T, 4, B)
                dist = (jnp.abs(st[:, 0] - x_guess[0][None])
                        + jnp.abs(st[:, 1] - x_guess[1][None])
                        + jnp.abs(st[:, 2] - x_guess[2][None])
                        + jnp.abs(st[:, 3] - x_guess[3][None]))  # (T, B)
                dist = jnp.where(valid[lap_id_c], dist, jnp.inf)
                # kNN + candidate extraction in one gather-free sweep; when
                # k exceeds the stored lap length the overflow candidates
                # carry dval=inf and are masked out of the sweep (the host
                # path returns fewer candidates instead, base.py:332-341)
                idx_kb_sel, dval, (x0s, x1s, x2s, x3s, q_terms) = \
                    _topk_select(dist, k, [st[:, 0], st[:, 1], st[:, 2],
                                           st[:, 3], qfun[lap_id_c]])
                cand_ok = jnp.isfinite(dval)  # (K, B)
                x_terms = jnp.stack([x0s, x1s, x2s, x3s])  # (4, K, B)
                x0b = jnp.broadcast_to(x[:, None, :], (4, k, b))
                u_init_kb = jnp.broadcast_to(u_ws[:, :, None, :],
                                             (n, 2, k, b))
                if pallas_solver is not None:
                    from ilqr_iterative_tasks_tpu.ops.pallas_ilqr import (
                        obstacle_to_lanes)
                    obs_l = obstacle_to_lanes(obstacle, b)  # (6, B)
                    obs_kb = jnp.broadcast_to(
                        obs_l[:, None, :], (6, k, b)).reshape(6, k * b)
                    idx_kb = idx_kb_sel  # (K, B) int32
                    if dedup_passes and cache is not None:
                        # Cross-pass dedup: a candidate re-selected from the
                        # same safe-set slot is the SAME pure solve (x0,
                        # u_init=zeros, lamb, obstacle are pass-invariant
                        # within a control step) — reuse the cached result.
                        ent = cache[off]
                        # the fresh candidate must itself be selectable:
                        # overflow candidates (k > stored lap length) repeat
                        # idx 0 and would spuriously "match" a valid cached
                        # slot-0 entry — keep the invariant explicit here
                        # rather than relying on the downstream cost mask.
                        match = ((idx_kb[:, None, :] == ent["idx"][None])
                                 & ent["ok"][None]
                                 & cand_ok[:, None, :])  # (K, C, B)
                        found = jnp.any(match, axis=1)  # (K, B)
                        src = jnp.argmax(match, axis=1)  # (K, B)
                        us_cached = jnp.take_along_axis(
                            ent["us"], src[None, None], axis=2)
                        xl_cached = jnp.take_along_axis(
                            ent["xl"], src[None], axis=1)
                        d_cached = jnp.take_along_axis(ent["d"], src, axis=0)
                        # Compact duplicates to the tail so whole kernel
                        # tiles start all-done and exit at iteration zero.
                        skip_flat = found.reshape(k * b)
                        pos, inv, _num_fresh = _stable_partition(skip_flat)
                        us_f, xl_f, cost_f, d_f = pallas_solver(
                            x0b.reshape(4, k * b)[:, inv],
                            x_terms.reshape(4, k * b)[:, inv],
                            u_init_kb.reshape(n, 2, k * b)[:, :, inv],
                            obs_kb[:, inv],
                            skip_flat[inv].astype(jnp.float32))
                        us_f = us_f[:, :, pos]
                        xl_f = xl_f[:, pos]
                        d_f = d_f[pos]
                        sol_us = jnp.where(found[None, None], us_cached,
                                           us_f.reshape(n, 2, k, b))
                        x_last = jnp.where(found[None], xl_cached,
                                           xl_f.reshape(4, k, b))
                        d = jnp.where(found, d_cached, d_f.reshape(k, b))
                    elif lane_src is not None:
                        # inactive-lane compaction (see solve_step docstring):
                        # u_init is zeros (permutation-invariant), x0/obs/
                        # x_terms gathered by lane_src, outputs gathered back
                        # by lane_dst (A[:, i] == P[:, lane_dst[i]]).
                        x0b_p = jnp.broadcast_to(x_perm[:, None, :], (4, k, b))
                        xt_p = jnp.take(x_terms, lane_src, axis=-1)
                        obs_p = jnp.take(obs_l, lane_src, axis=-1)
                        obs_kb_p = jnp.broadcast_to(
                            obs_p[:, None, :], (6, k, b)).reshape(6, k * b)
                        us_f, xl_f, cost_f, d_f = pallas_solver(
                            x0b_p.reshape(4, k * b), xt_p.reshape(4, k * b),
                            u_init_kb.reshape(n, 2, k * b), obs_kb_p, skip_kb)
                        sol_us = jnp.take(us_f.reshape(n, 2, k, b), lane_dst,
                                          axis=-1)
                        x_last = jnp.take(xl_f.reshape(4, k, b), lane_dst,
                                          axis=-1)
                        d = jnp.take(d_f.reshape(k, b), lane_dst, axis=-1)
                    else:
                        us_f, xl_f, cost_f, d_f = pallas_solver(
                            x0b.reshape(4, k * b), x_terms.reshape(4, k * b),
                            u_init_kb.reshape(n, 2, k * b), obs_kb)
                        sol_us = us_f.reshape(n, 2, k, b)
                        x_last = xl_f.reshape(4, k, b)
                        d = d_f.reshape(k, b)
                    if dedup_passes:
                        ent_new = dict(idx=idx_kb, ok=cand_ok & lap_ok,
                                       us=sol_us, xl=x_last, d=d)
                        if cache is not None:
                            prev = cache[off]
                            ent_new = dict(
                                idx=jnp.concatenate(
                                    [prev["idx"], ent_new["idx"]], axis=0),
                                ok=jnp.concatenate(
                                    [prev["ok"], ent_new["ok"]], axis=0),
                                us=jnp.concatenate(
                                    [prev["us"], ent_new["us"]], axis=2),
                                xl=jnp.concatenate(
                                    [prev["xl"], ent_new["xl"]], axis=1),
                                d=jnp.concatenate(
                                    [prev["d"], ent_new["d"]], axis=0))
                        new_cache.append(ent_new)
                else:
                    sol = ilqr_solve_soa(
                        params, limits, obstacle, x0b, x_terms,
                        u_init_kb, params.lamb, dt,
                        num_horizon=n, max_iter=solver_max_iter,
                        precision_islands=precision_islands)
                    sol_us = sol.us
                    x_last = sol.xs[-1]
                    d = jnp.sqrt(sum((x_last[i] - x_terms[i]) ** 2
                                     for i in range(4)))  # (K, B)
                unit = 80.0 / (10 ** outer)
                i_rel = jnp.maximum(jnp.ceil(d / unit - 1e-12), 1.0)
                cost = jnp.where(d <= unit * params.max_relax_iter,
                                 q_terms + float(n) + 100.0 * i_rel, jnp.inf)
                cost = jnp.where(cand_ok & lap_ok, cost, jnp.inf)
                # ragged Python-list comparison tensor (base.py:462: min()
                # over per-lap candidate cost LISTS): when k exceeds a
                # stored lap's length the reference list is shorter, and a
                # strict-prefix list ranks BELOW its extension — emulated by
                # ranking absent tail slots -inf in a comparison-only tensor
                # (mirrors batched_nlmpc_soa's general path; real costs keep
                # +inf so the within-row argmin and feasibility mask are
                # unchanged). INVARIANT: valid slots are a per-lane PREFIX
                # of each row (_topk_select fills selectable rows first), so
                # -inf padding == list comparison; rows of non-existent laps
                # rank above everything.
                cmp = jnp.where(lap_ok,
                                jnp.where(cand_ok, cost, -jnp.inf), jnp.inf)
                rows_cost.append(cost)
                rows_cmp.append(cmp)
                rows_sol_us.append(sol_us)  # (N, 2, K, B)
                rows_sol_xN.append(x_last)  # (4, K, B)
                rows_idx.append(idx_kb_sel)  # (K, B)
                rows_lap.append(jnp.full((b,), lap_id_c, jnp.int32))
                row_ok.append(lap_ok)
            cost_rows = jnp.stack(rows_cost)  # (L, K, B)
            best_row = _lex_argmin_rows(jnp.stack(rows_cmp))  # (B,)
            row_cost = jnp.take_along_axis(
                cost_rows, best_row[None, None, :].astype(jnp.int32),
                axis=0)[0]  # (K, B)
            best_col = jnp.argmin(row_cost, axis=0)  # (B,)

            def pick(stacked):
                """stacked: (L, ..., K, B) -> (..., B) at (best_row, best_col)."""
                r = jnp.take_along_axis(
                    stacked,
                    best_row.reshape((1,) * (stacked.ndim - 1) + (b,)).astype(
                        jnp.int32), axis=0)[0]  # (..., K, B)
                return jnp.take_along_axis(
                    r, best_col.reshape((1,) * (r.ndim - 2) + (1, b)).astype(
                        jnp.int32), axis=-2)[..., 0, :]

            us_sel = pick(jnp.stack(rows_sol_us))  # (N, 2, B)
            xl_sel = pick(jnp.stack(rows_sol_xN))  # (4, B) terminal states
            idx_sel = pick(jnp.stack(rows_idx))  # (B,)
            lap_sel = jnp.take_along_axis(
                jnp.stack(rows_lap), best_row[None, :].astype(jnp.int32),
                axis=0)[0]  # (B,)
            return (xl_sel, us_sel, idx_sel, lap_sel,
                    best_row.astype(jnp.int32), new_cache)

        xg = tuple(g0[i] for i in range(4))
        xl_p, us_p, idx_c, lap_c, row_c, cch = one_pass(0, xg)
        xl_p, us_p, idx_c, lap_c, row_c, cch = one_pass(
            1, tuple(xl_p[i] for i in range(4)), cch if dedup_passes else None)
        xl_p, us_p, idx_c, lap_c, row_c, _ = one_pass(
            2, tuple(xl_p[i] for i in range(4)), cch if dedup_passes else None)
        chosen_len = jnp.take_along_axis(lap_len, lap_c[None, :], axis=0)[0]
        shrink = (idx_c + 1) > (chosen_len - 1)
        u = us_p[0]  # (2, B)
        u_old = jnp.concatenate([us_p[1:], jnp.zeros((1, 2, b), dtype)], axis=0)
        return u, u_old, shrink, idx_c.astype(jnp.int32), row_c, None

    retile_block = (None if retile_frac is None
                    else max(1, int(round(retile_frac * b))))

    def run_lap(ss, lap_count, key, scen_p, orig_id, acc0):
        """One closed-loop lap. Under re-tiling, ``scen_p`` (a SoaScenarios
        pytree) and ``orig_id`` carry the permuted scenario leaves and the
        original lane ids; with retile off they pass through untouched."""

        def step_cond(c):
            (x, t, done, *_r) = c
            return jnp.any((t < sim_step_budget) & ~done)

        def step_body(c):
            if perm_on:
                (x, t, done, obstacle, horizon_left, replay_pos, u_old,
                 xs_rec, key, stall, q_prev, acc, ss_c, scen_c, oid,
                 skip_base, compacted) = c
                # periodic straggler re-tiling / tail compaction (see
                # simulate docstring): stably partition ALL per-lane state
                # active-first — on the retile trigger (inactive count grew
                # by retile_block) and/or ONCE when the not-done count
                # first fits the tail_shrink prefix. Pure schedule change —
                # per-lane math is lane-position invariant and the noise
                # stream is routed by oid below.
                skipf = done | (horizon_left < n)
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
                P = (x, t, done, obstacle, horizon_left, replay_pos, u_old,
                     xs_rec, stall, q_prev, acc, ss_c, scen_c, oid)

                def do_perm(args):
                    P_in, _sb = args
                    if tail_shrink is None:
                        _dst, src, _nf = _stable_partition(skipf)
                    else:
                        # 3-way stable order: solver-active, then replay
                        # (not done — still integrating and recording),
                        # then done — so the solver prefix AND the record
                        # prefix are both honored after compaction
                        key3 = (skipf.astype(jnp.int32)
                                + done.astype(jnp.int32))
                        src = jnp.argsort(key3, stable=True).astype(
                            jnp.int32)
                    return _permute_lanes(P_in, src), n_skip

                P, skip_base = jax.lax.cond(
                    trigger, do_perm, lambda args: args, (P, skip_base))
                (x, t, done, obstacle, horizon_left, replay_pos, u_old,
                 xs_rec, stall, q_prev, acc, ss_c, scen_c, oid) = P
                if tail_shrink is not None:
                    compacted = jnp.maximum(
                        compacted, tail_cond.astype(jnp.float32))
            else:
                (x, t, done, obstacle, horizon_left, replay_pos, u_old,
                 xs_rec, key, stall, q_prev, acc) = c
                ss_c, scen_c, oid, skip_base = ss, scenarios, None, None
                compacted = None
            in_replay = horizon_left < n  # (B,)
            if stall_reseed is not None:
                # stall-reseed guard (see simulate docstring): stalled lanes
                # kNN around the GOAL on pass 0 instead of the current state
                g0 = jnp.where((stall >= stall_reseed)[None, :],
                               scen_c.goal, x)
            else:
                g0 = x
            u_solve, u_old_new, shrink, idx_sel, row_sel, stats = solve_step(
                ss_c, lap_count, x, g0, obstacle, inactive=done | in_replay,
                compacted=compacted)
            if stats_on:
                acc = tuple(a + sv for a, sv in zip(acc, stats))
            if stall_reseed is not None:
                # winner's time-to-go: one-hot extraction of Qfun at the
                # chosen (lap row, safe-set index); a lane whose q has not
                # strictly decreased for S active steps is "stalled"
                lap_ids_s, _, _ = _step_solver_inputs(
                    lap_count, nsi, max_laps, None, b)
                oh_q = (t_idx[:, None]
                        == jnp.clip(idx_sel, 0, max_steps - 1)[None, :])
                q_win = jnp.zeros((b,), dtype)
                for off in range(nsi):
                    qf_off = ss_c[1][lap_ids_s[off]]  # (T, B)
                    q_win = jnp.where(
                        row_sel == off,
                        jnp.sum(jnp.where(oh_q, qf_off, 0.0), axis=0),
                        q_win)
                active = (~done) & (~in_replay)
                progress = q_win < q_prev
                stall = jnp.where(active,
                                  jnp.where(progress, 0, stall + 1), stall)
                q_prev = jnp.where(active, q_win, q_prev)
            # replay branch: stored input at replay_pos per lane. One-hot
            # mask-reduce instead of take_along_axis: the (2, B) gather runs
            # on the TPU scalar core (~1.7 ns/element measured) while the
            # where-sum stays on the VPU; exact (single non-zero per lane,
            # modulo a -0.0 -> +0.0 flip nothing downstream is sensitive to).
            p = jnp.clip(replay_pos, 0, n - 1)
            onehot_p = (jnp.arange(n, dtype=jnp.int32)[:, None]
                        == p[None, :])  # (N, B)
            u_replay = jnp.sum(
                jnp.where(onehot_p[:, None, :], u_old, 0.0), axis=0)  # (2,B)
            u = jnp.where(in_replay[None, :], u_replay, u_solve)
            u_old_next = jnp.where(in_replay[None, None, :], u_old, u_old_new)
            horizon_next = jnp.where(
                in_replay, horizon_left - 1,
                jnp.where(shrink, horizon_left - 1, horizon_left))
            replay_next = jnp.where(in_replay, replay_pos + 1, replay_pos)
            # plant step + noise
            x_next = jnp.stack(step_soa(tuple(x[i] for i in range(4)),
                                        (u[0], u[1]), dt))
            key, k1, k2 = jax.random.split(key, 3)
            noise_v = jnp.clip(jax.random.normal(k1, (b,), dtype) * 0.01,
                               -0.05, 0.05)
            noise_th = jnp.clip(jax.random.normal(k2, (b,), dtype) * 0.005,
                                -0.05, 0.05)
            if retile_frac is not None:
                # draws are positional in the ORIGINAL lane order; route
                # them to the permuted lanes so each lane's noise stream is
                # permutation-invariant (bitwise vs retile off)
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
            horizon_next = jnp.where(done, horizon_left, horizon_next)
            replay_next = jnp.where(done, replay_pos, replay_next)
            u_old_next = jnp.where(done[None, None, :], u_old, u_old_next)
            # record row t_next of each lane <- x_next via a (T, 4, B)
            # onehot-select. For done lanes this rewrites row t (frozen) with
            # the frozen x — a no-op, so no mask is needed. A per-lane
            # scatter looks cheaper on paper (T/1 less traffic) but lowers to
            # the TPU scalar core at ~80 ns/row — measured 5.4 ms/step at
            # B=64k vs ~0.4 ms for the full-tensor select on the VPU.
            # In-bounds by the max_steps check at function entry.
            if tail_shrink is not None:
                # record prefix-write: all not-done lanes live in the first
                # tail_shrink columns after compaction; full-width writes
                # are no-ops for done lanes (row t already holds the frozen
                # x), so restricting the (T, 4, B) onehot-select to the
                # prefix is bitwise-identical and drops its VPU traffic
                _Bs = tail_shrink

                def _rec_small(args):
                    xs_r, x_n, t_n = args
                    oh = t_idx[:, None] == t_n[None, :_Bs]
                    head = jnp.where(oh[:, None, :], x_n[None, :, :_Bs],
                                     xs_r[:, :, :_Bs])
                    return jnp.concatenate([head, xs_r[:, :, _Bs:]],
                                           axis=-1)

                def _rec_full(args):
                    xs_r, x_n, t_n = args
                    oh = t_idx[:, None] == t_n[None, :]
                    return jnp.where(oh[:, None, :], x_n[None], xs_r)

                xs_rec = jax.lax.cond(compacted > 0.5, _rec_small,
                                      _rec_full, (xs_rec, x_next, t_next))
            else:
                onehot_t = t_idx[:, None] == t_next[None, :]  # (T, B)
                xs_rec = jnp.where(onehot_t[:, None, :], x_next[None],
                                   xs_rec)
            reach = jnp.sqrt(sum((x_next[i] - scen_c.goal[i]) ** 2
                                 for i in range(4))) <= goal_tol
            done_next = done | ((~done) & reach)
            core = (x_next, t_next, done_next, obstacle_next, horizon_next,
                    replay_next, u_old_next, xs_rec, key, stall, q_prev, acc)
            if perm_on:
                cmp_f = (compacted if tail_shrink is not None
                         else jnp.float32(0.0))
                return core + (ss_c, scen_c, oid, skip_base, cmp_f)
            return core

        xs_rec = jnp.zeros((max_steps, 4, b), dtype)
        xs_rec = xs_rec.at[0].set(scen_p.x0)
        init = (scen_p.x0, jnp.zeros((b,), jnp.int32),
                jnp.zeros((b,), bool), scen_p.obstacle,
                jnp.full((b,), n, jnp.int32), jnp.zeros((b,), jnp.int32),
                jnp.zeros((n, 2, b), dtype), xs_rec, key,
                jnp.zeros((b,), jnp.int32),
                jnp.full((b,), jnp.inf, dtype), acc0)
        if perm_on:
            init = init + (ss, scen_p, orig_id, jnp.asarray(0, jnp.int32),
                           jnp.float32(0.0))
            (x, t, done, _obs, _hl, _rp, _uo, xs_rec, key, _st, _qp, acc,
             ss_o, scen_o, oid_o, _sb, _cp) = jax.lax.while_loop(
                 step_cond, step_body, init)
            return xs_rec, t, done, key, acc, ss_o, scen_o, oid_o
        (x, t, done, _obs, _hl, _rp, _uo, xs_rec, key, _st, _qp, acc) = (
            jax.lax.while_loop(step_cond, step_body, init))
        return xs_rec, t, done, key, acc, ss, scen_p, orig_id

    def _set_goal(xs_rec, pos, goal):
        """xs_rec: (T, 4, B); pos: (B,); goal: (4, B). Set row ``pos`` per lane."""
        onehot = (t_idx[:, None] == pos[None, :])  # (T, B)
        return jnp.where(onehot[:, None, :], goal[None, :, :], xs_rec)

    def lap_loop(lap_i, carry):
        ss, key, lap_steps, lap_done, stat_acc, scen_p, orig_id = carry
        lap_count = lap_i + lap0  # laps stored so far (seed + learned)
        if stats_on and perm_on:
            # the running total rides the while carry so each permutation
            # moves the partial sums with their lanes
            acc0 = stat_acc
        elif stats_on:
            acc0 = tuple(jnp.zeros((b,), jnp.float32) for _ in range(3))
        else:
            acc0 = ()
        xs_rec, t, done, key, lap_acc, ss, scen_p, orig_id = run_lap(
            ss, lap_count, key, scen_p, orig_id, acc0)
        if stats_on:
            if perm_on:
                stat_acc = lap_acc
            else:
                stat_acc = tuple(a + sv for a, sv in zip(stat_acc, lap_acc))
        if goal_append:
            # goal appended as an extra recorded row (tests/ilqr_test.py:51)
            xs_rec = _set_goal(xs_rec, t + 1, scen_p.goal)
            n_valid = t + 2
        else:
            # goal snapped onto the final row (iterative_ilqr tests variant)
            xs_rec = _set_goal(xs_rec, t, scen_p.goal)
            n_valid = t + 1
        ss = add_lap(ss, lap_count, xs_rec, n_valid)
        if perm_on:
            # lap rows are reported in ORIGINAL lane order; the permutation
            # may differ between laps, so scatter back per lap
            t = jnp.zeros_like(t).at[orig_id].set(t)
            done = jnp.zeros_like(done).at[orig_id].set(done)
        lap_steps = lap_steps.at[lap_i].set(t)
        lap_done = lap_done.at[lap_i].set(done)
        return ss, key, lap_steps, lap_done, stat_acc, scen_p, orig_id

    acc0 = (tuple(jnp.zeros((b,), jnp.float32) for _ in range(3))
            if stats_on else ())
    init = (ss0, key, jnp.zeros((num_laps, b), jnp.int32),
            jnp.zeros((num_laps, b), bool), acc0, scenarios,
            jnp.arange(b, dtype=jnp.int32))
    ss, key, lap_steps, lap_done, stat_acc, _scen, orig_id = jax.lax.fori_loop(
        0, num_laps, lap_loop, init)
    if perm_on:
        # restore ORIGINAL lane order on the lane-permuted outputs
        inv = _unpermute_idx(orig_id, b)
        ss = _permute_lanes(ss, inv)
        if stats_on:
            stat_acc = _permute_lanes(stat_acc, inv)
    return SoaRunResult(lap_steps=lap_steps, lap_done=lap_done,
                        final_x=scenarios.goal, safe_set=ss,
                        lap_count=lap0 + num_laps, final_key=key,
                        iter_stats=stat_acc)
