"""i2LQR learning controller — the paper's contribution (CDC 2023).

Behavioral parity: /root/reference/iterative_ilqr/utils/base.py:305-479 (iLqr).
Per control step:
- 3-pass outer relaxation loop (``for iter in range(max_outloop_iter)`` with a
  hard break at iter == 2, base.py:384, :472-478),
- per pass: for each safe-set iteration in the last ``num_ss_iter`` laps,
  select ``num_ss_points`` L1-nearest candidates around the terminal guess
  (pass 0 guesses the current state, later passes the previous best x_N,
  base.py:398-402), solve one fixed-horizon iLQR per candidate,
- relaxed reachability cost: smallest i in [1, max_relax_iter] with
  ||x_N - x_term|| <= 80*i/10^iter gives cost_terminal + N + 100*i, else Inf
  (base.py:427-437),
- lexicographic list-min across iteration candidate vectors (base.py:462 —
  ``cost_list.index(min(cost_list))`` on a list of lists), argmin inside,
- terminal guess re-centering, horizon shrink when the chosen candidate is the
  lap's final point (base.py:472-478), then stored-input shrinking-horizon
  replay for the remaining steps (base.py:377-382).

TPU-first design: the outer relaxation and safe-set bookkeeping are cheap,
data-dependent host logic; the hot path — all candidates of a pass — is ONE
jitted vmapped device solve (ops.ilqr.ilqr_solve_candidates) instead of the
reference's nested sequential loops. Documented deviation: the reference
threads the LM lambda from candidate j into j+1 (base.py:393,414-426); we
reset lambda per candidate (clean parallel semantics). The deviation is
CLOSABLE: ``sequential_lambda=True`` swaps in the exact threading
(ops.ilqr.ilqr_solve_candidates_seq, one lax.scan) and reproduces the
recorded reference run [54, 27, 24, 24, 24] EXACTLY at f64
(tests/test_closed_loop_i2lqr.py::test_five_lap_parity_f64_exact_sequential_lambda).
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np
import jax.numpy as jnp

from ilqr_iterative_tasks_tpu.constants import X_DIM, U_DIM
from ilqr_iterative_tasks_tpu.control.safe_set import SafeSet
from ilqr_iterative_tasks_tpu.models import kinetic_bicycle as dyn
from ilqr_iterative_tasks_tpu.models.obstacle import Obstacle
from ilqr_iterative_tasks_tpu.ops.ilqr import (ilqr_solve_candidates,
                                               ilqr_solve_candidates_seq)
from ilqr_iterative_tasks_tpu.utils.params import IlqrParams, SystemLimits


def relaxed_reach_cost(dist: float, cost_terminal: float, num_horizon: int,
                       outer_iter: int, max_relax_iter: int) -> float:
    """Relaxed reachability cost (base.py:427-437).

    Finds the smallest i >= 1 with dist <= 80*i/10^outer_iter; returns
    cost_terminal + num_horizon + 100*i, or Inf when i would exceed
    max_relax_iter.
    """
    unit = 80.0 / (10 ** outer_iter)
    if dist > unit * max_relax_iter:
        return float("inf")
    i = max(1, int(math.ceil(dist / unit - 1e-12)))
    return float(cost_terminal) + float(num_horizon) + 100.0 * i


class I2LqrController:
    """Host-driven i2LQR controller with device-batched candidate solves.

    ``sequential_lambda=True`` switches the candidate sweep from the
    parallel vmap (lambda reset per candidate — the documented deviation)
    to the reference's EXACT sequential threading (base.py:393,414-426):
    candidate j's final LM lambda seeds candidate j+1 within a lap, reset
    per (relaxation pass, lap). Compiled as one lax.scan; serialized only
    by the true lambda dependence. Use for bit-level parity studies; the
    parallel sweep is the production default.
    """

    def __init__(self, params: IlqrParams, obstacle: Optional[object] = None,
                 limits: Optional[SystemLimits] = None, dtype=jnp.float32,
                 sequential_lambda: bool = False):
        self.sequential_lambda = sequential_lambda
        self.params = params
        self.limits = limits if limits is not None else SystemLimits.make(dtype=dtype)
        self.obstacle = obstacle  # sim.plant.ObstacleSim or None
        self.safe_set = SafeSet()
        self.dtype = dtype
        self.timestep: Optional[float] = None
        self.time = 0.0
        self.x: Optional[np.ndarray] = None
        self.u: Optional[np.ndarray] = None
        self.num_horizon = params.num_horizon
        self.x_terminal_guess: Optional[np.ndarray] = None
        self.x_pred: Optional[np.ndarray] = None
        self.u_pred: Optional[np.ndarray] = None
        self.u_old: Optional[np.ndarray] = None

    # -- ControlBase API (base.py:216-234) --
    def set_timestep(self, dt: float):
        self.timestep = dt

    def set_state(self, x):
        self.x = np.asarray(x, dtype=np.float64)

    def get_input(self):
        return self.u

    @property
    def iter(self) -> int:
        return self.safe_set.num_laps

    def add_trajectory(self, x: np.ndarray, u: np.ndarray):
        """Store a completed lap and reset per-lap solver state (base.py:343-369)."""
        self.safe_set.add_trajectory(x, u)
        self.num_horizon = self.params.num_horizon
        self.x_terminal_guess = self.safe_set.ss[-1][:, self.num_horizon].copy()

    def _device_obstacle(self) -> Obstacle:
        if self.obstacle is None:
            return Obstacle.absent(dtype=self.dtype)
        return self.obstacle.as_pytree(dtype=self.dtype)

    def calc_input(self):
        p = self.params
        if self.num_horizon < p.num_horizon:
            # Shrinking-horizon stored-input replay (base.py:377-382).
            if self.u_old.shape[1] == 0:
                # Latent reference crash: base.py:378-379 indexes column 0
                # of an EMPTY replay buffer (IndexError) when plant noise
                # keeps the lap alive past the last stored input — a rare
                # (~0.3%/lap) noise tail event, see docs/PERF.md "The 0.3%
                # non-completion". Degrade exactly like the batched sims'
                # clipped replay position: repeat the last applied input
                # until the lap ends (goal or budget).
                self.u_pred = np.asarray(self.u, dtype=np.float64).reshape(
                    U_DIM, 1)
                self.time += self.timestep
                return
            self.u_pred = self.u_old
            self.u = self.u_pred[:, 0]
            self.u_old = self.u_pred[:, 1:]
            self.num_horizon -= 1
            self.time += self.timestep
            return

        min_iter = max(0, self.iter - p.num_ss_iter)
        obstacle = self._device_obstacle()
        n = self.num_horizon
        for outer in range(p.max_outloop_iter):
            cost_list, id_list = [], []
            x_pred_all, u_pred_all = [], []
            x_guess = self.x if outer == 0 else self.x_pred[:, -1]
            for lap_id in range(min_iter, self.iter):
                idx = self.safe_set.select_close(lap_id, x_guess, p.num_ss_points)
                x_terms = self.safe_set.ss[lap_id][:, idx].T  # (k, 4)
                q_terms = self.safe_set.Qfun[lap_id][idx]
                if n > 1:
                    solve_fn = (ilqr_solve_candidates_seq
                                if self.sequential_lambda
                                else ilqr_solve_candidates)
                    sols = solve_fn(
                        p, self.limits, obstacle,
                        jnp.asarray(self.x, dtype=self.dtype),
                        jnp.asarray(x_terms, dtype=self.dtype),
                        jnp.zeros((n, U_DIM), dtype=self.dtype),
                        p.lamb, self.timestep, num_horizon=n)
                    xs_b = np.asarray(sols.xs, dtype=np.float64)  # (k, N+1, 4)
                    us_b = np.asarray(sols.us, dtype=np.float64)  # (k, N, 2)
                    dists = np.linalg.norm(xs_b[:, -1, :] - x_terms, axis=1)
                    cost_iter = [
                        relaxed_reach_cost(dists[j], q_terms[j], n, outer,
                                           p.max_relax_iter)
                        for j in range(len(idx))
                    ]
                    x_pred_iter = [xs_b[j].T for j in range(len(idx))]
                    u_pred_iter = [us_b[j].T for j in range(len(idx))]
                else:
                    # Horizon-1 fallback (base.py:438-450).
                    cost_iter, x_pred_iter, u_pred_iter = [], [], []
                    for j in range(len(idx)):
                        x_next = np.asarray(dyn.step(
                            jnp.asarray(self.x), jnp.asarray(self.u_old[:, 0]),
                            self.timestep))
                        reach = np.linalg.norm(x_next - x_terms[j]) <= float(
                            np.asarray(p.reach_error))
                        cost_iter.append(1.0 + float(q_terms[j]) if reach
                                         else float("inf"))
                        xv = np.zeros((X_DIM, 2))
                        xv[:, 0] = self.x
                        xv[:, -1] = x_next
                        uv = np.zeros((U_DIM, 1))
                        uv[:, 0] = self.u_old[:, 0]
                        x_pred_iter.append(xv)
                        u_pred_iter.append(uv)
                id_list.append(idx)
                cost_list.append(cost_iter)
                x_pred_all.append(x_pred_iter)
                u_pred_all.append(u_pred_iter)

            # Lexicographic list-min across laps (base.py:462), argmin within.
            best_lap_loc = cost_list.index(min(cost_list))
            cost_vec = cost_list[best_lap_loc]
            best_time = cost_vec.index(min(cost_vec))
            best_lap = best_lap_loc + min_iter
            self.u_pred = u_pred_all[best_lap_loc][best_time]
            self.x_pred = x_pred_all[best_lap_loc][best_time]
            self.u = self.u_pred[:, 0]
            self.x_terminal_guess = self.x_pred[:, -1]
            if self.num_horizon > 1:
                self.u_old = self.u_pred[:, 1:]
            if outer == 2:
                chosen = int(id_list[best_lap_loc][best_time])
                if chosen + 1 > self.safe_set.ss[best_lap].shape[1] - 1:
                    self.num_horizon -= 1
                break
        self.time += self.timestep
