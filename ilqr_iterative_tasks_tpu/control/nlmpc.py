"""NLMPC learning controller (nonlinear Learning MPC baseline).

Behavioral parity: /root/reference/iterative_ilqr/utils/base.py:514-690 (LMPC)
with the per-candidate NLP solved by ops/al_ilqr.py instead of CasADi/IPOPT
(see that module's docstring for the NLP parity mapping).

Per control step (base.py:557-655):
- candidate terminal states from the last ``num_ss_iter`` laps via one of
  three safe-set options: advancing time-varying windows (:537-546), L1-kNN
  around the terminal guess (:548-555), or every stored point (:569-571),
- one constrained min-time solve per candidate (batched on device),
- candidate cost N + Qfun(x_term) if feasible else Inf (:197), lexicographic
  list-min across laps (:605), argmin within,
- warm-start vector reassembly by shifting the predicted trajectory one step
  and appending the successor safe-set point + its stored input (:619-639),
- horizon decrement when the chosen candidate is the lap's last point
  (:640-654).

Deviation: on an all-infeasible step the reference calls os.system("pause")
(:607-609); we raise RuntimeError, which the plant maps to feasible=0 and a
repeat of the previous input (base.py:143-155 semantics).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ilqr_iterative_tasks_tpu.constants import X_DIM, U_DIM
from ilqr_iterative_tasks_tpu.control.safe_set import SafeSet
from ilqr_iterative_tasks_tpu.models import kinetic_bicycle as dyn
from ilqr_iterative_tasks_tpu.models.obstacle import Obstacle
from ilqr_iterative_tasks_tpu.ops.lm_shooting import lm_feasibility_solve_candidates
from ilqr_iterative_tasks_tpu.utils.params import LmpcParams, SystemLimits


class NlmpcController:
    """Host-driven NLMPC controller with device-batched AL-iLQR solves.

    ``mesh``: optional jax.sharding.Mesh (first axis name is used). When set,
    the controller runs pod-scale: spaceVarying kNN routes through
    parallel/sharded_safe_set.py::sharded_knn (stored lap rows sharded over
    the mesh, local top-k -> all_gather -> global top-k over ICI), and the
    per-step candidate solve batch is sharded over the same mesh — the
    production wiring of the "long-context" safe-set axis, sized for the
    ``all_ss_point`` regime where every stored state of every lap is a
    candidate (base.py:569-571) and the candidate set outgrows one device.
    """

    def __init__(self, params: LmpcParams, obstacle: Optional[object] = None,
                 limits: Optional[SystemLimits] = None, dtype=jnp.float32,
                 mesh=None):
        self.params = params
        self.limits = limits if limits is not None else SystemLimits.make(dtype=dtype)
        self.obstacle = obstacle
        self.safe_set = SafeSet()
        self.dtype = dtype
        self.mesh = mesh
        self.mesh_axis = mesh.axis_names[0] if mesh is not None else None
        self.timestep: Optional[float] = None
        self.time = 0.0
        self.x: Optional[np.ndarray] = None
        self.u: Optional[np.ndarray] = None
        self.num_horizon = params.num_horizon
        self.x_terminal_guess = None
        self.x_guess = None  # flat warm start: (N+1)*X states then N*U inputs
        self.x_sol = None
        self.u_sol = None
        self.x_pred = None
        self.u_pred = None
        self.cost = None
        self.old_cost = None
        self.cost_improve = None
        self.ss_windows = []  # advancing time-varying windows, one per lap

    # -- ControlBase API --
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
        """Store a lap + reset warm starts/windows (base.py:657-690)."""
        p = self.params
        self.safe_set.add_trajectory(x, u)
        self.num_horizon = p.num_horizon
        n = self.num_horizon
        x = np.asarray(x, dtype=np.float64)
        u = np.asarray(u, dtype=np.float64)
        self.x_terminal_guess = x.T[:, n].copy()
        self.x_guess = np.concatenate(
            [x[: n + 1, :].flatten(), u[:n, :].flatten()])
        self.cost = float(self.safe_set.Qfun[-1][0])
        self.old_cost = self.cost + 1
        self.x_sol = x.T[:, : n + 1].copy()
        self.u_sol = u.T[:, :n].copy()
        self.cost_improve = -1
        self.ss_windows = self.safe_set.time_varying_windows(
            n, p.num_ss_points, p.all_ss_point)

    def _select_time_varying(self, lap_id: int) -> np.ndarray:
        """Advancing window selection (base.py:537-546); mutates the window."""
        sel = self.ss_windows[lap_id]
        lap_len = self.safe_set.ss[lap_id].shape[1]
        valid = sel[(sel > 0) & (sel < lap_len)]
        self.ss_windows[lap_id] = sel + 1
        if valid.shape[0] < 1:
            valid = np.array([lap_len - 1])
        return valid

    def _device_obstacle(self) -> Obstacle:
        if self.obstacle is None:
            return Obstacle.absent(dtype=self.dtype)
        return self.obstacle.as_pytree(dtype=self.dtype)

    def _warm_u_init(self, n: int) -> np.ndarray:
        """Input section of the flat warm-start vector -> (n, 2)."""
        flat = self.x_guess[X_DIM * (n + 1): X_DIM * (n + 1) + U_DIM * n]
        return flat.reshape(n, U_DIM)

    def _select_close_sharded(self, lap_id: int, k: int) -> np.ndarray:
        """select_close via the mesh-sharded global top-k (same ordering as a
        single-device masked top_k; ties across devices resolve in global row
        order, matching np.argsort up to exact-tie permutations)."""
        from ilqr_iterative_tasks_tpu.parallel.sharded_safe_set import (
            sharded_knn)

        x = self.safe_set.ss[lap_id]  # (4, T)
        q = self.safe_set.Qfun[lap_id]
        t = x.shape[1]
        ndev = int(np.prod(self.mesh.devices.shape))
        # pad rows so each shard holds >= k rows and T divides the mesh
        shard = max(-(-t // ndev), k)
        tp = shard * ndev
        states = np.zeros((tp, 4), dtype=np.float64)
        states[:t] = x.T
        qfun = np.zeros((tp,), dtype=np.float64)
        qfun[:t] = q
        valid = np.arange(tp) < t
        idx, _pts, _qs, dist = sharded_knn(
            jnp.asarray(states), jnp.asarray(valid), jnp.asarray(qfun),
            jnp.asarray(self.x_terminal_guess, states.dtype), k, self.mesh,
            axis_name=self.mesh_axis)
        idx = np.asarray(idx)
        # k can exceed the lap length: the host path returns fewer candidates
        return idx[np.isfinite(np.asarray(dist))]

    def _solve_candidates(self, x_terms: np.ndarray, n: int):
        """Batched constrained solves; returns (x_sols, u_sols, feas) numpy.

        Under a mesh the candidate axis is sharded (padded to the device
        count) so the solves data-parallelize over ICI.
        """
        obstacle = self._device_obstacle()
        nc = x_terms.shape[0]
        u_init = np.broadcast_to(self._warm_u_init(n), (nc, n, U_DIM))
        xt = jnp.asarray(x_terms, dtype=self.dtype)
        ui = jnp.asarray(u_init, dtype=self.dtype)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            ndev = int(np.prod(self.mesh.devices.shape))
            pad = (-nc) % ndev
            if pad:  # repeat the last candidate; padded solves are dropped
                xt = jnp.concatenate([xt, jnp.repeat(xt[-1:], pad, 0)])
                ui = jnp.concatenate([ui, jnp.repeat(ui[-1:], pad, 0)])
            sh = NamedSharding(self.mesh, P(self.mesh_axis))
            xt = jax.device_put(xt, sh)
            ui = jax.device_put(ui, sh)
        sols = lm_feasibility_solve_candidates(
            self.limits, obstacle, jnp.asarray(self.x, dtype=self.dtype),
            xt, ui, self.timestep, num_horizon=n)
        return (np.asarray(sols.xs, np.float64)[:nc],
                np.asarray(sols.us, np.float64)[:nc],
                np.asarray(sols.feasible)[:nc])

    def calc_input(self):
        p = self.params
        n = self.num_horizon
        min_iter = 0 if p.all_ss_iter else max(0, self.iter - p.num_ss_iter)
        cost_list, id_list = [], []
        u_list, x_pred_all, u_pred_all = [], [], []
        for lap_id in range(min_iter, self.iter):
            if p.all_ss_point:
                idx = np.arange(0, self.safe_set.ss[lap_id].shape[1])
            elif p.ss_option == "timeVarying":
                idx = self._select_time_varying(lap_id)
            elif self.mesh is not None:
                # kNN over the mesh-sharded history axis (ICI global top-k)
                idx = self._select_close_sharded(lap_id, p.num_ss_points)
            else:  # spaceVarying (kNN around the terminal guess, base.py:548-555)
                idx = self.safe_set.select_close(
                    lap_id, self.x_terminal_guess, p.num_ss_points)
            x_terms = self.safe_set.ss[lap_id][:, idx].T  # (k, 4)
            q_terms = self.safe_set.Qfun[lap_id][idx]
            cost_iter, input_iter, x_pred_iter, u_pred_iter = [], [], [], []
            if n > 1:
                xs_b, us_b, feas = self._solve_candidates(x_terms, n)
                for j in range(len(idx)):
                    cost_iter.append(n + float(q_terms[j]) if feas[j]
                                     else float("inf"))
                    x_pred_iter.append(xs_b[j].T)  # (4, N+1)
                    u_pred_iter.append(us_b[j].T)  # (2, N)
                    input_iter.append(us_b[j][0])
            else:
                # Horizon-1 reach check (nonlinear_lmpc.py:199-213).
                u0 = self.x_guess[X_DIM * (n + 1): X_DIM * (n + 1) + U_DIM]
                x_next = np.asarray(dyn.step(jnp.asarray(self.x),
                                             jnp.asarray(u0), self.timestep))
                for j in range(len(idx)):
                    if np.linalg.norm(x_next - x_terms[j]) <= 1e-3:
                        cost_iter.append(1.0 + float(q_terms[j]))
                        x_pred_iter.append(np.vstack([self.x, x_terms[j]]).T)
                        uv = np.zeros((U_DIM, 1))
                        uv[:, 0] = u0
                        u_pred_iter.append(uv)
                        input_iter.append(u0)
                    else:
                        cost_iter.append(float("inf"))
                        x_pred_iter.append(
                            np.full((X_DIM, 2), np.inf))
                        u_pred_iter.append(np.full((U_DIM, 1), np.inf))
                        input_iter.append(np.full(U_DIM, np.inf))
            id_list.append(idx)
            cost_list.append(cost_iter)
            u_list.append(input_iter)
            x_pred_all.append(x_pred_iter)
            u_pred_all.append(u_pred_iter)

        best_lap_loc = cost_list.index(min(cost_list))
        cost_vec = cost_list[best_lap_loc]
        if min(cost_vec) == float("inf"):
            raise RuntimeError("NLMPC: all safe-set candidates infeasible")
        best_time = cost_vec.index(min(cost_vec))
        best_lap = best_lap_loc + min_iter
        self.u = np.asarray(u_list[best_lap_loc][best_time])
        self.x_pred = x_pred_all[best_lap_loc][best_time]
        self.u_pred = u_pred_all[best_lap_loc][best_time]
        self.cost = cost_list[best_lap_loc][best_time]
        self.cost_improve = self.cost_improve + self.old_cost - self.cost - 1
        self.old_cost = self.cost

        # Warm-start shift + horizon bookkeeping (base.py:619-654).
        x_pred_flat = self.x_pred[:, : n + 1].T.flatten()
        u_pred_flat = self.u_pred[:, :n].T.flatten()
        chosen = int(id_list[best_lap_loc][best_time])
        if chosen + 1 <= self.safe_set.ss[best_lap].shape[1] - 1:
            self.x_terminal_guess = self.safe_set.ss[best_lap][:, chosen + 1].copy()
            self.x_guess[0: X_DIM * n] = x_pred_flat[X_DIM: X_DIM * (n + 1)]
            self.x_guess[X_DIM * n: X_DIM * (n + 1)] = self.x_terminal_guess
            self.x_guess[X_DIM * (n + 1): X_DIM * (n + 1) + U_DIM * (n - 1)] = (
                u_pred_flat[U_DIM: U_DIM * n])
            self.x_guess[X_DIM * (n + 1) + U_DIM * (n - 1):
                         X_DIM * (n + 1) + U_DIM * n] = (
                self.safe_set.u_ss[best_lap][:, chosen])
        elif n > 1:
            self.x_terminal_guess = x_pred_flat[
                X_DIM * n: X_DIM * (n + 1)].copy()
            new_guess = np.zeros(n * X_DIM + (n - 1) * U_DIM)
            new_guess[0: X_DIM * n] = x_pred_flat[X_DIM: X_DIM * (n + 1)]
            new_guess[X_DIM * n: X_DIM * n + U_DIM * (n - 1)] = (
                u_pred_flat[U_DIM: U_DIM * n])
            self.x_guess = new_guess
            self.num_horizon = n - 1
        else:
            # Horizon floor. The reference decrements unguarded
            # (base.py:651-654) and would call nlmpc() with num_horizon=0,
            # which its NLP builder cannot represent — a latent crash its
            # published scenarios happen not to trigger. Keep n=1 and
            # re-center the guess on the predicted terminal state; if the
            # reach check keeps failing the step is reported infeasible and
            # the lap times out at the budget.
            self.x_terminal_guess = x_pred_flat[
                X_DIM * n: X_DIM * (n + 1)].copy()
        self.time += self.timestep
