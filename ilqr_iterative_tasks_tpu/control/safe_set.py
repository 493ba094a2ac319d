"""Safe set (sampled safe states + time-to-go value function) machinery.

Behavioral parity:
- add_trajectory / Qfun:   /root/reference/iterative_ilqr/utils/base.py:343-369
  (iLqr) and :657-690 (LMPC). Qfun is time-to-go in steps: arange(T-1..0).
- space-varying kNN:       base.py:332-341 / :548-555 (L1 norm, argsort).
- time-varying windows:    base.py:358-369 / :537-546, :679-690.

Two representations:
1. ``SafeSet`` — host-side, ragged (list of laps), used by the faithful
   step-by-step controllers. kNN math runs in numpy (tiny), candidate solves
   run on device.
2. ``DeviceSafeSet`` — fixed-capacity padded tensors + validity masks for the
   fully-jitted batched lap simulator and the sharded pod-scale path
   (masked L1 distances + lax.top_k).
"""

from __future__ import annotations

from typing import List

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct


class SafeSet:
    """Host-side ragged safe set: one entry per completed lap ("iteration")."""

    def __init__(self):
        self.ss: List[np.ndarray] = []  # each (4, T+1) states, column-major like ref
        self.u_ss: List[np.ndarray] = []  # each (2, T)
        self.Qfun: List[np.ndarray] = []  # each (T+1,) time-to-go in steps
        self.iter_cost: List[float] = []

    @property
    def num_laps(self) -> int:
        return len(self.ss)

    def add_trajectory(self, x: np.ndarray, u: np.ndarray):
        """x: (T+1, 4) row-major lap states; u: (T, 2). Mirrors base.py:343-346."""
        x = np.asarray(x, dtype=np.float64)
        u = np.asarray(u, dtype=np.float64)
        self.ss.append(x.T.copy())
        self.u_ss.append(u.T.copy())
        self.Qfun.append(np.arange(x.shape[0] - 1, -1, -1))
        self.iter_cost.append(float(self.Qfun[-1][0]))

    def select_close(self, lap_id: int, x_guess: np.ndarray, k: int) -> np.ndarray:
        """L1-kNN indices into lap ``lap_id`` (base.py:332-341)."""
        x = self.ss[lap_id]
        diff = x - np.asarray(x_guess).reshape(-1, 1)
        norm = np.linalg.norm(diff, 1, axis=0)
        return np.argsort(norm)[:k]

    def select_points(self, lap_id: int, x0, k: int):
        """Standalone kNN returning (points (4, k), Qfun values (k,), indices)
        — parity with the utility at ilqr_helper.py:67-80."""
        idx = self.select_close(lap_id, x0, k)
        return self.ss[lap_id][:, idx], self.Qfun[lap_id][idx], idx

    def time_varying_windows(self, num_horizon: int, k: int,
                             all_ss_point: bool) -> List[np.ndarray]:
        """Initial per-lap candidate index windows, recomputed after each lap
        (base.py:358-369): window starts at
        (lap_cost - best_cost + horizon) into each stored lap."""
        min_cost = int(np.min(self.iter_cost))
        windows = []
        for lap_id in range(self.num_laps):
            lap_cost = self.ss[lap_id].shape[1] - 1
            if all_ss_point:
                windows.append(np.arange(0, self.ss[lap_id].shape[1]))
            else:
                start = lap_cost - min_cost + num_horizon
                windows.append(np.arange(start, start + k))
        return windows


@struct.dataclass
class DeviceSafeSet:
    """Fixed-capacity padded safe set resident on device.

    states: (L, T, 4); inputs: (L, T, 2); qfun: (L, T); valid: (L, T) bool;
    lap_len: (L,) number of valid rows per lap; num_laps: scalar int.
    Functional updates only — ``add_lap`` returns a new pytree.
    """

    states: jnp.ndarray
    inputs: jnp.ndarray
    qfun: jnp.ndarray
    valid: jnp.ndarray
    lap_len: jnp.ndarray
    num_laps: jnp.ndarray

    @classmethod
    def empty(cls, max_laps: int, max_steps: int, dtype=jnp.float32):
        return cls(
            states=jnp.zeros((max_laps, max_steps, 4), dtype=dtype),
            inputs=jnp.zeros((max_laps, max_steps, 2), dtype=dtype),
            qfun=jnp.zeros((max_laps, max_steps), dtype=dtype),
            valid=jnp.zeros((max_laps, max_steps), dtype=bool),
            lap_len=jnp.zeros((max_laps,), dtype=jnp.int32),
            num_laps=jnp.zeros((), dtype=jnp.int32),
        )

    def add_lap(self, xs: jnp.ndarray, us: jnp.ndarray, n_valid) -> "DeviceSafeSet":
        """Append a lap given padded xs (T,4) / us (T,2) and its true length
        ``n_valid`` (number of states). Qfun = time-to-go = n_valid-1-i."""
        slot = self.num_laps
        t = self.states.shape[1]
        idx = jnp.arange(t)
        valid_row = idx < n_valid
        qfun_row = jnp.maximum(
            jnp.asarray(n_valid, self.qfun.dtype) - 1.0 - idx.astype(self.qfun.dtype), 0.0)
        return self.replace(
            states=self.states.at[slot].set(xs),
            inputs=self.inputs.at[slot].set(us),
            qfun=self.qfun.at[slot].set(qfun_row),
            valid=self.valid.at[slot].set(valid_row),
            lap_len=self.lap_len.at[slot].set(jnp.asarray(n_valid, jnp.int32)),
            num_laps=self.num_laps + 1,
        )

    def knn(self, lap_id, x_guess: jnp.ndarray, k: int):
        """Masked L1-kNN inside one lap -> (indices (k,), states (k,4), qfun (k,)).

        Invalid (padded) rows get +inf distance; jitted via lax.top_k on the
        negated distances.
        """
        states = self.states[lap_id]  # (T, 4)
        d = jnp.sum(jnp.abs(states - x_guess[None, :]), axis=-1)
        d = jnp.where(self.valid[lap_id], d, jnp.inf)
        neg_top, idx = jax.lax.top_k(-d, k)
        # when k exceeds the lap length, top_k pads with invalid rows whose
        # gathered states are the zero padding; poison their Qfun so every
        # downstream candidate cost becomes +inf (the host path returns
        # fewer candidates instead, base.py:332-341)
        q = jnp.where(jnp.isfinite(-neg_top), self.qfun[lap_id][idx], jnp.inf)
        return idx, states[idx], q
