"""Seed (iteration-0) trajectory generation.

Behavioral parity: /root/reference/iterative_ilqr/utils/base.py:103-138
(KineticBicycle.get_traj): a scripted 120 s open-loop maneuver — accelerate
1 s at a=1, steer +pi/6 for 1 s, opposite steer at mid-trajectory, decelerate
near the end — integrated with the bicycle dynamics. Defines the task: start
[0,0,0,0], goal xcl[-1] (~[201.45, 0, 0, -0.5236] at dt=1).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ilqr_iterative_tasks_tpu.constants import X_DIM, U_DIM
from ilqr_iterative_tasks_tpu.models import kinetic_bicycle as dyn


def load_recorded_trajectory(state_path: str, input_path: str):
    """direct_ctrl_policy mode: load a recorded lap from reference-format
    text files (base.py:134-136 loads data/closed_loop_multi_laps.txt, stored
    TRANSPOSED as (4, T+1), + input_multi_laps.txt (2, T))."""
    xcl = np.loadtxt(state_path)
    ucl = np.loadtxt(input_path)
    if xcl.shape[0] == X_DIM and xcl.shape[1] != X_DIM:
        xcl = xcl.T
    if ucl.ndim == 2 and ucl.shape[0] == U_DIM and ucl.shape[1] != U_DIM:
        ucl = ucl.T
    return np.asarray(xcl, np.float64), np.asarray(ucl, np.float64)


def seed_trajectory(dt: float, save_path: str | None = None):
    """Returns (xcl (T+1, 4), ucl (T, 2)) with T = int(120/dt).

    ``save_path``: optionally write the states in the reference's format
    (base.py:133 writes data/closed_loop_feasible.txt)."""
    angle = np.pi / 6
    total = int(120 / dt)
    xs = [np.zeros(X_DIM)]
    us = []
    for i in range(total):
        u = np.zeros(U_DIM)
        if i <= 1 / dt:
            u[0] = 1.0
        elif total - 4 / dt <= i <= total - 3 / dt:
            u[0] = -1.0
        if 0 < i <= 1 / dt:
            u[1] = angle
        elif total / 2 - 2 / dt <= i <= total / 2 - 1 / dt:
            u[1] = -angle
        xs.append(np.asarray(
            dyn.step(jnp.asarray(xs[-1]), jnp.asarray(u), dt), dtype=np.float64))
        us.append(u)
    xcl = np.stack(xs)
    if save_path is not None:
        np.savetxt(save_path, xcl, fmt="%f")
    return xcl, np.stack(us)
