"""Closed-loop plant: true bicycle dynamics + noise + per-lap recording.

Behavioral parity: /root/reference/iterative_ilqr/utils/base.py:67-213
(KineticBicycle) and :23-64 (Obstacle host wrapper).
Noise model (base.py:197-213): clipped Gaussian added to v and theta,
x_v += 0.5 * clip(randn()*0.01, -0.05, 0.05),
x_theta += 0.5 * clip(randn()*0.005, -0.05, 0.05), disabled by zero-noise flag.

The reference's hard-coded mid-run pickle dump (base.py:170-176) and
``os.system("pause")`` style side effects are intentionally NOT reproduced.
"""

from __future__ import annotations

import time as _time
from typing import List, Optional

import numpy as np
import jax.numpy as jnp

from ilqr_iterative_tasks_tpu.constants import X_DIM
from ilqr_iterative_tasks_tpu.models import kinetic_bicycle as dyn
from ilqr_iterative_tasks_tpu.models.obstacle import Obstacle


class ObstacleSim:
    """Host-side moving-obstacle wrapper around the Obstacle pytree.

    Mirrors base.py:23-64: per-step motion (option 1: +y, option 2: -x),
    per-lap trajectory recording, lap reset to the initial center.
    """

    def __init__(self, x, y, width, height, spd=None, timestep=None,
                 moving_option=None):
        self.x0, self.y0 = float(x), float(y)
        self.x, self.y = float(x), float(y)
        self.width, self.height = float(width), float(height)
        self.spd = spd
        self.timestep = timestep
        self.moving_option = moving_option
        self.lap_states: List[np.ndarray] = []
        self._states = [np.array([self.x0, self.y0])]

    def as_pytree(self, dtype=jnp.float32) -> Obstacle:
        return Obstacle.make(
            x=self.x, y=self.y, width=self.width, height=self.height,
            spd=self.spd, moving_option=self.moving_option, present=True,
            dtype=dtype)

    def update(self):
        """One closed-loop motion step (base.py:50-58)."""
        if self.spd is not None and self.spd != 0:
            if self.moving_option == 1:
                self.y += self.spd * self.timestep
            elif self.moving_option == 2:
                self.x -= self.spd * self.timestep
        self._states.append(np.array([self.x, self.y]))

    def reset(self):
        """Lap-end reset (base.py:60-64)."""
        self.x, self.y = self.x0, self.y0
        self.lap_states.append(np.stack(self._states))
        self._states = [np.array([self.x0, self.y0])]


class BicyclePlant:
    """True plant with recording, mirroring KineticBicycle (base.py:67-213)."""

    def __init__(self, limits=None, rng: Optional[np.random.Generator] = None):
        self.limits = limits
        self.timestep: Optional[float] = None
        self.x: Optional[np.ndarray] = None
        self.u: Optional[np.ndarray] = None
        self.time = 0.0
        self.zero_noise_flag = False
        self.rng = rng if rng is not None else np.random.default_rng(0)
        self.ctrl_policy = None
        self.feasible = None
        self.delta_timer = None
        # per-lap records
        self.states = None
        self.inputs: List[np.ndarray] = []
        self.timestamps: List[float] = []
        self.solver_times: List[float] = []
        self.feasibility: List[int] = []
        self.data = {"state": [], "input": [], "timestamp": []}
        self.diagnostics = {"solver_time": [], "feasibility": []}

    def set_zero_noise(self):
        self.zero_noise_flag = True

    def set_timestep(self, dt: float):
        self.timestep = dt

    def set_state(self, x):
        self.x = np.asarray(x, dtype=np.float64).copy()
        self.states = [self.x.copy()]
        self.inputs = []
        self.timestamps = []
        self.solver_times = []
        self.feasibility = []

    def set_ctrl_policy(self, policy):
        self.ctrl_policy = policy

    def calc_ctrl_input(self):
        """Solve for the next input, wall-clock timed (base.py:143-155)."""
        self.ctrl_policy.set_state(self.x)
        t0 = _time.perf_counter()
        try:
            self.ctrl_policy.calc_input()
            self.u = np.asarray(self.ctrl_policy.get_input(), dtype=np.float64)
            self.delta_timer = _time.perf_counter() - t0
            self.feasible = 1
        except RuntimeError:
            self.feasible = 0
            self.delta_timer = _time.perf_counter() - t0

    def forward_dynamics(self):
        """True dynamics step with clipped Gaussian noise (base.py:197-213)."""
        x_next = np.asarray(
            dyn.step(jnp.asarray(self.x), jnp.asarray(self.u), self.timestep),
            dtype=np.float64)
        if not self.zero_noise_flag:
            noise_v = np.clip(self.rng.standard_normal() * 0.01, -0.05, 0.05)
            noise_theta = np.clip(self.rng.standard_normal() * 0.005, -0.05, 0.05)
            x_next[2] += 0.5 * noise_v
            x_next[3] += 0.5 * noise_theta
        self.x = x_next
        self.time += self.timestep

    def forward_one_step(self):
        """Solve -> step -> record (base.py:157-161)."""
        self.calc_ctrl_input()
        self.forward_dynamics()
        self.ctrl_policy.set_state(self.x)
        self.update_memory()

    def update_memory(self):
        self.states.append(self.x.copy())
        self.inputs.append(self.u.copy())
        self.timestamps.append(self.time)
        self.solver_times.append(self.delta_timer)
        self.feasibility.append(self.feasible)

    def update_memory_post_iter(self):
        """Lap-end bookkeeping + state reset (base.py:189-195)."""
        self.data["state"].append(np.stack(self.states))
        self.data["input"].append(np.stack(self.inputs) if self.inputs
                                  else np.zeros((0, 2)))
        self.data["timestamp"].append(np.asarray(self.timestamps))
        self.diagnostics["solver_time"].append(np.asarray(self.solver_times))
        self.diagnostics["feasibility"].append(np.asarray(self.feasibility))
        self.set_state(np.zeros((X_DIM,)))
