"""Closed-loop lap simulator.

Behavioral parity: /root/reference/iterative_ilqr/utils/base.py:693-726
(Simulator.sim): step plant + obstacle until ||x - x_goal|| <= 0.8 or the
step budget runs out. The reference hard-codes sim_time = 121 regardless of
its own argument (base.py:708-709) — reproduced as the default max budget.

Lap-end goal handling (two reference variants):
- "snap":   demo CLI overwrites the last recorded state with the goal
            (iterative_ilqr/tests/ilqr_test.py:59),
- "append": CI test appends the goal as an extra row
            (tests/ilqr_test.py:51).
"""

from __future__ import annotations

import numpy as np


class Simulator:
    def __init__(self, goal_tol: float = 0.8, max_sim_time: float = 121.0):
        self.plant = None
        self.timestep = None
        self.goal = None
        self.goal_tol = goal_tol
        self.max_sim_time = max_sim_time
        self.lap_finished = []

    def set_robotic(self, plant):
        self.plant = plant

    def set_timestep(self, dt):
        self.timestep = dt

    def set_goal(self, goal):
        self.goal = np.asarray(goal, dtype=np.float64)

    def sim(self, lap_index: int, sim_time: float = 121.0):
        """Run one closed-loop lap (base.py:708-726). ``sim_time`` is accepted
        for API parity but, like the reference, the hard budget is
        ``max_sim_time`` (121 s)."""
        del sim_time
        steps = int(self.max_sim_time / self.timestep)
        finished = False
        for i in range(steps):
            self.plant.forward_one_step()
            obstacle = getattr(self.plant.ctrl_policy, "obstacle", None)
            if obstacle is not None:
                obstacle.update()
            if np.linalg.norm(self.plant.x - self.goal) <= self.goal_tol:
                finished = True
                self.plant.update_memory_post_iter()
                if obstacle is not None:
                    obstacle.reset()
                break
            if i == steps - 1:
                self.plant.update_memory_post_iter()
                if obstacle is not None:
                    obstacle.reset()
        self.lap_finished.append(finished)
        return finished

    def lap_times(self, dt: float):
        """Per-lap closed-loop times in seconds (len(timestamps)*dt)."""
        return [len(t) * dt for t in self.plant.data["timestamp"]]
