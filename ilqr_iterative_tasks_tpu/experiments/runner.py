"""Closed-loop experiment driver mirroring the reference entry points.

Behavioral parity: /root/reference/iterative_ilqr/tests/ilqr_test.py:8-78 and
nlmpc_test.py:7-80 — build plant + controller, seed the safe set with the
scripted lap, run ``lap_number`` closed-loop laps, report lap times.

Goal handling after each lap: the demo CLI *snaps* the final recorded state to
the goal (ilqr_test.py:59) while the CI test *appends* it (tests/ilqr_test.py:51);
``goal_fixup`` selects the variant.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np
import jax.numpy as jnp

from ilqr_iterative_tasks_tpu.sim.plant import BicyclePlant, ObstacleSim
from ilqr_iterative_tasks_tpu.sim.seed import seed_trajectory
from ilqr_iterative_tasks_tpu.sim.simulator import Simulator
from ilqr_iterative_tasks_tpu.utils.params import SystemLimits


@dataclass
class RunResult:
    lap_times: List[float]  # seconds per closed-loop lap (excl. seed lap)
    seed_time: float
    lap_finished: List[bool]
    plant: BicyclePlant = field(repr=False)
    simulator: Simulator = field(repr=False)

    @property
    def all_lap_times(self):
        return [self.seed_time] + list(self.lap_times)


def run_closed_loop(controller, lap_number: int, dt: float = 1.0,
                    zero_noise: bool = True, goal_fixup: str = "snap",
                    obstacle_schedule=None,
                    rng: Optional[np.random.Generator] = None,
                    seed_safe_set: bool = True,
                    seed: Optional[tuple] = None,
                    verbose: bool = False) -> RunResult:
    """Run seed lap + ``lap_number`` learning laps with any controller that
    implements the ControlBase API + add_trajectory.

    ``obstacle_schedule``: optional callable (lap_index, controller) -> None
    to inject/remove obstacles mid-run (result/ilqr_test_add_*_obstacle.py).
    ``seed_safe_set=False`` skips the initial add_trajectory — for controllers
    resumed from a checkpoint whose safe set is already populated.
    ``seed``: optional (xcl, ucl) replacing the scripted seed lap — the
    reference's direct_ctrl_policy mode (base.py:134-136).
    """
    xcl, ucl = seed if seed is not None else seed_trajectory(dt)
    xcl = np.asarray(xcl, dtype=np.float64)
    ucl = np.asarray(ucl, dtype=np.float64)
    plant = BicyclePlant(rng=rng)
    plant.set_state(np.zeros(4))
    plant.set_timestep(dt)
    if zero_noise:
        plant.set_zero_noise()
    if seed_safe_set:
        controller.add_trajectory(xcl, ucl)
    controller.set_timestep(dt)
    plant.set_ctrl_policy(controller)

    simulator = Simulator()
    simulator.set_robotic(plant)
    simulator.set_timestep(dt)
    simulator.set_goal(xcl[-1, :])

    for lap in range(lap_number):
        if obstacle_schedule is not None:
            obstacle_schedule(lap, controller)
        if verbose:
            print(f"iteration {lap} begins")
        simulator.sim(lap)
        lap_states = plant.data["state"][-1]
        if goal_fixup == "snap":
            lap_states = lap_states.copy()
            lap_states[-1, :] = xcl[-1, :]
        elif goal_fixup == "append":
            lap_states = np.vstack((lap_states, xcl[-1, :]))
        plant.data["state"][-1] = lap_states
        controller.add_trajectory(lap_states, plant.data["input"][-1])
        if verbose:
            print(f"iteration {lap} done: "
                  f"{len(plant.data['timestamp'][-1]) * dt:.0f} s")

    lap_times = simulator.lap_times(dt)
    return RunResult(
        lap_times=lap_times,
        seed_time=len(ucl) * dt,
        lap_finished=list(simulator.lap_finished),
        plant=plant,
        simulator=simulator,
    )


def default_obstacle(dt: float = 1.0, for_nlmpc: bool = False) -> ObstacleSim:
    """The standard test obstacle (tests/ilqr_test.py:26-30: x=31, y=-2,
    8x6 ellipse; demo CLI uses y=-3, iterative_ilqr/tests/ilqr_test.py:31-35)."""
    return ObstacleSim(31.0, -2.0, 8.0, 6.0, spd=0, timestep=dt)
