"""The 8 paper scenarios: {i2LQR, NLMPC} x {no_obstacle, static_obstacle,
add_static_obstacle, add_moving_obstacle}.

Parity: /root/reference/iterative_ilqr/result/*.py —
- "static": obstacle present the whole run (ilqr_test_static_obstacle.py),
- "add_static"/"add_moving": obstacle injected at lap 5 and removed at lap 6
  (ilqr_test_add_static_obstacle.py:50-59, ilqr_test_add_moving_obstacle.py:
  63-75),
- moving geometries (ilqr_test_add_moving_obstacle.py:18-31):
  up:   center (35, -16), 34x34, spd 1, option 1 (+y)
  left: center (50, -1), 35x35, spd 0.2, option 2 (-x)
- each run is saved to data/ (we store portable .npz via utils.checkpoint
  instead of the reference's full-object pickles).

Run:  python -m ilqr_iterative_tasks_tpu.experiments.scenarios \
          --controller ilqr --scenario add_moving_obstacle --moving-option up \
          --lap-number 8
"""

from __future__ import annotations

import argparse
import os

from ilqr_iterative_tasks_tpu.control.i2lqr import I2LqrController
from ilqr_iterative_tasks_tpu.control.nlmpc import NlmpcController
from ilqr_iterative_tasks_tpu.experiments.runner import run_closed_loop
from ilqr_iterative_tasks_tpu.sim.plant import ObstacleSim
from ilqr_iterative_tasks_tpu.utils.checkpoint import save_run
from ilqr_iterative_tasks_tpu.utils.params import IlqrParams, LmpcParams

MOVING_GEOMETRY = {
    # moving_option "up" (1): result/ilqr_test_add_moving_obstacle.py:18-24
    "up": dict(x=35.0, y=-16.0, width=34.0, height=34.0, spd=1.0,
               moving_option=1),
    # moving_option "left" (2): result/ilqr_test_add_moving_obstacle.py:25-31
    "left": dict(x=50.0, y=-1.0, width=35.0, height=35.0, spd=0.2,
                 moving_option=2),
}

SCENARIOS = ("no_obstacle", "static_obstacle", "add_static_obstacle",
             "add_moving_obstacle")


def build_schedule(scenario: str, dt: float, moving_option: str = "up"):
    """Returns (initial obstacle, obstacle_schedule callable)."""
    if scenario == "no_obstacle":
        return None, None
    if scenario == "static_obstacle":
        return ObstacleSim(31.0, -2.0, 8.0, 6.0, spd=0, timestep=dt), None
    if scenario == "add_static_obstacle":
        def schedule(lap, controller):
            # inject at lap 5, remove at lap 6 (add_static_obstacle.py:50-59)
            if lap == 5:
                controller.obstacle = ObstacleSim(31.0, -2.0, 8.0, 6.0,
                                                  spd=0, timestep=dt)
            if lap == 6:
                controller.obstacle = None
        return None, schedule
    if scenario == "add_moving_obstacle":
        geom = MOVING_GEOMETRY[moving_option]

        def schedule(lap, controller):
            if lap == 5:
                controller.obstacle = ObstacleSim(timestep=dt, **geom)
            if lap == 6:
                controller.obstacle = None
        return None, schedule
    raise ValueError(f"unknown scenario {scenario!r}")


def run_scenario(controller_kind: str, scenario: str, lap_number: int = 8,
                 num_ss_points: int = 8, num_ss_iters: int = 1,
                 moving_option: str = "up", save_dir: str | None = "data",
                 verbose: bool = False):
    dt = 1.0
    obstacle, schedule = build_schedule(scenario, dt, moving_option)
    if controller_kind == "ilqr":
        params = IlqrParams.make(num_ss_points=num_ss_points,
                                 num_ss_iter=num_ss_iters)
        controller = I2LqrController(params, obstacle=obstacle)
        goal_fixup = "snap"
    elif controller_kind == "nlmpc":
        params = LmpcParams.make(num_ss_points=num_ss_points,
                                 num_ss_iter=num_ss_iters,
                                 ss_option="spaceVarying")
        controller = NlmpcController(params, obstacle=obstacle)
        goal_fixup = None
    else:
        raise ValueError(f"unknown controller {controller_kind!r}")
    result = run_closed_loop(controller, lap_number=lap_number, dt=dt,
                             zero_noise=True, goal_fixup=goal_fixup,
                             obstacle_schedule=schedule, verbose=verbose)
    if save_dir:
        os.makedirs(save_dir, exist_ok=True)
        tag = f"{controller_kind}_ss_{num_ss_points}_{scenario}"
        if scenario == "add_moving_obstacle":
            tag += f"_{moving_option}"
        save_run(os.path.join(save_dir, f"ego_{tag}.npz"), result, controller)
    return result


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--controller", choices=["ilqr", "nlmpc"],
                        default="ilqr")
    parser.add_argument("--scenario", choices=SCENARIOS,
                        default="static_obstacle")
    parser.add_argument("--lap-number", type=int, default=8)
    parser.add_argument("--num-ss-points", type=int, default=8)
    parser.add_argument("--num-ss-iters", type=int, default=1)
    parser.add_argument("--moving-option", choices=["up", "left"],
                        default="up")
    parser.add_argument("--no-save", action="store_true")
    parser.add_argument("--platform", type=str, default=None,
                        choices=["cpu", "tpu"],
                        help="force a JAX backend (default: environment)")
    args = parser.parse_args(argv)
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    result = run_scenario(
        args.controller, args.scenario, lap_number=args.lap_number,
        num_ss_points=args.num_ss_points, num_ss_iters=args.num_ss_iters,
        moving_option=args.moving_option,
        save_dir=None if args.no_save else "data", verbose=True)
    print("lap times:", result.all_lap_times)


if __name__ == "__main__":
    main()
