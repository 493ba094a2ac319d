"""NLMPC closed-loop demo CLI — mirror of the reference entry point.

Parity: /root/reference/iterative_ilqr/tests/nlmpc_test.py:7-94 (flags
--lap-number --num-ss-points --num-ss-iters --ss-option {space,time,all}
--plotting --save-trajectory; N=6, dt=1, obstacle (31,-2) 8x6, zero noise).

Run:  python -m ilqr_iterative_tasks_tpu.experiments.nlmpc_test \
          --lap-number 10 --num-ss-iters 2 --num-ss-points 8 --ss-option space
"""

from __future__ import annotations

import argparse

import numpy as np

from ilqr_iterative_tasks_tpu.control.nlmpc import NlmpcController
from ilqr_iterative_tasks_tpu.experiments.runner import run_closed_loop
from ilqr_iterative_tasks_tpu.sim.plant import ObstacleSim
from ilqr_iterative_tasks_tpu.utils.params import LmpcParams


def nlmpc_test(args):
    dt = 1.0
    if args["ss_option"] == "all":
        params = LmpcParams.make(
            num_ss_points=args["num_ss_points"],
            num_ss_iter=args["num_ss_iters"],
            num_horizon=6, all_ss_point=True, all_ss_iter=True)
    else:
        ss_option = ("spaceVarying" if args["ss_option"] == "space"
                     else "timeVarying")
        params = LmpcParams.make(
            num_ss_points=args["num_ss_points"],
            num_ss_iter=args["num_ss_iters"],
            num_horizon=6, ss_option=ss_option)
    obstacle = ObstacleSim(31.0, -2.0, 8.0, 6.0, spd=0, timestep=dt)
    controller = NlmpcController(params, obstacle=obstacle)
    result = run_closed_loop(
        controller, lap_number=args["lap_number"], dt=dt, zero_noise=True,
        goal_fixup=None, verbose=True)
    print(f"time at iteration 0 is {result.seed_time:.0f} s")
    for lap, t in enumerate(result.lap_times, start=1):
        print(f"time at iteration {lap} is {t:.0f} s")
    if args.get("save_trajectory"):
        np.savetxt("data/lmpc_closed_loop_multi_laps.txt",
                   np.round(result.plant.data["state"][-1], 5), fmt="%f")
        np.savetxt("data/lmpc_input_multi_laps.txt",
                   np.round(result.plant.data["input"][-1], 5), fmt="%f")
    if args.get("plotting"):
        from ilqr_iterative_tasks_tpu.utils import viz
        viz.plot_inputs(result.plant)
        viz.plot_closed_loop(result.plant, controller)
    return result


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--lap-number", type=int, default=5)
    parser.add_argument("--num-ss-points", type=int, default=8)
    parser.add_argument("--num-ss-iters", type=int, default=1)
    parser.add_argument("--ss-option", type=str, default="space",
                        choices=["space", "time", "all"])
    parser.add_argument("--plotting", action="store_true")
    parser.add_argument("--save-trajectory", action="store_true")
    parser.add_argument("--platform", type=str, default=None,
                        choices=["cpu", "tpu"],
                        help="force a JAX backend (default: environment)")
    args = vars(parser.parse_args(argv))
    if args.get("platform"):
        import jax
        jax.config.update("jax_platforms", args["platform"])
    nlmpc_test(args)


if __name__ == "__main__":
    main()
