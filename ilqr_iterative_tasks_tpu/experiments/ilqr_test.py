"""i2LQR closed-loop demo CLI — mirror of the reference entry point.

Parity: /root/reference/iterative_ilqr/tests/ilqr_test.py:8-92 (flags
--lap-number --num-ss-points --num-ss-iters --plotting --direct-ilqr
--save-trajectory; N=6, dt=1, obstacle ellipse (31,-3) 8x6, zero noise,
final recorded state snapped to the goal before learning, :59).

Run:  python -m ilqr_iterative_tasks_tpu.experiments.ilqr_test \
          --lap-number 3 --num-ss-iters 2 --num-ss-points 8
"""

from __future__ import annotations

import argparse

import numpy as np

from ilqr_iterative_tasks_tpu.control.i2lqr import I2LqrController
from ilqr_iterative_tasks_tpu.experiments.runner import run_closed_loop
from ilqr_iterative_tasks_tpu.sim.plant import ObstacleSim
from ilqr_iterative_tasks_tpu.utils.params import IlqrParams


def test_ilqr(args):
    dt = 1.0
    params = IlqrParams.make(
        num_ss_points=args["num_ss_points"],
        num_ss_iter=args["num_ss_iters"],
        num_horizon=6,
    )
    # demo CLI obstacle (iterative_ilqr/tests/ilqr_test.py:31-35): y = -3
    obstacle = ObstacleSim(31.0, -3.0, 8.0, 6.0, spd=0, timestep=dt)
    controller = I2LqrController(params, obstacle=obstacle)
    seed = None
    if args.get("direct_ilqr"):
        # direct_ctrl_policy: seed from recorded lap files (base.py:134-136)
        from ilqr_iterative_tasks_tpu.sim.seed import load_recorded_trajectory
        seed = load_recorded_trajectory("data/closed_loop_multi_laps.txt",
                                        "data/input_multi_laps.txt")
    result = run_closed_loop(
        controller, lap_number=args["lap_number"], dt=dt, zero_noise=True,
        goal_fixup="snap", seed=seed, verbose=True)
    print(f"time at iteration 0 is {result.seed_time:.0f} s")
    for lap, t in enumerate(result.lap_times, start=1):
        print(f"time at iteration {lap} is {t:.0f} s")
    if args.get("save_trajectory"):
        np.savetxt("data/ilqr_closed_loop_multi_laps.txt",
                   np.round(result.plant.data["state"][-1], 5), fmt="%f")
        np.savetxt("data/ilqr_input_multi_laps.txt",
                   np.round(result.plant.data["input"][-1], 5), fmt="%f")
    if args.get("plotting"):
        from ilqr_iterative_tasks_tpu.utils import viz
        viz.plot_inputs(result.plant)
        viz.plot_closed_loop(result.plant, controller)
    return result


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--lap-number", type=int, default=3)
    parser.add_argument("--num-ss-points", type=int, default=8)
    parser.add_argument("--num-ss-iters", type=int, default=1)
    parser.add_argument("--plotting", action="store_true")
    parser.add_argument("--direct-ilqr", action="store_true")
    parser.add_argument("--save-trajectory", action="store_true")
    parser.add_argument("--platform", type=str, default=None,
                        choices=["cpu", "tpu"],
                        help="force a JAX backend (default: environment)")
    args = vars(parser.parse_args(argv))
    if args.get("platform"):
        import jax
        jax.config.update("jax_platforms", args["platform"])
    test_ilqr(args)


if __name__ == "__main__":
    main()
