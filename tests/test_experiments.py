"""Smoke tests: experiment CLIs, paper scenarios, checkpoint/resume, metrics."""

import os

import numpy as np
import pytest

from ilqr_iterative_tasks_tpu.control.i2lqr import I2LqrController
from ilqr_iterative_tasks_tpu.experiments import scenarios as scn
from ilqr_iterative_tasks_tpu.experiments.runner import (
    default_obstacle, run_closed_loop)
from ilqr_iterative_tasks_tpu.utils import checkpoint, metrics
from ilqr_iterative_tasks_tpu.utils.params import IlqrParams


@pytest.mark.slow
def test_ilqr_cli_smoke(capsys):
    from ilqr_iterative_tasks_tpu.experiments.ilqr_test import main
    main(["--lap-number", "2", "--num-ss-points", "8", "--num-ss-iters", "1"])
    out = capsys.readouterr().out
    assert "time at iteration 0 is 120 s" in out
    assert "time at iteration 2 is" in out


@pytest.mark.slow
def test_nlmpc_cli_smoke(capsys):
    from ilqr_iterative_tasks_tpu.experiments.nlmpc_test import main
    main(["--lap-number", "2", "--ss-option", "space"])
    out = capsys.readouterr().out
    assert "time at iteration 0 is 120 s" in out


@pytest.mark.slow
@pytest.mark.parametrize("scenario", ["no_obstacle", "add_static_obstacle"])
def test_scenarios_run(scenario, tmp_path):
    res = scn.run_scenario("ilqr", scenario, lap_number=3,
                           save_dir=str(tmp_path))
    assert all(res.lap_finished)
    files = os.listdir(tmp_path)
    assert len(files) == 1 and files[0].endswith(".npz")


def test_moving_geometry_matches_reference():
    # result/ilqr_test_add_moving_obstacle.py:18-31
    up = scn.MOVING_GEOMETRY["up"]
    assert (up["x"], up["y"], up["width"], up["height"], up["spd"],
            up["moving_option"]) == (35.0, -16.0, 34.0, 34.0, 1.0, 1)
    left = scn.MOVING_GEOMETRY["left"]
    assert (left["x"], left["y"], left["spd"], left["moving_option"]) == (
        50.0, -1.0, 0.2, 2)


@pytest.mark.slow
def test_checkpoint_roundtrip_and_resume(tmp_path):
    params = IlqrParams.make()
    ctrl = I2LqrController(params, obstacle=default_obstacle(1.0))
    res = run_closed_loop(ctrl, lap_number=2, dt=1.0, goal_fixup="append")
    path = str(tmp_path / "run.npz")
    checkpoint.save_run(path, res, ctrl)
    data = checkpoint.load_run(path)
    assert int(data["num_laps"]) == 3  # seed + 2 learning laps
    # resume: a fresh controller re-seeded from the checkpoint continues
    # improving from the stored state
    ctrl2 = I2LqrController(IlqrParams.make(), obstacle=default_obstacle(1.0))
    checkpoint.resume_controller(ctrl2, path)
    assert ctrl2.iter == 3
    np.testing.assert_allclose(ctrl2.safe_set.ss[1], ctrl.safe_set.ss[1])
    res2 = run_closed_loop(ctrl2, lap_number=1, dt=1.0, goal_fixup="append",
                           seed_safe_set=False)
    assert res2.lap_finished[-1]
    assert res2.lap_times[-1] <= res.lap_times[-1]


@pytest.mark.slow
def test_metrics_summary():
    params = IlqrParams.make()
    ctrl = I2LqrController(params, obstacle=default_obstacle(1.0))
    res = run_closed_loop(ctrl, lap_number=2, dt=1.0, goal_fixup="append")
    s = metrics.summary_dict(res)
    assert s["seed_time_s"] == 120.0
    assert s["lap_completion_rate"] == 1.0
    assert s["num_solves"] > 0
    assert 0 < s["solve_latency_p50_s"] < 1.0  # under the 1 s real-time budget
    assert s["monotone_improvement"]


def test_viz_smoke(tmp_path, monkeypatch):
    """Plot functions render without a display (Agg) — parity surface for
    base.py:728-762 and :36-48."""
    import matplotlib
    matplotlib.use("Agg")
    from ilqr_iterative_tasks_tpu.control.i2lqr import I2LqrController
    from ilqr_iterative_tasks_tpu.experiments.runner import (
        default_obstacle, run_closed_loop)
    from ilqr_iterative_tasks_tpu.utils import viz
    from ilqr_iterative_tasks_tpu.utils.params import IlqrParams

    ctrl = I2LqrController(IlqrParams.make(), obstacle=default_obstacle(1.0))
    res = run_closed_loop(ctrl, lap_number=1, dt=1.0, goal_fixup="append")
    fig1 = viz.plot_inputs(res.plant, show=False)
    fig2 = viz.plot_closed_loop(res.plant, ctrl, show=False)
    fig1.savefig(tmp_path / "inputs.png")
    fig2.savefig(tmp_path / "traj.png")
    assert (tmp_path / "inputs.png").stat().st_size > 0
