"""Checkpoint / resume for learning runs.

The reference checkpoints by pickling entire plant objects mid-run
(base.py:170-176) and at scenario end (result/*.py). Here runs are stored as
portable .npz archives of the safe-set tensors + per-lap closed-loop records
(SURVEY.md §5 'Checkpoint / resume'), and a controller can be exactly re-seeded
from them: the safe set IS the learned state, so replaying `add_trajectory`
over the stored laps reproduces the controller mid-run.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np


def save_run(path: str, result, controller) -> None:
    """Save a RunResult + controller safe set to ``path`` (.npz)."""
    ss = controller.safe_set
    payload = {
        "num_laps": np.asarray(ss.num_laps),
        "lap_times": np.asarray(result.lap_times),
        "seed_time": np.asarray(result.seed_time),
        "lap_finished": np.asarray(result.lap_finished),
    }
    for i in range(ss.num_laps):
        payload[f"ss_x_{i}"] = ss.ss[i]
        payload[f"ss_u_{i}"] = ss.u_ss[i]
    for i, states in enumerate(result.plant.data["state"]):
        payload[f"lap_state_{i}"] = states
        payload[f"lap_input_{i}"] = result.plant.data["input"][i]
        payload[f"lap_solver_time_{i}"] = result.plant.diagnostics["solver_time"][i]
        payload[f"lap_feasibility_{i}"] = result.plant.diagnostics["feasibility"][i]
    np.savez_compressed(path, **payload)


def load_run(path: str) -> dict:
    with np.load(path, allow_pickle=False) as z:
        return {k: z[k] for k in z.files}


def save_soa_run(path: str, result) -> None:
    """Checkpoint a batched SoA run (SoaRunResult / NlmpcSoaRunResult): the
    device safe-set tensors + lap count + PRNG key, enough for EXACT resume
    via ``simulate_*_runs_soa(..., resume_from=...)``."""
    payload = {
        "lap_count": np.asarray(result.lap_count),
        "key": np.asarray(result.final_key),
        "lap_steps": np.asarray(result.lap_steps),
        "lap_done": np.asarray(result.lap_done),
        "num_ss_tensors": np.asarray(len(result.safe_set)),
    }
    for i, t in enumerate(result.safe_set):
        payload[f"ss_{i}"] = np.asarray(t)
    np.savez_compressed(path, **payload)


def load_soa_run(path: str):
    """Returns (resume_from tuple, lap_steps, lap_done). Feed resume_from and
    its key into the matching SoA simulator to continue the sweep:

        ck, steps, done = load_soa_run(p)
        res = simulate_learning_runs_soa(..., ck[2], resume_from=ck, ...)
    """
    import jax.numpy as jnp

    with np.load(path, allow_pickle=False) as z:
        ss = tuple(jnp.asarray(z[f"ss_{i}"])
                   for i in range(int(z["num_ss_tensors"])))
        resume = (ss, jnp.asarray(z["lap_count"]), jnp.asarray(z["key"]))
        return resume, z["lap_steps"], z["lap_done"]


def restore_safe_set(path: str) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Returns [(x (T+1,4) row-major, u (T,2)), ...] per stored lap, ready to
    replay through ``controller.add_trajectory`` for exact resume."""
    data = load_run(path)
    laps = []
    for i in range(int(data["num_laps"])):
        laps.append((data[f"ss_x_{i}"].T, data[f"ss_u_{i}"].T))
    return laps


def resume_controller(controller, path: str):
    """Re-seed a fresh controller from a checkpoint (exact safe-set state)."""
    for x, u in restore_safe_set(path):
        controller.add_trajectory(x, u)
    return controller
