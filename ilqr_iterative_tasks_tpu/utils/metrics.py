"""Metrics & profiling: per-step solve latency percentiles, lap statistics,
throughput accounting.

The reference's only instrumentation is a wall-clock print around each solve
(base.py:145-150) plus per-lap diagnostics dicts (:163-195). Here metrics are
first-class (SURVEY.md §5): structured per-lap records, latency percentiles
(p50/p99 is a headline target in BASELINE.md), and a block-until-ready timing
harness for jitted callables.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable, Dict, List

import numpy as np
import jax


@dataclass
class LatencyStats:
    p50: float
    p90: float
    p99: float
    mean: float
    max: float
    n: int

    @classmethod
    def from_samples(cls, samples) -> "LatencyStats":
        s = np.asarray(list(samples), dtype=np.float64)
        if s.size == 0:
            return cls(0.0, 0.0, 0.0, 0.0, 0.0, 0)
        return cls(
            p50=float(np.percentile(s, 50)),
            p90=float(np.percentile(s, 90)),
            p99=float(np.percentile(s, 99)),
            mean=float(s.mean()),
            max=float(s.max()),
            n=int(s.size),
        )


def run_latency_stats(result) -> LatencyStats:
    """Latency stats over every per-step solve of a closed-loop RunResult."""
    samples: List[float] = []
    for lap in result.plant.diagnostics["solver_time"]:
        samples.extend(np.asarray(lap).ravel().tolist())
    return LatencyStats.from_samples(samples)


@dataclass
class LapMetrics:
    lap_times: List[float]
    seed_time: float
    monotone: bool
    converged_time: float
    completion_rate: float

    @classmethod
    def from_result(cls, result) -> "LapMetrics":
        t = list(result.lap_times)
        return cls(
            lap_times=t,
            seed_time=result.seed_time,
            monotone=all(b <= a for a, b in zip(t, t[1:])),
            converged_time=t[-1] if t else float("nan"),
            completion_rate=float(np.mean(result.lap_finished))
            if result.lap_finished else 0.0,
        )


def time_jitted(fn: Callable, *args, reps: int = 5, warmup: int = 1,
                **kwargs) -> LatencyStats:
    """block_until_ready timing harness for a jitted callable."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args, **kwargs))
    samples = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args, **kwargs))
        samples.append(time.perf_counter() - t0)
    return LatencyStats.from_samples(samples)


def summary_dict(result) -> Dict:
    """One flat dict: lap metrics + latency percentiles, for logging/JSON."""
    lat = run_latency_stats(result)
    laps = LapMetrics.from_result(result)
    return {
        "seed_time_s": laps.seed_time,
        "lap_times_s": laps.lap_times,
        "converged_lap_s": laps.converged_time,
        "monotone_improvement": laps.monotone,
        "lap_completion_rate": laps.completion_rate,
        "solve_latency_p50_s": lat.p50,
        "solve_latency_p90_s": lat.p90,
        "solve_latency_p99_s": lat.p99,
        "solve_latency_max_s": lat.max,
        "num_solves": lat.n,
    }
