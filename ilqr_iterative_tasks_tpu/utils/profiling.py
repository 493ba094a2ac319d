"""Profiling helpers: jax.profiler trace capture around solver/sim sections.

SURVEY.md §5: the reference's only tracing is a wall-clock print per solve;
here device-level traces are first-class. Usage:

    from ilqr_iterative_tasks_tpu.utils.profiling import trace
    with trace("/tmp/tpu_trace"):
        jax.block_until_ready(simulate_learning_runs_soa(...))

then inspect with TensorBoard's profile plugin or xprof. ``annotate`` wraps
named regions so kernels attribute to framework phases.
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace for the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace region (shows up in xprof timelines)."""
    return jax.profiler.TraceAnnotation(name)


def device_memory_stats() -> dict:
    """Per-device live memory stats (bytes), where the backend reports them."""
    out = {}
    for d in jax.devices():
        try:
            out[str(d)] = d.memory_stats()
        except Exception:  # backend without memory_stats
            out[str(d)] = None
    return out
