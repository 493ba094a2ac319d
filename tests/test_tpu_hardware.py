"""Opt-in ON-HARDWARE parity smoke tests (ADVICE r3).

CI validates the qsort_skip control flow (f32-scalar alive carry, tile-level
early-terminated while_loop, position-indexed stores) bitwise in interpret
mode on CPU — but the documented miscompile surface is the real Mosaic TPU
lowering (i1 carries, (8, 128) reshape tiling). These tests re-run the
qsort-vs-baseline bitwise comparison on the actual chip at the production
tile shape (tile_rows=8, one 1024-lane tile, 2 learning laps) so a Mosaic
regression of the early-terminated loop is caught by a test, not by headline
number drift.

Opt-in: ``RUN_TPU_TESTS=1 python -m pytest tests/test_tpu_hardware.py -v``
(skipped otherwise — the conftest pins the test process to CPU, and the one
real chip is reserved for benches; each worker runs in a subprocess that
inherits the sitecustomize axon platform). First run compiles ~15 s per
kernel variant; the persistent .jax_cache makes re-runs fast.
"""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("RUN_TPU_TESTS") != "1",
    reason="on-hardware smoke tests are opt-in: set RUN_TPU_TESTS=1")

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "_tpu_qsort_worker.py")


def _run_worker(which: str) -> None:
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # let the sitecustomize axon pin apply
    out = subprocess.run([sys.executable, _WORKER, which],
                         capture_output=True, text=True, timeout=1200,
                         env=env)
    assert out.returncode == 0, (
        f"worker failed:\nstdout:\n{out.stdout}\nstderr:\n{out.stderr}")
    assert "TPU_QSORT_PARITY_OK" in out.stdout


def test_i2lqr_qsort_skip_bitwise_on_hardware():
    _run_worker("i2lqr")


def test_nlmpc_qsort_skip_bitwise_on_hardware():
    _run_worker("nlmpc")


def test_nlmpc_with_stats_qsort_compiled_on_hardware():
    """ADVICE r4: the with_stats qsort kernel adds a (tile,) f32 vector +
    f32 scalar to the Mosaic scf.while carry; CI only exercises it in
    interpret mode. Build it non-interpret on the chip and check the
    observer is bitwise-neutral with useful <= executed."""
    _run_worker("nlmpc_stats")
