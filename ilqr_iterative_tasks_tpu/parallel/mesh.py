"""Device-mesh helpers for pod-scale sharding.

The reference is single-process with no parallelism (SURVEY.md §2); scale-out
here is TPU-native: a 1-D mesh whose axes carry
- ``scenario``: data parallelism over independent lap simulations, and
- ``candidate``: parallelism over safe-set terminal candidates of one solve
  (the "long-context" axis at ss_option=all scale, SURVEY.md §5),
with XLA collectives over ICI for the global argmin/top-k reductions.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = "scenario") -> Mesh:
    """1-D mesh over the first ``n_devices`` devices."""
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    return Mesh(np.array(devs[:n_devices]), (axis_name,))


def make_mesh_2d(n_scenario: int, n_candidate: int) -> Mesh:
    """2-D mesh: scenario-parallel x candidate-parallel."""
    devs = np.array(jax.devices()[: n_scenario * n_candidate])
    return Mesh(devs.reshape(n_scenario, n_candidate),
                ("scenario", "candidate"))


def scenario_sharding(mesh: Mesh, axis_name: str = "scenario") -> NamedSharding:
    """Shard the leading (batch) axis across the mesh; replicate the rest."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
