"""Multi-host runtime: jax.distributed initialization + global mesh helpers.

Single-host pods need nothing from this module (jax.devices() already sees
every chip over ICI). For multi-host slices (hosts connected over DCN), call
``initialize_distributed`` once per process before any other JAX use; all
parallel/ APIs then operate on the global device set transparently — the
scenario axis shards across hosts (pure DCN-free data parallelism: scenarios
never communicate), while candidate/history collectives stay within a host's
ICI domain by construction when the mesh majors host-locally.

The reference is single-process with no distributed backend (SURVEY.md §5);
this is the TPU-native equivalent of an MPI/NCCL bootstrap.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Initialize the multi-host runtime (idempotent).

    With no arguments, defers to cluster auto-detection (TPU pod metadata) —
    the standard path on Cloud TPU slices. Explicit arguments support manual
    bring-up (e.g. CPU multi-process tests over loopback).
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs.update(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def global_scenario_mesh(axis_name: str = "scenario") -> Mesh:
    """1-D mesh over every chip of every host, host-major so that any
    future per-host collectives ride ICI, not DCN."""
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    return Mesh(np.array(devs), (axis_name,))


def host_local_batch_slice(global_batch: int) -> slice:
    """The slice of a globally-sharded scenario batch owned by this process
    (for building per-host scenario shards without materializing the global
    batch on every host)."""
    n_proc = jax.process_count()
    per = global_batch // n_proc
    start = jax.process_index() * per
    return slice(start, start + per)
