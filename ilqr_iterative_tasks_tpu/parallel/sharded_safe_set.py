"""Sharded safe set with global top-k — the framework's "long-context" axis.

At ss_option=all scale (every stored state of every lap, base.py:569-571) the
safe set outgrows one device. Here the safe-set state tensor is sharded over
the mesh along the time/history axis; kNN runs as: local masked L1 distances
-> local top-k -> all_gather of k (distance, global index, point, qfun)
tuples per device -> global top-k — O(devices * k) bytes over ICI instead of
gathering the whole safe set (SURVEY.md §5 'Long-context / sequence
parallelism').
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@partial(jax.jit, static_argnames=("k", "axis_name", "mesh"))
def _knn_impl(states, valid, qfun, x_guess, *, k: int, mesh: Mesh,
              axis_name: str):
    def local(states_l, valid_l, qfun_l):
        shard = states_l.shape[0]
        d = jnp.sum(jnp.abs(states_l - x_guess[None, :]), axis=-1)
        d = jnp.where(valid_l, d, jnp.inf)
        neg, idx = jax.lax.top_k(-d, k)  # local top-k
        my = jax.lax.axis_index(axis_name)
        gidx = my * shard + idx
        pts = states_l[idx]  # (k, 4)
        qs = qfun_l[idx]
        # gather candidate tuples from every device: (n_dev, k, ...)
        all_d = jax.lax.all_gather(-neg, axis_name)
        all_gidx = jax.lax.all_gather(gidx, axis_name)
        all_pts = jax.lax.all_gather(pts, axis_name)
        all_qs = jax.lax.all_gather(qs, axis_name)
        flat_d = all_d.reshape(-1)
        neg2, sel = jax.lax.top_k(-flat_d, k)  # global top-k
        return (all_gidx.reshape(-1)[sel], all_pts.reshape(-1, 4)[sel],
                all_qs.reshape(-1)[sel], -neg2)

    from jax import shard_map
    return shard_map(
        local, mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), P(axis_name)),
        out_specs=(P(), P(), P(), P()), check_vma=False)(states, valid, qfun)


def sharded_knn(states: jnp.ndarray, valid: jnp.ndarray, qfun: jnp.ndarray,
                x_guess: jnp.ndarray, k: int, mesh: Mesh,
                axis_name: str = "history"):
    """Global L1-kNN over a safe set sharded along its first axis.

    states: (T, 4), valid: (T,), qfun: (T,) with T divisible by mesh size.
    Returns (global indices (k,), points (k, 4), qfun (k,), distances (k,)),
    ordered exactly as a single-device masked-top_k would order them.
    """
    sh = NamedSharding(mesh, P(axis_name))
    states = jax.device_put(states, sh)
    valid = jax.device_put(valid, sh)
    qfun = jax.device_put(qfun, sh)
    return _knn_impl(states, valid, qfun, x_guess, k=k, mesh=mesh,
                     axis_name=axis_name)
