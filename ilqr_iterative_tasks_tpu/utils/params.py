"""Hyperparameter pytrees for the controllers and the plant.

Parity references:
- iLqrParam defaults: /root/reference/iterative_ilqr/utils/base.py:242-302
- LMPCParam defaults:  /root/reference/iterative_ilqr/utils/base.py:482-511
- KineticBicycleParam: /root/reference/iterative_ilqr/utils/base.py:15-20

Design: flax.struct dataclasses. Fields that determine trace shapes or loop
structure (horizon, candidate counts, iteration caps) are static
(``pytree_node=False``); numeric weights are array leaves so they can be
swept/batch-varied without recompilation.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import struct


def _diag4(a, b, c, d):
    return np.diag([a, b, c, d]).astype(np.float64)


@struct.dataclass
class SystemLimits:
    """Input/state limits (base.py:15-20). ``delta_max_r`` is the
    round(delta_max, 2) value that the reference uses for clipping and
    barriers (iterative_ilqr.py:36-39, ilqr_helper.py:96-99)."""

    a_max: jnp.ndarray
    delta_max: jnp.ndarray
    delta_max_r: jnp.ndarray
    v_max: jnp.ndarray
    v_min: jnp.ndarray

    @classmethod
    def make(cls, a_max=2.0, delta_max=np.pi / 2, v_max=10.0, v_min=0.0,
             dtype=jnp.float32):
        f = lambda v: jnp.asarray(v, dtype=dtype)
        return cls(a_max=f(a_max), delta_max=f(delta_max),
                   delta_max_r=f(round(float(delta_max), 2)),
                   v_max=f(v_max), v_min=f(v_min))


@struct.dataclass
class IlqrParams:
    """i2LQR hyperparameters (base.py:242-302)."""

    # --- cost weights (array leaves) ---
    matrix_Q: jnp.ndarray  # (4,4) running state weight (default 0)
    matrix_R: jnp.ndarray  # (2,2) running input weight (default 0)
    matrix_Qterminal: jnp.ndarray  # (4,4) terminal weight
    tuning_state_q1: jnp.ndarray  # carried for API parity (unused by the
    tuning_state_q2: jnp.ndarray  # reference solver too, base.py:251-252)
    tuning_ctrl_q1: jnp.ndarray
    tuning_ctrl_q2: jnp.ndarray
    tuning_obs_q1: jnp.ndarray
    tuning_obs_q2: jnp.ndarray
    safety_margin: jnp.ndarray
    eps: jnp.ndarray  # iLQR relative-cost convergence tol
    lamb: jnp.ndarray  # initial LM regularization
    lamb_factor: jnp.ndarray
    max_lamb: jnp.ndarray
    reach_error: jnp.ndarray  # horizon-1 feasibility tol

    # --- structural (static) ---
    num_ss_points: int = struct.field(pytree_node=False, default=8)
    num_ss_iter: int = struct.field(pytree_node=False, default=1)
    num_horizon: int = struct.field(pytree_node=False, default=6)
    max_ilqr_iter: int = struct.field(pytree_node=False, default=150)
    max_relax_iter: int = struct.field(pytree_node=False, default=55)
    max_outloop_iter: int = struct.field(pytree_node=False, default=50)
    all_ss_point: bool = struct.field(pytree_node=False, default=False)
    all_ss_iter: bool = struct.field(pytree_node=False, default=False)
    ss_option: str = struct.field(pytree_node=False, default="spaceVarying")

    @classmethod
    def make(cls, *, matrix_Q=None, matrix_R=None, matrix_Qterminal=None,
             tuning_state_q1=1.0, tuning_state_q2=1.0,
             tuning_ctrl_q1=1.0, tuning_ctrl_q2=1.0,
             tuning_obs_q1=2.74, tuning_obs_q2=2.74, safety_margin=0.0,
             eps=1e-2, lamb=1.0, lamb_factor=10.0, max_lamb=1000.0,
             reach_error=1.0, dtype=jnp.float32, **static):
        f = lambda v: jnp.asarray(v, dtype=dtype)
        if matrix_Q is None:
            matrix_Q = 0.0 * _diag4(0.0, 0.0, 0.0, 0.0)
        if matrix_R is None:
            matrix_R = 0.0 * np.diag([0.05, 0.05])
        if matrix_Qterminal is None:
            matrix_Qterminal = 2.0 * _diag4(1.0, 1.0, 20.0, 0.02)
        return cls(
            matrix_Q=f(matrix_Q), matrix_R=f(matrix_R),
            matrix_Qterminal=f(matrix_Qterminal),
            tuning_state_q1=f(tuning_state_q1),
            tuning_state_q2=f(tuning_state_q2),
            tuning_ctrl_q1=f(tuning_ctrl_q1), tuning_ctrl_q2=f(tuning_ctrl_q2),
            tuning_obs_q1=f(tuning_obs_q1), tuning_obs_q2=f(tuning_obs_q2),
            safety_margin=f(safety_margin), eps=f(eps), lamb=f(lamb),
            lamb_factor=f(lamb_factor), max_lamb=f(max_lamb),
            reach_error=f(reach_error), **static)


@struct.dataclass
class LmpcParams:
    """NLMPC hyperparameters (base.py:482-511). The reference's nlmpc() is a
    pure min-time solve, so the weight matrices are carried for API parity but
    unused by the solver (see SURVEY.md component table)."""

    matrix_Q: jnp.ndarray
    matrix_R: jnp.ndarray
    matrix_Qslack: jnp.ndarray
    matrix_dR: jnp.ndarray

    num_ss_points: int = struct.field(pytree_node=False, default=8)
    num_ss_iter: int = struct.field(pytree_node=False, default=1)
    num_horizon: int = struct.field(pytree_node=False, default=6)
    all_ss_point: bool = struct.field(pytree_node=False, default=False)
    all_ss_iter: bool = struct.field(pytree_node=False, default=False)
    ss_option: str = struct.field(pytree_node=False, default="spaceVarying")

    @classmethod
    def make(cls, *, dtype=jnp.float32, **static):
        f = lambda v: jnp.asarray(v, dtype=dtype)
        return cls(
            matrix_Q=f(np.zeros((6, 6))),
            matrix_R=f(np.diag([1.0, 0.25])),
            matrix_Qslack=f(5.0 * np.diag([10, 0, 0, 1, 10, 0])),
            matrix_dR=f(5.0 * np.diag([0.8, 0.0])),
            **static)
