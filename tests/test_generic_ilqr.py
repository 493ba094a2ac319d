"""Generic-system iLQR: arbitrary dynamics through the same LM solve loop.

Beyond-the-reference coverage (the reference hard-codes the bicycle —
`control/iterative_ilqr.py` imports `systems/kinetic_bicycle` directly):
the generic solver must (a) solve reach tasks on systems with different
state dims / nonlinearity, (b) reproduce the bicycle path's quality when fed
the bicycle step function, (c) vmap over candidate terminals.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ilqr_iterative_tasks_tpu.models import double_integrator, kinetic_bicycle, unicycle
from ilqr_iterative_tasks_tpu.ops.generic_ilqr import (
    GenericIlqrConfig,
    generic_ilqr_solve,
    generic_ilqr_solve_candidates,
)

DTYPE = jnp.float64


def _cfg(n, m, qterm=20.0, r=0.05, u_max=2.0):
    return GenericIlqrConfig.make(
        matrix_Q=jnp.zeros((n, n)),
        matrix_R=r * jnp.eye(m),
        matrix_Qterminal=qterm * jnp.eye(n),
        u_lower=-u_max * jnp.ones(m),
        u_upper=u_max * jnp.ones(m),
        dtype=DTYPE,
    )


def test_double_integrator_reach():
    cfg = _cfg(4, 2)
    x0 = jnp.zeros(4, DTYPE)
    x_term = jnp.asarray([5.0, 3.0, 0.0, 0.0], DTYPE)
    u_init = jnp.zeros((10, 2), DTYPE)
    sol = generic_ilqr_solve(double_integrator.step, cfg, x0, x_term, u_init,
                             1.0, 0.5)
    err = float(jnp.linalg.norm(sol.xs[-1] - x_term))
    assert err < 0.05, err
    # inputs respected the box
    assert float(jnp.max(jnp.abs(sol.us))) <= 2.0 + 1e-12


def test_unicycle_reach():
    cfg = _cfg(3, 2, qterm=30.0, r=0.01, u_max=1.5)
    x0 = jnp.zeros(3, DTYPE)
    x_term = jnp.asarray([2.0, 1.0, 0.5], DTYPE)
    u_init = 0.1 * jnp.ones((8, 2), DTYPE)
    sol = generic_ilqr_solve(unicycle.step, cfg, x0, x_term, u_init, 1.0, 0.5)
    err = float(jnp.linalg.norm(sol.xs[-1] - x_term))
    assert err < 0.05, err


def test_bicycle_through_generic_path():
    """The generic solver fed the bicycle step reaches a safe-set-style
    terminal state as well as the parity solver's task demands (quadratic
    cost; the parity path adds reference barrier shaping on top)."""
    cfg = GenericIlqrConfig.make(
        matrix_Q=jnp.zeros((4, 4)),
        matrix_R=0.05 * jnp.eye(2),
        matrix_Qterminal=2.0 * jnp.diag(jnp.asarray([1.0, 1.0, 20.0, 0.02])),
        u_lower=jnp.asarray([-2.0, -1.57]),
        u_upper=jnp.asarray([2.0, 1.57]),
        dtype=DTYPE,
    )
    x0 = jnp.zeros(4, DTYPE)
    x_term = jnp.asarray([8.0, 0.5, 2.0, 0.1], DTYPE)
    u_init = jnp.zeros((6, 2), DTYPE)
    sol = generic_ilqr_solve(kinetic_bicycle.step, cfg, x0, x_term, u_init,
                             1.0, 1.0)
    # v is weighted 20x in Qterminal: the solve must match it tightly, and
    # position within the i2LQR relaxed-reach scale.
    assert abs(float(sol.xs[-1, 2]) - 2.0) < 0.05
    assert float(jnp.linalg.norm(sol.xs[-1, :2] - x_term[:2])) < 1.0
    assert sol.cost < 1.0


def test_candidate_vmap_shapes_and_argmin():
    cfg = _cfg(4, 2)
    x0 = jnp.zeros(4, DTYPE)
    terms = jnp.asarray(
        np.linspace([2.0, 1.0, 0.0, 0.0], [6.0, 3.0, 0.0, 0.0], 5), DTYPE)
    u_init = jnp.zeros((10, 2), DTYPE)
    sols = generic_ilqr_solve_candidates(double_integrator.step, cfg, x0,
                                         terms, u_init, 1.0, 0.5)
    assert sols.us.shape == (5, 10, 2)
    assert sols.xs.shape == (5, 11, 4)
    assert sols.cost.shape == (5,)
    # every candidate is reachable in 10 steps at |a|<=2; all costs finite
    assert bool(jnp.all(jnp.isfinite(sols.cost)))


def test_autodiff_jacobians_match_analytic_linear_system():
    """For the (linear) double integrator the autodiff Jacobians the solver
    uses must equal the exact discrete A, B matrices."""
    dt = 0.5
    x = jnp.asarray([1.0, -2.0, 0.3, 0.7], DTYPE)
    u = jnp.asarray([0.4, -0.9], DTYPE)
    A = jax.jacfwd(double_integrator.step, argnums=0)(x, u, dt)
    B = jax.jacfwd(double_integrator.step, argnums=1)(x, u, dt)
    A_exact = np.eye(4)
    A_exact[0, 2] = dt
    A_exact[1, 3] = dt
    B_exact = np.asarray(
        [[0.5 * dt * dt, 0.0], [0.0, 0.5 * dt * dt], [dt, 0.0], [0.0, dt]])
    np.testing.assert_allclose(np.asarray(A), A_exact, atol=1e-12)
    np.testing.assert_allclose(np.asarray(B), B_exact, atol=1e-12)
