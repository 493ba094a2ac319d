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


def test_generic_soa_matches_aos_double_integrator():
    """The SoA (batch-trailing scalarized) generic solver must reproduce the
    AoS generic path's solutions at f64 on the double integrator: same LM
    loop, same spectral clamp (closed-form 2x2 vs eigh), iterates differ
    only by reassociation of the small matrix algebra."""
    from ilqr_iterative_tasks_tpu.ops.generic_ilqr_soa import (
        build_generic_ilqr_soa)

    n, m, N = 4, 2, 10
    cfg = _cfg(n, m)
    rng = np.random.default_rng(7)
    b = 16
    x0 = jnp.zeros((n, b), DTYPE)
    xts = jnp.asarray(rng.uniform(-4, 4, (n, b)), DTYPE)
    u_init = jnp.zeros((N, m, b), DTYPE)
    solve = build_generic_ilqr_soa(
        double_integrator.step_comps, n=n, m=m,
        matrix_Q=np.zeros((n, n)), matrix_R=0.05 * np.eye(m),
        matrix_Qterminal=20.0 * np.eye(n),
        u_lower=-2.0 * np.ones(m), u_upper=2.0 * np.ones(m), dt=0.5,
        num_horizon=N)
    soa = solve(x0, xts, u_init, 1.0)
    aos = jax.vmap(
        lambda xt: generic_ilqr_solve(double_integrator.step, cfg,
                                      jnp.zeros(n, DTYPE), xt,
                                      jnp.zeros((N, m), DTYPE), 1.0, 0.5)
    )(xts.T)
    np.testing.assert_allclose(np.asarray(soa.cost),
                               np.asarray(aos.cost), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(soa.us),
                               np.moveaxis(np.asarray(aos.us), 0, -1),
                               atol=1e-8)


def test_generic_soa_unicycle_reach():
    """Nonlinear 3-state system through the SoA path (jvp Jacobians on
    component tuples): reaches the target like the AoS path."""
    from ilqr_iterative_tasks_tpu.ops.generic_ilqr_soa import (
        build_generic_ilqr_soa)

    n, m, N = 3, 2, 8
    b = 8
    solve = build_generic_ilqr_soa(
        unicycle.step_comps, n=n, m=m,
        matrix_Q=np.zeros((n, n)), matrix_R=0.01 * np.eye(m),
        matrix_Qterminal=30.0 * np.eye(n),
        u_lower=-1.5 * np.ones(m), u_upper=1.5 * np.ones(m), dt=0.5,
        num_horizon=N)
    x0 = jnp.zeros((n, b), DTYPE)
    xt = jnp.broadcast_to(jnp.asarray([2.0, 1.0, 0.5], DTYPE)[:, None],
                          (n, b))
    sol = solve(x0, xt, 0.1 * jnp.ones((N, m, b), DTYPE), 1.0)
    err = np.linalg.norm(np.asarray(sol.xs[-1] - xt), axis=0)
    assert err.max() < 0.05, err


def test_generic_soa_bicycle_matches_generic_aos():
    """Feeding the bicycle's own component step through the GENERIC SoA
    solver must reproduce the generic AoS path's solutions at f64 (same
    quadratic-reach cost structure; the PARITY solver differs by its
    control barrier terms, so the apples-to-apples oracle is the generic
    AoS path on the same cost)."""
    from ilqr_iterative_tasks_tpu.ops.generic_ilqr_soa import (
        build_generic_ilqr_soa)
    from ilqr_iterative_tasks_tpu.ops.ilqr_soa import step_soa
    from ilqr_iterative_tasks_tpu.utils.params import (IlqrParams,
                                                       SystemLimits)

    params = IlqrParams.make(dtype=DTYPE)
    limits = SystemLimits.make(dtype=DTYPE)
    rng = np.random.default_rng(11)
    b = 16
    x0 = jnp.broadcast_to(jnp.asarray([0, 0, 1.0, 0], DTYPE)[:, None],
                          (4, b))
    xts = jnp.asarray(
        np.asarray([3.0, 0.2, 1.0, 0.0])[:, None]
        + 0.5 * rng.normal(size=(4, b)), DTYPE)
    u_init = jnp.zeros((6, 2, b), DTYPE)
    qt = np.asarray(params.matrix_Qterminal, np.float64)
    lo = [-float(limits.a_max), -float(limits.delta_max_r)]
    hi = [float(limits.a_max), float(limits.delta_max_r)]
    solve = build_generic_ilqr_soa(
        step_soa, n=4, m=2,
        matrix_Q=np.asarray(params.matrix_Q, np.float64),
        matrix_R=np.asarray(params.matrix_R, np.float64),
        matrix_Qterminal=qt,
        u_lower=lo, u_upper=hi, dt=1.0, num_horizon=6)
    gen = solve(x0, xts, u_init, float(np.asarray(params.lamb)))
    cfg = GenericIlqrConfig.make(
        matrix_Q=jnp.asarray(params.matrix_Q, DTYPE),
        matrix_R=jnp.asarray(params.matrix_R, DTYPE),
        matrix_Qterminal=jnp.asarray(qt, DTYPE),
        u_lower=jnp.asarray(lo, DTYPE), u_upper=jnp.asarray(hi, DTYPE),
        dtype=DTYPE)
    aos = jax.vmap(
        lambda xt: generic_ilqr_solve(kinetic_bicycle.step, cfg,
                                      jnp.asarray([0, 0, 1.0, 0], DTYPE),
                                      xt, jnp.zeros((6, 2), DTYPE),
                                      float(np.asarray(params.lamb)), 1.0)
    )(xts.T)
    # the default reference costs make this an exact-reach problem (Q = 0,
    # R = 0): both converged costs are ~0 and both terminal states land on
    # the target — compare absolutely
    np.testing.assert_allclose(np.asarray(gen.cost),
                               np.asarray(aos.cost), atol=1e-12)
    np.testing.assert_allclose(np.asarray(gen.xs[-1]),
                               np.asarray(aos.xs[:, -1]).T, atol=1e-5)


def test_generic_parallel_backward_converges_like_sequential():
    """backward="parallel" (associative-scan Riccati, ops/parallel_riccati)
    must reach the target like the sequential path. The regularization
    differs (control Tikhonov vs eig clamp), so iterates are not identical;
    both converge to the same exact-reach optimum (cost ~ 0)."""
    cfg = _cfg(4, 2)
    x0 = jnp.zeros(4, DTYPE)
    x_term = jnp.asarray([5.0, 3.0, 0.0, 0.0], DTYPE)
    u_init = jnp.zeros((32, 2), DTYPE)
    seq = generic_ilqr_solve(double_integrator.step, cfg, x0, x_term, u_init,
                             1.0, 0.25, "sequential")
    par = generic_ilqr_solve(double_integrator.step, cfg, x0, x_term, u_init,
                             1.0, 0.25, "parallel")
    err_seq = float(jnp.linalg.norm(seq.xs[-1] - x_term))
    err_par = float(jnp.linalg.norm(par.xs[-1] - x_term))
    assert err_seq < 0.05 and err_par < 0.05, (err_seq, err_par)
    assert float(par.cost) <= float(seq.cost) * 1.5 + 1e-6


def test_generic_pallas_matches_soa_double_integrator():
    """The generic Pallas tile kernel (ops/pallas_generic_ilqr.py) runs the
    SAME shared core (make_generic_core) inside a VMEM-resident while_loop
    — in interpret mode at f32 its solutions must match the XLA SoA generic
    solver at solution level (costs/rollouts; f32 LM cascades preclude
    cross-compilation bitwise equality, docs/PARITY.md convention)."""
    from ilqr_iterative_tasks_tpu.ops.generic_ilqr_soa import (
        build_generic_ilqr_soa)
    from ilqr_iterative_tasks_tpu.ops.pallas_generic_ilqr import (
        build_generic_ilqr_pallas)

    n, m, N = 4, 2, 6
    b = 256
    kw = dict(n=n, m=m, matrix_Q=np.zeros((n, n)),
              matrix_R=0.05 * np.eye(m), matrix_Qterminal=20.0 * np.eye(n),
              u_lower=-2.0 * np.ones(m), u_upper=2.0 * np.ones(m), dt=0.5,
              num_horizon=N, max_iter=60)
    rng = np.random.default_rng(3)
    x0 = jnp.zeros((n, b), jnp.float32)
    xts = jnp.asarray(rng.uniform(-4, 4, (n, b)), jnp.float32)
    u_init = jnp.zeros((N, m, b), jnp.float32)
    soa = build_generic_ilqr_soa(double_integrator.step_comps, **kw)(
        x0, xts, u_init, 1.0)
    pal = build_generic_ilqr_pallas(double_integrator.step_comps,
                                    tile_rows=1, interpret=True, **kw)(
        x0, xts, u_init)
    us_p, xl_p, cost_p, iters_p = pal
    np.testing.assert_allclose(np.asarray(cost_p), np.asarray(soa.cost),
                               rtol=2e-4)
    np.testing.assert_allclose(np.asarray(xl_p), np.asarray(soa.xs[-1]),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(us_p), np.asarray(soa.us),
                               atol=2e-3)


def test_generic_pallas_nonlinear_unicycle_reach():
    """Nonlinear 3-state system through the generic Pallas kernel (jvp
    one-hot Jacobians traced inside the kernel body) reaches the target."""
    from ilqr_iterative_tasks_tpu.ops.pallas_generic_ilqr import (
        build_generic_ilqr_pallas)

    n, m, N = 3, 2, 8
    b = 128
    solve = build_generic_ilqr_pallas(
        unicycle.step_comps, n=n, m=m, matrix_Q=np.zeros((n, n)),
        matrix_R=0.01 * np.eye(m), matrix_Qterminal=30.0 * np.eye(n),
        u_lower=-1.5 * np.ones(m), u_upper=1.5 * np.ones(m), dt=0.5,
        num_horizon=N, max_iter=60, tile_rows=1, interpret=True)
    x0 = jnp.zeros((n, b), jnp.float32)
    xt = jnp.broadcast_to(jnp.asarray([2.0, 1.0, 0.5], jnp.float32)[:, None],
                          (n, b))
    _us, xl, _cost, _it = solve(x0, xt, 0.1 * jnp.ones((N, m, b),
                                                       jnp.float32))
    err = np.linalg.norm(np.asarray(xl - xt), axis=0)
    assert err.max() < 0.05, err
