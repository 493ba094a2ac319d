"""Parallel (associative-scan) Riccati vs the sequential oracle, and the
sharded safe-set global kNN vs single-device top-k."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ilqr_iterative_tasks_tpu.ops.parallel_riccati as pr


def _random_lqr(rng, n=4, m=2, N=64):
    F = jnp.asarray(rng.normal(size=(N, n, n)) * 0.4 + np.eye(n) * 0.8)
    b = jnp.asarray(rng.normal(size=(N, n)) * 0.1)
    L = jnp.asarray(rng.normal(size=(N, n, m)))
    Xs = rng.normal(size=(N, n, n))
    X = jnp.asarray(Xs @ np.swapaxes(Xs, -1, -2) * 0.1)
    q = jnp.asarray(rng.normal(size=(N, n)))
    Us = rng.normal(size=(N, m, m))
    U = jnp.asarray(Us @ np.swapaxes(Us, -1, -2) * 0.5 + np.eye(m)[None] * 0.5)
    bu = jnp.asarray(rng.normal(size=(N, m)))
    PTs = rng.normal(size=(n, n))
    P_T = jnp.asarray(PTs @ PTs.T)
    p_T = jnp.asarray(rng.normal(size=n))
    return F, b, L, X, q, U, bu, P_T, p_T


@pytest.mark.parametrize("lamb", [0.0, 1.0])
@pytest.mark.parametrize("N", [5, 64, 257])
def test_parallel_matches_sequential(lamb, N):
    rng = np.random.default_rng(N)
    args = _random_lqr(rng, N=N)
    Pp, pp = pr.parallel_riccati_backward(*args, lamb)
    Ps, ps = pr.sequential_riccati_backward(*args, lamb)
    np.testing.assert_allclose(Pp, Ps, rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(pp, ps, rtol=1e-8, atol=1e-9)


def test_parallel_gains_are_lqr_optimal():
    """For an unconstrained LQR, simulating with the parallel gains must hit
    the analytic optimum: cost gradient ~ 0 (finite-difference check)."""
    rng = np.random.default_rng(7)
    n, m, N = 4, 2, 32
    args = _random_lqr(rng, n=n, m=m, N=N)
    F, b, L, X, q, U, bu, P_T, p_T = args
    kff, K, P, p = pr.parallel_lqr_gains(*args, 0.0)
    x0 = jnp.asarray(rng.normal(size=n))

    def simulate(du_flat):
        du = du_flat.reshape(N, m)
        x = x0
        cost = 0.0
        for i in range(N):
            u = kff[i] + K[i] @ x + du[i]
            cost = cost + 0.5 * x @ X[i] @ x + q[i] @ x \
                + 0.5 * u @ U[i] @ u + bu[i] @ u
            x = F[i] @ x + L[i] @ u + b[i]
        return cost + 0.5 * x @ P_T @ x + p_T @ x

    g = jax.grad(simulate)(jnp.zeros(N * m))
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-7)
    # value function prediction matches realized cost
    v0 = 0.5 * x0 @ P[0] @ x0 + p[0] @ x0
    realized = simulate(jnp.zeros(N * m))
    # V carries constant terms not tracked; compare via gradient wrt x0 instead
    gx = jax.grad(lambda x: (lambda x0_:
        _closed_loop_cost(x0_, kff, K, F, b, L, X, q, U, bu, P_T, p_T))(x))(x0)
    np.testing.assert_allclose(np.asarray(gx),
                               np.asarray(P[0] @ x0 + p[0]), rtol=1e-6,
                               atol=1e-7)


def _closed_loop_cost(x0, kff, K, F, b, L, X, q, U, bu, P_T, p_T):
    x = x0
    cost = 0.0
    for i in range(F.shape[0]):
        u = kff[i] + K[i] @ x
        cost = cost + 0.5 * x @ X[i] @ x + q[i] @ x \
            + 0.5 * u @ U[i] @ u + bu[i] @ u
        x = F[i] @ x + L[i] @ u + b[i]
    return cost + 0.5 * x @ P_T @ x + p_T @ x


def test_sharded_safe_set_knn_matches_local():
    from ilqr_iterative_tasks_tpu.parallel.mesh import make_mesh
    from ilqr_iterative_tasks_tpu.parallel.sharded_safe_set import sharded_knn

    rng = np.random.default_rng(3)
    T, k = 256, 8
    mesh = make_mesh(8, axis_name="history")
    states = jnp.asarray(rng.normal(size=(T, 4)) * 10, jnp.float32)
    valid = jnp.asarray(rng.random(T) > 0.2)
    qfun = jnp.asarray(np.arange(T)[::-1].copy(), jnp.float32)
    x_guess = jnp.asarray(rng.normal(size=4) * 5, jnp.float32)
    gidx, pts, qs, dists = sharded_knn(states, valid, qfun, x_guess, k, mesh)
    # local reference
    d = np.abs(np.asarray(states) - np.asarray(x_guess)).sum(axis=1)
    d = np.where(np.asarray(valid), d, np.inf)
    want = np.argsort(d, kind="stable")[:k]
    assert set(np.asarray(gidx).tolist()) == set(want.tolist())
    np.testing.assert_allclose(np.sort(np.asarray(dists)),
                               np.sort(d[want]), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(pts), np.asarray(states)[np.asarray(gidx)], rtol=1e-6)
