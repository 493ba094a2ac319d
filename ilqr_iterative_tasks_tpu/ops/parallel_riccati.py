"""Parallel-in-time Riccati recursion via associative scan — the long-horizon
solver path.

The reference's horizons are tiny (N = 6), but this framework treats horizon
length as a first-class scaling axis (SURVEY.md §5 "long-context"): for
N >> 100 the sequential Riccati recursion's O(N) depth dominates; the
backward pass is reformulated as a suffix scan of affine-fractional value
maps, giving O(log N) depth on TPU via ``jax.lax.associative_scan``
(cf. PAPERS.md: "The Parallelization of Riccati Recursion"; Sarkka &
Garcia-Fernandez, temporal parallelization of LQT).

Derivation. With value convention V(x) = 0.5 x'P x + p'x (+const), one LQR
backward step with stage (F, b, L, X, q, U) — dynamics x' = F x + L u + b,
cost 0.5 x'X x + q'x + 0.5 u'U u — maps (P, p) -> (P_out, p_out):

    P_out = X + F' (I + P C)^{-1} P F,        C = L U^{-1} L'
    p_out = q + F' (I + P C)^{-1} (P b + p)

This 5-parameter family e = (A, b, C, eta, J), acting as
    P_out = J + A'(I + P C)^{-1} P A,
    p_out = eta + A'(I + P C)^{-1} (P b + p),
is closed under composition with an ASSOCIATIVE combination rule, so the
suffix maps e_k o e_{k+1} o ... o e_N are computed by one associative scan;
evaluating each suffix at the empty value (P = 0, p = 0) yields (P_k, p_k)
for every k simultaneously.

Regularization note: the reference regularizes by clamping Quu eigenvalues
(iterative_ilqr.py:118-123) — a data-dependent nonlinearity incompatible with
a fixed element algebra. The parallel path instead uses control Tikhonov
(U + lamb*I), the standard LM variant for parallel Riccati; both recover the
Newton step as lamb -> 0. Linear-in-u stage costs are absorbed by completing
the square (u-shift), which modifies b and adds a constant.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class RiccatiElement(NamedTuple):
    A: jnp.ndarray  # (..., n, n)
    b: jnp.ndarray  # (..., n)
    C: jnp.ndarray  # (..., n, n)
    eta: jnp.ndarray  # (..., n)
    J: jnp.ndarray  # (..., n, n)


def _combine(e_later: RiccatiElement, e_earlier: RiccatiElement):
    """Compose value maps: (e_earlier o e_later), i.e. the earlier-in-time
    element is applied AFTER the later one (backward pass ordering)."""
    A1, b1, C1, eta1, J1 = e_earlier
    A2, b2, C2, eta2, J2 = e_later
    n = A1.shape[-1]
    eye = jnp.eye(n, dtype=A1.dtype)
    m = jnp.linalg.solve(eye + C1 @ J2, eye)  # (I + C1 J2)^{-1}
    mt = jnp.swapaxes(m, -1, -2)
    a1t = jnp.swapaxes(A1, -1, -2)
    A = A2 @ m @ A1
    b = (A2 @ m @ (b1[..., None] + C1 @ eta2[..., None]))[..., 0] + b2
    C = A2 @ m @ C1 @ jnp.swapaxes(A2, -1, -2) + C2
    eta = (a1t @ mt @ (eta2[..., None] - J2 @ b1[..., None]))[..., 0] + eta1
    J = a1t @ mt @ J2 @ A1 + J1
    return RiccatiElement(A, b, C, eta, J)


def _combine_assoc(ea, eb):
    """Combine for ``associative_scan(..., reverse=True)``: in reverse mode
    the first argument is the LATER-in-array (later-in-time) operand
    (verified against the sequential oracle; the naive order diverges)."""
    return _combine(e_later=ea, e_earlier=eb)


def make_stage_elements(F, b, L, X, q, U, bu, lamb=0.0):
    """Build per-stage elements from LQR stage data (leading axis N).

    F: (N,n,n), b: (N,n), L: (N,n,m), X: (N,n,n), q: (N,n), U: (N,m,m),
    bu: (N,m) linear-in-u cost (absorbed via u-shift), lamb: control Tikhonov.
    """
    n = F.shape[-1]
    m = U.shape[-1]
    u_reg = U + lamb * jnp.eye(m, dtype=U.dtype)
    u_inv = jnp.linalg.solve(u_reg, jnp.broadcast_to(
        jnp.eye(m, dtype=U.dtype), u_reg.shape))
    # u-shift: u = v - U^{-1} bu  =>  effective drift b - L U^{-1} bu
    b_eff = b - (L @ (u_inv @ bu[..., None]))[..., 0]
    C = L @ u_inv @ jnp.swapaxes(L, -1, -2)
    # element convention: V = 0.5 x'Jx - eta'x, so eta_stage = -q
    return RiccatiElement(A=F, b=b_eff, C=C, eta=-q, J=X)


def terminal_element(P_T, p_T):
    n = P_T.shape[-1]
    z = jnp.zeros_like(P_T)
    return RiccatiElement(A=z, b=jnp.zeros_like(p_T), C=z, eta=-p_T, J=P_T)


@jax.jit
def parallel_riccati_backward(F, b, L, X, q, U, bu, P_T, p_T, lamb=0.0):
    """All suffix value functions (P_k, p_k), k = 0..N, in O(log N) depth.

    Returns (P (N+1,n,n), p (N+1,n)). V_k(x) = 0.5 x'P_k x + p_k'x is the
    cost-to-go of the (control-Tikhonov-regularized) LQR from step k.
    """
    elems = make_stage_elements(F, b, L, X, q, U, bu, lamb)
    term = jax.tree_util.tree_map(lambda a: a[None], terminal_element(P_T, p_T))
    elems = jax.tree_util.tree_map(
        lambda a, t: jnp.concatenate([a, t], axis=0), elems, term)
    suffix = jax.lax.associative_scan(_combine_assoc, elems, reverse=True)
    # convert back from the element convention (V = 0.5 x'Jx - eta'x)
    return suffix.J, -suffix.eta


@jax.jit
def parallel_lqr_gains(F, b, L, X, q, U, bu, P_T, p_T, lamb=0.0):
    """Feedforward/feedback gains for every stage from the parallel backward.

    u_k = k_k + K_k x_k with
      Quu = U + lamb I + L'P_{k+1}L,  kff = -Quu^{-1}(bu + L'(P_{k+1}b + p_{k+1})),
      K = -Quu^{-1} L'P_{k+1}F.
    Returns (kff (N,m), K (N,m,n), P (N+1,n,n), p (N+1,n)).
    """
    P, p = parallel_riccati_backward(F, b, L, X, q, U, bu, P_T, p_T, lamb)
    P1 = P[1:]
    p1 = p[1:]
    lt = jnp.swapaxes(L, -1, -2)
    m = U.shape[-1]
    quu = U + lamb * jnp.eye(m, dtype=U.dtype) + lt @ P1 @ L
    rhs_ff = bu + (lt @ ((P1 @ b[..., None]) + p1[..., None]))[..., 0]
    kff = -jnp.linalg.solve(quu, rhs_ff[..., None])[..., 0]
    big_k = -jnp.linalg.solve(quu, lt @ P1 @ F)
    return kff, big_k, P, p


def sequential_riccati_backward(F, b, L, X, q, U, bu, P_T, p_T, lamb=0.0):
    """O(N)-depth oracle of the same regularized recursion (for tests and as
    the small-N fallback)."""
    n = F.shape[-1]
    m = U.shape[-1]
    eye_n = jnp.eye(n, dtype=F.dtype)
    eye_m = jnp.eye(m, dtype=U.dtype)

    def body(carry, inp):
        P, p = carry
        f, bc, l, x, qv, u, buv = inp
        u_reg = u + lamb * eye_m
        u_inv = jnp.linalg.solve(u_reg, eye_m)
        b_eff = bc - l @ u_inv @ buv
        C = l @ u_inv @ l.T
        P_out = x + f.T @ jnp.linalg.solve(eye_n + P @ C, P) @ f
        p_out = qv + f.T @ jnp.linalg.solve(eye_n + P @ C, P @ b_eff + p)
        return (P_out, p_out), (P_out, p_out)

    (_, _), (Ps, ps) = jax.lax.scan(
        body, (P_T, p_T), (F, b, L, X, q, U, bu), reverse=True)
    P_full = jnp.concatenate([Ps, P_T[None]], axis=0)
    p_full = jnp.concatenate([ps, p_T[None]], axis=0)
    return P_full, p_full
