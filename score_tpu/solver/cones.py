"""Batched second-order-cone (SOC) algebra for the interior-point solver.

Every problem instance has a product cone K = SOC(k)^N with a single, static
cone width k (= dim + 1), so all operations here are dense batched array ops
of shape (N, k) / (N, k, k) — ideal for the TPU VPU, vmap-safe, and free of
dynamic shapes.

Conventions: a cone vector u = (u0, u1) with u0 scalar and u1 in R^{k-1};
u in int(SOC) iff u0 > ||u1||. The Jordan product is
u o v = (u.v, u0 v1 + v0 u1) with identity e = (1, 0). The Nesterov-Todd
scaling point for (s, z) is represented by (eta, wbar) with
wbar^T J wbar = 1 (J = diag(1, -I)), W = eta * [wbar0, wbar1^T;
wbar1, I + wbar1 wbar1^T / (1 + wbar0)], satisfying W^2 z = s and
lambda = W z = W^{-1} s.

This module is the TPU-native replacement for the cone handling inside
Gurobi's barrier method (the reference's numerical engine, SURVEY.md §2.3).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from score_tpu.solver import dd

__all__ = [
    "NTScaling",
    "soc_identity",
    "soc_residual",
    "min_eig",
    "jordan_mul",
    "jordan_solve",
    "nt_scaling",
    "apply_W",
    "apply_Winv",
    "winv2_matrices",
    "scaled_lambda",
    "max_step",
    "shift_to_interior",
    "inner",
]


class NTScaling(NamedTuple):
    """Per-cone NT scaling: W = eta * H(wbar)."""

    eta: jnp.ndarray  # (N,)
    wbar: jnp.ndarray  # (N, k), wbar^T J wbar = 1


def soc_identity(N: int, k: int, dtype) -> jnp.ndarray:
    """The Jordan identity e = (1, 0, ..., 0) per cone."""
    return jnp.zeros((N, k), dtype=dtype).at[:, 0].set(1.0)


def inner(u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Total inner product over the cone product: sum_m <u_m, v_m>.

    Per-cone products are compensated (near-complementary pairs cancel to
    O(mu) from O(1) terms); the cross-cone sum of the nonnegative per-cone
    gaps is benign."""
    return jnp.sum(dd.dot(u, v))


def percone_inner(u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Compensated <u_m, v_m> per cone, shape (N,)."""
    return dd.dot(u, v)


def soc_residual(u: jnp.ndarray) -> jnp.ndarray:
    """u0^2 - ||u1||^2 per cone (positive strictly inside the cone),
    evaluated with compensated arithmetic: near the boundary the naive
    form has relative error eps * u0^2 / residual ~ eps/mu, which is what
    otherwise floors the IPM endgame at sqrt(eps)-grade gaps."""
    return dd.signed_sumsq(u)


def min_eig(u: jnp.ndarray) -> jnp.ndarray:
    """Smallest Jordan eigenvalue u0 - ||u1|| per cone."""
    return u[:, 0] - jnp.linalg.norm(u[:, 1:], axis=1)


def jordan_mul(u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """u o v = (u.v, u0 v1 + v0 u1)."""
    head = jnp.sum(u * v, axis=1, keepdims=True)
    tail = u[:, :1] * v[:, 1:] + v[:, :1] * u[:, 1:]
    return jnp.concatenate([head, tail], axis=1)


def jordan_solve(lmbda: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """Solve lambda o u = d for u (the arrow-matrix L(lambda) inverse).

    With a = lambda0, b = lambda1, sigma = a^2 - ||b||^2:
      u0 = (a d0 - b.d1) / sigma,  u1 = (d1 - u0 b) / a.

    Both sigma (the Jordan determinant) and the u0 numerator are
    cancellation-prone for near-boundary lambda: at a degenerate cone
    det(lambda) = rho_s rho_z can sit many orders below lambda0^2 ~ mu,
    and the naive forms lose ALL their digits (relative error
    eps lambda0^2 / det > 1) — which poisons the Newton rhs
    v = W(lambda \\ d) and freezes the IPM endgame. Both are evaluated
    compensated (solver/dd.py); this is what lets large multi-robot
    problems keep cutting the gap once a cone goes degenerate."""
    a = lmbda[:, :1]
    b = lmbda[:, 1:]
    sigma = dd.signed_sumsq(lmbda)[:, None]
    u0 = dd.jdot(lmbda, d)[:, None] / sigma
    u1 = (d[:, 1:] - u0 * b) / a
    return jnp.concatenate([u0, u1], axis=1)


def nt_scaling(s: jnp.ndarray, z: jnp.ndarray) -> NTScaling:
    """Nesterov-Todd scaling for each cone (rank-1 ECOS-style formulas).

    rho_s = sqrt(s0^2 - ||s1||^2),  rho_z likewise,
    sbar = s / rho_s,  zbar = z / rho_z,
    gamma = sqrt((1 + sbar.zbar) / 2),
    wbar = (sbar + J zbar) / (2 gamma),   eta = sqrt(rho_s / rho_z).
    """
    # Floor the (cancellation-prone) cone residuals at the smallest normal
    # so a boundary-grazing iterate degrades the scaling instead of
    # poisoning the whole step with NaNs; the solver's wide-neighborhood
    # safeguard keeps iterates where this floor never binds.
    tiny = jnp.finfo(s.dtype).smallest_normal
    rho_s = jnp.sqrt(jnp.maximum(soc_residual(s), tiny))
    rho_z = jnp.sqrt(jnp.maximum(soc_residual(z), tiny))
    sbar = s / rho_s[:, None]
    zbar = z / rho_z[:, None]
    # <sbar, zbar> via the compensated per-cone product of the RAW vectors
    # (the normalized dot would reintroduce the cancellation).
    sz = percone_inner(s, z) / (rho_s * rho_z)
    gamma = jnp.sqrt((1.0 + sz) / 2.0)
    Jzbar = zbar.at[:, 1:].multiply(-1.0)
    wbar = (sbar + Jzbar) / (2.0 * gamma[:, None])
    eta = jnp.sqrt(rho_s / rho_z)
    return NTScaling(eta=eta, wbar=wbar)


def _apply_H(wbar: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """H(wbar) u with H = [w0, w1^T; w1, I + w1 w1^T/(1+w0)] (O(k) per cone)."""
    w0 = wbar[:, :1]
    w1 = wbar[:, 1:]
    dot = jnp.sum(w1 * u[:, 1:], axis=1, keepdims=True)
    head = w0 * u[:, :1] + dot
    tail = u[:, 1:] + (u[:, :1] + dot / (1.0 + w0)) * w1
    return jnp.concatenate([head, tail], axis=1)


def apply_W(nt: NTScaling, u: jnp.ndarray) -> jnp.ndarray:
    """W u (W is symmetric)."""
    return nt.eta[:, None] * _apply_H(nt.wbar, u)


def apply_Winv(nt: NTScaling, u: jnp.ndarray) -> jnp.ndarray:
    """W^{-1} u = (1/eta) H(J wbar) u."""
    Jwbar = nt.wbar.at[:, 1:].multiply(-1.0)
    return _apply_H(Jwbar, u) / nt.eta[:, None]


def apply_Winv2(nt: NTScaling, u: jnp.ndarray) -> jnp.ndarray:
    """W^{-2} u via two structured H applications, never forming the dense
    matrix. For a near-degenerate cone ||W||^2 reaches ~1/mu^2-grade while
    W^{-2}'s small eigenvalue is ~mu^2-grade; the explicit (N, k, k)
    matrix stores entries of scale ||W||^2, so its small eigenvalue
    drowns in eps * ||W||^2 roundoff (observed at the 20-robot endgame:
    *negative* computed eigenvalues at -8e-6). The two-step operator form
    keeps the error at eps * kappa(W) instead of eps * kappa(W)^2 —
    load-bearing for the Newton back-substitution dz = W^{-2}(G dx + ...)
    once any cone goes degenerate. The dense matrices remain in use for
    KKT *assembly* (the factorization is a preconditioner there; the
    solver's residual-guarded refinement corrects its entry error)."""
    return apply_Winv(nt, apply_Winv(nt, u))


def winv2_matrices(nt: NTScaling) -> jnp.ndarray:
    """Dense per-cone W^{-2} = eta^{-2} (2 (J wbar)(J wbar)^T - J), shape
    (N, k, k) — consumed by the KKT assembly G^T W^{-2} G."""
    N, k = nt.wbar.shape
    Jwbar = nt.wbar.at[:, 1:].multiply(-1.0)
    J = jnp.eye(k, dtype=nt.wbar.dtype).at[1:, 1:].multiply(-1.0)
    M = 2.0 * Jwbar[:, :, None] * Jwbar[:, None, :] - J[None]
    return M / (nt.eta**2)[:, None, None]


def scaled_lambda(nt: NTScaling, z: jnp.ndarray) -> jnp.ndarray:
    """lambda = W z (= W^{-1} s)."""
    return apply_W(nt, z)


def max_step(u: jnp.ndarray, du: jnp.ndarray, cap: float = 10.0) -> jnp.ndarray:
    """Largest alpha in (0, cap] with u + alpha du in SOC for EVERY cone,
    given u strictly interior. Solves the per-cone quadratic
    f(alpha) = (u0+a du0)^2 - ||u1 + a du1||^2 >= 0 for its smallest positive
    root (the first boundary crossing). Returns a scalar.
    """
    a = dd.signed_sumsq(du)
    b = 2.0 * dd.jdot(u, du)
    c = soc_residual(u)  # > 0 strictly inside
    disc = b * b - 4.0 * a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    eps = jnp.finfo(u.dtype).tiny
    # Quadratic roots via the numerically stable form (sign(0) treated as +1
    # so b == 0 still yields a valid root pair).
    sgn = jnp.where(b >= 0.0, 1.0, -1.0)
    qq = -0.5 * (b + sgn * sq)
    qq_safe = jnp.where(qq == 0.0, eps, qq)
    a_safe = jnp.where(a == 0.0, eps, a)
    r1 = qq_safe / a_safe
    r2 = c / qq_safe
    # Linear fallback when a ~ 0: root = -c / b (only limits if b < 0).
    lin = jnp.where(b < 0.0, -c / jnp.where(b == 0.0, -eps, b), cap)

    def pos_min(x, y):
        x = jnp.where(x > 0.0, x, cap)
        y = jnp.where(y > 0.0, y, cap)
        return jnp.minimum(x, y)

    quad = jnp.where(disc >= 0.0, pos_min(r1, r2), cap)
    per_cone = jnp.where(a == 0.0, lin, quad)
    per_cone = jnp.where(b >= 0.0, jnp.where(a >= 0.0, cap, per_cone), per_cone)
    return jnp.minimum(jnp.min(per_cone), cap) if per_cone.size else jnp.asarray(cap, u.dtype)


def shift_to_interior(u: jnp.ndarray, margin: float = 0.0) -> jnp.ndarray:
    """Shift u along the global identity so that every cone is strictly
    interior: u0 += (1 + |t|) when t = min over cones of min_eig(u) <= margin
    (CVXOPT coneqp-style initialization shift)."""
    if u.shape[0] == 0:
        return u
    t = jnp.min(min_eig(u))
    shift = jnp.where(t <= margin, 1.0 + jnp.abs(t), 0.0)
    return u.at[:, 0].add(shift)
