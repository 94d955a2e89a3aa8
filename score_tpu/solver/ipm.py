"""Primal-dual interior-point solver for conic QPs (the TPU-native
replacement of the reference's Gurobi barrier backend, SURVEY.md §2.3).

Solves    minimize    0.5 x^T P x + q^T x
          subject to  G x + s = h,   s in K = SOC(k)^N

with a Mehrotra predictor-corrector method under Nesterov-Todd scaling:

  * scaled complementarity linearization
        lambda o (W^{-1} ds + W dz) = d
    reduced to one SPD system per direction:
        (P + G^T W^{-2} G) dx = -rx - G^T W^{-2} (rz + W (lambda \\ d))
        dz = W^{-2} (G dx + rz + W (lambda \\ d))
        ds = -rz - G dx
  * the affine direction uses d = -lambda o lambda; the combined direction
    adds the Mehrotra second-order correction and centering sigma * mu * e;
  * one Cholesky factorization of K = P + G^T W^{-2} G serves both solves;
  * the gauge pin (first pose = [I|0]) is enforced by masking pinned
    rows/columns of K and of the dual residual (free-subspace Newton step).

The whole iteration is a `lax.while_loop` of dense/batched array ops — fully
jit-able, vmap-able over batched problem instances, and differentiable in
structure (no host round-trips).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from score_tpu.assembly.conic import ConicProblem
from score_tpu.solver import cones
from score_tpu.solver.linops import (
    G_apply,
    GT_apply,
    ProblemOperators,
    gtwg_dense,
    pin_fix_matrix,
    prepare_operators,
)

__all__ = ["IPMParams", "IPMResult", "solve_conic", "solve_conic_with_iterates"]

# Status codes.
RUNNING = 0
OPTIMAL = 1
MAX_ITER = 2
NUMERICAL_ERROR = 3


@dataclasses.dataclass(frozen=True)
class IPMParams:
    """Interior-point controls. Defaults target 1e-8-grade accuracy (vs the
    reference's BarQCPConvTol=1e-1, gurobi_utils.py:212)."""

    max_iter: int = 50
    tol_feas: float = 1e-8
    tol_gap_abs: float = 1e-8
    tol_gap_rel: float = 1e-8
    step_fraction: float = 0.99
    kkt_refine_steps: int = 1  # iterative-refinement passes per KKT solve
    # Static diagonal regularization of K, relative to max|diag(K)|; the
    # refinement passes solve against the TRUE K, so the regularization
    # perturbs conditioning, not the answer (ECOS/Clarabel-style).
    static_reg: float = 1e-11
    # Escalation factor for the retry factorization when the first Cholesky
    # breaks down (produces non-finite entries).
    reg_escalation: float = 1e5


class IPMResult(NamedTuple):
    x: jnp.ndarray
    s: jnp.ndarray
    z: jnp.ndarray
    iterations: jnp.ndarray
    status: jnp.ndarray
    pobj: jnp.ndarray  # 0.5 x'Px + q'x + const (true relaxation objective)
    gap: jnp.ndarray  # s'z
    pres: jnp.ndarray
    dres: jnp.ndarray


class _State(NamedTuple):
    x: jnp.ndarray
    s: jnp.ndarray
    z: jnp.ndarray
    it: jnp.ndarray
    status: jnp.ndarray


def _residuals(problem, ops: ProblemOperators, x, s, z):
    rx = ops.mask * (ops.P @ x + ops.q + GT_apply(problem, z))
    rz = G_apply(problem, x) + s - problem.cone_h
    return rx, rz


def _convergence(problem, ops, params: IPMParams, x, s, z):
    rx, rz = _residuals(problem, ops, x, s, z)
    pres = jnp.linalg.norm(rz) / ops.hnorm
    dres = jnp.linalg.norm(rx) / ops.qnorm
    gap = cones.inner(s, z)
    pq = 0.5 * x @ (ops.P @ x) + ops.q @ x
    relgap = gap / jnp.maximum(1.0, jnp.abs(pq))
    ok = (
        (pres < params.tol_feas)
        & (dres < params.tol_feas)
        & ((gap < params.tol_gap_abs) | (relgap < params.tol_gap_rel))
    )
    bad = ~(
        jnp.isfinite(pres) & jnp.isfinite(dres) & jnp.isfinite(gap)
    )
    return ok, bad, pres, dres, gap, pq


def _chol_solve(L, rhs):
    y = jax.scipy.linalg.solve_triangular(L, rhs, lower=True)
    return jax.scipy.linalg.solve_triangular(L.T, y, lower=False)


def _robust_cholesky(K, params: IPMParams):
    """Cholesky of K + delta*I with an escalated-regularization retry when
    the first factorization breaks down (non-finite entries from a loss of
    positive definiteness under roundoff — routine in late IPM iterations).
    Returns the factor; refinement downstream corrects the perturbation."""
    n = K.shape[0]
    scale = jnp.max(jnp.abs(jnp.diagonal(K)))
    delta = params.static_reg * scale
    eye = jnp.eye(n, dtype=K.dtype)
    L1 = jnp.linalg.cholesky(K + delta * eye)
    ok = jnp.all(jnp.isfinite(L1))
    return jax.lax.cond(
        ok,
        lambda: L1,
        lambda: jnp.linalg.cholesky(K + (params.reg_escalation * delta) * eye),
    )


def _step(problem: ConicProblem, ops: ProblemOperators, params: IPMParams,
          state: _State) -> _State:
    x, s, z = state.x, state.s, state.z
    N = problem.num_cones
    dtype = x.dtype

    nt = cones.nt_scaling(s, z)
    lam = cones.apply_W(nt, z)
    Winv2 = cones.winv2_matrices(nt)
    K = pin_fix_matrix(ops.P + gtwg_dense(problem, Winv2), ops.mask)
    L = _robust_cholesky(K, params)

    rx, rz = _residuals(problem, ops, x, s, z)
    gap = cones.inner(s, z)
    mu = gap / N

    def kkt_dirs(d):
        v = cones.apply_W(nt, cones.jordan_solve(lam, d))  # W (lambda \ d)
        rzv = rz + v
        wrz = jnp.einsum("mij,mj->mi", Winv2, rzv)
        rhs = ops.mask * (-(rx) - GT_apply(problem, wrz))
        dx = _chol_solve(L, rhs)
        for _ in range(params.kkt_refine_steps):
            resid = rhs - ops.mask * (K @ dx)
            dx = dx + _chol_solve(L, resid)
        Gdx = G_apply(problem, dx)
        dz = jnp.einsum("mij,mj->mi", Winv2, Gdx + rzv)
        ds = -rz - Gdx
        return dx, ds, dz

    # --- affine (predictor) direction ---
    d_aff = -cones.jordan_mul(lam, lam)
    dx_a, ds_a, dz_a = kkt_dirs(d_aff)
    alpha_a = jnp.minimum(
        1.0, jnp.minimum(cones.max_step(s, ds_a), cones.max_step(z, dz_a))
    )
    gap_a = cones.inner(s + alpha_a * ds_a, z + alpha_a * dz_a)
    sigma = jnp.clip((jnp.maximum(gap_a, 0.0) / gap) ** 3, 0.0, 1.0)

    # --- combined (corrector) direction ---
    e = cones.soc_identity(N, problem.k, dtype)
    correction = cones.jordan_mul(
        cones.apply_Winv(nt, ds_a), cones.apply_W(nt, dz_a)
    )
    d_comb = d_aff - correction + sigma * mu * e
    dx, ds, dz = kkt_dirs(d_comb)
    alpha = jnp.minimum(
        1.0,
        params.step_fraction
        * jnp.minimum(cones.max_step(s, ds), cones.max_step(z, dz)),
    )

    x_new = x + alpha * dx
    s_new = s + alpha * ds
    z_new = z + alpha * dz

    finite = (
        jnp.all(jnp.isfinite(x_new))
        & jnp.all(jnp.isfinite(s_new))
        & jnp.all(jnp.isfinite(z_new))
        & jnp.all(jnp.isfinite(L))
    )
    x_new = jnp.where(finite, x_new, x)
    s_new = jnp.where(finite, s_new, s)
    z_new = jnp.where(finite, z_new, z)
    status = jnp.where(finite, state.status, NUMERICAL_ERROR)

    return _State(x=x_new, s=s_new, z=z_new, it=state.it + 1, status=status)


def _initial_point(problem: ConicProblem, ops: ProblemOperators,
                   params: IPMParams = IPMParams()):
    """CVXOPT-coneqp-style start: solve the W=I KKT system, then shift s, z
    to the cone interior."""
    dtype = ops.P.dtype
    N, k = problem.num_cones, problem.k
    eyes = jnp.broadcast_to(jnp.eye(k, dtype=dtype), (N, k, k))
    K0 = pin_fix_matrix(ops.P + gtwg_dense(problem, eyes), ops.mask)
    L0 = _robust_cholesky(K0, params)
    rhs0 = -ops.q + GT_apply(problem, problem.cone_h)
    pin_contrib = ops.P @ ops.xpin + GT_apply(problem, G_apply(problem, ops.xpin))
    dx0 = _chol_solve(L0, ops.mask * (rhs0 - pin_contrib))
    x0 = ops.xpin + dx0
    z_raw = G_apply(problem, x0) - problem.cone_h
    s0 = cones.shift_to_interior(-z_raw)
    z0 = cones.shift_to_interior(z_raw)
    return x0, s0, z0


@partial(jax.jit, static_argnames=("params",))
def solve_conic(problem: ConicProblem, params: IPMParams = IPMParams()) -> IPMResult:
    """Solve a ConicProblem. Fully jit-compiled; vmap over a batch of
    problems with identical static shape for Monte-Carlo batching."""
    ops = prepare_operators(problem)

    if problem.num_cones == 0:
        # Degenerate: an unconstrained equality-pinned QP.
        K = pin_fix_matrix(ops.P, ops.mask)
        L = jnp.linalg.cholesky(K)
        x = ops.xpin + _chol_solve(
            L, ops.mask * (-(ops.q) - ops.P @ ops.xpin)
        )
        zero = jnp.zeros((0, problem.k), dtype=x.dtype)
        pobj = 0.5 * x @ (ops.P @ x) + ops.q @ x + ops.const
        return IPMResult(
            x=x, s=zero, z=zero,
            iterations=jnp.asarray(0),
            status=jnp.asarray(OPTIMAL),
            pobj=pobj,
            gap=jnp.asarray(0.0, x.dtype),
            pres=jnp.asarray(0.0, x.dtype),
            dres=jnp.asarray(0.0, x.dtype),
        )

    x0, s0, z0 = _initial_point(problem, ops, params)
    state0 = _State(
        x=x0, s=s0, z=z0, it=jnp.asarray(0), status=jnp.asarray(RUNNING)
    )

    def cond(state):
        ok, bad, *_ = _convergence(problem, ops, params, state.x, state.s, state.z)
        running = (state.status == RUNNING) & ~ok & ~bad
        return running & (state.it < params.max_iter)

    state = jax.lax.while_loop(
        cond, lambda st: _step(problem, ops, params, st), state0
    )

    ok, bad, pres, dres, gap, pq = _convergence(
        problem, ops, params, state.x, state.s, state.z
    )
    status = jnp.where(
        state.status != RUNNING,
        state.status,
        jnp.where(ok, OPTIMAL, jnp.where(bad, NUMERICAL_ERROR, MAX_ITER)),
    )
    return IPMResult(
        x=state.x,
        s=state.s,
        z=state.z,
        iterations=state.it,
        status=status,
        pobj=pq + ops.const,
        gap=gap,
        pres=pres,
        dres=dres,
    )


@partial(jax.jit, static_argnames=("params", "num_iters"))
def solve_conic_fixed(
    problem: ConicProblem,
    params: IPMParams = IPMParams(),
    num_iters: int = 50,
) -> IPMResult:
    """Fixed-trip-count variant of :func:`solve_conic` with convergence
    gating via `lax.cond` — the vmap-safe form for batched solves (a vmapped
    `while_loop` would keep applying the body to already-converged lanes;
    here converged lanes freeze exactly)."""
    ops = prepare_operators(problem)
    x0, s0, z0 = _initial_point(problem, ops, params)
    state0 = _State(
        x=x0, s=s0, z=z0, it=jnp.asarray(0), status=jnp.asarray(RUNNING)
    )

    def scan_body(state, _):
        ok, bad, *_ = _convergence(problem, ops, params, state.x, state.s, state.z)
        active = (state.status == RUNNING) & ~ok & ~bad
        new_state = jax.lax.cond(
            active,
            lambda st: _step(problem, ops, params, st),
            lambda st: st,
            state,
        )
        return new_state, None

    state, _ = jax.lax.scan(scan_body, state0, None, length=num_iters)
    ok, bad, pres, dres, gap, pq = _convergence(
        problem, ops, params, state.x, state.s, state.z
    )
    status = jnp.where(
        state.status != RUNNING,
        state.status,
        jnp.where(ok, OPTIMAL, jnp.where(bad, NUMERICAL_ERROR, MAX_ITER)),
    )
    return IPMResult(
        x=state.x, s=state.s, z=state.z,
        iterations=state.it, status=status,
        pobj=pq + ops.const, gap=gap, pres=pres, dres=dres,
    )


@partial(jax.jit, static_argnames=("params", "num_iters"))
def solve_conic_with_iterates(
    problem: ConicProblem,
    params: IPMParams = IPMParams(),
    num_iters: int = 50,
) -> Tuple[IPMResult, jnp.ndarray]:
    """Like :func:`solve_conic` but records x after every iteration
    (parity with the reference's BarIterLimit iterate sweep,
    solve_score.py:89-116 — here it is a single scan, not N re-solves).

    Returns (result, xs) with xs of shape (num_iters + 1, n); iterations
    after convergence repeat the converged x.
    """
    ops = prepare_operators(problem)
    x0, s0, z0 = _initial_point(problem, ops, params)
    state0 = _State(
        x=x0, s=s0, z=z0, it=jnp.asarray(0), status=jnp.asarray(RUNNING)
    )

    def scan_body(state, _):
        ok, bad, *_ = _convergence(problem, ops, params, state.x, state.s, state.z)
        active = (state.status == RUNNING) & ~ok & ~bad
        new_state = jax.lax.cond(
            active,
            lambda st: _step(problem, ops, params, st),
            lambda st: st,
            state,
        )
        return new_state, new_state.x

    state, xs = jax.lax.scan(scan_body, state0, None, length=num_iters)
    ok, bad, pres, dres, gap, pq = _convergence(
        problem, ops, params, state.x, state.s, state.z
    )
    status = jnp.where(
        state.status != RUNNING,
        state.status,
        jnp.where(ok, OPTIMAL, jnp.where(bad, NUMERICAL_ERROR, MAX_ITER)),
    )
    result = IPMResult(
        x=state.x, s=state.s, z=state.z,
        iterations=state.it, status=status,
        pobj=pq + ops.const, gap=gap, pres=pres, dres=dres,
    )
    xs_all = jnp.concatenate([x0[None], xs], axis=0)
    return result, xs_all
