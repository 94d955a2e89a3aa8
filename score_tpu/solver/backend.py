"""KKT backend abstraction for the interior-point solver.

A backend supplies the problem-dependent linear algebra of one IPM
iteration: objective/constraint operator applications and the Newton-system
factor/solve. Backends are plain classes of static methods (passed to the
solver as a static argument) plus a pytree ``state`` produced by
``prepare`` — so the whole solver stays jit/vmap-compatible.

- :class:`DenseBackend` — materialized dense P and dense K = P + G'W^{-2}G
  with Cholesky. Robust, O(n^3) per iteration; the correctness reference.
- ``ChainArrowBackend`` (solver/chain_arrow.py) — exploits the SLAM
  block-tridiagonal-plus-arrow sparsity; O(n) per iteration.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from score_tpu.assembly.conic import ConicProblem
from score_tpu.solver.linops import (
    G_apply,
    GT_apply,
    ProblemOperators,
    gtwg_dense,
    pin_fix_matrix,
    prepare_operators,
)

__all__ = ["DenseBackend", "chol_solve"]


def chol_solve(L, rhs):
    y = jax.scipy.linalg.solve_triangular(L, rhs, lower=True)
    return jax.scipy.linalg.solve_triangular(L.T, y, lower=False)


class _DenseFactors(NamedTuple):
    L: jnp.ndarray
    K: jnp.ndarray  # true (unregularized) pin-fixed K, for refinement


class DenseBackend:
    """Dense-KKT backend (SURVEY.md §7 build-order step 3)."""

    @staticmethod
    def prepare(problem: ConicProblem, aux=None) -> ProblemOperators:
        return prepare_operators(problem)

    @staticmethod
    def P_matvec(state: ProblemOperators, v):
        return state.P @ v

    @staticmethod
    def G(problem: ConicProblem, state, x):
        return G_apply(problem, x)

    @staticmethod
    def GT(problem: ConicProblem, state, z):
        return GT_apply(problem, z)

    @staticmethod
    def factor(problem: ConicProblem, state: ProblemOperators, Winv2, params):
        K = pin_fix_matrix(state.P + gtwg_dense(problem, Winv2), state.mask)
        scale = jnp.max(jnp.abs(jnp.diagonal(K)))
        delta = params.static_reg * scale
        eye = jnp.eye(problem.n, dtype=K.dtype)
        L1 = jnp.linalg.cholesky(K + delta * eye)
        ok = jnp.all(jnp.isfinite(L1))
        L = jax.lax.cond(
            ok,
            lambda: L1,
            lambda: jnp.linalg.cholesky(
                K + (params.reg_escalation * delta) * eye
            ),
        )
        return _DenseFactors(L=L, K=K)

    @staticmethod
    def solve(problem: ConicProblem, state: ProblemOperators,
              factors: _DenseFactors, rhs, params):
        dx = chol_solve(factors.L, rhs)
        for _ in range(params.kkt_refine_steps):
            resid = rhs - state.mask * (factors.K @ dx)
            dx = dx + chol_solve(factors.L, resid)
        return dx

    @staticmethod
    def solve_panel(problem: ConicProblem, state: ProblemOperators,
                    factors: _DenseFactors, rhs_panel, params):
        """Solve K dx = rhs for a (K_rhs, n) PANEL of right-hand sides
        through the one factorization (triangular solves take multi-RHS
        natively — one pass over L instead of K_rhs)."""
        dx = chol_solve(factors.L, rhs_panel.T).T
        for _ in range(params.kkt_refine_steps):
            resid = rhs_panel - state.mask * (dx @ factors.K.T)
            dx = dx + chol_solve(factors.L, resid.T).T
        return dx
