"""Parallel (block) cyclic reduction for SPD block-tridiagonal systems.

The chain part of the SLAM KKT system is block-tridiagonal with tiny (D=6)
blocks. A sequential block-Cholesky scan costs T sequential steps — pure
latency on a TPU. Cyclic reduction eliminates all odd-position blocks at
once per level (batched 6x6 ops over T/2 blocks), halving the system
log2(T) times: ~10 level-steps of wide batched arithmetic instead of ~680
sequential tiny steps (SURVEY.md §5: "cyclic-reduction block factorization
... parallel scan over the chain").

For an SPD system with diagonal blocks D_t and super-diagonal blocks U_t
(coupling t -> t+1), one level with even/odd split computes

    W2_j = Dodd_j^{-1} Ueven_j^T          W1_j = Dodd_j^{-1} Uodd_j
    D'_i = Deven_i - Ueven_i W2_i - [Uodd^T W1]_{i-1}
    U'_i = -W2_i^T Uodd_i

and a solve does a matching down pass (fold odd rhs into even) and up pass
(back-substitute odd blocks). All block ops use the unrolled small-block
kernels (no XLA custom calls). Lengths are padded to a power of two with
identity diagonal blocks, which cyclic reduction preserves exactly.
"""

from __future__ import annotations

from typing import List, NamedTuple, Tuple

import jax.numpy as jnp

from score_tpu.solver.smallblocks import chol_small, tri_lower_solve, tri_upper_solve

__all__ = ["PCRFactors", "pcr_pad_length", "pcr_factor", "pcr_solve"]


class _Level(NamedTuple):
    L_odd: jnp.ndarray  # (Tl/2, D, D) Cholesky of odd diagonal blocks
    W1: jnp.ndarray  # (Tl/2, D, D) Dodd^{-1} Uodd
    W2: jnp.ndarray  # (Tl/2, D, D) Dodd^{-1} Ueven^T
    U_even: jnp.ndarray  # (Tl/2, D, D)
    U_odd: jnp.ndarray  # (Tl/2, D, D)


class PCRFactors(NamedTuple):
    levels: Tuple[_Level, ...]
    L_root: jnp.ndarray  # (D, D)


def pcr_pad_length(T: int) -> int:
    p = 1
    while p < T:
        p *= 2
    return p


def _dinv(L, M):
    return tri_upper_solve(L, tri_lower_solve(L, M))


def pcr_factor(D: jnp.ndarray, U: jnp.ndarray) -> PCRFactors:
    """Factor a block-tridiagonal SPD system.

    D: (T, Db, Db) diagonal blocks (T a power of two; pad with identity).
    U: (T, Db, Db) super-diagonal blocks, U[t] couples (t, t+1); U[T-1]
       must be zero.
    """
    levels: List[_Level] = []
    while D.shape[0] > 1:
        D_even, D_odd = D[0::2], D[1::2]
        U_even, U_odd = U[0::2], U[1::2]
        L_odd = chol_small(D_odd)
        W2 = _dinv(L_odd, jnp.swapaxes(U_even, -1, -2))
        W1 = _dinv(L_odd, U_odd)
        term_right = U_even @ W2
        Lterm = jnp.swapaxes(U_odd, -1, -2) @ W1
        term_left = jnp.concatenate(
            [jnp.zeros_like(Lterm[:1]), Lterm[:-1]], axis=0
        )
        D = D_even - term_right - term_left
        U = -jnp.swapaxes(W2, -1, -2) @ U_odd
        levels.append(_Level(L_odd, W1, W2, U_even, U_odd))
    L_root = chol_small(D[0])
    return PCRFactors(levels=tuple(levels), L_root=L_root)


def pcr_solve(factors: PCRFactors, rhs: jnp.ndarray) -> jnp.ndarray:
    """Solve the factored system for rhs of shape (T, Db, K)."""
    # down pass: fold odd right-hand sides into the even system
    r = rhs
    ros = []
    for lev in factors.levels:
        r_even, r_odd = r[0::2], r[1::2]
        ro = _dinv(lev.L_odd, r_odd)
        fold = jnp.swapaxes(lev.U_odd, -1, -2) @ ro
        fold = jnp.concatenate([jnp.zeros_like(fold[:1]), fold[:-1]], axis=0)
        r = r_even - fold - lev.U_even @ ro
        ros.append(ro)
    # root
    x = _dinv(factors.L_root, r[0])[None]
    # up pass: interleave back-substituted odd blocks
    for lev, ro in zip(reversed(factors.levels), reversed(ros)):
        x_shift = jnp.concatenate([x[1:], jnp.zeros_like(x[:1])], axis=0)
        x_odd = ro - lev.W2 @ x - lev.W1 @ x_shift
        Tl = x.shape[0] * 2
        out = jnp.zeros((Tl,) + x.shape[1:], dtype=x.dtype)
        out = out.at[0::2].set(x)
        out = out.at[1::2].set(x_odd)
        x = out
    return x
