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
kernels (no XLA custom calls).

Compilation-size trick: levels run as a `lax.scan` over a FIXED-shape
state. The reduced system after each level (length T/2) is stored
compacted in the state's first half, the second half refilled with
decoupled identity blocks (zero couplings). Cyclic reduction treats those
pads as an independent identity system riding along — so every level is
the same static-shape program, and the whole factorization is one scanned
body instead of log2(T) unrolled level graphs. Lengths are padded to a
power of two with identity diagonal blocks.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from score_tpu.solver.smallblocks import chol_small, tri_lower_solve, tri_upper_solve

__all__ = ["PCRFactors", "pcr_pad_length", "pcr_factor", "pcr_solve"]


class PCRFactors(NamedTuple):
    # per-level stacked data, each (L, T/2, Db, Db); level l's valid prefix
    # is T/2^(l+1) blocks (the rest belong to the identity padding system)
    L_odd: jnp.ndarray
    W1: jnp.ndarray
    W2: jnp.ndarray
    U_even: jnp.ndarray
    U_odd: jnp.ndarray
    L_root: jnp.ndarray  # (Db, Db)


def pcr_pad_length(T: int) -> int:
    p = 1
    while p < T:
        p *= 2
    return p


def _num_levels(T: int) -> int:
    L = 0
    while (1 << L) < T:
        L += 1
    return L


def _dinv(L, M):
    return tri_upper_solve(L, tri_lower_solve(L, M))


def _eye_pad(template: jnp.ndarray) -> jnp.ndarray:
    """Identity blocks shaped like `template` ((T/2, Db, Db))."""
    Db = template.shape[-1]
    return jnp.broadcast_to(
        jnp.eye(Db, dtype=template.dtype), template.shape
    )


def pcr_factor(D: jnp.ndarray, U: jnp.ndarray) -> PCRFactors:
    """Factor a block-tridiagonal SPD system.

    D: (T, Db, Db) diagonal blocks (T a power of two; pad with identity).
    U: (T, Db, Db) super-diagonal blocks, U[t] couples (t, t+1); U[T-1]
       must be zero.
    """
    T, Db = D.shape[0], D.shape[-1]
    L = _num_levels(T)
    if L == 0:
        return PCRFactors(
            L_odd=jnp.zeros((0, 0, Db, Db), D.dtype),
            W1=jnp.zeros((0, 0, Db, Db), D.dtype),
            W2=jnp.zeros((0, 0, Db, Db), D.dtype),
            U_even=jnp.zeros((0, 0, Db, Db), D.dtype),
            U_odd=jnp.zeros((0, 0, Db, Db), D.dtype),
            L_root=chol_small(D[0]),
        )

    def level(carry, _):
        Dc, Uc = carry  # (T, Db, Db) with valid prefix, identity pads after
        D_even, D_odd = Dc[0::2], Dc[1::2]
        U_even, U_odd = Uc[0::2], Uc[1::2]
        L_odd = chol_small(D_odd)
        W2 = _dinv(L_odd, jnp.swapaxes(U_even, -1, -2))
        W1 = _dinv(L_odd, U_odd)
        term_right = U_even @ W2
        Lterm = jnp.swapaxes(U_odd, -1, -2) @ W1
        term_left = jnp.concatenate(
            [jnp.zeros_like(Lterm[:1]), Lterm[:-1]], axis=0
        )
        D_next = D_even - term_right - term_left
        U_next = -jnp.swapaxes(W2, -1, -2) @ U_odd
        # recompact: reduced system in the first half, identity pad after
        Dc2 = jnp.concatenate([D_next, _eye_pad(D_next)], axis=0)
        Uc2 = jnp.concatenate([U_next, jnp.zeros_like(U_next)], axis=0)
        return (Dc2, Uc2), (L_odd, W1, W2, U_even, U_odd)

    (Df, _), levs = jax.lax.scan(level, (D, U), None, length=L)
    return PCRFactors(
        L_odd=levs[0], W1=levs[1], W2=levs[2], U_even=levs[3],
        U_odd=levs[4], L_root=chol_small(Df[0]),
    )


def pcr_solve(factors: PCRFactors, rhs: jnp.ndarray) -> jnp.ndarray:
    """Solve the factored system for rhs of shape (T, Db, K)."""
    T = rhs.shape[0]
    L = factors.L_odd.shape[0]
    if L == 0:
        return _dinv(factors.L_root, rhs[0])[None]

    # down pass: fold odd right-hand sides into the even system (compacted)
    def down(r, lev):
        L_odd, W1, W2, U_even, U_odd = lev
        r_even, r_odd = r[0::2], r[1::2]
        ro = _dinv(L_odd, r_odd)
        fold = jnp.swapaxes(U_odd, -1, -2) @ ro
        fold = jnp.concatenate([jnp.zeros_like(fold[:1]), fold[:-1]], axis=0)
        r_next = r_even - fold - U_even @ ro
        r2 = jnp.concatenate([r_next, jnp.zeros_like(r_next)], axis=0)
        return r2, ro

    levs = (factors.L_odd, factors.W1, factors.W2, factors.U_even,
            factors.U_odd)
    r_final, ros = jax.lax.scan(down, rhs, levs)

    # root solve; the level-L "solution state" is a (T,)-shaped array whose
    # position 0 holds the root block (pads are irrelevant)
    x0 = _dinv(factors.L_root, r_final[0])
    x_init = jnp.zeros((T,) + x0.shape, dtype=x0.dtype).at[0].set(x0)

    # up pass (reverse over levels): the reduced solution consumed by level
    # l is the first half of level (l+1)'s state; interleave it with the
    # back-substituted odd blocks to reconstruct level l's state.
    def up(x_state, lev_ro):
        (L_odd, W1, W2, U_even, U_odd), ro = lev_ro
        x_even = x_state[: T // 2]
        x_shift = jnp.concatenate(
            [x_even[1:], jnp.zeros_like(x_even[:1])], axis=0
        )
        x_odd = ro - W2 @ x_even - W1 @ x_shift
        out = jnp.zeros_like(x_state)
        out = out.at[0::2].set(x_even)
        out = out.at[1::2].set(x_odd)
        return out, None

    x, _ = jax.lax.scan(up, x_init, (levs, ros), reverse=True)
    return x
