"""Unrolled small-block linear algebra for the structured KKT backend.

XLA's `cholesky` / `triangular_solve` are custom calls with per-invocation
overhead that dwarfs the arithmetic for the D=6 blocks inside the chain
scans (and the f64 paths take slow generic routes on TPU). These unrolled
versions lower to plain fused vector ops — orders of magnitude cheaper at
block sizes 2..8 — and batch over arbitrary leading dimensions.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["chol_small", "tri_lower_solve", "tri_upper_solve", "inv_small_spd"]


def chol_small(A: jnp.ndarray) -> jnp.ndarray:
    """Cholesky of (..., m, m) SPD matrices, unrolled over the static m.

    Left-looking column algorithm; every step is a batched vector op.
    """
    m = A.shape[-1]
    cols = []
    for j in range(m):
        c = A[..., :, j]
        for k in range(j):
            c = c - cols[k] * cols[k][..., j : j + 1]
        pivot = jnp.sqrt(c[..., j : j + 1])
        col = c / pivot
        # zero the strictly-upper part of this column
        mask = jnp.arange(m) >= j
        col = col * mask.astype(A.dtype)
        cols.append(col)
    return jnp.stack(cols, axis=-1)


def tri_lower_solve(L: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Solve L Y = B with L (..., m, m) lower-triangular and B (..., m, K),
    unrolled forward substitution (rows are batched vector ops)."""
    m = L.shape[-1]
    rows = []
    for i in range(m):
        r = B[..., i, :]
        for k in range(i):
            r = r - L[..., i, k : k + 1] * rows[k]
        rows.append(r / L[..., i, i : i + 1])
    return jnp.stack(rows, axis=-2)


def tri_upper_solve(L: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Solve L^T Y = B (L lower-triangular) by unrolled back substitution."""
    m = L.shape[-1]
    rows = [None] * m
    for i in reversed(range(m)):
        r = B[..., i, :]
        for k in range(i + 1, m):
            r = r - L[..., k, i : i + 1] * rows[k]
        rows[i] = r / L[..., i, i : i + 1]
    return jnp.stack(rows, axis=-2)


def inv_small_spd(A: jnp.ndarray) -> jnp.ndarray:
    """Inverse of small SPD matrices via unrolled Cholesky."""
    m = A.shape[-1]
    L = chol_small(A)
    eye = jnp.broadcast_to(jnp.eye(m, dtype=A.dtype), A.shape)
    return tri_upper_solve(L, tri_lower_solve(L, eye))
