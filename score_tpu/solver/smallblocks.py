"""Unrolled small-block linear algebra for the structured KKT backend.

XLA's `cholesky` / `triangular_solve` are custom calls with per-invocation
overhead that dwarfs the arithmetic for the D=6..12 blocks inside the
chain scans (and the f64 paths take slow generic routes on TPU). These
unrolled versions lower to plain fused vector ops — orders of magnitude
cheaper at block sizes 2..12 — and batch over arbitrary leading
dimensions.

f32 Pallas fast path: with ``SCORE_TPU_PALLAS=1`` exported, f32 batches
route through the lane-parallel Pallas kernels in
:mod:`score_tpu.ops.pallas_blocks` (one fused kernel per batched op
instead of ~m^2 vector HLOs — relevant on runtimes with high per-op
overhead). f64 always takes the unrolled jnp path (Pallas has no f64).
"""

from __future__ import annotations

import os

import jax.numpy as jnp

__all__ = ["chol_small", "tri_lower_solve", "tri_upper_solve", "inv_small_spd"]


def _use_pallas(a: jnp.ndarray) -> bool:
    return (
        os.environ.get("SCORE_TPU_PALLAS") == "1"
        and a.dtype == jnp.float32
        and a.ndim >= 3
    )


def chol_small(A: jnp.ndarray) -> jnp.ndarray:
    """Cholesky of (..., m, m) SPD matrices, unrolled over the static m.

    Left-looking column algorithm; every step is a batched vector op.
    """
    if _use_pallas(A):
        from score_tpu.ops.pallas_blocks import chol_blocks_pallas

        batch = A.shape[:-2]
        m = A.shape[-1]
        return chol_blocks_pallas(A.reshape(-1, m, m)).reshape(A.shape)
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
    if _use_pallas(L):
        from score_tpu.ops.pallas_blocks import tri_lower_solve_blocks_pallas

        m, K = L.shape[-1], B.shape[-1]
        Y = tri_lower_solve_blocks_pallas(
            L.reshape(-1, m, m), B.reshape(-1, m, K)
        )
        return Y.reshape(B.shape)
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
