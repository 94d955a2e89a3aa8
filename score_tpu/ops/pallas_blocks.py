"""Pallas TPU kernels for batched small-block linear algebra (f32 path).

The structured KKT backend spends its per-iteration time on batched tiny
(D=6) block operations — Cholesky factorizations and triangular solves over
thousands of blocks. In f64 these must stay as XLA ops (Pallas has no f64),
but the f32 fast path can fuse an entire level of blocks into one Pallas
kernel: blocks live in VMEM, the per-block recurrences unroll over the
static block size, and the batch dimension maps onto the 8x128 VPU lanes.

Layout: a batch of M blocks (M, D, D) is processed as D*D lane-major
vectors of length M — i.e. the kernel operates on arrays of shape
(D, D, M) so every elementwise recurrence step is a full-width vector op
across the batch. This is the transpose-of-batch trick: small-matrix
algebra becomes embarrassingly lane-parallel.

Wired into :mod:`score_tpu.solver.smallblocks`: exporting
``SCORE_TPU_PALLAS=1`` routes every f32 `chol_small` / `tri_lower_solve`
batch (the inner ops of the chain+arrow PCR factorization under
``precision="f32"``/``"mixed"``) through these kernels; f64 keeps the
unrolled jnp path (Pallas has no f64). Correctness is pinned against the
unrolled jnp implementations in tests (interpret mode on CPU, compiled on
TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

__all__ = ["chol_blocks_pallas", "tri_lower_solve_blocks_pallas"]


def _chol_kernel(a_ref, l_ref, *, D: int):
    """Cholesky of all blocks at once; refs have shape (D, D, M)."""
    # load columns as (M,) lanes; unrolled Cholesky-Crout over static D
    cols = [[a_ref[i, j, :] for j in range(D)] for i in range(D)]
    L = [[None] * D for _ in range(D)]
    for j in range(D):
        acc = cols[j][j]
        for k in range(j):
            acc = acc - L[j][k] * L[j][k]
        piv = jax.lax.rsqrt(acc)
        L[j][j] = acc * piv  # sqrt(acc)
        for i in range(j + 1, D):
            s = cols[i][j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * piv
    for i in range(D):
        for j in range(D):
            if j > i:
                l_ref[i, j, :] = jnp.zeros_like(cols[0][0])
            else:
                l_ref[i, j, :] = L[i][j]


def _interpret_default() -> bool:
    # compiled Mosaic kernels only exist on TPU; interpret elsewhere
    return jax.default_backend() != "tpu"


def chol_blocks_pallas(A: jnp.ndarray, interpret=None) -> jnp.ndarray:
    """Batched Cholesky of (M, D, D) f32 SPD blocks via one Pallas kernel."""
    M, D, _ = A.shape
    if interpret is None:
        interpret = _interpret_default()
    At = jnp.transpose(A, (1, 2, 0))  # (D, D, M): batch on lanes
    Lt = pl.pallas_call(
        functools.partial(_chol_kernel, D=D),
        out_shape=jax.ShapeDtypeStruct((D, D, M), A.dtype),
        interpret=interpret,
    )(At)
    return jnp.transpose(Lt, (2, 0, 1))


def _tri_solve_kernel(l_ref, b_ref, y_ref, *, D: int, K: int):
    """Solve L Y = B for all blocks; refs (D, D, M), (D, K, M), (D, K, M)."""
    Lv = [[l_ref[i, j, :] for j in range(D)] for i in range(D)]
    inv_diag = [pl.reciprocal(Lv[i][i], approx=False) for i in range(D)]
    for col in range(K):
        rows = []
        for i in range(D):
            r = b_ref[i, col, :]
            for k in range(i):
                r = r - Lv[i][k] * rows[k]
            rows.append(r * inv_diag[i])
        for i in range(D):
            y_ref[i, col, :] = rows[i]


def tri_lower_solve_blocks_pallas(
    L: jnp.ndarray, B: jnp.ndarray, interpret=None
) -> jnp.ndarray:
    """Batched forward substitution: L (M, D, D) lower-tri, B (M, D, K)."""
    M, D, _ = L.shape
    K = B.shape[-1]
    if interpret is None:
        interpret = _interpret_default()
    Lt = jnp.transpose(L, (1, 2, 0))
    Bt = jnp.transpose(B, (1, 2, 0))
    Yt = pl.pallas_call(
        functools.partial(_tri_solve_kernel, D=D, K=K),
        out_shape=jax.ShapeDtypeStruct((D, K, M), B.dtype),
        interpret=interpret,
    )(Lt, Bt)
    return jnp.transpose(Yt, (2, 0, 1))
