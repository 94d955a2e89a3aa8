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
from jax import lax

__all__ = [
    "chol_small",
    "tri_lower_solve",
    "tri_upper_solve",
    "inv_small_spd",
    "chol_blocked",
    "blocked_lower_solve",
    "blocked_upper_solve",
    "blocked_dense_L",
]


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


# ------------------------------------------------------------------ #
# Blocked Cholesky for the mid-size dense arrow (A ~ 64..1000)
# ------------------------------------------------------------------ #
#
# XLA TPU's f64 `cholesky`/`triangular_solve` decompose into slow generic
# routes (measured at A=258 on this runtime: 17 ms per cholesky, 3 ms per
# VECTOR triangular solve — dominating the multi-robot arrow phase, with
# 1 factorization and ~8-12 substitutions per IPM iteration). These
# blocked versions stay in plain jnp — per-block unrolled kernels inside
# one lax.scan over block columns — so XLA lowers them to fused vector
# ops and batched contractions instead of the custom-call path. Same f64
# arithmetic, same algorithmic error class as a standard right-looking
# blocked Cholesky.

_ARROW_BLOCK = 32


def _blk_iota(nb):
    # int32 on purpose: x64-default i64 iotas serve no purpose here and
    # keep these helpers safe to reuse near Mosaic-adjacent code
    return jnp.arange(nb, dtype=jnp.int32)


def chol_blocked(S: jnp.ndarray, b: int = _ARROW_BLOCK):
    """Cholesky of one (A, A) SPD matrix, blocked at size ``b``.

    Returns ``(Lb, Dinv)``: the lower-block-triangular factor as
    (nb, nb, b, b) blocks of the identity-padded matrix, and the inverses
    of its diagonal blocks (nb, b, b) for blocked substitution."""
    A = S.shape[-1]
    nb = -(-A // b)
    Ap = nb * b
    dt = S.dtype
    Sp = jnp.zeros((Ap, Ap), dt).at[:A, :A].set(S)
    Sp = Sp + jnp.diag((jnp.arange(Ap) >= A).astype(dt))
    Sb = Sp.reshape(nb, b, nb, b).transpose(0, 2, 1, 3)  # [i, j, b, b]
    eye = jnp.eye(b, dtype=dt)
    im = _blk_iota(nb)

    def step(carry, k):
        Lb, Dinv = carry
        jmask = (im < k).astype(dt)[:, None, None]
        Lk = lax.dynamic_slice_in_dim(Lb, k, 1, axis=0)[0]  # row k (nb,b,b)
        Lkm = Lk * jmask
        Scol = lax.dynamic_slice_in_dim(Sb, k, 1, axis=1)[:, 0]  # (nb,b,b)
        # R_i = S[i,k] - sum_{j<k} L[i,j] L[k,j]^T for ALL i (masked write)
        R = Scol - jnp.einsum("ijab,jcb->iac", Lb, Lkm)
        Akk = lax.dynamic_slice_in_dim(R, k, 1, axis=0)[0]
        Lkk = chol_small(Akk)
        Dk = tri_lower_solve(Lkk, eye)  # Lkk^{-1}
        Lcol = jnp.einsum("iac,dc->iad", R, Dk)  # R @ Lkk^{-T}
        Lcol = jnp.where((im < k)[:, None, None], 0.0, Lcol)
        Lcol = jnp.where((im == k)[:, None, None], Lkk[None], Lcol)
        Lb = lax.dynamic_update_slice_in_dim(
            Lb, Lcol[:, None], k, axis=1
        )
        Dinv = lax.dynamic_update_slice_in_dim(Dinv, Dk[None], k, axis=0)
        return (Lb, Dinv), None

    (Lb, Dinv), _ = lax.scan(
        step,
        (jnp.zeros((nb, nb, b, b), dt), jnp.zeros((nb, b, b), dt)),
        _blk_iota(nb),
    )
    return Lb, Dinv


def blocked_dense_L(Lb: jnp.ndarray, A: int) -> jnp.ndarray:
    """Reassemble the (A, A) dense lower factor from (nb, nb, b, b) blocks."""
    nb, _, b, _ = Lb.shape
    return Lb.transpose(0, 2, 1, 3).reshape(nb * b, nb * b)[:A, :A]


def _pad_blocks(r, nb, b):
    A = r.shape[-1]
    rp = jnp.zeros(r.shape[:-1] + (nb * b,), r.dtype).at[..., :A].set(r)
    return rp.reshape(r.shape[:-1] + (nb, b))


def blocked_lower_solve(Lb, Dinv, r):
    """Solve L y = r (r (..., A)) by block forward substitution."""
    nb, _, b, _ = Lb.shape
    A = r.shape[-1]
    rb = _pad_blocks(r, nb, b)
    im = _blk_iota(nb)

    def step(y, k):
        jmask = (im < k).astype(r.dtype)[:, None, None]
        Lk = lax.dynamic_slice_in_dim(Lb, k, 1, axis=0)[0] * jmask
        rk = lax.dynamic_slice_in_dim(rb, k, 1, axis=-2)[..., 0, :]
        acc = rk - jnp.einsum("jab,...jb->...a", Lk, y)
        Dk = lax.dynamic_slice_in_dim(Dinv, k, 1, axis=0)[0]
        yk = jnp.einsum("ab,...b->...a", Dk, acc)
        return lax.dynamic_update_slice_in_dim(
            y, yk[..., None, :], k, axis=-2
        ), None

    y, _ = lax.scan(step, jnp.zeros_like(rb), _blk_iota(nb))
    return y.reshape(r.shape[:-1] + (nb * b,))[..., :A]


def blocked_upper_solve(Lb, Dinv, r):
    """Solve L^T y = r (r (..., A)) by block backward substitution."""
    nb, _, b, _ = Lb.shape
    A = r.shape[-1]
    rb = _pad_blocks(r, nb, b)
    im = _blk_iota(nb)

    def step(y, k):
        jmask = (im > k).astype(r.dtype)[:, None, None]
        Lck = lax.dynamic_slice_in_dim(Lb, k, 1, axis=1)[:, 0] * jmask
        rk = lax.dynamic_slice_in_dim(rb, k, 1, axis=-2)[..., 0, :]
        acc = rk - jnp.einsum("jba,...jb->...a", Lck, y)
        Dk = lax.dynamic_slice_in_dim(Dinv, k, 1, axis=0)[0]
        yk = jnp.einsum("ba,...b->...a", Dk, acc)
        return lax.dynamic_update_slice_in_dim(
            y, yk[..., None, :], k, axis=-2
        ), None

    y, _ = lax.scan(
        step, jnp.zeros_like(rb), _blk_iota(nb)[::-1]
    )
    return y.reshape(r.shape[:-1] + (nb * b,))[..., :A]
