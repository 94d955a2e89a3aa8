"""Linear operators derived from a :class:`ConicProblem`.

The sparse row encodings (cost rows, cone rows) are applied with
gather/scatter index arithmetic — exact, static-shape, and cheap relative to
the KKT factorization. Dense P / K materialization uses batched outer-product
scatter-adds (O(R * nnz^2) elements), which XLA fuses well.

Column index ``n`` is the padding slot: gathers from a zero-extended vector,
scatter-adds into a discarded slot.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from score_tpu.assembly.conic import ConicProblem

__all__ = [
    "ProblemOperators",
    "prepare_operators",
    "G_apply",
    "GT_apply",
    "gtwg_dense",
    "pin_fix_matrix",
    "pin_vector",
    "free_mask",
]


def _pad(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([x, jnp.zeros((1,), dtype=x.dtype)])


def G_apply(problem: ConicProblem, x: jnp.ndarray) -> jnp.ndarray:
    """(G x) of shape (N, k)."""
    xp = _pad(x)
    return jnp.sum(problem.cone_coefs * xp[problem.cone_cols], axis=-1)


def GT_apply(problem: ConicProblem, z: jnp.ndarray) -> jnp.ndarray:
    """(G^T z) of shape (n,) for z of shape (N, k)."""
    out = jnp.zeros((problem.n + 1,), dtype=z.dtype)
    out = out.at[problem.cone_cols].add(problem.cone_coefs * z[..., None])
    return out[: problem.n]


def cost_matvec_dense_P(problem: ConicProblem) -> jnp.ndarray:
    """Materialize dense P = 2 sum_r w_r a_r a_r^T, shape (n, n)."""
    w = problem.cost_w
    coefs = problem.cost_coefs
    cols = problem.cost_cols
    vals = 2.0 * w[:, None, None] * coefs[:, :, None] * coefs[:, None, :]
    P = jnp.zeros((problem.n + 1, problem.n + 1), dtype=coefs.dtype)
    P = P.at[cols[:, :, None], cols[:, None, :]].add(vals)
    return P[: problem.n, : problem.n]


def cost_q(problem: ConicProblem) -> jnp.ndarray:
    """q = -2 sum_r w_r b_r a_r."""
    contrib = -2.0 * (problem.cost_w * problem.cost_b)[:, None] * problem.cost_coefs
    q = jnp.zeros((problem.n + 1,), dtype=problem.cost_coefs.dtype)
    q = q.at[problem.cost_cols].add(contrib)
    return q[: problem.n]


def cost_constant(problem: ConicProblem) -> jnp.ndarray:
    """c0 + sum_r w_r b_r^2 so that 0.5 x'Px + q'x + const == true cost."""
    return problem.c0 + jnp.sum(problem.cost_w * problem.cost_b**2)


def gtwg_dense(problem: ConicProblem, Winv2: jnp.ndarray) -> jnp.ndarray:
    """Dense G^T W^{-2} G from per-cone (N, k, k) middle matrices."""
    coefs = problem.cone_coefs  # (N, k, 2)
    cols = problem.cone_cols
    # vals[m, i, a, j, b] = coefs[m,i,a] * Winv2[m,i,j] * coefs[m,j,b]
    vals = jnp.einsum("mia,mij,mjb->miajb", coefs, Winv2, coefs)
    rows = cols[:, :, :, None, None]
    colsx = cols[:, None, None, :, :]
    K = jnp.zeros((problem.n + 1, problem.n + 1), dtype=coefs.dtype)
    K = K.at[jnp.broadcast_to(rows, vals.shape),
             jnp.broadcast_to(colsx, vals.shape)].add(vals)
    return K[: problem.n, : problem.n]


def free_mask(problem: ConicProblem, dtype) -> jnp.ndarray:
    """(n,) mask: 1 on free coordinates, 0 on pinned ones."""
    return jnp.ones((problem.n,), dtype=dtype).at[problem.pin_idx].set(0.0)


def pin_vector(problem: ConicProblem, dtype) -> jnp.ndarray:
    """(n,) vector with the pinned values at pinned slots, 0 elsewhere."""
    return (
        jnp.zeros((problem.n,), dtype=dtype)
        .at[problem.pin_idx]
        .set(problem.pin_val.astype(dtype))
    )


def pin_fix_matrix(K: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Zero pinned rows/cols of K and put 1 on pinned diagonal entries, so
    that solving K d = (mask * rhs) yields d_pinned = 0 — the free-subspace
    Newton step with the gauge pin enforced exactly."""
    Km = K * mask[:, None] * mask[None, :]
    return Km + jnp.diag(1.0 - mask)


class ProblemOperators(NamedTuple):
    """Solver-ready derived quantities (a pytree)."""

    P: jnp.ndarray  # (n, n) dense Hessian of the objective
    q: jnp.ndarray  # (n,)
    const: jnp.ndarray  # scalar objective constant
    mask: jnp.ndarray  # (n,) free-coordinate mask
    xpin: jnp.ndarray  # (n,) pinned values
    hnorm: jnp.ndarray  # scalar, max(1, ||h||)
    qnorm: jnp.ndarray  # scalar, max(1, ||q||)


def prepare_operators(problem: ConicProblem) -> ProblemOperators:
    dtype = problem.cost_coefs.dtype
    P = cost_matvec_dense_P(problem)
    q = cost_q(problem)
    return ProblemOperators(
        P=P,
        q=q,
        const=cost_constant(problem),
        mask=free_mask(problem, dtype),
        xpin=pin_vector(problem, dtype),
        hnorm=jnp.maximum(1.0, jnp.linalg.norm(problem.cone_h)),
        qnorm=jnp.maximum(1.0, jnp.linalg.norm(q)),
    )
