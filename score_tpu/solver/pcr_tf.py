"""Parallel cyclic reduction in two-float (double-f32) arithmetic.

Mirrors :mod:`score_tpu.solver.pcr` exactly (same level recurrences, same
fixed-shape compaction trick, same :class:`PCRFactors` container — here
with :class:`score_tpu.ops.twofloat.TF` leaves), but every block op runs
in rigorous double-f32 (~2^-47). This is the TPU-fast band factorization:
the chain band has kappa ~1e8-1e9 after Jacobi equilibration, so plain
f32 diverges (kappa * eps32 > 1) while two-float keeps a single solve at
~1e-5 relative residual — one f64 refinement pass then restores
f64-grade directions. See chain_arrow.MixedChainArrowBackend.

On TPU this jnp implementation is the correctness reference; the fused
Pallas kernels (ops/pallas_pcr.py) are the production path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from score_tpu.ops import twofloat as tfm
from score_tpu.ops.twofloat import TF
from score_tpu.solver.pcr import PCRFactors, _num_levels

__all__ = ["pcr_factor_tf", "pcr_solve_tf"]


def _sl(x: TF, sl) -> TF:
    """Slice the leading (block) axis of both limbs."""
    return TF(x.hi[sl], x.lo[sl])


def _cat(a: TF, b: TF) -> TF:
    return TF(
        jnp.concatenate([a.hi, b.hi], axis=0),
        jnp.concatenate([a.lo, b.lo], axis=0),
    )


def _zeros_like(x: TF) -> TF:
    return TF(jnp.zeros_like(x.hi), jnp.zeros_like(x.lo))


def _eye_pad(template: TF) -> TF:
    Db = template.hi.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(Db, dtype=jnp.float32), template.hi.shape)
    return TF(eye, jnp.zeros_like(eye))


def _dinv(L: TF, M: TF) -> TF:
    return tfm.tri_upper_solve(L, tfm.tri_lower_solve(L, M))


def _tf_empty(shape) -> TF:
    z = jnp.zeros(shape, dtype=jnp.float32)
    return TF(z, z)


def pcr_factor_tf(D: TF, U: TF) -> PCRFactors:
    """Two-float twin of :func:`score_tpu.solver.pcr.pcr_factor`.

    D, U: TF blocks of shape (T, Db, Db), T a power of two (identity /
    zero padded), U[T-1] zero.
    """
    T, Db = D.hi.shape[0], D.hi.shape[-1]
    L = _num_levels(T)
    if L == 0:
        e = _tf_empty((0, 0, Db, Db))
        return PCRFactors(
            L_odd=e, W1=e, W2=e, U_even=e, U_odd=e,
            L_root=tfm.chol_small(_sl(D, slice(0, 1))),
        )

    def level(carry, _):
        Dc, Uc = carry
        D_even, D_odd = _sl(Dc, slice(0, None, 2)), _sl(Dc, slice(1, None, 2))
        U_even, U_odd = _sl(Uc, slice(0, None, 2)), _sl(Uc, slice(1, None, 2))
        L_odd = tfm.chol_small(D_odd)
        W2 = _dinv(L_odd, tfm.transpose(U_even))
        W1 = _dinv(L_odd, U_odd)
        term_right = tfm.matmul(U_even, W2)
        Lterm = tfm.matmul(tfm.transpose(U_odd), W1)
        term_left = _cat(_zeros_like(_sl(Lterm, slice(0, 1))),
                         _sl(Lterm, slice(0, -1)))
        D_next = tfm.sub(tfm.sub(D_even, term_right), term_left)
        U_next = tfm.neg(tfm.matmul(tfm.transpose(W2), U_odd))
        Dc2 = _cat(D_next, _eye_pad(D_next))
        Uc2 = _cat(U_next, _zeros_like(U_next))
        return (Dc2, Uc2), (L_odd, W1, W2, U_even, U_odd)

    (Df, _), levs = jax.lax.scan(level, (D, U), None, length=L)
    return PCRFactors(
        L_odd=levs[0], W1=levs[1], W2=levs[2], U_even=levs[3],
        U_odd=levs[4], L_root=tfm.chol_small(_sl(Df, slice(0, 1))),
    )


def pcr_solve_tf(factors: PCRFactors, rhs: TF) -> TF:
    """Two-float twin of :func:`score_tpu.solver.pcr.pcr_solve`;
    rhs of shape (T, Db, K)."""
    T = rhs.hi.shape[0]
    L = factors.L_odd.hi.shape[0]
    if L == 0:
        out = _dinv(factors.L_root, _sl(rhs, slice(0, 1)))
        return out

    def down(r, lev):
        L_odd, W1, W2, U_even, U_odd = lev
        r_even, r_odd = _sl(r, slice(0, None, 2)), _sl(r, slice(1, None, 2))
        ro = _dinv(L_odd, r_odd)
        fold = tfm.matmul(tfm.transpose(U_odd), ro)
        fold = _cat(_zeros_like(_sl(fold, slice(0, 1))),
                    _sl(fold, slice(0, -1)))
        r_next = tfm.sub(tfm.sub(r_even, fold), tfm.matmul(U_even, ro))
        r2 = _cat(r_next, _zeros_like(r_next))
        return r2, ro

    levs = (factors.L_odd, factors.W1, factors.W2, factors.U_even,
            factors.U_odd)
    r_final, ros = jax.lax.scan(down, rhs, levs)

    x0 = _dinv(factors.L_root, _sl(r_final, slice(0, 1)))
    zero_state = _tf_empty((T,) + x0.hi.shape[1:])
    x_init = TF(
        zero_state.hi.at[0].set(x0.hi[0]),
        zero_state.lo.at[0].set(x0.lo[0]),
    )

    def up(x_state, lev_ro):
        (L_odd, W1, W2, U_even, U_odd), ro = lev_ro
        x_even = _sl(x_state, slice(0, T // 2))
        x_shift = _cat(_sl(x_even, slice(1, None)),
                       _zeros_like(_sl(x_even, slice(0, 1))))
        x_odd = tfm.sub(tfm.sub(ro, tfm.matmul(W2, x_even)),
                        tfm.matmul(W1, x_shift))
        out_hi = jnp.zeros_like(x_state.hi)
        out_lo = jnp.zeros_like(x_state.lo)
        out_hi = out_hi.at[0::2].set(x_even.hi).at[1::2].set(x_odd.hi)
        out_lo = out_lo.at[0::2].set(x_even.lo).at[1::2].set(x_odd.lo)
        return TF(out_hi, out_lo), None

    x, _ = jax.lax.scan(up, x_init, (levs, ros), reverse=True)
    return x
