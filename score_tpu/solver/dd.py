"""Compensated (double-word) floating-point primitives for the cone algebra.

The IPM endgame accuracy is limited by catastrophic cancellation in a
handful of cone quantities evaluated on raw iterates: the SOC residual
``u0^2 - ||u1||^2`` of a near-boundary vector and the per-cone inner
product ``<s, z>`` of a near-complementary pair both shrink like mu while
their constituent terms stay O(1), so a naive evaluation carries a
relative error of eps/mu — which is what floors the achievable duality
gap near sqrt(eps). Evaluating exactly these few reductions with
error-free transformations (Knuth two-sum, Dekker two-product) removes
that floor at negligible cost: the arrays are (N, k) with k = dim + 1,
tiny next to the KKT work.

All primitives are plain jax ops (no FMA requirement), dtype-aware
(f32/f64 splitting constants), and vmap/jit-safe. They rely on IEEE
round-to-nearest arithmetic, which XLA preserves (no unsafe
reassociation by default); on backends with non-IEEE emulated f64 the
error terms degrade gracefully toward the uncompensated result.

Replaces nothing in the reference (Gurobi's barrier hides its own
endgame handling); this is part of the from-scratch numerical engine
(SURVEY.md §2.3).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "two_sum",
    "two_prod",
    "signed_sumsq",
    "jdot",
    "dot",
]


def two_sum(a, b):
    """Error-free sum: returns (s, e) with s = fl(a + b), s + e = a + b."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def _split(a):
    """Dekker split of a into hi + lo with hi carrying the top half of the
    mantissa (splitting constant 2^ceil(p/2) + 1 for p mantissa bits)."""
    bits = jnp.finfo(a.dtype).nmant  # 52 for f64, 23 for f32
    factor = jnp.asarray(float(2 ** ((bits + 2) // 2) + 1), dtype=a.dtype)
    c = factor * a
    hi = c - (c - a)
    lo = a - hi
    return hi, lo


def two_prod(a, b):
    """Error-free product: returns (p, e) with p = fl(a * b), p + e = a*b."""
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def _fold_terms(ps, es):
    """Compensated sum of the product terms: cascading two_sum over the
    last axis (small, unrolled), accumulating all error terms."""
    k = ps.shape[-1]
    s = ps[..., 0]
    err = es[..., 0]
    for i in range(1, k):
        s, e = two_sum(s, ps[..., i])
        err = err + e + es[..., i]
    return s + err


def signed_sumsq(u, head_sign=1.0):
    """Compensated head_sign*u0^2 - sum_i u_i^2 (i >= 1) over the last axis
    — the SOC residual when head_sign=+1, evaluated without the eps/mu
    cancellation blowup of the naive form."""
    p, e = two_prod(u, u)
    sign = jnp.ones((u.shape[-1],), dtype=u.dtype).at[1:].set(-1.0)
    sign = sign.at[0].set(head_sign)
    return _fold_terms(p * sign, e * sign)


def jdot(u, v):
    """Compensated u0*v0 - <u1, v1> over the last axis."""
    p, e = two_prod(u, v)
    sign = jnp.ones((u.shape[-1],), dtype=u.dtype).at[1:].set(-1.0)
    return _fold_terms(p * sign, e * sign)


def dot(u, v):
    """Compensated <u, v> over the last axis."""
    p, e = two_prod(u, v)
    return _fold_terms(p, e)
