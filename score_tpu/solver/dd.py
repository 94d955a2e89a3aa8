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
round-to-nearest arithmetic of the working type, which XLA preserves
(no unsafe reassociation by default).

Backend precision notes (measured on-device):

* genuine f32 (CPU or TPU): faithful IEEE — two_sum/two_prod are exact
  error-free transforms (the basis of :mod:`score_tpu.ops.twofloat`);
* host f64: faithful IEEE — exact EFTs;
* TPU "f64" (the axon emulation): a double-f32-style arithmetic with
  ~1e-15 median / ~1.2e-14 max multiply error and accurate addition.
  It has no faithful rounding, so Dekker splitting is not exact there;
  the compensation degrades gracefully to ~arithmetic-precision
  reductions (measured two_prod residual ~3e-15) instead of the
  eps^2-grade it reaches on IEEE backends. This is what separates the
  TPU relgap floor (~4e-6 on GOATS) from the CPU one (~4e-7).

Replaces nothing in the reference (Gurobi's barrier hides its own
endgame handling); this is part of the from-scratch numerical engine
(SURVEY.md §2.3).
"""

from __future__ import annotations

import os

import jax.numpy as jnp

__all__ = [
    "two_sum",
    "two_prod",
    "signed_sumsq",
    "jdot",
    "dot",
]


def _effective_nmant(dtype) -> int:
    """Mantissa bits assumed by the Dekker splitting constant: the nominal
    type precision (``SCORE_TPU_F64_NMANT`` overrides, for testing).

    On the TPU f64 emulation there is no splitting constant that makes
    two_prod exact (the arithmetic has no faithful rounding — see module
    docstring); the nominal constant keeps the compensation at its
    graceful-degradation best there (~arithmetic precision).
    """
    nmant = jnp.finfo(dtype).nmant
    if nmant > 23:
        override = os.environ.get("SCORE_TPU_F64_NMANT")
        if override:
            return int(override)
    return nmant


def _opaque(x):
    """Hide a value from XLA's algebraic simplifier: patterns like
    ``(a + b) - a`` and ``c - (c - a)`` can be folded by value-based
    rewrites inside large fused graphs (measured on XLA:CPU), which
    silently turns every compensated reduction back into the naive one.
    The barrier pins the rounding semantics; it costs no arithmetic."""
    import jax

    return jax.lax.optimization_barrier(x)


def two_sum(a, b):
    """Error-free sum: returns (s, e) with s = fl(a + b), s + e = a + b."""
    s = a + b
    bb = _opaque(s - a)
    e = (a - _opaque(s - bb)) + (b - bb)
    return s, e


def _split(a):
    """Dekker split of a into hi + lo with hi carrying the top half of the
    mantissa (splitting constant 2^ceil(p/2) + 1 for p mantissa bits)."""
    bits = _effective_nmant(a.dtype)  # 52 for f64, 23 for f32/TPU-f64
    factor = jnp.asarray(float(2 ** ((bits + 2) // 2) + 1), dtype=a.dtype)
    # the barrier pins the ROUNDED product: fma contraction of `c - x`
    # would skip the rounding the Veltkamp split is built on
    c = _opaque(factor * a)
    hi = c - _opaque(c - a)
    lo = a - hi
    return hi, lo


def two_prod(a, b):
    """Error-free product: returns (p, e) with p = fl(a * b), p + e = a*b."""
    p = _opaque(a * b)  # pinned: downstream uses must see the ROUNDED product
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
