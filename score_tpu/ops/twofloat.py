"""Rigorous double-f32 ("two-float") arithmetic for TPU.

TPU hardware has no f64. This environment's runtime emulates one (a
double-f32-style arithmetic with ~1e-15 median multiply error and no
faithful rounding) at roughly 3x the cost of native f32 — and the
emulation's lack of faithful rounding means error-free transforms cannot
run on top of it. Genuine f32, by contrast, IS faithfully rounded IEEE on
the TPU vector unit (verified on-device: Knuth two-sum and Dekker
two-product reproduce exact results), so extended precision can be built
honestly in software: a value is an unevaluated sum hi + lo of two f32
with |lo| <= ulp(hi)/2, giving ~2^-47 effective precision with the f32
exponent range.

This is the numeric foundation of the TPU-fast KKT factorization path
(:mod:`score_tpu.solver.chain_arrow` mixed precision): the chain band of
a GOATS-scale KKT system has kappa ~ 1e8-1e9 even after Jacobi
equilibration (the pinned odometry chain is a 1D-Laplacian-like
operator), so plain-f32 factorization diverges (kappa * eps32 > 1) while
two-float keeps kappa * eps_tf ~ 1e-5 — small enough for one refinement
pass to restore f64-grade directions.

Algorithms follow the classic double-double construction (Dekker 1971;
Knuth TAOCP v2; Hida-Li-Bailey QD), restricted to the add/sub/mul/div/
sqrt set the solver needs. Everything is elementwise/batched jnp on f32
— VPU-friendly, vmap/jit-safe, and Pallas-compatible (f32 only).

No counterpart in the reference (Gurobi runs on host f64); this is part
of the from-scratch TPU numerical engine (SURVEY.md §2.3).
"""

from __future__ import annotations

from typing import NamedTuple

import contextlib

import jax
import jax.numpy as jnp

_BARRIERS = [True]


@contextlib.contextmanager
def no_barriers():
    """Trace-time switch: drop the anti-fusion barriers.

    Used around Pallas kernel bodies — Mosaic neither supports
    ``optimization_barrier`` nor performs the XLA fusion rewrites the
    barriers exist to block.
    """
    _BARRIERS.append(False)
    try:
        yield
    finally:
        _BARRIERS.pop()


def _opaque(x):
    """Hide a value from XLA's rewrite machinery.

    Error-free transforms depend on every intermediate being the ROUNDED
    f32 value of its expression. XLA:CPU contracts mul->add chains into
    FMAs across fusion boundaries (measured: ``x*y - c`` compiles to an
    fma), which skips exactly those roundings and silently degrades
    compensated results toward working precision. The barrier pins the
    value; it costs no arithmetic. Under :func:`no_barriers` (Pallas
    kernels) it is the identity.
    """
    if not _BARRIERS[-1]:
        return x
    return jax.lax.optimization_barrier(x)

__all__ = [
    "TF",
    "tf",
    "from_hi_lo",
    "to_f64",
    "from_f64",
    "neg",
    "add",
    "add_sloppy",
    "normalize",
    "sub",
    "mul",
    "div",
    "sqrt",
    "scale",
    "matmul",
    "where",
    "transpose",
    "chol_small",
    "tri_lower_solve",
    "tri_upper_solve",
]

_SPLIT = float(2**12 + 1)  # Veltkamp constant for the 24-bit f32 mantissa


class TF(NamedTuple):
    """An unevaluated f32 sum hi + lo with |lo| <= ulp(hi)/2 (a pytree)."""

    hi: jnp.ndarray
    lo: jnp.ndarray


def tf(x) -> TF:
    """Lift a plain f32 array (lo = 0)."""
    x = jnp.asarray(x, dtype=jnp.float32)
    return TF(x, jnp.zeros_like(x))


def from_hi_lo(hi, lo) -> TF:
    return TF(jnp.asarray(hi, jnp.float32), jnp.asarray(lo, jnp.float32))


def from_f64(x) -> TF:
    """Split a higher-precision array into (hi, lo). Exact when the source
    is true f64; on the TPU f64 emulation the conversion is as good as the
    emulated value itself."""
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(x.dtype)).astype(jnp.float32)
    return TF(hi, lo)


def to_f64(a: TF):
    return a.hi.astype(jnp.float64) + a.lo.astype(jnp.float64)


def _two_sum(a, b):
    s = a + b
    bb = _opaque(s - a)
    return s, (a - _opaque(s - bb)) + (b - bb)


def _quick_two_sum(a, b):
    # requires |a| >= |b| (or a == 0)
    s = a + b
    return s, b - _opaque(s - a)


def _split(a):
    # c must be the ROUNDED product: without the barrier the compiler may
    # contract `c - x` into fma(_SPLIT, a, -x), which skips the rounding
    # the Veltkamp split is built on (measured on XLA:CPU).
    c = _opaque(jnp.float32(_SPLIT) * a)
    hi = c - _opaque(c - a)
    return hi, a - hi


def _two_prod(a, b):
    # p pinned for the same reason as _split's c: downstream `p + x` must
    # see the rounded product, not an fma-contracted exact one
    p = _opaque(a * b)
    ah, al = _split(a)
    bh, bl = _split(b)
    return p, ((ah * bh - p) + ah * bl + al * bh) + al * bl


def neg(a: TF) -> TF:
    return TF(-a.hi, -a.lo)


def add(a: TF, b: TF) -> TF:
    """Accurate double-f32 addition (Knuth two-sum on both limbs)."""
    s1, s2 = _two_sum(a.hi, b.hi)
    t1, t2 = _two_sum(a.lo, b.lo)
    s2 = s2 + t1
    s1, s2 = _quick_two_sum(s1, s2)
    s2 = s2 + t2
    s1, s2 = _quick_two_sum(s1, s2)
    return TF(s1, s2)


def add_sloppy(a: TF, b: TF) -> TF:
    """Accumulation-grade addition (QD 'sloppy add'): exact two-sum on
    the hi limbs, plain f32 accumulation of the error limbs. Over a
    k-term contraction the lo limb absorbs O(k) roundings of ~eps^2
    magnitude — plenty for the band kernels' short (k <= Db) chains at
    less than half the flops of :func:`add`. The result may be
    UNNORMALIZED (|lo| can exceed ulp(hi)/2 by a few ulps); call
    :func:`normalize` before feeding it to mul/div/sqrt chains."""
    s, e = _two_sum(a.hi, b.hi)
    return TF(s, e + (a.lo + b.lo))


def normalize(a: TF) -> TF:
    """Renormalize an (hi, lo) pair so |lo| <= ulp(hi)/2."""
    return TF(*_two_sum(a.hi, a.lo))


def sub(a: TF, b: TF) -> TF:
    return add(a, neg(b))


def mul(a: TF, b: TF) -> TF:
    p1, p2 = _two_prod(a.hi, b.hi)
    p2 = p2 + (a.hi * b.lo + a.lo * b.hi)
    return TF(*_quick_two_sum(p1, p2))


def scale(a: TF, c) -> TF:
    """a * c with c a plain f32 array (exact two_prod on the hi limb)."""
    p1, p2 = _two_prod(a.hi, c)
    p2 = p2 + a.lo * c
    return TF(*_quick_two_sum(p1, p2))


def div(a: TF, b: TF) -> TF:
    """Long division: three f32 quotient corrections (~full tf precision)."""
    q1 = a.hi / b.hi
    r = sub(a, scale(b, q1))
    q2 = r.hi / b.hi
    r = sub(r, scale(b, q2))
    q3 = r.hi / b.hi
    s1, s2 = _quick_two_sum(q1, q2)
    return add(TF(s1, s2), tf(q3))


def sqrt(a: TF) -> TF:
    """Newton step on the f32 estimate: q + (a - q^2) / (2q).

    Domain: a > 0 (the solver's cone/pivot quantities); a.hi == 0 returns 0.
    """
    q = jnp.sqrt(a.hi)
    safe = jnp.where(q > 0.0, q, 1.0)
    p1, p2 = _two_prod(safe, safe)
    r = sub(a, TF(p1, p2))
    corr = r.hi / (2.0 * safe)
    out = TF(*_quick_two_sum(safe, corr))
    zero = jnp.zeros_like(q)
    return TF(jnp.where(q > 0.0, out.hi, zero), jnp.where(q > 0.0, out.lo, zero))


def where(c, a: TF, b: TF) -> TF:
    return TF(jnp.where(c, a.hi, b.hi), jnp.where(c, a.lo, b.lo))


def transpose(A: TF) -> TF:
    """Swap the last two axes."""
    return TF(jnp.swapaxes(A.hi, -1, -2), jnp.swapaxes(A.lo, -1, -2))


def _col(A: TF, j: int) -> TF:
    return TF(A.hi[..., :, j], A.lo[..., :, j])


def _row(A: TF, i: int) -> TF:
    return TF(A.hi[..., i, :], A.lo[..., i, :])


def _entry_keepdim(v: TF, j: int) -> TF:
    return TF(v.hi[..., j : j + 1], v.lo[..., j : j + 1])


def chol_small(A: TF) -> TF:
    """Cholesky of (..., m, m) SPD blocks in two-float arithmetic
    (unrolled left-looking columns, mirroring
    :func:`score_tpu.solver.smallblocks.chol_small`)."""
    m = A.hi.shape[-1]
    cols = []
    for j in range(m):
        c = _col(A, j)
        for k in range(j):
            c = sub(c, mul(cols[k], _entry_keepdim(cols[k], j)))
        pivot = sqrt(_entry_keepdim(c, j))
        col = div(c, pivot)
        # int32 iota: these helpers also run inside Pallas kernels, where
        # an x64-default (i64) arange is rejected by Mosaic
        mask = (jnp.arange(m, dtype=jnp.int32) >= j).astype(jnp.float32)
        col = TF(col.hi * mask, col.lo * mask)
        cols.append(col)
    return TF(
        jnp.stack([c.hi for c in cols], axis=-1),
        jnp.stack([c.lo for c in cols], axis=-1),
    )


def tri_lower_solve(L: TF, B: TF) -> TF:
    """Solve L Y = B, L (..., m, m) lower-triangular, B (..., m, K)."""
    m = L.hi.shape[-1]
    rows = []
    for i in range(m):
        r = _row(B, i)
        for k in range(i):
            lik = TF(L.hi[..., i, k : k + 1], L.lo[..., i, k : k + 1])
            r = sub(r, mul(lik, rows[k]))
        lii = TF(L.hi[..., i, i : i + 1], L.lo[..., i, i : i + 1])
        rows.append(div(r, lii))
    return TF(
        jnp.stack([r.hi for r in rows], axis=-2),
        jnp.stack([r.lo for r in rows], axis=-2),
    )


def tri_upper_solve(L: TF, B: TF) -> TF:
    """Solve L^T Y = B (L lower-triangular), unrolled back substitution."""
    m = L.hi.shape[-1]
    rows = [None] * m
    for i in reversed(range(m)):
        r = _row(B, i)
        for k in range(i + 1, m):
            lki = TF(L.hi[..., k, i : i + 1], L.lo[..., k, i : i + 1])
            r = sub(r, mul(lki, rows[k]))
        lii = TF(L.hi[..., i, i : i + 1], L.lo[..., i, i : i + 1])
        rows[i] = div(r, lii)
    return TF(
        jnp.stack([r.hi for r in rows], axis=-2),
        jnp.stack([r.lo for r in rows], axis=-2),
    )


def matmul(A: TF, B: TF) -> TF:
    """Batched (..., m, p) @ (..., p, k) in two-float arithmetic.

    The p products are exact two_prods evaluated in one broadcast batch;
    the contraction is a sequential compensated accumulation over p
    (p is a small static block dimension here, 2..12).
    """
    m, p = A.hi.shape[-2], A.hi.shape[-1]
    k = B.hi.shape[-1]
    Ae = TF(A.hi[..., :, :, None], A.lo[..., :, :, None])  # (..., m, p, 1)
    Be = TF(B.hi[..., None, :, :], B.lo[..., None, :, :])  # (..., 1, p, k)
    terms = mul(Ae, Be)  # (..., m, p, k)
    acc = TF(terms.hi[..., :, 0, :], terms.lo[..., :, 0, :])
    for i in range(1, p):
        acc = add(acc, TF(terms.hi[..., :, i, :], terms.lo[..., :, i, :]))
    return acc
