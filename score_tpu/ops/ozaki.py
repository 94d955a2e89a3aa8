"""Exact split-f32 ("Ozaki-style") matmuls: f64-grade contractions on the MXU.

The chain+arrow backend's per-iteration cost at multi-robot scale is
dominated by two dense contractions that are NOT block-structured — the
arrow Schur product ``S - B'Z`` (~1e9 MACs/iter at 20 robots) and the
arrow-arrow one-hot cross term. Run in the runtime's emulated f64 they
execute as slow VPU scalar chains; run as plain f32/bf16 matmuls they are
MXU-fast but ~2e-3-grade — far below what the endgame refinement can
absorb (kappa(S) ~ 1e8).

This module gets both: each f64 operand is split into a short sum of f32
"slices" with at most ``nbits`` significand bits, extracted error-free by
big-constant rounding on genuine f32 (faithfully rounded IEEE on the TPU
VPU — the same foundation as :mod:`score_tpu.ops.twofloat`). Slice-pair
products then have <= 2*nbits significand bits, so they are EXACT in a
single-pass bf16 MXU matmul (bf16 holds 8 significand bits; the MXU
accumulates in f32, exact while partial sums stay below 2^24 ulps —
guaranteed by chunking the contraction axis at kc <= 2^(24 - bx - by)).
Chunk partials are promoted and combined in two-float compensated
arithmetic. Dropping slice pairs below ``drop_bits`` bounds the error at
~2^-drop_bits * ||row|| * ||col|| per output element — with the default 45
bits, the same ~2^-45 grade as the two-float band factors feeding it.

This is the scheme of Ozaki-Ogita-Oishi-Rump (error-free transformation
of matrix multiplication, Numer. Algorithms 2012), re-targeted at the
MXU's bf16 single-pass mode instead of FMA dot products.

Everything is plain jnp (vmap/jit-safe; works identically on XLA:CPU,
where a DEFAULT-precision f32 matmul is true f32 and our integer-valued
slices are exact as well). The slice extraction pins intermediates with
``optimization_barrier`` so XLA:CPU's mul->add FMA contraction cannot skip
the roundings it depends on (see twofloat._opaque).

No counterpart in the reference (Gurobi runs on host f64); part of the
from-scratch TPU numerical engine (SURVEY.md §2.3).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

import jax.numpy as jnp
from jax import lax

from score_tpu.ops import twofloat as tfm
from score_tpu.ops.twofloat import TF, _opaque

__all__ = ["mm_f64", "onehot_pair_contract"]

_DEFAULT_NBITS = 7
_DEFAULT_DROP_BITS = 45
# slices of the lo limb sit at least 23 bits below the hi limb's sigma
# (|lo| <= ulp(hi)/2 <= sigma * 2^-24, plus the folded hi residual)
_LO_BOUND_BITS = 23


def _sigma(x, axis):
    """Per-row power-of-two bound: smallest 2^e with max|x| < 2^e.

    frexp(m) = (f, e) with m = f * 2^e, f in [0.5, 1) — so 2^e > m
    strictly unless m == 0 (where sigma harmlessly becomes 1).
    """
    m = jnp.max(jnp.abs(x), axis=axis, keepdims=True)
    _, e = jnp.frexp(m)
    return jnp.ldexp(jnp.ones_like(m), e)


def _extract(r, phi):
    """Error-free top-bits extraction: r rounded to ulp phi*2^-22*2/3.

    Requires |r| << phi with phi = 3 * 2^(22-nbits) * sigma: r + phi then
    lies in the binade [2^(15+log2 sigma), 2^(16+log2 sigma)) whose f32
    ulp is exactly sigma * 2^-nbits; round-to-nearest makes the slice a
    multiple of that ulp with <= nbits significand bits, and both
    subtractions are exact (Rump's ExtractScalar). The barriers pin the
    rounded intermediates against XLA:CPU FMA/fusion rewrites.
    """
    s = _opaque(_opaque(r + phi) - phi)
    return s, _opaque(r - s)


def _slice_operand(
    X, nbits: int, axis: int, exact_bits: Optional[int] = None
) -> List[Tuple[jnp.ndarray, int]]:
    """Split an f64(-emulated) array into error-free f32 slices.

    Returns [(slice_f32, bound_bits)] with |slice| <= sigma * 2^-bound and
    <= nbits significand bits per slice, where sigma is the per-row
    power-of-two bound over ``axis`` (the contraction axis). With
    ``exact_bits`` set, X is promised to already be exactly representable
    in that many bits (e.g. a 0/1 one-hot): returned as a single slice.

    Input-magnitude bound: the extraction constant phi = sigma * 3 *
    2^(22-nbits) must itself be finite in f32, which caps column maxima
    at |X| < ~2^(111+nbits-22) ~ 2.6e33 for the default nbits=7. Larger
    entries overflow phi to inf and silently poison the output. The KKT
    quantities routed here (arrow Schur operands, Hhat blocks) are
    Jacobi-equilibrated / measurement-scaled and sit many orders below
    that; a diverging iterate large enough to breach it also trips the
    solver's finite-iterate guards before the factorization is used.
    """
    if exact_bits is not None:
        return [(X.astype(jnp.float32), 0)]
    t = tfm.from_f64(X)
    out: List[Tuple[jnp.ndarray, int]] = []
    # hi limb: 24 significand bits -> ceil(24/nbits) slices
    r = t.hi
    sig = _sigma(r, axis)
    phi = sig * np.float32(3.0 * 2.0 ** (22 - nbits))
    for k in range(-(-24 // nbits)):
        s, r = _extract(r, phi)
        out.append((s, nbits * k))
        phi = phi * np.float32(2.0**-nbits)
    # lo limb (+ the sub-ulp hi residual): 3 more slices, nominally
    # >= _LO_BOUND_BITS below sigma (the actual scale is usually lower;
    # the static bound only needs to be an upper bound for pair dropping)
    r = t.lo + r
    sig2 = _sigma(r, axis)
    phi = sig2 * np.float32(3.0 * 2.0 ** (22 - nbits))
    for k in range(3):
        s, r = _extract(r, phi)
        out.append((s, _LO_BOUND_BITS + nbits * k))
        phi = phi * np.float32(2.0**-nbits)
    return out


def _tf_sum_leading(parts):
    """Compensated (two-float) sum of a stack of exact f32 partials along
    axis 0; returns f64.

    Pairwise TREE reduction — log2(P) vectorized two-float adds — not a
    sequential scan: at robot20 scale the Schur product stacks ~375
    (258, 258) partials, and a P-step scan of small adds is pure
    serialized latency (measured 25 ms/iter in the schur microbench
    phase). Pairwise summation also carries a ~log2(P) (vs P) error
    growth factor on top of the sloppy add's 2^-47 grade."""
    acc = TF(parts, jnp.zeros_like(parts))
    while acc.hi.shape[0] > 1:
        m = acc.hi.shape[0]
        if m % 2:
            pad = [(0, 1)] + [(0, 0)] * (acc.hi.ndim - 1)
            acc = TF(jnp.pad(acc.hi, pad), jnp.pad(acc.lo, pad))
        acc = tfm.add_sloppy(
            TF(acc.hi[0::2], acc.lo[0::2]),
            TF(acc.hi[1::2], acc.lo[1::2]),
        )
    return tfm.to_f64(tfm.normalize(TF(acc.hi[0], acc.lo[0])))


def mm_f64(
    X,
    Y,
    *,
    nbits: int = _DEFAULT_NBITS,
    drop_bits: int = _DEFAULT_DROP_BITS,
    x_exact_bits: Optional[int] = None,
    y_exact_bits: Optional[int] = None,
):
    """X.T @ Y for X (K, M), Y (K, N) f64 -> (M, N) f64-grade.

    All arithmetic on the fast path is exact: bf16-safe slice matmuls at
    DEFAULT precision (single MXU pass) with the contraction axis chunked
    to keep f32 accumulation exact, then a compensated two-float
    combination of the chunk/pair partials. The only truncation is the
    statically dropped slice pairs below ``drop_bits`` (~2^-45 norm-wise
    by default).
    """
    K, M = X.shape
    K2, N = Y.shape
    assert K == K2, (X.shape, Y.shape)
    bx = x_exact_bits if x_exact_bits is not None else nbits
    by = y_exact_bits if y_exact_bits is not None else nbits
    kc = 1 << max(0, 24 - bx - by)
    q = -(-K // kc)
    if q * kc != K:
        pad = q * kc - K
        X = jnp.pad(X, ((0, pad), (0, 0)))
        Y = jnp.pad(Y, ((0, pad), (0, 0)))
    Xq = X.reshape(q, kc, M)
    Yq = Y.reshape(q, kc, N)
    xs = _slice_operand(Xq, nbits, axis=-2, exact_bits=x_exact_bits)
    ys = _slice_operand(Yq, nbits, axis=-2, exact_bits=y_exact_bits)
    parts = []
    for sx, bxk in xs:
        for sy, byk in ys:
            if bxk + byk > drop_bits:
                continue
            parts.append(
                jnp.einsum(
                    "qkm,qkn->qmn", sx, sy, precision=lax.Precision.DEFAULT
                )
            )
    stacked = jnp.concatenate(parts, axis=0)  # (P*q, M, N) exact f32
    return _tf_sum_leading(stacked)


def onehot_pair_contract(oh_a, oh_b, H, *, nbits: int = _DEFAULT_NBITS):
    """einsum('ma,mb,mij->aibj', oh_a, oh_b, H) with one-hot oh, f64 H.

    Only H needs slicing: oh entries are exact 0/1, so oh_b * H_slice is
    an exact f32 product and the m-contraction of (1-bit) x (nbits-bit)
    values accumulates exactly in f32 while m < 2^(24 - 1 - nbits).
    H slices use a single per-(i,j)-column sigma (max over all m) —
    a valid, slightly conservative upper bound for every (b, i, j) column
    of the masked product.
    """
    m, A = oh_a.shape
    _, B = oh_b.shape
    d = H.shape[-1]
    assert m < (1 << (24 - 1 - nbits)), m  # exact f32 accumulation bound
    Hf = H.reshape(m, d * d)
    oa = oh_a.astype(jnp.float32)
    ob = oh_b.astype(jnp.float32)
    parts = []
    for sH, _ in _slice_operand(Hf, nbits, axis=0):
        P = (ob[:, :, None] * sH[:, None, :]).reshape(m, B * d * d)
        parts.append(
            jnp.einsum("ma,mx->ax", oa, P, precision=lax.Precision.DEFAULT)
        )
    out = _tf_sum_leading(jnp.stack(parts))  # (A, B*d*d)
    out = out.reshape(A, B, d, d)
    return jnp.transpose(out, (0, 2, 1, 3))  # 'abij' -> 'aibj'
