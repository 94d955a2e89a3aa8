"""Fused Pallas TPU kernels: two-float parallel cyclic reduction.

The production band factorization of the mixed-precision chain+arrow
backend. The jnp two-float PCR (solver/pcr_tf.py) is numerically right
but launch-bound on this runtime (~hundreds of fused-kernel dispatches
per band solve at ~0.5 ms each); these kernels run one entire
factorization (resp. one entire solve) as ONE kernel launch with all
levels unrolled in VMEM.

Algorithm: all-positions block parallel cyclic reduction (PCR proper,
not the compacting CR of solver/pcr.py — compaction needs stride-2 lane
gathers, which Mosaic does not support; PCR needs only lane ROLLS, which
it does). For the system

    A_i x_{i-s} + D_i x_i + C_i x_{i+s} = b_i      (s = 2^level)

each level computes, for every i simultaneously (lane-parallel over T):

    E_i = -A_i invD_{i-s}          F_i = -C_i invD_{i+s}
    D'_i = D_i + E_i C_{i-s} + F_i A_{i+s}
    A'_i = E_i A_{i-s}             C'_i = F_i C_{i+s}

and a solve replays   b'_i = b_i + E_i b_{i-s} + F_i b_{i+s}   through
the stored (E, F), finishing with x_i = invD_i b_i on the fully
decoupled final system. PCR does log2(T) times more block work than CR
— irrelevant here: the work is lane-parallel two-float VPU arithmetic
(~2 ms per GOATS-size factorization) and the launch count is what
dominates this runtime.

Layout: blocks live as (Db, Db, C*T) — ALL chains concatenated on the
lane axis (lane = c*T + i, every chain padded to the same power-of-two
T by the caller). This runtime's Pallas toolchain rejects any gridded
pallas_call (verified: even a trivial 2D-tiled kernel fails to compile
remotely), so the kernels are gridless with every operand fully VMEM
resident; chain boundaries are enforced by masking rolls with the
within-chain position lane % T. Two-float values are (hi, lo) pairs of
f32 arrays (ops/twofloat.py primitives are plain jnp and work unchanged
inside kernels).

VMEM budget: E/F factors are 4 * L*Db*Db*C*T*4 bytes — ~6 MB for
GOATS (Db=6, T=1024), ~11 MB for Manhattan-4 (C=4, T=512). Callers
should fall back to the jnp path when the estimate exceeds ~12 MB
(see chain_arrow._use_pallas_pcr); wide solve panels are chunked along
K across separate launches instead (ppcr_solve_pallas).

Correctness is pinned against dense solves and solver/pcr_tf.py in
tests (interpret mode on CPU, compiled on TPU).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from score_tpu.ops import twofloat as tfm
from score_tpu.ops.twofloat import TF

__all__ = [
    "PPCRFactors",
    "ppcr_factor_pallas",
    "ppcr_solve_pallas",
    "ppcr_vmem_bytes",
]


class PPCRFactors(NamedTuple):
    """Stored PCR factors: per-level elimination blocks + final inverses.

    E, F: TF of shape (L*Db, Db, C*T) — level `l` occupies block rows
    [l*Db, (l+1)*Db); invD: TF of shape (Db, Db, C*T). Chains are
    concatenated on the lane axis. The static (C, T, Db) layout info
    travels with the chain_arrow structure, not here.
    """

    E: TF
    F: TF
    invD: TF


def _num_levels(T: int) -> int:
    L = 0
    while (1 << L) < T:
        L += 1
    return L


def ppcr_vmem_bytes(C: int, T: int, Db: int) -> int:
    """Rough resident-bytes estimate for the factor kernel (inputs +
    outputs + working set), used for the Pallas-vs-jnp fallback choice."""
    L = max(_num_levels(T), 1)
    ef = 4 * L * Db * Db * C * T * 4  # E/F hi+lo
    io = 8 * Db * Db * C * T * 4  # D/U/invD hi+lo + work
    return ef + io


# ------------------------------------------------------------------ #
# In-kernel two-float block algebra on (Db, Db, C*T) lane-major values
# ------------------------------------------------------------------ #


def _shift(x: TF, s: int, T: int) -> TF:
    """Chain-local x_{i-s} (s > 0) / x_{i+s} (s < 0), zero at chain
    boundaries: circular lane roll + within-chain position mask
    (lane % T works because every chain spans exactly T lanes)."""
    CT = x.hi.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.hi.shape, x.hi.ndim - 1)
    pos = jax.lax.rem(lane, jnp.int32(T))
    if s > 0:
        mask = pos >= s
    else:
        mask = pos < T + s
    # pltpu.roll takes non-negative shifts (s < 0 wraps circularly); keep
    # the shift i32 — under x64 a python int lowers as i64, which Mosaic's
    # tpu.dynamic_rotate rejects.
    sh = jnp.int32(s % CT)
    hi = jnp.where(mask, pltpu.roll(x.hi, sh, axis=x.hi.ndim - 1), 0.0)
    lo = jnp.where(mask, pltpu.roll(x.lo, sh, axis=x.lo.ndim - 1), 0.0)
    return TF(hi, lo)


def _mm(A: TF, B: TF) -> TF:
    """Block matmul on (i, k, M) x (k, j, M) -> (i, j, M): lane-parallel
    over M, contraction unrolled over the static k."""
    Ae = TF(A.hi[:, :, None, :], A.lo[:, :, None, :])  # (i, k, 1, M)
    Be = TF(B.hi[None, :, :, :], B.lo[None, :, :, :])  # (1, k, j, M)
    t = tfm.mul(Ae, Be)  # (i, k, j, M)
    k = A.hi.shape[1]
    acc = TF(t.hi[:, 0], t.lo[:, 0])
    for kk in range(1, k):
        acc = tfm.add(acc, TF(t.hi[:, kk], t.lo[:, kk]))
    return acc


def _transpose_blocks(A: TF) -> TF:
    """Swap the block axes of (i, j, M) — lanes untouched."""
    return TF(jnp.swapaxes(A.hi, 0, 1), jnp.swapaxes(A.lo, 0, 1))


def _block_inv(D: TF, Db: int) -> TF:
    """Inverse of all (Db, Db) blocks: unrolled two-float Cholesky +
    forward/back substitution against the identity (lane-parallel)."""
    cols = []
    for j in range(Db):
        c = TF(D.hi[:, j], D.lo[:, j])
        for k in range(j):
            ckj = TF(cols[k].hi[j : j + 1], cols[k].lo[j : j + 1])
            c = tfm.sub(c, tfm.mul(cols[k], ckj))
        piv = tfm.sqrt(TF(c.hi[j : j + 1], c.lo[j : j + 1]))
        col = tfm.div(c, piv)
        # 2D int32 iota: Mosaic rejects 1D (and i64) iotas inside kernels
        mask = (
            jax.lax.broadcasted_iota(jnp.int32, (Db, 1), 0) >= j
        ).astype(jnp.float32)
        cols.append(TF(col.hi * mask, col.lo * mask))
    L = [[TF(cols[j].hi[i : i + 1], cols[j].lo[i : i + 1]) for j in range(Db)]
         for i in range(Db)]
    inv_rows = []
    for rhs_col in range(Db):
        y = []
        for i in range(Db):
            r = tfm.tf(
                jnp.full_like(D.hi[:1, 0], 1.0 if i == rhs_col else 0.0)
            )
            for k in range(i):
                r = tfm.sub(r, tfm.mul(L[i][k], y[k]))
            y.append(tfm.div(r, L[i][i]))
        x = [None] * Db
        for i in reversed(range(Db)):
            r = y[i]
            for k in range(i + 1, Db):
                r = tfm.sub(r, tfm.mul(L[k][i], x[k]))
            x[i] = tfm.div(r, L[i][i])
        inv_rows.append(x)  # column rhs_col of the inverse
    hi = jnp.concatenate(
        [jnp.concatenate([inv_rows[j][i].hi for j in range(Db)], axis=0)[None]
         for i in range(Db)], axis=0)
    lo = jnp.concatenate(
        [jnp.concatenate([inv_rows[j][i].lo for j in range(Db)], axis=0)[None]
         for i in range(Db)], axis=0)
    return TF(hi, lo)


# ------------------------------------------------------------------ #
# Kernels (gridless: every ref is the full array in VMEM)
# ------------------------------------------------------------------ #


def _factor_kernel(dhi, dlo, uhi, ulo,
                   ehi, elo, fhi, flo, ivhi, ivlo, *, Db: int, T: int):
    """Unrolled PCR factorization over all chains at once. Refs: inputs
    (Db, Db, CT); outputs E/F (L*Db, Db, CT) with level `lev` in rows
    [lev*Db, (lev+1)*Db), invD (Db, Db, CT)."""
    L = _num_levels(T)
    D = TF(dhi[...], dlo[...])
    U = TF(uhi[...], ulo[...])
    A = _shift(_transpose_blocks(U), 1, T)  # A_i = U_{i-1}^T
    C = U
    for lev in range(L):
        s = 1 << lev
        invD = _block_inv(D, Db)
        E = tfm.neg(_mm(A, _shift(invD, s, T)))
        F = tfm.neg(_mm(C, _shift(invD, -s, T)))
        r = slice(lev * Db, (lev + 1) * Db)
        ehi[r], elo[r] = E.hi, E.lo
        fhi[r], flo[r] = F.hi, F.lo
        D = tfm.add(D, tfm.add(_mm(E, _shift(C, s, T)),
                               _mm(F, _shift(A, -s, T))))
        A = _mm(E, _shift(A, s, T))
        C = _mm(F, _shift(C, -s, T))
    if L == 0:  # T == 1: no levels; zero-fill the (1-level) output pad
        z = jnp.zeros_like(dhi[...])
        ehi[0:Db], elo[0:Db] = z, z
        fhi[0:Db], flo[0:Db] = z, z
    invD = _block_inv(D, Db)
    ivhi[...], ivlo[...] = invD.hi, invD.lo


def _solve_kernel(ehi, elo, fhi, flo, ivhi, ivlo, bhi, blo,
                  xhi, xlo, *, Db: int, T: int):
    """K rhs columns over all chains: replay the stored eliminations on
    the rhs, then x = invD b. rhs layout (Db, K, CT)."""
    L = _num_levels(T)
    b = TF(bhi[...], blo[...])
    for lev in range(L):
        s = 1 << lev
        r = slice(lev * Db, (lev + 1) * Db)
        E = TF(ehi[r], elo[r])
        F = TF(fhi[r], flo[r])
        b = tfm.add(b, tfm.add(_mm(E, _shift(b, s, T)),
                               _mm(F, _shift(b, -s, T))))
    x = _mm(TF(ivhi[...], ivlo[...]), b)
    xhi[...], xlo[...] = x.hi, x.lo


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _vspec():
    return pl.BlockSpec(memory_space=pltpu.VMEM)


def _to_lanes(a):
    """(C, T, Db, Db) -> (Db, Db, C*T)."""
    C, T = a.shape[0], a.shape[1]
    return jnp.transpose(a, (2, 3, 0, 1)).reshape(a.shape[2], a.shape[3], C * T)


def ppcr_factor_pallas(D: TF, U: TF, interpret=None) -> PPCRFactors:
    """Factor C independent block-tridiagonal systems in one launch.

    D, U: TF of shape (C, T, Db, Db) (same convention as solver/pcr.py:
    identity/zero padded to a power-of-two T, U[:, T-1] = 0).
    """
    C, T, Db, _ = D.hi.shape
    L = max(_num_levels(T), 1)
    if interpret is None:
        interpret = _interpret_default()
    args = (_to_lanes(D.hi), _to_lanes(D.lo), _to_lanes(U.hi), _to_lanes(U.lo))
    shp = jax.ShapeDtypeStruct((L * Db, Db, C * T), jnp.float32)
    shp_iv = jax.ShapeDtypeStruct((Db, Db, C * T), jnp.float32)
    ehi, elo, fhi, flo, ivhi, ivlo = pl.pallas_call(
        functools.partial(_factor_kernel, Db=Db, T=T),
        in_specs=[_vspec()] * 4,
        out_specs=(_vspec(),) * 6,
        out_shape=(shp, shp, shp, shp, shp_iv, shp_iv),
        interpret=interpret,
    )(*args)
    return PPCRFactors(E=TF(ehi, elo), F=TF(fhi, flo), invD=TF(ivhi, ivlo))


def ppcr_solve_pallas(factors: PPCRFactors, rhs: TF, interpret=None) -> TF:
    """Solve for rhs TF of shape (C, T, Db, K); returns the same shape.

    Wide panels (the chain-arrow coupling solves, K = A up to ~900 on
    multi-robot problems) are chunked along K into separate launches so
    the VMEM-resident rhs stays ~2 MB per launch."""
    C, T, Db, K = rhs.hi.shape
    if interpret is None:
        interpret = _interpret_default()
    CT = C * T
    Kc = max(1, min(K, (2 << 20) // (Db * CT * 4)))

    bhi = jnp.transpose(rhs.hi, (2, 3, 0, 1)).reshape(Db, K, CT)
    blo = jnp.transpose(rhs.lo, (2, 3, 0, 1)).reshape(Db, K, CT)

    def launch(bh, bl):
        kk = bh.shape[1]
        shp = jax.ShapeDtypeStruct((Db, kk, CT), jnp.float32)
        return pl.pallas_call(
            functools.partial(_solve_kernel, Db=Db, T=T),
            in_specs=[_vspec()] * 8,
            out_specs=(_vspec(), _vspec()),
            out_shape=(shp, shp),
            interpret=interpret,
        )(factors.E.hi, factors.E.lo, factors.F.hi, factors.F.lo,
          factors.invD.hi, factors.invD.lo, bh, bl)

    outs_hi, outs_lo = [], []
    for k0 in range(0, K, Kc):
        k1 = min(K, k0 + Kc)
        xh, xl = launch(bhi[:, k0:k1], blo[:, k0:k1])
        outs_hi.append(xh)
        outs_lo.append(xl)
    xhi = jnp.concatenate(outs_hi, axis=1) if len(outs_hi) > 1 else outs_hi[0]
    xlo = jnp.concatenate(outs_lo, axis=1) if len(outs_lo) > 1 else outs_lo[0]
    xhi = jnp.transpose(xhi.reshape(Db, K, C, T), (2, 3, 0, 1))
    xlo = jnp.transpose(xlo.reshape(Db, K, C, T), (2, 3, 0, 1))
    return TF(xhi, xlo)
