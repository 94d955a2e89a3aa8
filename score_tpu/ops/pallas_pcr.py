"""Fused Pallas TPU kernels: two-float parallel cyclic reduction.

The production band factorization of the mixed-precision chain+arrow
backend. The jnp two-float PCR (solver/pcr_tf.py) is numerically right
but launch-bound on this runtime (~hundreds of fused-kernel dispatches
per band solve at ~0.5 ms each); these kernels run a factorization in
~log2(T) launches (one per PCR level + init/inverse) and a band solve in
ONE launch per chain-chunk, everything VMEM-resident.

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

VMEM budget: the factorization runs one kernel per level (one compiled
kernel serves all levels — the shift arrives as an SMEM scalar), and
chains are chunked into lane-budgeted groups per call (Db*Db*lanes <=
36*1024, ~9 MB of stack); wide solve panels additionally chunk along K.
A single chain whose Db*Db*T exceeds the budget is unsupported
(`ppcr_supported`) and the caller falls back to another band.

Correctness is pinned against dense solves and solver/pcr_tf.py in
tests (interpret mode on CPU, compiled on TPU).
"""

from __future__ import annotations

import functools
import os
import sys
from typing import NamedTuple

# The two-float level bodies build deep expression chains; Mosaic lowering
# recurses over them and overflows CPython's default 1000-frame limit.
if sys.getrecursionlimit() < 20_000:
    sys.setrecursionlimit(20_000)

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from score_tpu.ops import twofloat as tfm
from score_tpu.ops.twofloat import TF

__all__ = [
    "CRFactors",
    "CRLevel",
    "PPCRFactors",
    "ppcr_factor_pallas",
    "ppcr_solve_pallas",
    "ppcr_supported",
]

# Lane-elements budget per kernel call: Db*Db*CT <= 36 * 1024 keeps the
# level kernel's VMEM stack ~9 MB (measured: 36 * 2048 needs 18.7 MB,
# over the 16 MB/core limit). Chains are independent, so wider problems
# are CHUNKED into groups of chains per call; a single chain whose
# Db*Db*T exceeds the budget cannot be chunked and is unsupported (the
# caller falls back to another band implementation).
_LANE_ELEMS_MAX = 36 * 1024


def ppcr_supported(T: int, Db: int) -> bool:
    """Can the fused kernels serve chains of length T with Db-wide blocks?

    Accounts for the 128-lane alignment floor in `_chunk_group`: short
    chains are grouped up to >= 128 lanes per call, so the post-alignment
    lane count must also fit the budget (relevant only for Db >= 17)."""
    lanes = T if T >= 128 else (128 // T) * T
    return Db * Db * lanes <= _LANE_ELEMS_MAX


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


class CRLevel(NamedTuple):
    """One compacting-CR level's stored blocks, all at the coarse
    (half) width: E/F reduce the rhs onto the retained even rows;
    invD/A/C back-substitute the eliminated odd rows (A, C are the
    level INPUT couplings at the odd rows)."""

    E: TF
    F: TF
    invD: TF
    A: TF
    C: TF


class CRFactors(NamedTuple):
    """Compacting cyclic-reduction factors: ``levels`` (fine -> coarse)
    eliminate odd rows and HALVE the lane width each step — outside the
    kernels, as XLA stride-2 lane slices (Mosaic cannot compact
    in-kernel, but it never needs to: the shift distance stays 1 because
    dropped rows make surviving neighbors adjacent) — and ``base`` is a
    plain all-positions PCR factorization of the compacted remainder.
    Compaction does ~1/log2(T) of PCR's block work; eliminations on the
    retained rows are arithmetically IDENTICAL to PCR's, so accuracy is
    unchanged (odd rows swap a redundant reduction for one exact
    back-substitution)."""

    levels: tuple  # of CRLevel
    base: PPCRFactors


# Compact while the next level still fills this many lanes (the Mosaic
# lane-alignment floor); module-level so interpret-mode tests can drop
# it to exercise compaction on tiny chains. The env override is read at
# call time (not import) so a caller can disable compaction and retrace
# (jax.clear_caches()) without restarting the process — bench.py uses
# this as a safety net to retry a failed solve with compaction off.
_CR_MIN_LANES = 128


def _cr_min_lanes() -> int:
    env = os.environ.get("SCORE_TPU_CR_MIN_LANES")
    return int(env) if env else _CR_MIN_LANES


def _cr_schedule(T: int, lanes: int) -> int:
    """Number of compaction levels for chains of length T in chunks of
    ``lanes`` total lanes (both powers of two)."""
    n = 0
    floor = _cr_min_lanes()
    while (T >> n) >= 2 and (lanes >> (n + 1)) >= floor:
        n += 1
    return n


def _even_lanes(a):
    return a[..., 0::2]


def _odd_lanes(a):
    return a[..., 1::2]


def _interleave_lanes(ev, od):
    return jnp.stack([ev, od], axis=-1).reshape(ev.shape[:-1] + (-1,))


def _num_levels(T: int) -> int:
    L = 0
    while (1 << L) < T:
        L += 1
    return L


# ------------------------------------------------------------------ #
# In-kernel two-float block algebra on (Db, Db, C*T) lane-major values
# ------------------------------------------------------------------ #


def _shift(x: TF, s, T: int, down: bool) -> TF:
    """Chain-local neighbor gather with zero boundaries: x_{i-s} when
    ``down`` else x_{i+s} (s >= 0, may be a traced i32 — Mosaic lowers
    dynamic lane rotates). The within-chain position mask uses lane % T,
    which works because every chain spans exactly T lanes."""
    CT = x.hi.shape[-1]
    s = jnp.int32(s)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.hi.shape, x.hi.ndim - 1)
    pos = jax.lax.rem(lane, jnp.int32(T))
    if down:
        mask = pos >= s
        sh = s
    else:
        mask = pos < jnp.int32(T) - s
        sh = jnp.int32(CT) - s  # roll left by s == roll right by CT - s

    def roll2d(v):
        # dynamic rolls only lower for 2D operands on this toolchain
        # (higher ranks hit an unsupported gather); lane axis untouched
        shp = v.shape
        flat = v.reshape(-1, shp[-1])
        return pltpu.roll(flat, sh, axis=1).reshape(shp)

    hi = jnp.where(mask, roll2d(x.hi), 0.0)
    lo = jnp.where(mask, roll2d(x.lo), 0.0)
    return TF(hi, lo)


def _mm(A: TF, B: TF) -> TF:
    """Block matmul on (i, k, M) x (k, j, M) -> (i, j, M): lane-parallel
    over M, contraction accumulated over the static k (no (i,k,j,M)
    intermediate — register pressure is what blows Mosaic compile time).
    Accumulation uses the sloppy add (exact hi-limb two-sum, plain error
    accumulation) with one final renormalization — same 2^-45-grade
    result over these short chains at ~60% of the fully-normalized add's
    flops."""
    k = A.hi.shape[1]

    def term(kk):
        # pure slices only: integer-plus-newaxis indexing lowers to a
        # gather, which Mosaic rejects above 2D
        Ae = TF(A.hi[:, kk : kk + 1, :], A.lo[:, kk : kk + 1, :])  # (i,1,M)
        Be = TF(B.hi[kk : kk + 1, :, :], B.lo[kk : kk + 1, :, :])  # (1,j,M)
        return tfm.mul(Ae, Be)  # (i, j, M)

    acc = term(0)
    for kk in range(1, k):
        acc = tfm.add_sloppy(acc, term(kk))
    return tfm.normalize(acc) if k > 1 else acc


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


def _level_body(D: TF, A: TF, C: TF, s, Db: int, T: int):
    """One PCR elimination level: returns (E, F, D', A', C', invD)."""
    invD = _block_inv(D, Db)
    E = tfm.neg(_mm(A, _shift(invD, s, T, down=True)))
    F = tfm.neg(_mm(C, _shift(invD, s, T, down=False)))
    D2 = tfm.normalize(
        tfm.add_sloppy(
            D,
            tfm.add_sloppy(_mm(E, _shift(C, s, T, down=True)),
                           _mm(F, _shift(A, s, T, down=False))),
        )
    )
    A2 = _mm(E, _shift(A, s, T, down=True))
    C2 = _mm(F, _shift(C, s, T, down=False))
    return E, F, D2, A2, C2, invD


def _factor_level_kernel(s_ref, dhi, dlo, ahi, alo, chi, clo,
                         ehi, elo, fhi, flo,
                         d2hi, d2lo, a2hi, a2lo, c2hi, c2lo,
                         *, Db: int, T: int):
    """One PCR level over all chains: consumes (D, A, C), emits the
    elimination blocks (E, F) and the reduced (D', A', C'). The shift
    s = 2^level arrives as an SMEM scalar so ONE compiled kernel serves
    every level — and the per-level working set (a handful of two-float
    block arrays + matmul temporaries) stays inside the VMEM budget,
    which a fused all-levels kernel exceeds at GOATS scale (measured
    22.3 MB needed vs the 16 MB per-core limit).

    Traced under ``tfm.no_barriers()`` by the caller (Mosaic has no
    optimization_barrier and needs none)."""
    s = s_ref[0]
    D = TF(dhi[...], dlo[...])
    A = TF(ahi[...], alo[...])
    C = TF(chi[...], clo[...])
    E, F, D2, A2, C2, _ = _level_body(D, A, C, s, Db, T)
    ehi[...], elo[...] = E.hi, E.lo
    fhi[...], flo[...] = F.hi, F.lo
    d2hi[...], d2lo[...] = D2.hi, D2.lo
    a2hi[...], a2lo[...] = A2.hi, A2.lo
    c2hi[...], c2lo[...] = C2.hi, C2.lo


def _factor_level2_kernel(s_ref, dhi, dlo, ahi, alo, chi, clo,
                          e1hi, e1lo, f1hi, f1lo,
                          e2hi, e2lo, f2hi, f2lo,
                          d2hi, d2lo, a2hi, a2lo, c2hi, c2lo,
                          *, Db: int, T: int):
    """TWO consecutive PCR levels in one launch (launch count is a
    meaningful cost on this runtime): s and 2s eliminations back to
    back. The extra held (E1, F1) outputs fit the VMEM budget for 2D
    block sizes (Db <= 8); 3D stays on the single-level kernel."""
    s = s_ref[0]
    D = TF(dhi[...], dlo[...])
    A = TF(ahi[...], alo[...])
    C = TF(chi[...], clo[...])
    E1, F1, D1, A1, C1, _ = _level_body(D, A, C, s, Db, T)
    e1hi[...], e1lo[...] = E1.hi, E1.lo
    f1hi[...], f1lo[...] = F1.hi, F1.lo
    E2, F2, D2, A2, C2, _ = _level_body(D1, A1, C1, s * 2, Db, T)
    e2hi[...], e2lo[...] = E2.hi, E2.lo
    f2hi[...], f2lo[...] = F2.hi, F2.lo
    d2hi[...], d2lo[...] = D2.hi, D2.lo
    a2hi[...], a2lo[...] = A2.hi, A2.lo
    c2hi[...], c2lo[...] = C2.hi, C2.lo


def _cr_level_kernel(s_ref, dhi, dlo, ahi, alo, chi, clo,
                     ehi, elo, fhi, flo, ivhi, ivlo,
                     d2hi, d2lo, a2hi, a2lo, c2hi, c2lo,
                     *, Db: int, T: int):
    """One COMPACTING cyclic-reduction level: identical elimination to
    `_factor_level_kernel` at s (always 1 after compaction — neighbors
    become adjacent when the caller drops eliminated rows), but also
    emits the block inverses invD (the caller keeps the ODD-row slices
    for back-substitution; even-row slices of D2/A2/C2 feed the next,
    half-width level)."""
    s = s_ref[0]
    D = TF(dhi[...], dlo[...])
    A = TF(ahi[...], alo[...])
    C = TF(chi[...], clo[...])
    E, F, D2, A2, C2, invD = _level_body(D, A, C, s, Db, T)
    ehi[...], elo[...] = E.hi, E.lo
    fhi[...], flo[...] = F.hi, F.lo
    ivhi[...], ivlo[...] = invD.hi, invD.lo
    d2hi[...], d2lo[...] = D2.hi, D2.lo
    a2hi[...], a2lo[...] = A2.hi, A2.lo
    c2hi[...], c2lo[...] = C2.hi, C2.lo


def _cr_reduce_kernel(ehi, elo, fhi, flo, behi, belo, bohi, bolo,
                      outhi, outlo, *, Db: int, T: int):
    """CR rhs reduction onto the retained (even) rows, all operands at
    the COARSE width (T = coarse chain length): even row 2j has odd
    neighbors 2j-1 = shift-down(odd)[j] and 2j+1 = odd[j], so
    b'[j] = b_ev[j] + E[j] odd[j-1] + F[j] odd[j]."""
    E = TF(ehi[...], elo[...])
    F = TF(fhi[...], flo[...])
    be = TF(behi[...], belo[...])
    bo = TF(bohi[...], bolo[...])
    out = tfm.normalize(
        tfm.add_sloppy(
            be,
            tfm.add_sloppy(_mm(E, _shift(bo, 1, T, down=True)),
                           _mm(F, bo)),
        )
    )
    outhi[...], outlo[...] = out.hi, out.lo


def _cr_backsub_kernel(ivhi, ivlo, ahi, alo, chi, clo,
                       bohi, bolo, xehi, xelo, xohi, xolo,
                       *, Db: int, T: int):
    """CR back-substitution for the eliminated (odd) rows, all operands
    at the COARSE width: odd row 2j+1 has even neighbors 2j = even[j]
    and 2j+2 = shift-up(even)[j], so
    x_od[j] = invD_od[j] (b_od[j] - A_od[j] x_ev[j] - C_od[j] x_ev[j+1])."""
    invD = TF(ivhi[...], ivlo[...])
    A = TF(ahi[...], alo[...])
    C = TF(chi[...], clo[...])
    bo = TF(bohi[...], bolo[...])
    xe = TF(xehi[...], xelo[...])
    r = tfm.sub(bo, _mm(A, xe))
    r = tfm.sub(r, _mm(C, _shift(xe, 1, T, down=False)))
    xo = _mm(invD, r)
    xohi[...], xolo[...] = xo.hi, xo.lo


def _block_inv_kernel(dhi, dlo, ivhi, ivlo, *, Db: int):
    invD = _block_inv(TF(dhi[...], dlo[...]), Db)
    ivhi[...], ivlo[...] = invD.hi, invD.lo


def _init_A_kernel(uhi, ulo, ahi, alo, *, T: int):
    A = _shift(_transpose_blocks(TF(uhi[...], ulo[...])), 1, T, down=True)
    ahi[...], alo[...] = A.hi, A.lo


def _solve_kernel(ehi, elo, fhi, flo, ivhi, ivlo, bhi, blo,
                  xhi, xlo, *, Db: int, T: int):
    """K rhs columns over all chains: replay the stored eliminations on
    the rhs (levels as a fori_loop), then x = invD b. rhs (Db, K, CT)."""
    L = _num_levels(T)
    b0 = TF(bhi[...], blo[...])

    def level(lev, b):
        s = jax.lax.shift_left(jnp.int32(1), jnp.int32(lev))
        r = pl.ds(lev * Db, Db)
        E = TF(ehi[r], elo[r])
        F = TF(fhi[r], flo[r])
        return tfm.normalize(
            tfm.add_sloppy(
                b,
                tfm.add_sloppy(_mm(E, _shift(b, s, T, down=True)),
                               _mm(F, _shift(b, s, T, down=False))),
            )
        )

    b = (
        jax.lax.fori_loop(jnp.int32(0), jnp.int32(L), level, b0)
        if L > 0
        else b0
    )
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


def _chunk_group(C: int, T: int, Db: int) -> int:
    """Chains per kernel call: each call's lane axis is group*T, chosen so
    (a) Db*Db*group*T stays inside the per-call VMEM budget, (b) the lane
    axis is 128-aligned, and (c) no more padding than the problem needs
    (group never exceeds the next power of two above C unless alignment
    demands it). Callers pad C to a multiple of the group with decoupled
    identity chains."""
    assert ppcr_supported(T, Db)
    budget = max(1, _LANE_ELEMS_MAX // (Db * Db * T))
    g2 = 1
    while g2 * 2 <= budget:
        g2 *= 2
    c2 = 1
    while c2 < C:
        c2 *= 2
    group = min(g2, c2)
    if T * group < 128:  # alignment floor: one 128-lane call minimum
        group = 128 // T
        # the alignment bump happens after the budget clamp: unreachable
        # for the block sizes in use (Db <= 12 -> Db*Db*128 well under
        # the lane budget), but guard against a future Db >= 17
        assert Db * Db * group * T <= _LANE_ELEMS_MAX, (Db, T, group)
    return group


def _ppcr_factor_impl(D: TF, U: TF, interpret=None, group=None,
                      compact=False, n_cr=None):
    """Factor C independent block-tridiagonal systems.

    D, U: TF of shape (C, T, Db, Db) (same convention as solver/pcr.py:
    identity/zero padded to a power-of-two T, U[:, T-1] = 0). Chains are
    processed in lane-budgeted chunks of `_chunk_group(C, T, Db)` chains per
    kernel call (C padded up with decoupled identity chains); factors
    keep the padded lane count — the solve pads its rhs to match.
    ``group`` overrides the chunk size (the vmap rules pick one that
    divides the folded chain count). With ``compact`` the first
    `_cr_schedule` levels run as compacting cyclic reduction (lane width
    halves per level — ~1/log2(T) of PCR's block work) and the return
    type is :class:`CRFactors`. ``n_cr`` overrides the compaction-level
    count (the vmap rule passes the UNBATCHED schedule: custom_vmap
    requires the rule's output pytree to match the primal's unbatched
    trace, and the folded lane width would otherwise admit more levels —
    a (100 x 4-chain, T=64) Monte-Carlo batch traced 3 levels folded vs
    1 unbatched and failed the structure check). A forced count never
    exceeds the folded schedule, so lane alignment still holds.
    """
    C, T, Db, _ = D.hi.shape
    if interpret is None:
        interpret = _interpret_default()
    if group is None:
        group = _chunk_group(C, T, Db)
    extra = (-C) % group
    if extra:
        eye = jnp.broadcast_to(
            jnp.eye(Db, dtype=jnp.float32), (extra, T, Db, Db)
        )
        zb = jnp.zeros((extra, T, Db, Db), jnp.float32)
        D = TF(jnp.concatenate([D.hi, eye]), jnp.concatenate([D.lo, zb]))
        U = TF(jnp.concatenate([U.hi, zb]), jnp.concatenate([U.lo, zb]))
        C = C + extra
    CTc = group * T  # lanes per chunk
    if n_cr is None:
        n_cr = _cr_schedule(T, CTc) if compact else 0
    else:
        assert n_cr <= (_cr_schedule(T, CTc) if compact else 0), (
            "forced compaction depth exceeds the feasible schedule",
            n_cr, T, CTc,
        )
    Tb, CTb = T >> n_cr, CTc >> n_cr  # base-case chain length / width
    levels = _num_levels(Tb)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    def shp(w):
        return jax.ShapeDtypeStruct((Db, Db, w), jnp.float32)

    init_call = pl.pallas_call(
        functools.partial(_init_A_kernel, T=T),
        in_specs=[_vspec()] * 2,
        out_specs=(_vspec(), _vspec()),
        out_shape=(shp(CTc), shp(CTc)),
        interpret=interpret,
    )
    cr_calls = [
        pl.pallas_call(
            functools.partial(_cr_level_kernel, Db=Db, T=T >> l),
            in_specs=[smem] + [_vspec()] * 6,
            out_specs=(_vspec(),) * 12,
            out_shape=(shp(CTc >> l),) * 12,
            interpret=interpret,
        )
        for l in range(n_cr)
    ]
    level_call = pl.pallas_call(
        functools.partial(_factor_level_kernel, Db=Db, T=Tb),
        in_specs=[smem] + [_vspec()] * 6,
        out_specs=(_vspec(),) * 10,
        out_shape=(shp(CTb),) * 10,
        interpret=interpret,
    )
    level2_call = pl.pallas_call(
        functools.partial(_factor_level2_kernel, Db=Db, T=Tb),
        in_specs=[smem] + [_vspec()] * 6,
        out_specs=(_vspec(),) * 14,
        out_shape=(shp(CTb),) * 14,
        interpret=interpret,
    )
    # dual-level launches halve the factor's launch count; the extra
    # held (E1, F1) outputs only fit the VMEM budget for 2D block sizes
    fuse2 = Db <= 8

    inv_call = pl.pallas_call(
        functools.partial(_block_inv_kernel, Db=Db),
        in_specs=[_vspec()] * 2,
        out_specs=(_vspec(), _vspec()),
        out_shape=(shp(CTb), shp(CTb)),
        interpret=interpret,
    )

    Ehs, Els, Fhs, Fls, IVhs, IVls = [], [], [], [], [], []
    cr_store = [[] for _ in range(n_cr)]  # per level: list of CRLevel
    s1 = jnp.asarray([1], jnp.int32)
    with tfm.no_barriers():
        for c0 in range(0, C, group):
            Dc = TF(D.hi[c0:c0 + group], D.lo[c0:c0 + group])
            Uc = TF(U.hi[c0:c0 + group], U.lo[c0:c0 + group])
            dhi, dlo = _to_lanes(Dc.hi), _to_lanes(Dc.lo)
            uhi, ulo = _to_lanes(Uc.hi), _to_lanes(Uc.lo)
            if T > 1:
                ahi, alo = init_call(uhi, ulo)
                chi, clo = uhi, ulo
                for l in range(n_cr):
                    (ehi, elo, fhi, flo, ivhi, ivlo, d2hi, d2lo,
                     a2hi, a2lo, c2hi, c2lo) = cr_calls[l](
                        s1, dhi, dlo, ahi, alo, chi, clo
                    )
                    cr_store[l].append(CRLevel(
                        E=TF(_even_lanes(ehi), _even_lanes(elo)),
                        F=TF(_even_lanes(fhi), _even_lanes(flo)),
                        invD=TF(_odd_lanes(ivhi), _odd_lanes(ivlo)),
                        A=TF(_odd_lanes(ahi), _odd_lanes(alo)),
                        C=TF(_odd_lanes(chi), _odd_lanes(clo)),
                    ))
                    dhi, dlo = _even_lanes(d2hi), _even_lanes(d2lo)
                    ahi, alo = _even_lanes(a2hi), _even_lanes(a2lo)
                    chi, clo = _even_lanes(c2hi), _even_lanes(c2lo)
            if levels > 0:
                Es, Fs = [], []
                lev = 0
                while lev < levels:
                    sarg = jnp.asarray([1 << lev], jnp.int32)
                    if fuse2 and lev + 1 < levels:
                        (e1hi, e1lo, f1hi, f1lo,
                         e2hi, e2lo, f2hi, f2lo,
                         dhi, dlo, ahi, alo, chi, clo) = level2_call(
                            sarg, dhi, dlo, ahi, alo, chi, clo
                        )
                        Es.append((e1hi, e1lo))
                        Fs.append((f1hi, f1lo))
                        Es.append((e2hi, e2lo))
                        Fs.append((f2hi, f2lo))
                        lev += 2
                    else:
                        (ehi, elo, fhi, flo, dhi, dlo,
                         ahi, alo, chi, clo) = level_call(
                            sarg, dhi, dlo, ahi, alo, chi, clo
                        )
                        Es.append((ehi, elo))
                        Fs.append((fhi, flo))
                        lev += 1
                Ehs.append(jnp.concatenate([e[0] for e in Es], axis=0))
                Els.append(jnp.concatenate([e[1] for e in Es], axis=0))
                Fhs.append(jnp.concatenate([f[0] for f in Fs], axis=0))
                Fls.append(jnp.concatenate([f[1] for f in Fs], axis=0))
            else:  # Tb == 1: no levels; 1-level zero pad keeps shapes static
                z = jnp.zeros((Db, Db, CTb), jnp.float32)
                Ehs.append(z); Els.append(z); Fhs.append(z); Fls.append(z)
            ivhi, ivlo = inv_call(dhi, dlo)
            IVhs.append(ivhi)
            IVls.append(ivlo)

    def cat(parts):
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts, -1)

    base = PPCRFactors(
        E=TF(cat(Ehs), cat(Els)),
        F=TF(cat(Fhs), cat(Fls)),
        invD=TF(cat(IVhs), cat(IVls)),
    )
    if n_cr == 0:
        return base
    cat_lv = [
        jax.tree_util.tree_map(lambda *p: cat(list(p)), *cr_store[l])
        for l in range(n_cr)
    ]
    return CRFactors(levels=tuple(cat_lv), base=base)


def _cr_solve_impl(factors: CRFactors, rhs: TF, interpret=None,
                   group=None) -> TF:
    """Solve through compacting-CR factors; rhs TF (C, T, Db, K).

    Mirrors `_ppcr_solve_impl`'s chunk/K tiling: per chunk, the rhs runs
    the CR reductions (lane width halving per level, the odd-row rhs
    saved for back-substitution), the base PCR replay on the compacted
    remainder, then the back-substitution sweep re-interleaving the
    eliminated rows."""
    C, T, Db, K = rhs.hi.shape
    if interpret is None:
        interpret = _interpret_default()
    n_cr = len(factors.levels)
    CT = factors.base.invD.hi.shape[-1] << n_cr  # fine chunk-padded lanes
    if CT != C * T:  # factor was chain-padded: pad the rhs to match
        extra = CT // T - C
        z = jnp.zeros((extra, T, Db, K), jnp.float32)
        rhs = TF(jnp.concatenate([rhs.hi, z]), jnp.concatenate([rhs.lo, z]))
    Corig, C = C, CT // T
    if group is None:
        group = _chunk_group(C, T, Db)
    extra = (-C) % group
    if extra:
        # factors whose lane padding was stripped (the custom_vmap rules
        # return per-trial views): restore chunk alignment with
        # decoupled identity chains (identity at every CR level: E=F=0
        # so reductions add nothing, invD=I / A=C=0 so back-substitution
        # passes the — zero — rhs through) + zero rhs
        cat = lambda a, p: jnp.concatenate([a, p], -1)
        lv_padded = []
        for l in range(n_cr):
            w = extra * (T >> (l + 1))
            z = jnp.zeros((Db, Db, w), jnp.float32)
            eye = jnp.broadcast_to(
                jnp.eye(Db, dtype=jnp.float32)[:, :, None], (Db, Db, w)
            )
            pad = CRLevel(E=TF(z, z), F=TF(z, z), invD=TF(eye, z),
                          A=TF(z, z), C=TF(z, z))
            lv_padded.append(
                jax.tree_util.tree_map(cat, factors.levels[l], pad)
            )
        base_pad = _identity_factor_lanes(
            factors.base.E.hi.shape[0], Db, extra * (T >> n_cr)
        )
        factors = CRFactors(
            levels=tuple(lv_padded),
            base=jax.tree_util.tree_map(cat, factors.base, base_pad),
        )
        z = jnp.zeros((extra, T, Db, K), jnp.float32)
        rhs = TF(jnp.concatenate([rhs.hi, z]), jnp.concatenate([rhs.lo, z]))
        C += extra
        CT = C * T
    CTc = group * T
    CTb = CTc >> n_cr
    Tb = T >> n_cr
    n_chunks = CT // CTc
    Kc = max(1, min(K, (256 << 10) // (Db * CTc * 4)))

    bhi = jnp.transpose(rhs.hi, (2, 3, 0, 1)).reshape(Db, K, CT)
    blo = jnp.transpose(rhs.lo, (2, 3, 0, 1)).reshape(Db, K, CT)

    def cr_reduce(lv4, beh, bel, boh, bol, l):
        kk, W = beh.shape[1], beh.shape[-1]
        shp = jax.ShapeDtypeStruct((Db, kk, W), jnp.float32)
        with tfm.no_barriers():
            return pl.pallas_call(
                functools.partial(_cr_reduce_kernel, Db=Db, T=T >> (l + 1)),
                in_specs=[_vspec()] * 8,
                out_specs=(_vspec(), _vspec()),
                out_shape=(shp, shp),
                interpret=interpret,
            )(*lv4, beh, bel, boh, bol)

    def cr_backsub(lv6, boh, bol, xeh, xel, l):
        kk, W = boh.shape[1], boh.shape[-1]
        shp = jax.ShapeDtypeStruct((Db, kk, W), jnp.float32)
        with tfm.no_barriers():
            return pl.pallas_call(
                functools.partial(_cr_backsub_kernel, Db=Db, T=T >> (l + 1)),
                in_specs=[_vspec()] * 10,
                out_specs=(_vspec(), _vspec()),
                out_shape=(shp, shp),
                interpret=interpret,
            )(*lv6, boh, bol, xeh, xel)

    def base_launch(efslices, bh, bl):
        kk = bh.shape[1]
        shp = jax.ShapeDtypeStruct((Db, kk, CTb), jnp.float32)
        with tfm.no_barriers():
            return pl.pallas_call(
                functools.partial(_solve_kernel, Db=Db, T=Tb),
                in_specs=[_vspec()] * 8,
                out_specs=(_vspec(), _vspec()),
                out_shape=(shp, shp),
                interpret=interpret,
            )(*efslices, bh, bl)

    base = factors.base
    outs_hi = [[] for _ in range(n_chunks)]
    outs_lo = [[] for _ in range(n_chunks)]
    for ci in range(n_chunks):
        slb = slice(ci * CTb, (ci + 1) * CTb)
        ef = (
            base.E.hi[:, :, slb], base.E.lo[:, :, slb],
            base.F.hi[:, :, slb], base.F.lo[:, :, slb],
            base.invD.hi[:, :, slb], base.invD.lo[:, :, slb],
        )
        for k0 in range(0, K, Kc):
            k1 = min(K, k0 + Kc)
            bh = bhi[:, k0:k1, ci * CTc:(ci + 1) * CTc]
            bl = blo[:, k0:k1, ci * CTc:(ci + 1) * CTc]
            saved = []
            for l in range(n_cr):
                Wc = CTc >> (l + 1)
                sl = slice(ci * Wc, (ci + 1) * Wc)
                lv = factors.levels[l]
                beh, bel = _even_lanes(bh), _even_lanes(bl)
                boh, bol = _odd_lanes(bh), _odd_lanes(bl)
                saved.append((boh, bol))
                bh, bl = cr_reduce(
                    (lv.E.hi[:, :, sl], lv.E.lo[:, :, sl],
                     lv.F.hi[:, :, sl], lv.F.lo[:, :, sl]),
                    beh, bel, boh, bol, l,
                )
            xh, xl = base_launch(ef, bh, bl)
            for l in reversed(range(n_cr)):
                Wc = CTc >> (l + 1)
                sl = slice(ci * Wc, (ci + 1) * Wc)
                lv = factors.levels[l]
                boh, bol = saved[l]
                xoh, xol = cr_backsub(
                    (lv.invD.hi[:, :, sl], lv.invD.lo[:, :, sl],
                     lv.A.hi[:, :, sl], lv.A.lo[:, :, sl],
                     lv.C.hi[:, :, sl], lv.C.lo[:, :, sl]),
                    boh, bol, xh, xl, l,
                )
                xh = _interleave_lanes(xh, xoh)
                xl = _interleave_lanes(xl, xol)
            outs_hi[ci].append(xh)
            outs_lo[ci].append(xl)

    def cat_k(parts):
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts, 1)

    xhi = jnp.concatenate([cat_k(p) for p in outs_hi], axis=-1) \
        if n_chunks > 1 else cat_k(outs_hi[0])
    xlo = jnp.concatenate([cat_k(p) for p in outs_lo], axis=-1) \
        if n_chunks > 1 else cat_k(outs_lo[0])
    xhi = jnp.transpose(xhi.reshape(Db, K, C, T), (2, 3, 0, 1))[:Corig]
    xlo = jnp.transpose(xlo.reshape(Db, K, C, T), (2, 3, 0, 1))[:Corig]
    return TF(xhi, xlo)


def _ppcr_solve_impl(factors: PPCRFactors, rhs: TF, interpret=None,
                     group=None) -> TF:
    """Solve for rhs TF of shape (C, T, Db, K); returns the same shape.

    Chains are chunked exactly like the factorization (reading each
    chunk's E/F lane slice); wide panels (the chain-arrow coupling
    solves, K = A up to ~900 on multi-robot problems) are additionally
    chunked along K so the VMEM-resident rhs stays ~2 MB per launch."""
    C, T, Db, K = rhs.hi.shape
    if interpret is None:
        interpret = _interpret_default()
    CTf = factors.invD.hi.shape[-1]  # factor lane count (chunk-padded)
    if CTf != C * T:  # factor was chain-padded: pad the rhs to match
        extra = CTf // T - C
        z = jnp.zeros((extra, T, Db, K), jnp.float32)
        rhs = TF(jnp.concatenate([rhs.hi, z]), jnp.concatenate([rhs.lo, z]))
    Corig, C = C, CTf // T
    CT = C * T
    if group is None:
        group = _chunk_group(C, T, Db)
    extra = (-C) % group
    if extra:
        # factors whose lane padding was stripped (the custom_vmap rules
        # return per-trial views): restore chunk alignment with
        # decoupled identity chains + zero rhs
        pad = _identity_factor_lanes(factors.E.hi.shape[0], Db, extra * T)
        factors = jax.tree_util.tree_map(
            lambda a, p: jnp.concatenate([a, p], -1), factors, pad
        )
        z = jnp.zeros((extra, T, Db, K), jnp.float32)
        rhs = TF(jnp.concatenate([rhs.hi, z]), jnp.concatenate([rhs.lo, z]))
        C += extra
        CT = C * T
    CTc = group * T
    # rhs-chunk budget: two-float _mm internals keep ~15 live temporaries
    # of the (Db, Kc, CTc) operand size, so the operand itself must stay
    # ~0.4 MB to hold the kernel stack under the 16 MB VMEM limit
    # (measured: Kc=85 at CTc=1024 needs 36.8 MB; Kc=16 with L=7
    # factors resident still peaked 16.57 MB)
    Kc = max(1, min(K, (256 << 10) // (Db * CTc * 4)))

    bhi = jnp.transpose(rhs.hi, (2, 3, 0, 1)).reshape(Db, K, CT)
    blo = jnp.transpose(rhs.lo, (2, 3, 0, 1)).reshape(Db, K, CT)

    def launch(efslices, bh, bl):
        kk = bh.shape[1]
        shp = jax.ShapeDtypeStruct((Db, kk, CTc), jnp.float32)
        with tfm.no_barriers():
            return pl.pallas_call(
                functools.partial(_solve_kernel, Db=Db, T=T),
                in_specs=[_vspec()] * 8,
                out_specs=(_vspec(), _vspec()),
                out_shape=(shp, shp),
                interpret=interpret,
            )(*efslices, bh, bl)

    outs_hi = [[] for _ in range(0, CT, CTc)]
    outs_lo = [[] for _ in range(0, CT, CTc)]
    for ci, l0 in enumerate(range(0, CT, CTc)):
        sl = slice(l0, l0 + CTc)
        efslices = (
            factors.E.hi[:, :, sl], factors.E.lo[:, :, sl],
            factors.F.hi[:, :, sl], factors.F.lo[:, :, sl],
            factors.invD.hi[:, :, sl], factors.invD.lo[:, :, sl],
        )
        for k0 in range(0, K, Kc):
            k1 = min(K, k0 + Kc)
            xh, xl = launch(efslices, bhi[:, k0:k1, sl], blo[:, k0:k1, sl])
            outs_hi[ci].append(xh)
            outs_lo[ci].append(xl)

    def cat_k(parts):
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts, 1)

    xhi = jnp.concatenate([cat_k(p) for p in outs_hi], axis=-1) \
        if len(outs_hi) > 1 else cat_k(outs_hi[0])
    xlo = jnp.concatenate([cat_k(p) for p in outs_lo], axis=-1) \
        if len(outs_lo) > 1 else cat_k(outs_lo[0])
    xhi = jnp.transpose(xhi.reshape(Db, K, C, T), (2, 3, 0, 1))[:Corig]
    xlo = jnp.transpose(xlo.reshape(Db, K, C, T), (2, 3, 0, 1))[:Corig]
    return TF(xhi, xlo)


# ------------------------------------------------------------------ #
# Batch (vmap) support: fold the batch axis into the chain-lane axis
# ------------------------------------------------------------------ #
#
# This toolchain rejects gridded pallas_call, so jax's default vmap rule
# for pallas_call (which adds a grid axis) cannot work here. But the
# kernels already treat chains as fully independent lanes, so a batch of
# B same-structure problems x C chains IS just B*C chains: the
# custom_vmap rules below reshape the batch into the chain axis
# (trial-major lane order), call the same gridless kernels once at the
# FULL budget chunk size (launch count scales with total lanes / budget,
# not with the trial count — a 100-trial batch of 4-chain worlds runs
# 16-chain chunks, not 100 x 4-chain calls), and unfold. Alignment
# padding happens at the folded level: identity chains appended after
# all trials, sliced off before the per-trial reshape. This is what
# makes the mixed-precision band vmappable for Monte-Carlo batches
# (parallel/batch.py) on TPU.


def _identity_factor_lanes(L_Db: int, Db: int, lanes: int):
    """PPCRFactors lane-padding: decoupled identity chains (E = F = 0,
    invD = I) solve to zero for zero rhs."""
    z = jnp.zeros((L_Db, Db, lanes), jnp.float32)
    eye = jnp.broadcast_to(
        jnp.eye(Db, dtype=jnp.float32)[:, :, None], (Db, Db, lanes)
    )
    zi = jnp.zeros((Db, Db, lanes), jnp.float32)
    return PPCRFactors(E=TF(z, z), F=TF(z, z), invD=TF(eye, zi))


def _bcast_leaves(tree, flags, B):
    """Broadcast any unbatched leaves of `tree` to a leading B axis."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    flag_leaves = jax.tree_util.tree_leaves(flags)
    out = [
        leaf if batched else jnp.broadcast_to(leaf[None], (B,) + leaf.shape)
        for leaf, batched in zip(leaves, flag_leaves)
    ]
    return jax.tree_util.tree_unflatten(treedef, out)


@jax.custom_batching.custom_vmap
def _ppcr_factor_vmappable(D: TF, U: TF):
    return _ppcr_factor_impl(D, U, None, compact=True)


@_ppcr_factor_vmappable.def_vmap
def _ppcr_factor_vmap_rule(axis_size, in_batched, D, U):
    B = axis_size
    D = _bcast_leaves(D, in_batched[0], B)
    U = _bcast_leaves(U, in_batched[1], B)
    _, C, T, Db, _ = D.hi.shape
    fold = lambda a: a.reshape((B * C,) + a.shape[2:])
    # the impl pads the folded chain count to its own (budget-sized)
    # chunk group with identity chains; slice those off before the
    # per-trial unfold (lane order is trial-major: chain = b*C + c).
    # Compaction composes with the fold: every factor leaf is lane-major
    # with chain-contiguous (hence trial-contiguous) lanes, just at a
    # level-dependent width W = padded_fine >> k — stride-2 halving
    # preserves trial-major order because T is a power of two — so each
    # leaf unfolds by its own width ratio (pad chains sit at the end at
    # every level: proportional prefix slice drops them).
    # The compaction DEPTH must be the unbatched schedule, not the folded
    # one: custom_vmap requires this rule's output pytree to match the
    # primal traced on per-element avals (which sees the unbatched lane
    # width). The folded width always admits at least as many levels, so
    # the forced depth stays feasible.
    n_cr_u = _cr_schedule(T, _chunk_group(C, T, Db) * T)
    f = _ppcr_factor_impl(
        TF(fold(D.hi), fold(D.lo)), TF(fold(U.hi), fold(U.lo)), None,
        compact=True, n_cr=n_cr_u,
    )
    padded_fine = (
        f.base.invD.hi.shape[-1] << len(f.levels)
        if isinstance(f, CRFactors) else f.invD.hi.shape[-1]
    )

    def unfold(a):
        keep = (B * C * T * a.shape[-1]) // padded_fine
        return jnp.moveaxis(
            a[..., :keep].reshape(a.shape[0], a.shape[1], B, keep // B),
            2, 0,
        )

    out = jax.tree_util.tree_map(unfold, f)
    return out, jax.tree_util.tree_map(lambda _: True, out)


@jax.custom_batching.custom_vmap
def _ppcr_solve_vmappable(factors, rhs: TF) -> TF:
    if isinstance(factors, CRFactors):
        return _cr_solve_impl(factors, rhs, None)
    return _ppcr_solve_impl(factors, rhs, None)


@_ppcr_solve_vmappable.def_vmap
def _ppcr_solve_vmap_rule(axis_size, in_batched, factors, rhs):
    B = axis_size
    factors = _bcast_leaves(factors, in_batched[0], B)
    rhs = _bcast_leaves(rhs, in_batched[1], B)
    _, C, T, Db, K = rhs.hi.shape
    if isinstance(factors, CRFactors):
        # refold each leaf at its own width (trial-major lane order) and
        # let _cr_solve_impl's identity padding restore chunk alignment
        fold_f = lambda a: jnp.moveaxis(a, 0, 2).reshape(
            a.shape[1], a.shape[2], -1
        )
        ff = jax.tree_util.tree_map(fold_f, factors)
        rf = TF(
            rhs.hi.reshape((B * C,) + rhs.hi.shape[2:]),
            rhs.lo.reshape((B * C,) + rhs.lo.shape[2:]),
        )
        x = _cr_solve_impl(ff, rf, None)
        out = jax.tree_util.tree_map(
            lambda a: a.reshape((B, C) + a.shape[1:]), x
        )
        return out, jax.tree_util.tree_map(lambda _: True, out)
    CT = factors.invD.hi.shape[-1]  # per-trial lane count (= C*T)
    fold_f = lambda a: jnp.moveaxis(a, 0, 2).reshape(
        a.shape[1], a.shape[2], B * CT
    )
    ff = jax.tree_util.tree_map(fold_f, factors)
    fold_r = lambda a: a.reshape((B * C,) + a.shape[2:])
    rf = TF(fold_r(rhs.hi), fold_r(rhs.lo))
    # the impl chunk-aligns the folded batch itself (identity-chain
    # factor lanes + zero rhs chains) and slices back to B*C
    x = _ppcr_solve_impl(ff, rf, None)
    unfold = lambda a: a.reshape((B, C) + a.shape[1:])
    out = jax.tree_util.tree_map(unfold, x)
    return out, jax.tree_util.tree_map(lambda _: True, out)


def ppcr_factor_pallas(D: TF, U: TF, interpret=None):
    """Public factor entry: vmappable (batch folds into the chain axis).
    Returns :class:`CRFactors` (compaction preamble + PCR base) when
    `_cr_schedule` finds room — under vmap the kernels run at the FOLDED
    lane width but the compaction DEPTH is pinned to the unbatched
    schedule (custom_vmap's structure contract; see
    `_ppcr_factor_vmap_rule`) — else plain :class:`PPCRFactors`. An
    explicit ``interpret`` bypasses the custom_vmap wrapper (tests)."""
    if interpret is None:
        return _ppcr_factor_vmappable(D, U)
    return _ppcr_factor_impl(D, U, interpret, compact=True)


def ppcr_solve_pallas(factors, rhs: TF, interpret=None) -> TF:
    """Public solve entry: vmappable (batch folds into the chain axis).
    Accepts either factors type. An explicit ``interpret`` bypasses the
    custom_vmap wrapper (tests)."""
    if interpret is None:
        return _ppcr_solve_vmappable(factors, rhs)
    if isinstance(factors, CRFactors):
        return _cr_solve_impl(factors, rhs, interpret)
    return _ppcr_solve_impl(factors, rhs, interpret)


# ------------------------------------------------------------------ #
# Segmented band: chains too long for one VMEM-resident factorization
# ------------------------------------------------------------------ #
#
# A Db-wide chain fits the fused kernels only while Db*Db*T stays inside
# the per-call budget — 3D pose blocks (Db = 12) cap out at T = 256.
# Longer chains are handled by block substructuring (SPIKE-style): split
# each chain into S segments of Ts = the largest supported power of two;
# the segment INTERIORS are independent block-tridiagonal pseudo-chains
# (factored lane-parallel by the same kernels), and the S interface
# blocks (the first block of each segment) form a new length-S
# block-tridiagonal chain whose blocks are Schur complements through the
# interiors:
#
#   Shat_k      = D_{g_k} - U_{g_k} Z^L_k[0] - U_{m_k}' Z^R_{k-1}[m]
#   Uhat_k      = - U_{g_k}... (coupling g_k -> g_{k+1} through seg k)
#   (g_k = k Ts, m_k = (k+1) Ts - 1; Z^{L,R} = interior^{-1} B^{L,R},
#    B^L one nonzero row U_{g_k}' at the first interior row, B^R one
#    nonzero row U_{m_k} at the last)
#
# The interface chain is tiny (S = T / Ts, e.g. 4) and is factored with
# the jnp two-float PCR. A solve is: interior pre-solve (Pallas) ->
# interface reduction -> interface solve -> interior correction with the
# stored Z panels. Everything is static reshapes + the existing public
# (vmappable) kernel entries, so the segmented band composes with vmap.


class SegPPCRFactors(NamedTuple):
    """Factors of a segmented band (see module comment above)."""

    interior: PPCRFactors  # pseudo-chains (C*S, Tsp) at Db
    ZL: jnp.ndarray  # (C, S, Tsp, Db, Db) f64 interior^{-1} B^L
    ZR: jnp.ndarray  # (C, S, Tsp, Db, Db)
    iface: "object"  # pcr_tf factors of the (C, S) interface chain
    UgL: jnp.ndarray  # (C, S, Db, Db) U_{g_k} (interface -> first interior)
    UmR: jnp.ndarray  # (C, S, Db, Db) U_{m_k} (last interior -> interface)


def seg_lengths(T: int, Db: int):
    """(Ts, S) for a segmented factorization of length-T chains, or None
    when the plain kernels already fit / no supported segment exists."""
    if ppcr_supported(T, Db):
        return None
    Ts = 1
    while Ts * 2 <= T and ppcr_supported(Ts * 2, Db):
        Ts *= 2
    if Ts < 8 or T % Ts != 0:
        return None
    return Ts, T // Ts


def seg_factor_pallas(D: TF, U: TF, Ts: int) -> SegPPCRFactors:
    """Factor (C, T, Db, Db) two-float chains via segment substructuring.

    T must be a multiple of Ts (both powers of two, as produced by
    pcr_pad_length). Interface work runs in jnp two-float; Z panels and
    Schur products drop to f64 (same compromise as the chain-arrow
    coupling panels — the IPM's refinement sees true residuals).
    """
    from score_tpu.solver.pcr_tf import pcr_factor_tf

    C, T, Db, _ = D.hi.shape
    S = T // Ts
    Tsp = Ts  # interior length Ts-1 padded back up to Ts (power of two)

    def seg_view(a):
        return a.reshape(C, S, Ts, Db, Db)

    Dsg = jax.tree_util.tree_map(seg_view, D)
    Usg = jax.tree_util.tree_map(seg_view, U)

    # interface blocks g_k = k*Ts
    Dg = TF(Dsg.hi[:, :, 0], Dsg.lo[:, :, 0])  # (C, S, Db, Db)
    UgL = Usg.hi[:, :, 0].astype(jnp.float64) + Usg.lo[:, :, 0]  # U_{g_k}
    UmR = (
        Usg.hi[:, :, Ts - 1].astype(jnp.float64) + Usg.lo[:, :, Ts - 1]
    )  # U_{m_k}; the last segment's is the zero chain terminator

    # interiors: nodes kTs+1 .. kTs+Ts-1, padded with one identity slot
    eye = jnp.broadcast_to(jnp.eye(Db, dtype=jnp.float32), (C, S, 1, Db, Db))
    zero = jnp.zeros((C, S, 1, Db, Db), jnp.float32)
    Di = TF(
        jnp.concatenate([Dsg.hi[:, :, 1:], eye], 2),
        jnp.concatenate([Dsg.lo[:, :, 1:], zero], 2),
    )
    # interior off-diagonals: U at kTs+1 .. kTs+Ts-2; the one at Ts-1
    # couples to the NEXT interface and is cut here
    Ui = TF(
        jnp.concatenate([Usg.hi[:, :, 1 : Ts - 1], zero, zero], 2),
        jnp.concatenate([Usg.lo[:, :, 1 : Ts - 1], zero, zero], 2),
    )
    fold = lambda a: a.reshape(C * S, Tsp, Db, Db)
    interior = ppcr_factor_pallas(
        jax.tree_util.tree_map(fold, Di), jax.tree_util.tree_map(fold, Ui)
    )

    # spike panels: B^L row 0 = U_{g_k}', B^R row Ts-2 = U_{m_k}
    B = jnp.zeros((C, S, Tsp, Db, 2 * Db), jnp.float32)
    B = B.at[:, :, 0, :, :Db].set(
        jnp.swapaxes(Usg.hi[:, :, 0], -1, -2)
    )
    B = B.at[:, :, Ts - 2, :, Db:].set(Usg.hi[:, :, Ts - 1])
    Blo = jnp.zeros_like(B)
    Blo = Blo.at[:, :, 0, :, :Db].set(
        jnp.swapaxes(Usg.lo[:, :, 0], -1, -2)
    )
    Blo = Blo.at[:, :, Ts - 2, :, Db:].set(Usg.lo[:, :, Ts - 1])
    Z = ppcr_solve_pallas(
        interior, TF(B.reshape(C * S, Tsp, Db, 2 * Db),
                     Blo.reshape(C * S, Tsp, Db, 2 * Db))
    )
    Zf = tfm.to_f64(Z).reshape(C, S, Tsp, Db, 2 * Db)
    ZL, ZR = Zf[..., :Db], Zf[..., Db:]

    # interface Schur chain (f64 assembly, two-float factorization)
    Dg64 = Dg.hi.astype(jnp.float64) + Dg.lo
    Shat = Dg64 - jnp.einsum("csij,csjk->csik", UgL, ZL[:, :, 0])
    # right-spike contribution of the PREVIOUS segment onto g_k (k>=1)
    prevR = jnp.einsum(
        "csji,csjk->csik", UmR[:, :-1], ZR[:, :-1, Ts - 2]
    )
    Shat = Shat.at[:, 1:].add(-prevR)
    # interface off-diagonal g_k -> g_{k+1} through segment k:
    # -(B^L)' Z^R = -U_{g_k} Z^R[0]
    Uhat = -jnp.einsum("csij,csjk->csik", UgL[:, :-1], ZR[:, :-1, 0])
    Uhat = jnp.concatenate(
        [Uhat, jnp.zeros((C, 1, Db, Db), jnp.float64)], 1
    )
    iface = jax.vmap(pcr_factor_tf)(tfm.from_f64(Shat), tfm.from_f64(Uhat))

    return SegPPCRFactors(
        interior=interior, ZL=ZL, ZR=ZR, iface=iface, UgL=UgL, UmR=UmR
    )


def seg_solve_pallas(factors: SegPPCRFactors, rhs: TF) -> TF:
    """Solve through a segmented factorization; rhs (C, T, Db, K)."""
    from score_tpu.solver.pcr_tf import pcr_solve_tf

    C, T, Db, K = rhs.hi.shape
    S = factors.ZL.shape[1]
    Ts = T // S
    Tsp = factors.ZL.shape[2]

    seg = lambda a: a.reshape(C, S, Ts, Db, K)
    bs = jax.tree_util.tree_map(seg, rhs)
    bg = bs.hi[:, :, 0].astype(jnp.float64) + bs.lo[:, :, 0]  # (C,S,Db,K)
    zero = jnp.zeros((C, S, 1, Db, K), jnp.float32)
    bi = TF(
        jnp.concatenate([bs.hi[:, :, 1:], zero], 2),
        jnp.concatenate([bs.lo[:, :, 1:], zero], 2),
    )
    fold = lambda a: a.reshape(C * S, Tsp, Db, K)
    w = ppcr_solve_pallas(factors.interior, jax.tree_util.tree_map(fold, bi))
    w64 = tfm.to_f64(w).reshape(C, S, Tsp, Db, K)

    # interface rhs reduction
    rg = bg - jnp.einsum("csij,csjk->csik", factors.UgL, w64[:, :, 0])
    rg = rg.at[:, 1:].add(
        -jnp.einsum(
            "csji,csjk->csik", factors.UmR[:, :-1], w64[:, :-1, Ts - 2]
        )
    )
    y = tfm.to_f64(
        jax.vmap(pcr_solve_tf)(factors.iface, tfm.from_f64(rg))
    )  # (C, S, Db, K)

    # interior correction: x_I = w - Z^L y_k - Z^R y_{k+1}
    ynext = jnp.concatenate(
        [y[:, 1:], jnp.zeros((C, 1, Db, K), jnp.float64)], 1
    )
    xI = (
        w64
        - jnp.einsum("cstij,csjk->cstik", factors.ZL, y)
        - jnp.einsum("cstij,csjk->cstik", factors.ZR, ynext)
    )

    x = jnp.concatenate([y[:, :, None], xI[:, :, : Ts - 1]], 2)
    x = x.reshape(C, T, Db, K)
    return tfm.from_f64(x)
