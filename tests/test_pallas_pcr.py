"""Fused Pallas two-float PCR kernels vs dense references.

Interpret mode on CPU verifies the ALGORITHM (levels, masked rolls,
chain folding, K-chunking); the rigorous two-float precision cannot be
asserted here because XLA:CPU contracts mul->add chains into FMAs inside
fused loops — ignoring optimization barriers — which degrades EFT-based
arithmetic to ~f32 (measured: ``x*y - c`` compiles to an fma; a pinned
``s = p1 + p2`` rounds differently from its operands). The bounds below
are therefore f32-grade; the 2^-47-grade contract is enforced on TPU,
where Mosaic performs no such contraction (verified on-device)."""

import numpy as np

import jax.numpy as jnp

from score_tpu.ops import twofloat as tfm
from score_tpu.ops.pallas_pcr import ppcr_factor_pallas, ppcr_solve_pallas
from tests.test_pcr_tf import _block_tridiag, _dense


def _solve_pallas(D, U, rhs):
    fac = ppcr_factor_pallas(
        tfm.from_f64(jnp.asarray(D)), tfm.from_f64(jnp.asarray(U)),
        interpret=True,
    )
    x = ppcr_solve_pallas(fac, tfm.from_f64(jnp.asarray(rhs)), interpret=True)
    return np.asarray(tfm.to_f64(x))


def test_pallas_pcr_matches_dense():
    T, Db = 16, 4
    D, U = _block_tridiag(T, Db, 0)
    rhs = np.random.default_rng(1).standard_normal((T, Db, 2))
    x = _solve_pallas(D[None], U[None], rhs[None])[0]
    K = _dense(D, U)
    xref = np.linalg.solve(K, rhs.reshape(T * Db, 2))
    assert np.max(np.abs(x.reshape(T * Db, 2) - xref)) / np.max(np.abs(xref)) < 1e-6


def test_pallas_pcr_illconditioned():
    T, Db = 32, 4
    D, U = _block_tridiag(T, Db, 2, cond=1e8)
    rhs = np.random.default_rng(3).standard_normal((T, Db, 1))
    x = _solve_pallas(D[None], U[None], rhs[None])[0].reshape(-1)
    K = _dense(D, U)
    xref = np.linalg.solve(K, rhs.reshape(-1))
    assert np.linalg.norm(x - xref) / np.linalg.norm(xref) < 2e-4


def test_pallas_pcr_multichain_padded():
    # two chains, one carrying identity padding in its tail (like the
    # backend's power-of-two padding of unequal chains)
    T, Db = 8, 3
    D0, U0 = _block_tridiag(T, Db, 4)
    D1, U1 = _block_tridiag(T, Db, 5)
    # chain 1: only first 5 blocks active, rest decoupled identity
    D1[5:] = np.eye(Db)
    U1[4:] = 0.0
    D = np.stack([D0, D1])
    U = np.stack([U0, U1])
    rhs = np.random.default_rng(6).standard_normal((2, T, Db, 1))
    x = _solve_pallas(D, U, rhs)
    for c in range(2):
        K = _dense(D[c], U[c])
        xref = np.linalg.solve(K, rhs[c].reshape(-1))
        err = np.linalg.norm(x[c].reshape(-1) - xref) / np.linalg.norm(xref)
        assert err < 1e-6, (c, err)


def test_pallas_pcr_single_block():
    Db = 4
    D, U = _block_tridiag(1, Db, 7)
    rhs = np.random.default_rng(8).standard_normal((1, Db, 1))
    x = _solve_pallas(D[None], U[None], rhs[None])[0]
    xref = np.linalg.solve(D[0], rhs[0])
    assert np.max(np.abs(x[0] - xref)) / np.max(np.abs(xref)) < 1e-6


def test_pallas_pcr_vmap_folds_batch_into_lanes(monkeypatch):
    """The custom_vmap rules fold a batch of trials into the chain-lane
    axis (parallel/batch.py's mixed-band path); results must match
    per-trial unbatched calls."""
    import jax

    # pin compaction OFF so single and vmapped calls run the identical
    # elimination order (CR differs from PCR at roundoff on odd rows) —
    # keeps the 1e-9 parity bound meaningful under any env override
    from score_tpu.ops import pallas_pcr as pp

    monkeypatch.setattr(pp, "_CR_MIN_LANES", 1 << 30)

    T, Db, B, C = 8, 3, 3, 2
    rng = np.random.default_rng(7)
    Ds, Us, Rs = [], [], []
    for b in range(B):
        chains = [_block_tridiag(T, Db, 10 * b + c) for c in range(C)]
        Ds.append(np.stack([c[0] for c in chains]))
        Us.append(np.stack([c[1] for c in chains]))
        Rs.append(rng.standard_normal((C, T, Db, 2)))
    Db_ = jnp.asarray(np.stack(Ds))
    Ub_ = jnp.asarray(np.stack(Us))
    Rb_ = jnp.asarray(np.stack(Rs))

    def solve_one(D, U, R):
        fac = ppcr_factor_pallas(tfm.from_f64(D), tfm.from_f64(U))
        return tfm.to_f64(ppcr_solve_pallas(fac, tfm.from_f64(R)))

    # interpret mode is the CPU default (_interpret_default); the public
    # entries route through the custom_vmap wrappers when vmapped
    batched = np.asarray(jax.vmap(solve_one)(Db_, Ub_, Rb_))
    for b in range(B):
        single = np.asarray(solve_one(Db_[b], Ub_[b], Rb_[b]))
        assert np.max(np.abs(batched[b] - single)) < 1e-9, b


def test_cr_compaction_matches_dense(monkeypatch):
    """Compacting-CR preamble (lane width halves per level, shift stays
    1, base PCR on the remainder): active once the chunk width clears
    the (patched) lane floor, exact same solutions as dense."""
    from score_tpu.ops import pallas_pcr as pp

    monkeypatch.setattr(pp, "_CR_MIN_LANES", 4)
    T, Db = 32, 3
    D, U = _block_tridiag(T, Db, 11)
    rhs = np.random.default_rng(12).standard_normal((T, Db, 2))
    fac = ppcr_factor_pallas(
        tfm.from_f64(jnp.asarray(D[None])), tfm.from_f64(jnp.asarray(U[None])),
        interpret=True,
    )
    assert isinstance(fac, pp.CRFactors) and len(fac.levels) >= 2
    x = np.asarray(tfm.to_f64(ppcr_solve_pallas(
        fac, tfm.from_f64(jnp.asarray(rhs[None])), interpret=True
    )))[0]
    K = _dense(D, U)
    xref = np.linalg.solve(K, rhs.reshape(T * Db, 2))
    err = np.max(np.abs(x.reshape(T * Db, 2) - xref)) / np.max(np.abs(xref))
    assert err < 1e-6, err
    # and against the non-compacted PCR path on the same inputs
    fac0 = pp._ppcr_factor_impl(
        tfm.from_f64(jnp.asarray(D[None])), tfm.from_f64(jnp.asarray(U[None])),
        interpret=True, compact=False,
    )
    x0 = np.asarray(tfm.to_f64(pp._ppcr_solve_impl(
        fac0, tfm.from_f64(jnp.asarray(rhs[None])), interpret=True
    )))[0]
    # paths differ in odd-row treatment (back-substitution vs continued
    # reduction): agreement is roundoff-grade, f32-grade on CPU (see
    # module docstring on XLA:CPU FMA contraction)
    assert np.max(np.abs(x - x0)) < 1e-7


def test_cr_compaction_multichain_chunked(monkeypatch):
    """CR with chain padding + multiple lane chunks (forced group=2 over
    3 chains): per-chunk compaction, per-level lane slicing in the
    solve, identity-pad chains inert."""
    from score_tpu.ops import pallas_pcr as pp

    monkeypatch.setattr(pp, "_CR_MIN_LANES", 4)
    T, Db, C = 8, 3, 3
    chains = [_block_tridiag(T, Db, 20 + c) for c in range(C)]
    D = np.stack([c[0] for c in chains])
    U = np.stack([c[1] for c in chains])
    rhs = np.random.default_rng(21).standard_normal((C, T, Db, 2))
    fac = pp._ppcr_factor_impl(
        tfm.from_f64(jnp.asarray(D)), tfm.from_f64(jnp.asarray(U)),
        interpret=True, group=2, compact=True,
    )
    assert isinstance(fac, pp.CRFactors) and len(fac.levels) >= 1
    x = np.asarray(tfm.to_f64(pp._cr_solve_impl(
        fac, tfm.from_f64(jnp.asarray(rhs)), interpret=True, group=2
    )))
    for c in range(C):
        K = _dense(D[c], U[c])
        xref = np.linalg.solve(K, rhs[c].reshape(T * Db, 2))
        err = np.max(np.abs(x[c].reshape(T * Db, 2) - xref)) / np.max(
            np.abs(xref)
        )
        assert err < 1e-6, (c, err)


def test_cr_compaction_illconditioned(monkeypatch):
    from score_tpu.ops import pallas_pcr as pp

    monkeypatch.setattr(pp, "_CR_MIN_LANES", 4)
    T, Db = 32, 4
    D, U = _block_tridiag(T, Db, 2, cond=1e8)
    rhs = np.random.default_rng(3).standard_normal((T, Db, 1))
    fac = ppcr_factor_pallas(
        tfm.from_f64(jnp.asarray(D[None])), tfm.from_f64(jnp.asarray(U[None])),
        interpret=True,
    )
    assert isinstance(fac, pp.CRFactors)
    x = np.asarray(tfm.to_f64(ppcr_solve_pallas(
        fac, tfm.from_f64(jnp.asarray(rhs[None])), interpret=True
    )))[0].reshape(-1)
    K = _dense(D, U)
    xref = np.linalg.solve(K, rhs.reshape(-1))
    assert np.linalg.norm(x - xref) / np.linalg.norm(xref) < 2e-4


def test_cr_compaction_vmapped(monkeypatch):
    """Compaction composes with the batch fold: under vmap the schedule
    sees the FOLDED lane width, the factor rule returns (batched)
    CRFactors with level-dependent leaf widths, and the solve rule
    refolds them per leaf — with B*C=6 chains at a chunk group of 16 the
    identity re-padding path is exercised too. Per-trial results must
    match dense solves; base_T compacts all the way to 1 here."""
    import jax

    from score_tpu.ops import pallas_pcr as pp

    monkeypatch.setattr(pp, "_CR_MIN_LANES", 4)
    T, Db, B, C = 8, 3, 3, 2
    rng = np.random.default_rng(31)
    Ds, Us, Rs = [], [], []
    for b in range(B):
        chains = [_block_tridiag(T, Db, 40 + 10 * b + c) for c in range(C)]
        Ds.append(np.stack([c[0] for c in chains]))
        Us.append(np.stack([c[1] for c in chains]))
        Rs.append(rng.standard_normal((C, T, Db, 2)))
    Db_, Ub_, Rb_ = (jnp.asarray(np.stack(a)) for a in (Ds, Us, Rs))

    facs = jax.vmap(
        lambda D, U: ppcr_factor_pallas(tfm.from_f64(D), tfm.from_f64(U))
    )(Db_, Ub_)
    assert isinstance(facs, pp.CRFactors) and len(facs.levels) >= 2
    # level leaves carry a leading trial axis and halving lane widths
    w0 = facs.levels[0].E.hi.shape
    assert w0[0] == B and w0[-1] == C * T // 2, w0

    x = np.asarray(tfm.to_f64(jax.vmap(ppcr_solve_pallas)(
        facs, tfm.from_f64(Rb_)
    )))
    for b in range(B):
        for c in range(C):
            K = _dense(Ds[b][c], Us[b][c])
            xref = np.linalg.solve(K, Rs[b][c].reshape(T * Db, 2))
            err = np.max(np.abs(x[b, c].reshape(T * Db, 2) - xref))
            assert err / np.max(np.abs(xref)) < 1e-6, (b, c, err)


def test_segmented_band_matches_dense():
    """SPIKE-style substructuring (the 3D fast path for chains whose
    Db*Db*T exceeds the per-kernel VMEM budget): interiors through the
    fused kernels, interfaces through the two-float jnp PCR."""
    from score_tpu.ops.pallas_pcr import (
        seg_factor_pallas,
        seg_lengths,
        seg_solve_pallas,
    )

    # budget constants make real 3D cases (Db=12, T=1024 -> Ts=256) too
    # slow for interpret mode; algebra is block-size independent
    assert seg_lengths(1024, 12) == (256, 4)

    T, Db, C = 32, 3, 2
    D0, U0 = _block_tridiag(T, Db, 0)
    D1, U1 = _block_tridiag(T, Db, 1)
    D = np.stack([D0, D1])
    U = np.stack([U0, U1])
    rhs = np.random.default_rng(2).standard_normal((C, T, Db, 2))
    fac = seg_factor_pallas(
        tfm.from_f64(jnp.asarray(D)), tfm.from_f64(jnp.asarray(U)), Ts=8
    )
    x = np.asarray(tfm.to_f64(seg_solve_pallas(fac, tfm.from_f64(jnp.asarray(rhs)))))
    for c in range(C):
        K = _dense(D[c], U[c])
        xref = np.linalg.solve(K, rhs[c].reshape(T * Db, 2))
        err = np.max(np.abs(x[c].reshape(T * Db, 2) - xref)) / np.max(
            np.abs(xref)
        )
        assert err < 1e-6, (c, err)


def test_cr_vmap_depth_matches_unbatched_trace():
    """Regression: custom_vmap requires the rule's output pytree to match
    the primal traced on UNBATCHED avals. At Monte-Carlo-bench shapes
    (T=64, small C, large B) the folded lane width admits more compaction
    levels than the unbatched width, which used to make the factor rule
    return a deeper CRFactors (3 levels vs 1) and fail the structure
    check at trace time. The rule now forces the unbatched schedule;
    vmapped solves must equal the per-trial calls bit-for-bit (same
    depth => identical elimination order per lane)."""
    import jax

    T, Db, B, C, K = 64, 3, 25, 4, 2
    rng = np.random.default_rng(7)
    Ds, Us, Rs = [], [], []
    for b in range(B):
        chains = [_block_tridiag(T, Db, 100 + 10 * b + c) for c in range(C)]
        Ds.append(np.stack([c[0] for c in chains]))
        Us.append(np.stack([c[1] for c in chains]))
        Rs.append(rng.standard_normal((C, T, Db, K)))
    Db_, Ub_, Rb_ = (jnp.asarray(np.stack(a)) for a in (Ds, Us, Rs))

    def solve_one(D, U, R):
        f = ppcr_factor_pallas(tfm.from_f64(D), tfm.from_f64(U))
        return tfm.to_f64(ppcr_solve_pallas(f, tfm.from_f64(R)))

    xb = np.asarray(jax.vmap(solve_one)(Db_, Ub_, Rb_))
    for b in (0, B // 2, B - 1):
        x1 = np.asarray(solve_one(Db_[b], Ub_[b], Rb_[b]))
        np.testing.assert_array_equal(xb[b], x1)
        Kd = _dense(Ds[b][0], Us[b][0])
        xref = np.linalg.solve(Kd, Rs[b][0].reshape(T * Db, K))
        err = np.max(np.abs(xb[b, 0].reshape(T * Db, K) - xref))
        assert err / np.max(np.abs(xref)) < 1e-6, (b, err)
