"""Two-float cyclic reduction (solver/pcr_tf.py) vs the f64 reference."""

import numpy as np

import jax
import jax.numpy as jnp

from score_tpu.ops import twofloat as tfm
from score_tpu.solver.pcr import pcr_factor, pcr_solve
from score_tpu.solver.pcr_tf import pcr_factor_tf, pcr_solve_tf


def _block_tridiag(T, Db, seed, cond=1.0):
    """Random SPD block-tridiagonal (D, U); `cond` scales a diagonal weight
    spread to emulate the KKT band's conditioning."""
    rng = np.random.default_rng(seed)
    U = 0.3 * rng.standard_normal((T, Db, Db))
    U[-1] = 0.0
    D = np.zeros((T, Db, Db))
    w = np.logspace(0, np.log10(cond), T)
    for t in range(T):
        A = rng.standard_normal((Db, Db))
        D[t] = A @ A.T + (2.0 + 4.0 * Db) * np.eye(Db)
        D[t] *= w[t]
    return D, U


def _dense(D, U):
    T, Db = D.shape[0], D.shape[-1]
    K = np.zeros((T * Db, T * Db))
    for t in range(T):
        K[t * Db:(t + 1) * Db, t * Db:(t + 1) * Db] = D[t]
        if t < T - 1:
            K[t * Db:(t + 1) * Db, (t + 1) * Db:(t + 2) * Db] = U[t]
            K[(t + 1) * Db:(t + 2) * Db, t * Db:(t + 1) * Db] = U[t].T
    return K


def test_tf_pcr_matches_f64_well_conditioned():
    T, Db = 16, 4
    D, U = _block_tridiag(T, Db, 0)
    rhs = np.random.default_rng(1).standard_normal((T, Db, 2))
    x64 = np.asarray(pcr_solve(pcr_factor(jnp.asarray(D), jnp.asarray(U)),
                               jnp.asarray(rhs)))
    ftf = pcr_factor_tf(tfm.from_f64(jnp.asarray(D)), tfm.from_f64(jnp.asarray(U)))
    xtf = np.asarray(tfm.to_f64(pcr_solve_tf(ftf, tfm.from_f64(jnp.asarray(rhs)))))
    assert np.max(np.abs(xtf - x64)) / np.max(np.abs(x64)) < 1e-10


def test_tf_pcr_survives_illconditioned_band_where_f32_fails():
    # kappa ~ 1e8: the GOATS-band regime. f32 factorization loses
    # everything (kappa * eps32 > 1); two-float keeps ~1e-6 residuals.
    T, Db = 32, 4
    D, U = _block_tridiag(T, Db, 2, cond=1e8)
    K = _dense(D, U)
    rhs = np.random.default_rng(3).standard_normal((T, Db, 1))
    b = rhs.reshape(-1)

    # f64 reference solution
    xref = np.linalg.solve(K, b)

    # plain f32 PCR
    f32f = pcr_factor(jnp.asarray(D, jnp.float32), jnp.asarray(U, jnp.float32))
    x32 = np.asarray(pcr_solve(f32f, jnp.asarray(rhs, jnp.float32))).reshape(-1)
    err32 = np.linalg.norm(x32.astype(np.float64) - xref) / np.linalg.norm(xref)

    # two-float PCR
    ftf = pcr_factor_tf(tfm.from_f64(jnp.asarray(D)), tfm.from_f64(jnp.asarray(U)))
    xtf = np.asarray(
        tfm.to_f64(pcr_solve_tf(ftf, tfm.from_f64(jnp.asarray(rhs))))
    ).reshape(-1)
    errtf = np.linalg.norm(xtf - xref) / np.linalg.norm(xref)

    assert errtf < 1e-6
    assert errtf < 1e-3 * max(err32, 1e-30)


def test_tf_pcr_vmap_over_chains():
    T, Db, C = 8, 3, 3
    Ds, Us, rs = [], [], []
    for c in range(C):
        D, U = _block_tridiag(T, Db, 10 + c)
        Ds.append(D); Us.append(U)
        rs.append(np.random.default_rng(20 + c).standard_normal((T, Db, 1)))
    D, U, rhs = map(np.stack, (Ds, Us, rs))
    x64 = np.asarray(jax.vmap(
        lambda d, u, r: pcr_solve(pcr_factor(d, u), r)
    )(jnp.asarray(D), jnp.asarray(U), jnp.asarray(rhs)))
    xtf = np.asarray(tfm.to_f64(jax.vmap(
        lambda d, u, r: pcr_solve_tf(pcr_factor_tf(d, u), r)
    )(tfm.from_f64(jnp.asarray(D)), tfm.from_f64(jnp.asarray(U)),
      tfm.from_f64(jnp.asarray(rhs)))))
    assert np.max(np.abs(xtf - x64)) / np.max(np.abs(x64)) < 1e-9
