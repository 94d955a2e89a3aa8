"""Error-free-transform primitives (solver/dd.py).

The compensated cone algebra is what holds the IPM endgame accuracy on
both CPU f64 and the TPU's 24-bit-mantissa f64 emulation; these tests pin
the exactness contracts the solver relies on.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from score_tpu.solver import dd


def test_two_sum_exact_f32():
    rng = np.random.default_rng(0)
    a = rng.standard_normal(4096).astype(np.float32)
    b = (rng.standard_normal(4096) * 1e-6).astype(np.float32)
    s, e = jax.jit(dd.two_sum)(jnp.asarray(a), jnp.asarray(b))
    total = np.asarray(s, dtype=np.float64) + np.asarray(e, dtype=np.float64)
    exact = a.astype(np.float64) + b.astype(np.float64)
    np.testing.assert_array_equal(total, exact)


def test_two_prod_exact_f32():
    rng = np.random.default_rng(1)
    a = rng.standard_normal(4096).astype(np.float32)
    b = rng.standard_normal(4096).astype(np.float32)
    p, e = jax.jit(dd.two_prod)(jnp.asarray(a), jnp.asarray(b))
    total = np.asarray(p, dtype=np.float64) + np.asarray(e, dtype=np.float64)
    exact = a.astype(np.float64) * b.astype(np.float64)
    np.testing.assert_array_equal(total, exact)


def test_signed_sumsq_compensates_near_boundary_f32():
    # u0^2 - ||u1||^2 with u near the cone boundary: the naive form loses
    # everything to cancellation in f32; the compensated form keeps ~2^-48.
    rng = np.random.default_rng(2)
    u1 = rng.standard_normal((64, 3))
    r = np.linalg.norm(u1, axis=1)
    resid = 1e-9 * (1.0 + rng.random(64))
    u0 = np.sqrt(r**2 + resid)
    u = np.concatenate([u0[:, None], u1], axis=1)
    uf = jnp.asarray(u.astype(np.float32))
    # reference residual of the STORED f32 values, computed in f64
    u64 = np.asarray(uf, dtype=np.float64)
    exact = u64[:, 0] ** 2 - np.sum(u64[:, 1:] ** 2, axis=1)
    got = np.asarray(jax.jit(dd.signed_sumsq)(uf), dtype=np.float64)
    naive = np.asarray(
        jax.jit(lambda v: v[:, 0] ** 2 - jnp.sum(v[:, 1:] ** 2, axis=1))(uf),
        dtype=np.float64,
    )
    err_comp = np.abs(got - exact)
    err_naive = np.abs(naive - exact)
    # compensated: near-exact; naive: dominated by f32 rounding of O(1) terms
    assert np.max(err_comp) < 1e-12
    assert np.median(err_naive[err_naive > 0]) > 1e-9


def test_dot_compensated_beats_naive_f32():
    rng = np.random.default_rng(3)
    # ill-conditioned dot: huge cancellation
    a = np.concatenate([rng.standard_normal(512) * 1e4, rng.standard_normal(512)])
    b = np.concatenate([rng.standard_normal(512) * 1e4, rng.standard_normal(512)])
    af = jnp.asarray(a.astype(np.float32)).reshape(1, -1)
    bf = jnp.asarray(b.astype(np.float32)).reshape(1, -1)
    a64 = np.asarray(af, dtype=np.float64)[0]
    b64 = np.asarray(bf, dtype=np.float64)[0]
    exact = float(a64 @ b64)
    got = float(np.asarray(jax.jit(dd.dot)(af, bf))[0])
    naive = float(np.asarray(jax.jit(lambda x, y: jnp.sum(x * y, -1))(af, bf))[0])
    # compensated: error-sum accumulation is plain f32, so the bound is
    # ~eps32 of the error mass, not eps32^2 of the total — still orders
    # of magnitude better than the naive sum on this cancellation-heavy case
    assert abs(got - exact) < 0.05 * abs(naive - exact)
    assert abs(got - exact) / max(1.0, abs(exact)) < 1e-7


def test_effective_nmant_override(monkeypatch):
    monkeypatch.setenv("SCORE_TPU_F64_NMANT", "23")
    assert dd._effective_nmant(jnp.float64) == 23
    monkeypatch.delenv("SCORE_TPU_F64_NMANT")
    # CPU backend: nominal f64 precision
    if jax.default_backend() == "cpu":
        assert dd._effective_nmant(jnp.float64) == 52
    assert dd._effective_nmant(jnp.float32) == 23


def test_two_prod_exact_in_24bit_f64_domain(monkeypatch):
    """Simulate the axon arithmetic's value domain: f64 inputs truncated to
    24-bit mantissas. With the matching split constant, two_prod must
    reproduce the product exactly (pairwise half-products stay exact)."""
    monkeypatch.setenv("SCORE_TPU_F64_NMANT", "23")
    rng = np.random.default_rng(4)
    a = rng.standard_normal(2048).astype(np.float32).astype(np.float64)
    b = rng.standard_normal(2048).astype(np.float32).astype(np.float64)
    p, e = jax.jit(dd.two_prod)(jnp.asarray(a), jnp.asarray(b))
    total = np.asarray(p) + np.asarray(e)
    np.testing.assert_array_equal(total, a * b)
