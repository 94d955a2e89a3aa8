"""Double-f32 arithmetic (ops/twofloat.py): precision contracts.

Effective precision target ~2^-45 relative (the module promises ~2^-47
for single ops; compounding in div/sqrt/matmul relaxes a couple bits).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from score_tpu.ops import twofloat as tfm


def _rand(shape, seed, spread=0.0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal(shape)
    if spread:
        x = x * 10.0 ** rng.uniform(-spread, spread, size=shape)
    return x


def _relerr(got_tf, exact):
    got = np.asarray(tfm.to_f64(got_tf))
    return np.max(np.abs(got - exact) / np.maximum(np.abs(exact), 1e-300))


def test_roundtrip():
    x = _rand(4096, 0, spread=6)
    t = tfm.from_f64(jnp.asarray(x))
    back = np.asarray(tfm.to_f64(t))
    rel = np.abs(back - x) / np.abs(x)
    assert rel.max() < 2.0**-45


@pytest.mark.parametrize(
    "op,ref",
    [
        (tfm.add, lambda a, b: a + b),
        (tfm.sub, lambda a, b: a - b),
        (tfm.mul, lambda a, b: a * b),
        (tfm.div, lambda a, b: a / b),
    ],
)
def test_binary_ops(op, ref):
    a = _rand(8192, 1, spread=4)
    b = _rand(8192, 2, spread=4)
    ta, tb = tfm.from_f64(jnp.asarray(a)), tfm.from_f64(jnp.asarray(b))
    # exact reference on the values actually represented
    a64 = np.asarray(tfm.to_f64(ta))
    b64 = np.asarray(tfm.to_f64(tb))
    exact = ref(a64, b64)
    got = jax.jit(op)(ta, tb)
    # additive cancellation makes relative error unbounded for add/sub;
    # measure against the operand scale instead
    scale = np.maximum(np.abs(a64) + np.abs(b64), np.abs(exact))
    err = np.abs(np.asarray(tfm.to_f64(got)) - exact) / scale
    assert err.max() < 2.0**-44


def test_sqrt():
    a = np.abs(_rand(8192, 3, spread=6)) + 1e-10
    ta = tfm.from_f64(jnp.asarray(a))
    exact = np.sqrt(np.asarray(tfm.to_f64(ta)))
    assert _relerr(jax.jit(tfm.sqrt)(ta), exact) < 2.0**-44


def test_sqrt_zero():
    t = tfm.tf(jnp.zeros(4, jnp.float32))
    out = np.asarray(tfm.to_f64(tfm.sqrt(t)))
    np.testing.assert_array_equal(out, 0.0)


def test_scale():
    a = _rand(4096, 4, spread=4)
    c = _rand(4096, 5).astype(np.float32)
    ta = tfm.from_f64(jnp.asarray(a))
    exact = np.asarray(tfm.to_f64(ta)) * c.astype(np.float64)
    assert _relerr(jax.jit(tfm.scale)(ta, jnp.asarray(c)), exact) < 2.0**-44


def test_matmul_small_blocks():
    A = _rand((17, 6, 6), 6, spread=2)
    B = _rand((17, 6, 6), 7, spread=2)
    tA, tB = tfm.from_f64(jnp.asarray(A)), tfm.from_f64(jnp.asarray(B))
    A64 = np.asarray(tfm.to_f64(tA))
    B64 = np.asarray(tfm.to_f64(tB))
    exact = A64 @ B64
    got = np.asarray(tfm.to_f64(jax.jit(tfm.matmul)(tA, tB)))
    scale = np.abs(A64) @ np.abs(B64) + np.abs(exact)
    assert np.max(np.abs(got - exact) / scale) < 2.0**-42


def test_where():
    a = tfm.from_f64(jnp.asarray(_rand(64, 8)))
    b = tfm.from_f64(jnp.asarray(_rand(64, 9)))
    c = jnp.arange(64) % 2 == 0
    out = tfm.where(c, a, b)
    exp = np.where(np.asarray(c), np.asarray(tfm.to_f64(a)), np.asarray(tfm.to_f64(b)))
    np.testing.assert_array_equal(np.asarray(tfm.to_f64(out)), exp)


def test_precision_beats_f32_on_illconditioned_chain():
    # emulate the failure mode that motivates the module: accumulated
    # products whose f32 evaluation loses everything
    rng = np.random.default_rng(10)
    a = rng.standard_normal(2048)
    t = tfm.from_f64(jnp.asarray(a))
    # sum of squares minus its float-inflated value: pure cancellation probe
    sq = tfm.matmul(
        tfm.TF(t.hi.reshape(1, 1, -1), t.lo.reshape(1, 1, -1)),
        tfm.TF(t.hi.reshape(1, -1, 1), t.lo.reshape(1, -1, 1)),
    )
    a64 = np.asarray(tfm.to_f64(t))
    exact = float(a64 @ a64)
    got = float(np.asarray(tfm.to_f64(sq)).ravel()[0])
    naive = float(np.float32(a64.astype(np.float32) @ a64.astype(np.float32)))
    assert abs(got - exact) / exact < 1e-11
    assert abs(got - exact) <= abs(naive - exact)
