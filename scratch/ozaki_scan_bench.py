"""Device-accurate timing of the robot20-scale arrow-phase pieces:
Schur einsum (emulated f64) vs exact-MM, cross_aa einsum vs onehot path,
f64 Cholesky + triangular solves at A=258. Each piece runs REPS times in
one jitted carry-dependent lax.scan; per-call = (wall - empty)/REPS."""

import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

REPS = 30

from score_tpu.ops import ozaki  # noqa: E402

rng = np.random.default_rng(0)
C, Tp, D, A = 20, 128, 6, 258
K = C * Tp * D
Bp = jnp.asarray(rng.standard_normal((C, Tp, D, A)))
Z = jnp.asarray(rng.standard_normal((C, Tp, D, A)))
M = rng.standard_normal((A, A))
S = jnp.asarray(M @ M.T + A * np.eye(A))
r = jnp.asarray(rng.standard_normal((A,)))

m, NTB, d = 2351, 129, 2
oh_a = jnp.asarray(np.eye(NTB)[rng.integers(0, NTB, m)])
oh_b = jnp.asarray(np.eye(NTB)[rng.integers(0, NTB, m)])
H = jnp.asarray(rng.standard_normal((m, d, d)))

x0 = jnp.asarray(0.0)


def scan_over(body):
    def wrapped(c0):
        def step(c, _):
            out = body(1.0 + 1e-12 * c)
            s = sum(jnp.sum(jnp.abs(l)) for l in jax.tree_util.tree_leaves(out))
            return 1e-15 * s, None
        c, _ = jax.lax.scan(step, c0, None, length=REPS)
        return c
    return jax.jit(wrapped)


def timed(name, body):
    f = scan_over(body)
    f(x0)  # compile
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(f(x0))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best*1e3/REPS:.3f} ms/call (total {best*1e3:.1f} ms)",
          flush=True)


timed("empty", lambda sc: sc)
timed("schur_einsum_f64", lambda sc: jnp.einsum("ctia,ctib->ab", Bp * sc, Z))
timed("schur_mm_exact", lambda sc: ozaki.mm_f64(
    (Bp * sc).reshape(K, A), Z.reshape(K, A)))
timed("crossaa_einsum_f64", lambda sc: jnp.einsum(
    "ma,mb,mij->aibj", oh_a, oh_b, H * sc))
timed("crossaa_onehot_exact", lambda sc: ozaki.onehot_pair_contract(
    oh_a, oh_b, H * sc))
timed("cholesky_f64_258", lambda sc: jnp.linalg.cholesky(S * sc))
L = jnp.linalg.cholesky(S)
timed("trisolve_f64_258", lambda sc: jax.scipy.linalg.solve_triangular(
    L, r * sc, lower=True))
timed("schur_plus_chol", lambda sc: jnp.linalg.cholesky(
    S * sc - 1e-6 * jnp.einsum("ctia,ctib->ab", Bp, Z)))
print("SCAN_BENCH_DONE", flush=True)
