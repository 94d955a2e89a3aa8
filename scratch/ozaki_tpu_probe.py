"""On-TPU validation of the exact split-f32 (Ozaki) matmul path.

Run through the serial TPU queue (scratch/tpu_queue.sh). Checks, in one
process (one compile budget):
  1. tunnel health (tiny jit + scalar fetch),
  2. mm_f64 at robot20 Schur shape vs a host-numpy f64 reference,
  3. onehot_pair_contract vs host reference,
  4. timing: mm_f64 vs the emulated-f64 einsum at the same shape.
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

# 1. tunnel probe
t0 = time.time()
x = jax.jit(lambda a: a * 2 + 1)(jnp.ones((8, 128)))
print("probe ok", float(x.ravel()[0]), jax.default_backend(), f"{time.time()-t0:.1f}s", flush=True)

from score_tpu.ops import ozaki  # noqa: E402

rng = np.random.default_rng(0)
K, M = 15360, 258
X = rng.standard_normal((K, M)) * 10.0 ** rng.uniform(-4, 4, (1, M))
Y = rng.standard_normal((K, M)) * 10.0 ** rng.uniform(-4, 4, (1, M))
ref = X.T @ Y

mm = jax.jit(ozaki.mm_f64)
ein = jax.jit(lambda a, b: jnp.einsum("km,kn->mn", a, b))

Xd, Yd = jnp.asarray(X), jnp.asarray(Y)
t0 = time.time()
out = np.asarray(mm(Xd, Yd))
print(f"mm_f64 compile+run {time.time()-t0:.1f}s", flush=True)
rel = np.abs(out - ref) / np.outer(np.linalg.norm(X, axis=0), np.linalg.norm(Y, axis=0))
print("mm_f64 normwise rel err:", rel.max(), flush=True)

t0 = time.time()
oute = np.asarray(ein(Xd, Yd))
print(f"einsum f64 compile+run {time.time()-t0:.1f}s", flush=True)
rele = np.abs(oute - ref) / np.outer(np.linalg.norm(X, axis=0), np.linalg.norm(Y, axis=0))
print("einsum-f64(emulated) normwise rel err:", rele.max(), flush=True)

# timings (warm, forced completion by scalar fetch)
for name, f in [("mm_f64", mm), ("einsum_f64", ein)]:
    times = []
    for _ in range(5):
        t0 = time.time()
        r = f(Xd, Yd)
        _ = float(r.ravel()[0])
        times.append(time.time() - t0)
    print(f"{name} warm best {min(times)*1e3:.2f} ms times={[f'{t*1e3:.1f}' for t in times]}", flush=True)

# onehot pair contract at robot20 shape
m, A, d = 2351, 129, 2
oh_a = np.eye(A)[rng.integers(0, A, m)]
oh_b = np.eye(A)[rng.integers(0, A, m)]
H = rng.standard_normal((m, d, d)) * 10.0 ** rng.uniform(-3, 3, (m, 1, 1))
ref3 = np.einsum("ma,mb,mij->aibj", oh_a, oh_b, H)
oh = jax.jit(ozaki.onehot_pair_contract)
t0 = time.time()
out3 = np.asarray(oh(jnp.asarray(oh_a), jnp.asarray(oh_b), jnp.asarray(H)))
print(f"onehot compile+run {time.time()-t0:.1f}s rel err:",
      np.abs(out3 - ref3).max() / np.abs(ref3).max(), flush=True)
print("PROBE_DONE", flush=True)
