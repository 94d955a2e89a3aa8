"""Parity: shard_map-wrapped Pallas band vs unsharded, CPU 8-dev mesh."""
import os

flags = [
    f
    for f in os.environ.get("XLA_FLAGS", "").split()
    if "xla_force_host_platform_device_count" not in f
]
os.environ["XLA_FLAGS"] = " ".join(
    flags + ["--xla_force_host_platform_device_count=8"]
)
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"

from types import SimpleNamespace

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from score_tpu.ops import twofloat as tfm
from score_tpu.ops.pallas_pcr import ppcr_factor_pallas, ppcr_solve_pallas
from score_tpu.solver.chain_arrow import _shmap_ppcr_factor, _shmap_ppcr_solve

C, T, D = 8, 8, 6
rng = np.random.default_rng(0)
Dg = rng.normal(size=(C, T, D, D))
Dg = Dg @ Dg.transpose(0, 1, 3, 2) + 10.0 * np.eye(D)
Ug = 0.3 * rng.normal(size=(C, T, D, D))
Ug[:, -1] = 0.0
B = rng.normal(size=(C, T, D, 3))

Dj = jnp.asarray(Dg)
Uj = jnp.asarray(Ug)
Bj = jnp.asarray(B)

mesh = Mesh(np.array(jax.devices()), ("chains",))
st = SimpleNamespace(shard_mesh=mesh, shard_axis="chains")


@jax.jit
def plain(Dj, Uj, Bj):
    f = ppcr_factor_pallas(tfm.from_f64(Dj), tfm.from_f64(Uj))
    return tfm.to_f64(ppcr_solve_pallas(f, tfm.from_f64(Bj)))


@jax.jit
def sharded(Dj, Uj, Bj):
    f = _shmap_ppcr_factor(st, tfm.from_f64(Dj), tfm.from_f64(Uj))
    return tfm.to_f64(_shmap_ppcr_solve(st, f, tfm.from_f64(Bj)))


zp = np.asarray(plain(Dj, Uj, Bj))
zs = np.asarray(sharded(Dj, Uj, Bj))
print("plain norm", np.linalg.norm(zp))
print("sharded norm", np.linalg.norm(zs))
print("rel err", np.linalg.norm(zp - zs) / np.linalg.norm(zp))
