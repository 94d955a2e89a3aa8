"""Dissect the frozen 20-robot endgame state: which Newton row is
inaccurate, and which cones dominate it."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from score_tpu.assembly.conic import build_conic_problem
from score_tpu.assembly.normalize import normalize_factor_graph
from score_tpu.sim.manhattan import ManhattanWorldParams, simulate_manhattan_world
from score_tpu.solver.chain_arrow import ChainArrowBackend, build_chain_arrow
from score_tpu.solver import cones
from score_tpu.solver import ipm as I

sim = ManhattanWorldParams(
    num_robots=20, num_poses_per_robot=100, num_landmarks=10,
    grid_size=30, range_measure_prob=0.25,
    inter_robot_measure_prob=0.05, seed=20,
)
fg = simulate_manhattan_world(sim)
fg, _ = normalize_factor_graph(fg)
problem, idx = build_conic_problem(fg, "SOCP")
aux = build_chain_arrow(problem, idx)
backend = ChainArrowBackend
params = I.IPMParams(max_iter=60)

state_ops = backend.prepare(problem, aux)
st0 = I._make_initial_state(backend, problem, state_ops, params)
adv = jax.jit(lambda s: I._advance(backend, problem, state_ops, params, s))

NIT = int(sys.argv[1]) if len(sys.argv) > 1 else 14
t0 = time.time()
s = st0
for i in range(NIT):
    s = adv(s)
jax.block_until_ready(s.x)
print(f"{NIT} iterations in {time.time()-t0:.1f}s; it={int(s.it)}", flush=True)

x, sv, z = s.x, s.s, s.z
N = problem.num_cones
gap = cones.inner(sv, z)
mu = gap / N
print(f"gap={float(gap):.3e} mu={float(mu):.3e}")

# cone centrality spectrum
detp = np.asarray(cones.soc_residual(sv) * cones.soc_residual(z))
ratio = detp / float(mu) ** 2
order = np.argsort(ratio)
print("worst cones by detprod/mu^2:", [(int(i), f"{ratio[i]:.2e}") for i in order[:6]])
pg = np.asarray(cones.percone_inner(sv, z))
print("their percone gap/mu:", [f"{pg[i]/float(mu):.2e}" for i in order[:6]])
print("largest percone gap/mu:", np.sort(pg / float(mu))[-6:])

# build one combined-direction solve exactly as _step does
nt = cones.nt_scaling(sv, z)
lam = cones.apply_W(nt, z)
Winv2 = cones.winv2_matrices(nt)
factors = backend.factor(problem, state_ops, Winv2, params)
rx, rz = I._residuals(backend, problem, state_ops, x, sv, z)


def condensed(rx_, rz_, d):
    v = cones.apply_W(nt, cones.jordan_solve(lam, d))
    rzv = rz_ + v
    wrz = jnp.einsum("mij,mj->mi", Winv2, rzv)
    rhs = state_ops.mask * (-(rx_) - backend.GT(problem, state_ops, wrz))
    dx = backend.solve(problem, state_ops, factors, rhs, params)
    Gdx = backend.G(problem, state_ops, dx)
    dz = jnp.einsum("mij,mj->mi", Winv2, Gdx + rzv)
    ds = -rz_ - Gdx
    return dx, ds, dz


def resid(rx_, rz_, d, dx, ds, dz):
    f1 = state_ops.mask * (
        -(rx_) - backend.P_matvec(state_ops, dx)
        - backend.GT(problem, state_ops, dz)
    )
    f2 = -(rz_) - backend.G(problem, state_ops, dx) - ds
    f3 = d - cones.jordan_mul(
        lam, cones.apply_Winv(nt, ds) + cones.apply_W(nt, dz)
    )
    return f1, f2, f3


e = cones.soc_identity(N, problem.k, x.dtype)
d_aff = -cones.jordan_mul(lam, lam)
names = {}
dx_a, ds_a, dz_a = condensed(rx, rz, d_aff)
names["affine(raw)"] = (rx, rz, d_aff, dx_a, ds_a, dz_a)

d_c = mu * e - cones.jordan_mul(lam, lam)
zx, zz = jnp.zeros_like(rx), jnp.zeros_like(rz)
dx_c, ds_c, dz_c = condensed(zx, zz, d_c)
names["centering(raw)"] = (zx, zz, d_c, dx_c, ds_c, dz_c)

for name, (rx_, rz_, d, dx, ds, dz) in names.items():
    f1, f2, f3 = resid(rx_, rz_, d, dx, ds, dz)
    f3n = np.asarray(jnp.linalg.norm(f3, axis=1))
    worst3 = np.argsort(f3n)[-4:]
    print(
        f"{name}: |f1|={float(jnp.linalg.norm(f1)):.2e} "
        f"|f2|={float(jnp.linalg.norm(f2)):.2e} "
        f"|f3|={float(jnp.linalg.norm(f3)):.2e} "
        f"|d|={float(jnp.linalg.norm(d)):.2e} "
        f"worst f3 cones {[(int(i), f'{f3n[i]:.1e}', f'{ratio[i]:.1e}') for i in worst3]}",
        flush=True,
    )

# how inaccurate is the plain KKT solve itself? K dx = rhs residual
v = cones.apply_W(nt, cones.jordan_solve(lam, d_aff))
rzv = rz + v
wrz = jnp.einsum("mij,mj->mi", Winv2, rzv)
rhs = state_ops.mask * (-(rx) - backend.GT(problem, state_ops, wrz))
dx1 = backend.solve(problem, state_ops, factors, rhs, params)
Gv = backend.G(problem, state_ops, dx1)
Kdx = backend.P_matvec(state_ops, dx1) + backend.GT(
    problem, state_ops, jnp.einsum("mij,mj->mi", Winv2, Gv)
)
kres = float(jnp.linalg.norm(state_ops.mask * (rhs - Kdx)))
print(f"KKT solve: |rhs|={float(jnp.linalg.norm(rhs)):.3e} |K dx - rhs|={kres:.3e}")
w2 = np.asarray(Winv2)
eigs = np.linalg.eigvalsh(w2)
print(f"Winv2 eig range: min={eigs.min():.2e} max={eigs.max():.2e}")
