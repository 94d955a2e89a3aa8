"""Diagnose the 20-robot relgap ~8e-5 floor (VERDICT r2 item 1).

Runs the 20-robot Manhattan SOCP through solve_conic_traced on CPU f64
(true IEEE f64 — isolates algorithmic/conditioning floors from TPU
emulated-f64 artifacts) and prints per-iteration pres/dres/relgap.
"""
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
from score_tpu.solver.chain_arrow import (
    ChainArrowBackend,
    MixedChainArrowBackend,
    build_chain_arrow,
)
from score_tpu.solver.ipm import IPMParams, solve_conic_traced

poses = int(sys.argv[1]) if len(sys.argv) > 1 else 100
robots = int(sys.argv[2]) if len(sys.argv) > 2 else 20

sim = ManhattanWorldParams(
    num_robots=robots,
    num_poses_per_robot=poses,
    num_landmarks=10,
    grid_size=30,
    range_measure_prob=0.25,
    inter_robot_measure_prob=0.05,
    seed=20,
)
t0 = time.time()
fg = simulate_manhattan_world(sim)
print(f"simulated in {time.time()-t0:.1f}s: {fg.summary()}", flush=True)
fg, scale = normalize_factor_graph(fg)
print("normalize scale:", scale, flush=True)
problem, idx = build_conic_problem(fg, "SOCP")
st = build_chain_arrow(problem, idx)
print(
    f"structure: C={st.C} T={st.T} D={st.D} A={st.A} NTB={st.NTB} "
    f"NL={st.NL} NR={st.NR} NLC={st.NLC} n={problem.n}",
    flush=True,
)

backend = (
    MixedChainArrowBackend
    if os.environ.get("DIAG_MIXED") == "1"
    else ChainArrowBackend
)
print("backend:", backend.__name__, flush=True)
params = IPMParams(max_iter=60)
t0 = time.time()
res, metrics = solve_conic_traced(
    problem, params, num_iters=60,
    backend=backend, backend_aux=st,
)
m = np.asarray(metrics)
print(f"solve+compile {time.time()-t0:.1f}s", flush=True)
for i in range(m.shape[0]):
    pres, dres, gap, pobj, status = m[i, :5]
    alpha, frac, sigma, gr, dmin, cent, apre, nres = m[i, 5:]
    relgap = gap / max(1.0, abs(pobj))
    print(
        f"it={i:2d} pres={pres:.2e} dres={dres:.2e} "
        f"relgap={relgap:.3e} st={int(status)} | "
        f"a={alpha:.2e} frac={frac:.2f} sig={sigma:.2e} ga/g={gr:.3f} "
        f"dmin/mu2={dmin:.2e} cent={int(cent)} apre={apre:.2e} "
        f"nres={nres:.2e}",
        flush=True,
    )
    if status not in (0.0,) and i > int(res.iterations):
        break
print(
    f"final: status={int(res.status)} iters={int(res.iterations)} "
    f"pobj={float(res.pobj):.6f} gap={float(res.gap):.3e} "
    f"relgap={float(res.gap)/max(1.0,abs(float(res.pobj))):.3e} "
    f"pres={float(res.pres):.3e} dres={float(res.dres):.3e}"
)
