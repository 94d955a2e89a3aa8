"""Param sweep on the 20-robot endgame floor (CPU f64)."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from score_tpu.assembly.conic import build_conic_problem
from score_tpu.assembly.normalize import normalize_factor_graph
from score_tpu.sim.manhattan import ManhattanWorldParams, simulate_manhattan_world
from score_tpu.solver.chain_arrow import (
    ChainArrowBackend,
    MixedChainArrowBackend,
    build_chain_arrow,
)
from score_tpu.solver.ipm import IPMParams, solve_conic

sim = ManhattanWorldParams(
    num_robots=20, num_poses_per_robot=100, num_landmarks=10,
    grid_size=30, range_measure_prob=0.25,
    inter_robot_measure_prob=0.05, seed=20,
)
fg = simulate_manhattan_world(sim)
fg, scale = normalize_factor_graph(fg)
problem, idx = build_conic_problem(fg, "SOCP")
st = build_chain_arrow(problem, idx)

configs = {
    "base": IPMParams(max_iter=40),
    "kkt1": IPMParams(max_iter=40, kkt_refine_steps=1),
    "dir2": IPMParams(max_iter=40, dir_refine_steps=2),
    "gam03": IPMParams(max_iter=40, nbhd_gamma=0.3),
    "reg9+kkt1": IPMParams(max_iter=40, static_reg=1e-9, kkt_refine_steps=1),
    "dir2+kkt1": IPMParams(max_iter=40, dir_refine_steps=2, kkt_refine_steps=1),
}
backend = ChainArrowBackend
if os.environ.get("SWEEP_MIXED") == "1":
    backend = MixedChainArrowBackend

for name, p in configs.items():
    t0 = time.time()
    r = solve_conic(problem, p, backend=backend, backend_aux=st)
    rg = float(r.gap) / max(1.0, abs(float(r.pobj)))
    print(
        f"{name:12s} status={int(r.status)} it={int(r.iterations):2d} "
        f"relgap={rg:.3e} pres={float(r.pres):.2e} dres={float(r.dres):.2e} "
        f"t={time.time()-t0:.0f}s",
        flush=True,
    )
