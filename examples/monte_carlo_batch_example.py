#!/usr/bin/env python
"""Batched Monte-Carlo solving: N measurement-noise resamples of one
Manhattan world, compiled once and solved as a single vmapped interior-point
program (BASELINE north star: "100 batched Monte-Carlo trials vmapped on one
chip").

Usage: python examples/monte_carlo_batch_example.py [num_trials]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from score_tpu.assembly.conic import SOCP_RELAXATION, build_conic_problem
from score_tpu.parallel.batch import solve_conic_batch, stack_problems
from score_tpu.solver.chain_arrow import (
    ChainArrowBackend,
    MixedChainArrowBackend,
    build_chain_arrow,
)
from score_tpu.sim.manhattan import (
    ManhattanWorldParams,
    resample_measurements,
    simulate_manhattan_world,
)
from score_tpu.solver.ipm import IPMParams, SOLVED_STATUSES


def main() -> None:
    num_trials = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    sim = ManhattanWorldParams(
        num_robots=4,
        num_poses_per_robot=50,
        num_landmarks=4,
        grid_size=10,
        range_measure_prob=0.4,
        seed=0,
    )
    base = simulate_manhattan_world(sim)
    print("base world:", base.summary())

    t0 = time.time()
    trials = [resample_measurements(base, seed=s) for s in range(num_trials)]
    problems = [build_conic_problem(t, SOCP_RELAXATION)[0] for t in trials]
    batch = stack_problems(problems)
    print(f"assembled {num_trials} trials in {time.time()-t0:.2f}s "
          f"(n={problems[0].n}, cones={problems[0].num_cones})")

    _, idx = build_conic_problem(trials[0], SOCP_RELAXATION)
    ca = build_chain_arrow(problems[0], idx)
    # production TPU path: the mixed two-float band, vmapped via the
    # batch-folding custom_vmap kernel rules (ops/pallas_pcr.py)
    backend = (
        MixedChainArrowBackend
        if jax.default_backend() == "tpu"
        else ChainArrowBackend
    )
    print("backend:", backend.__name__)
    params = IPMParams(max_iter=20)
    t0 = time.time()
    res = solve_conic_batch(batch, params, backend=backend, backend_aux=ca)
    np.asarray(res.x)
    t_compile = time.time() - t0
    t0 = time.time()
    res = solve_conic_batch(batch, params, backend=backend, backend_aux=ca)
    np.asarray(res.x)
    t_warm = time.time() - t0

    statuses = np.asarray(res.status)
    print(f"compile+run {t_compile:.2f}s, warm batch solve {t_warm:.2f}s "
          f"({t_warm / num_trials * 1e3:.1f} ms/trial)")
    solved = np.isin(statuses, SOLVED_STATUSES).sum()
    print(f"converged: {solved}/{num_trials}")
    print("objectives:", np.round(np.asarray(res.pobj), 3))


if __name__ == "__main__":
    main()
