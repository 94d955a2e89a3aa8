"""Gondzio-corrector sweep for the bench MC workload (CPU, f64).

Each pre-endgame batch trip pays 1 factorization + (2 + gondzio)
condensed band solves (affine, combined, gondzio correctors). If the
batch's trip count (= slowest lane's iterations) survives fewer
correctors, each trip gets ~20-25% cheaper in its dominant phase —
VERDICT r3 #7 (86 -> <=70 ms/trial) without touching convergence.

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scratch/mc_gondzio_sweep.py
"""
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    from score_tpu.assembly.conic import build_conic_problem
    from score_tpu.parallel.batch import solve_conic_batch, stack_problems
    from score_tpu.sim.manhattan import (
        ManhattanWorldParams,
        resample_measurements,
        simulate_manhattan_world,
    )
    from score_tpu.solver.chain_arrow import (
        ChainArrowBackend,
        build_chain_arrow,
    )
    from score_tpu.solver.ipm import IPMParams, SOLVED_STATUSES

    ntrials = int(os.environ.get("MB_TRIALS", "100"))
    base = simulate_manhattan_world(
        ManhattanWorldParams(
            num_robots=4, num_poses_per_robot=50, num_landmarks=4,
            grid_size=10, range_measure_prob=0.4, seed=0,
        )
    )
    trials = [resample_measurements(base, seed=s) for s in range(ntrials)]
    problems = [build_conic_problem(t, "SOCP")[0] for t in trials]
    batch = stack_problems(problems)
    _, idx = build_conic_problem(trials[0], "SOCP")
    ca = build_chain_arrow(problems[0], idx)

    for ng in (2, 1, 0):
        params = dataclasses.replace(IPMParams(max_iter=20),
                                     gondzio_correctors=ng)
        t0 = time.perf_counter()
        res = solve_conic_batch(batch, params, backend=ChainArrowBackend,
                                backend_aux=ca)
        its = np.asarray(res.iterations)
        st = np.asarray(res.status)
        gaps = np.asarray(res.gap) / np.maximum(
            1.0, np.abs(np.asarray(res.pobj)))
        solved = int(np.isin(st, SOLVED_STATUSES).sum())
        print(json.dumps({
            "gondzio": ng,
            "wall_s": round(time.perf_counter() - t0, 2),
            "trips_max": int(its.max()),
            "trips_p50": int(np.median(its)),
            "solved": solved,
            "relgap_max": float(f"{gaps.max():.3e}"),
            # relative per-trip solve cost: trips * (2 + ng + 1-ish)
            "rel_solve_cost": int(its.max()) * (2 + ng),
        }), flush=True)


if __name__ == "__main__":
    main()
