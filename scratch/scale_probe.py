"""Scale probe: a 20,000-pose 50-robot Manhattan world through
solve_score (SOCP). Checks the structured backend holds up an order of
magnitude past the bench workloads (2,000 poses) and records the time.

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scratch/scale_probe.py [robots] [poses]
"""
import sys
import time

import numpy as np


def main():
    robots = int(sys.argv[1]) if len(sys.argv) > 1 else 25
    poses = int(sys.argv[2]) if len(sys.argv) > 2 else 800
    from score_tpu.api import ScoreSolverParams, solve_score
    from score_tpu.sim.manhattan import (
        ManhattanWorldParams,
        simulate_manhattan_world,
    )

    t0 = time.time()
    fg = simulate_manhattan_world(
        ManhattanWorldParams(
            num_robots=robots,
            num_poses_per_robot=poses,
            num_landmarks=20,
            grid_size=60,
            range_measure_prob=0.2,
            inter_robot_measure_prob=0.02,
            seed=7,
        )
    )
    print(f"simulated in {time.time()-t0:.1f}s:", fg.summary(), flush=True)
    t0 = time.time()
    res = solve_score(fg, "SOCP", ScoreSolverParams(max_iter=60))
    print(f"cold solve_score: {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    res = solve_score(fg, "SOCP", ScoreSolverParams(max_iter=60))
    warm = time.time() - t0
    rg = res.gap / max(1.0, abs(res.primal_objective))
    print(
        f"warm {warm:.2f}s solved={res.solved} iters={res.iterations} "
        f"relgap={rg:.3e}", flush=True,
    )


if __name__ == "__main__":
    main()
