#!/usr/bin/env python
"""3D (SE(3)) end-to-end: simulate a 3D range-SLAM world, round-trip it
through the g2o format, solve the SOCP relaxation, and export the
trajectory as TUM (the reference supports dim 3 through the same code
paths, gurobi_utils.py:37-50, but ships no 3D dataset).

On TPU, 3D chains longer than 256 poses run the SEGMENTED mixed-precision
Pallas band (SPIKE-style substructuring, ops/pallas_pcr.py) — the 12-wide
3D pose blocks exceed the per-kernel VMEM budget of the direct band.

Usage: python examples/solve_3d_example.py [num_poses]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from score_tpu.api import ScoreSolverParams, solve_score
from score_tpu.fg import parse_g2o_file, save_to_g2o_file, save_to_tum
from score_tpu.sim.world3d import World3DParams, simulate_3d_world
from score_tpu.utils.metrics import ate_against_ground_truth

OUT_DIR = os.path.join(os.path.dirname(__file__), "out")


def main() -> None:
    poses = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    fg = simulate_3d_world(
        World3DParams(
            num_poses_per_robot=poses,
            num_landmarks=5,
            world_size=40.0,
            range_measure_prob=0.35,
            seed=7,
        )
    )
    print("simulated:", fg.summary())

    os.makedirs(OUT_DIR, exist_ok=True)
    g2o_path = os.path.join(OUT_DIR, "world3d.g2o")
    save_to_g2o_file(fg, g2o_path)
    fg2 = parse_g2o_file(g2o_path)
    print("g2o round-trip:", fg2.summary())

    t0 = time.time()
    result = solve_score(fg2, "SOCP", ScoreSolverParams(verbose=True))
    print(
        f"solved={result.solved} iters={result.iterations} "
        f"time={time.time()-t0:.2f}s relgap="
        f"{result.gap / max(1.0, abs(result.primal_objective)):.2e}"
    )

    tum_path = os.path.join(OUT_DIR, "world3d_traj.tum")
    save_to_tum(result, tum_path)
    print("TUM trajectory written to", tum_path)

    ates = ate_against_ground_truth(result, fg)
    for chain, m in ates.items():
        print(f"ATE[{chain}]: rmse={m['rmse']:.3f} m max={m['max']:.3f} m")


if __name__ == "__main__":
    main()
