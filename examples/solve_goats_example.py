#!/usr/bin/env python
"""Solve the GOATS-14 real AUV dataset and visualize/export the result.

The working version of the reference's (stale) example
/root/reference/examples/solve_goats_example_score.py: load pickle ->
solve relaxation -> visualize, with the params object that example intended
(ScoreSolverParams) and ATE reporting against the shipped TUM ground truth.

Usage: python examples/solve_goats_example.py [SOCP|QCQP]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from score_tpu import parse_pickle_file
from score_tpu.api import ScoreSolverParams, solve_score
from score_tpu.fg import save_to_tum
from score_tpu.utils.metrics import ate_against_ground_truth
from score_tpu.utils.plot import plot_trajectories, visualize_solution

from score_tpu.datasets import goats_pickle_path

DATA_PATH = goats_pickle_path()
OUT_DIR = os.path.join(os.path.dirname(__file__), "out")


def main() -> None:
    relaxation = sys.argv[1] if len(sys.argv) > 1 else "QCQP"
    goats_pyfg = parse_pickle_file(DATA_PATH)
    print(goats_pyfg.summary())

    solver_params = ScoreSolverParams(
        solver="ipm",
        verbose=True,
        save_results=True,
        results_filepath=os.path.join(OUT_DIR, f"goats_result_{relaxation}.pkl"),
    )
    result = solve_score(goats_pyfg, relaxation, solver_params)

    print(
        f"solved={result.solved} iters={result.iterations} "
        f"time={result.total_time:.2f}s objective={result.primal_objective:.6f} "
        f"gap={result.gap:.3e}"
    )
    ate = ate_against_ground_truth(result, goats_pyfg)
    for chain, metrics in ate.items():
        print(
            f"chain {chain}: ATE rmse={metrics['rmse']:.3f} "
            f"mean={metrics['mean']:.3f} max={metrics['max']:.3f} (m)"
        )

    os.makedirs(OUT_DIR, exist_ok=True)
    tum_files = save_to_tum(
        result, os.path.join(OUT_DIR, f"goats_traj_{relaxation}.tum")
    )
    print("TUM trajectories:", tum_files)
    visualize_solution(
        result,
        goats_pyfg,
        save_path=os.path.join(OUT_DIR, f"goats_solution_{relaxation}.png"),
    )
    plot_trajectories(
        goats_pyfg,
        result,
        save_path=os.path.join(OUT_DIR, f"goats_trajs_{relaxation}.png"),
        title=f"GOATS-14 {relaxation} initialization",
    )
    print(f"plots saved under {OUT_DIR}")


if __name__ == "__main__":
    main()
