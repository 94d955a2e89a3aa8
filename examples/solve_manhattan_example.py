#!/usr/bin/env python
"""Solve the 4-robot Manhattan-world dataset shipped with the reference
(SURVEY.md §6: 1600 poses, 6 landmarks, 1160 ranges incl. inter-robot).

Usage: python examples/solve_manhattan_example.py [SOCP|QCQP] [--gif]

``--gif`` additionally renders the animated error plot to
examples/out/manhattan4_<relaxation>.gif — the analogue of the
reference's headline media/4robot_animation.gif (produced there by the
plot_utils.py:83-187 frame loop). Rendering is headless and takes a few
minutes at 1600 poses; pass nothing to skip it.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from score_tpu import parse_pickle_file
from score_tpu.api import ScoreSolverParams, solve_score
from score_tpu.utils.metrics import ate_against_ground_truth
from score_tpu.utils.plot import plot_trajectories

from score_tpu.datasets import manhattan_pickle_path

DATA_PATH = manhattan_pickle_path()
OUT_DIR = os.path.join(os.path.dirname(__file__), "out")


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--gif"]
    want_gif = "--gif" in sys.argv[1:]
    relaxation = args[0] if args else "SOCP"
    fg = parse_pickle_file(DATA_PATH)
    print(fg.summary())
    result = solve_score(fg, relaxation, ScoreSolverParams(verbose=True))
    print(
        f"solved={result.solved} iters={result.iterations} "
        f"time={result.total_time:.2f}s objective={result.primal_objective:.6f}"
    )
    for chain, m in ate_against_ground_truth(result, fg).items():
        print(f"robot {chain}: ATE rmse={m['rmse']:.3f} m")
    os.makedirs(OUT_DIR, exist_ok=True)
    plot_trajectories(
        fg,
        result,
        save_path=os.path.join(OUT_DIR, f"manhattan4_{relaxation}.png"),
        title=f"Manhattan 4-robot {relaxation} initialization",
    )
    if want_gif:
        from score_tpu.utils.plot import plot_error

        gif = os.path.join(OUT_DIR, f"manhattan4_{relaxation}.gif")
        plot_error(fg, result, show=False, save_animation_path=gif,
                   num_frames_skip=10)
        print(f"wrote {gif}")


if __name__ == "__main__":
    main()
