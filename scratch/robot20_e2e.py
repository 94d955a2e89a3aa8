"""End-to-end 20-robot SOCP solve on TPU, timing compile + warm solves.

argv[1]: exact_mm setting ("0" or "1") — exported as SCORE_TPU_EXACT_MM
before any tracing, so the arrow Schur product / cross_aa contraction
route through ozaki split-f32 MXU matmuls (1) or emulated-f64 einsums
(0). VERDICT r3 task 2: the ozaki routing landed untested on hardware.
Prints one JSON line with compile time, warm best, iters, relgap.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

mm = sys.argv[1] if len(sys.argv) > 1 else "1"
os.environ["SCORE_TPU_EXACT_MM"] = mm
# argv[2] (optional): gondzio corrector count override — compile-cost
# attribution (each unrolled corrector is one more condensed-solve
# subgraph in the while_loop body)
gondzio = int(sys.argv[2]) if len(sys.argv) > 2 else None

import numpy as np


def main():
    import jax

    t0 = time.perf_counter()
    import jax.numpy as jnp

    x = jax.jit(lambda a: a * 2 + 1)(jnp.ones((8, 128)))
    float(x.ravel()[0])
    assert jax.default_backend() == "tpu"
    print(json.dumps({"step": "probe", "s": round(time.perf_counter() - t0, 2)}),
          flush=True)

    from score_tpu.api import ScoreSolverParams, solve_score
    from score_tpu.sim.manhattan import (
        ManhattanWorldParams,
        simulate_manhattan_world,
    )

    fg = simulate_manhattan_world(
        ManhattanWorldParams(
            num_robots=20, num_poses_per_robot=100, num_landmarks=10,
            grid_size=30, range_measure_prob=0.25,
            inter_robot_measure_prob=0.05, seed=20,
        )
    )
    params = (
        ScoreSolverParams(max_iter=60)
        if gondzio is None
        else ScoreSolverParams(max_iter=60, gondzio_correctors=gondzio)
    )
    t0 = time.perf_counter()
    res = solve_score(fg, "SOCP", params)
    first = time.perf_counter() - t0
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        res = solve_score(fg, "SOCP", params)
        times.append(time.perf_counter() - t0)
    rg = res.gap / max(1.0, abs(res.primal_objective))
    print(
        json.dumps(
            {
                "step": "robot20_e2e",
                "exact_mm": mm,
                "gondzio": gondzio,
                "blocked_arrow": os.environ.get(
                    "SCORE_TPU_BLOCKED_ARROW", ""
                ),
                "first_s": round(first, 1),
                "warm_best": round(min(times), 4),
                "times": [round(t, 3) for t in times],
                "solved": res.solved,
                "iters": res.iterations,
                "relgap": float(f"{rg:.3e}"),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
