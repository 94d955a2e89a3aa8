"""Timed TPU solves of the two exact-MM-affected workloads (robot20,
manhattan4), one process. Run through the serial queue after
ozaki_tpu_probe.py validates the kernel path."""

import sys
import time

import jax

jax.config.update("jax_enable_x64", True)

from score_tpu.api import ScoreSolverParams, solve_score  # noqa: E402
from score_tpu.datasets import manhattan_pickle_path  # noqa: E402
from score_tpu.fg import parse_pickle_file  # noqa: E402
from score_tpu.sim.manhattan import (  # noqa: E402
    ManhattanWorldParams,
    simulate_manhattan_world,
)

which = sys.argv[1] if len(sys.argv) > 1 else "robot20,manhattan4"
print("backend:", jax.default_backend(), flush=True)


def timed(name, fg):
    params = ScoreSolverParams(max_iter=60)
    t0 = time.time()
    res = solve_score(fg, "SOCP", params)
    print(f"{name} compile+warm {time.time()-t0:.1f}s solved={res.solved} "
          f"iters={res.iterations} relgap={res.gap/max(1.0,abs(res.primal_objective)):.3e}",
          flush=True)
    times = []
    for _ in range(3):
        t0 = time.time()
        res = solve_score(fg, "SOCP", params)
        times.append(time.time() - t0)
    print(f"{name} warm best {min(times):.3f}s times={[f'{t:.3f}' for t in times]} "
          f"relgap={res.gap/max(1.0,abs(res.primal_objective)):.3e} iters={res.iterations}",
          flush=True)


if "robot20" in which:
    fg20 = simulate_manhattan_world(
        ManhattanWorldParams(
            num_robots=20, num_poses_per_robot=100, num_landmarks=10,
            grid_size=30, range_measure_prob=0.25,
            inter_robot_measure_prob=0.05, seed=20,
        )
    )
    timed("robot20", fg20)

if "manhattan4" in which:
    timed("manhattan4", parse_pickle_file(manhattan_pickle_path()))

print("TIMING_DONE", flush=True)
