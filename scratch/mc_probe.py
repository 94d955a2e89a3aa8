"""MC batch compile + warm probe (the bench extra_mc_batch workload:
100 trials of a 4x50-pose world, vmapped mixed band). Measures today's
compile cost (the r3 ~48 min figure predates compile-service speedups)
and the warm batch time. One JSON line per step."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    x = jax.jit(lambda a: a * 2 + 1)(jnp.ones((8, 128)))
    float(x.ravel()[0])
    assert jax.default_backend() == "tpu"
    print(json.dumps({"step": "probe", "s": round(time.perf_counter() - t0, 2)}),
          flush=True)

    from score_tpu.assembly.conic import build_conic_problem
    from score_tpu.parallel.batch import solve_conic_batch, stack_problems
    from score_tpu.sim.manhattan import (
        ManhattanWorldParams,
        resample_measurements,
        simulate_manhattan_world,
    )
    from score_tpu.solver.chain_arrow import (
        MixedChainArrowBackend,
        build_chain_arrow,
    )
    from score_tpu.solver.ipm import IPMParams, SOLVED_STATUSES

    base = simulate_manhattan_world(
        ManhattanWorldParams(
            num_robots=4, num_poses_per_robot=50, num_landmarks=4,
            grid_size=10, range_measure_prob=0.4, seed=0,
        )
    )
    trials = [resample_measurements(base, seed=s) for s in range(100)]
    problems = [build_conic_problem(t, "SOCP")[0] for t in trials]
    batch = stack_problems(problems)
    _, idx = build_conic_problem(trials[0], "SOCP")
    ca = build_chain_arrow(problems[0], idx)
    params = IPMParams(max_iter=20)
    t0 = time.perf_counter()
    res = solve_conic_batch(batch, params, backend=MixedChainArrowBackend,
                            backend_aux=ca)
    np.asarray(res.x)
    first = time.perf_counter() - t0
    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        res = solve_conic_batch(batch, params,
                                backend=MixedChainArrowBackend,
                                backend_aux=ca)
        np.asarray(res.x)
        times.append(time.perf_counter() - t0)
    statuses = np.asarray(res.status)
    solved = int(np.isin(statuses, SOLVED_STATUSES).sum())
    print(
        json.dumps(
            {
                "step": "mc_batch_100",
                "first_s": round(first, 1),
                "warm_best": round(min(times), 4),
                "times": [round(t, 3) for t in times],
                "solved": solved,
                "ms_per_trial": round(min(times) * 10.0, 2),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
