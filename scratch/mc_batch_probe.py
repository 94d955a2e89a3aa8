"""MC-batch probe: time the bench's 100-trial batch with a chosen
backend (argv[1] = mixed | f64) and iteration budget (argv[2], default
20). Mirrors bench.py's monte-carlo section exactly."""
import fcntl
import json
import sys
import time

import numpy as np


def main():
    which = sys.argv[1]
    max_iter = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    import jax

    assert jax.default_backend() == "tpu"

    from score_tpu.assembly.conic import build_conic_problem
    from score_tpu.parallel.batch import solve_conic_batch, stack_problems
    from score_tpu.sim.manhattan import (
        ManhattanWorldParams,
        resample_measurements,
        simulate_manhattan_world,
    )
    from score_tpu.solver.chain_arrow import (
        ChainArrowBackend,
        MixedChainArrowBackend,
        build_chain_arrow,
    )
    from score_tpu.solver.ipm import IPMParams, SOLVED_STATUSES

    base = simulate_manhattan_world(
        ManhattanWorldParams(
            num_robots=4,
            num_poses_per_robot=50,
            num_landmarks=4,
            grid_size=10,
            range_measure_prob=0.4,
            seed=0,
        )
    )
    trials = [resample_measurements(base, seed=s) for s in range(100)]
    problems = [build_conic_problem(t, "SOCP")[0] for t in trials]
    batch = stack_problems(problems)
    _, idx = build_conic_problem(trials[0], "SOCP")
    ca = build_chain_arrow(problems[0], idx)
    backend = {
        "mixed": MixedChainArrowBackend,
        "f64": ChainArrowBackend,
    }[which]
    params = IPMParams(max_iter=max_iter)

    res = solve_conic_batch(batch, params, backend=backend, backend_aux=ca)
    np.asarray(res.x)  # compile + warmup
    with open("/tmp/tpu_measure.lock", "w") as lk:
        fcntl.flock(lk, fcntl.LOCK_EX)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            res = solve_conic_batch(
                batch, params, backend=backend, backend_aux=ca
            )
            np.asarray(res.x)
            times.append(time.perf_counter() - t0)
    statuses = np.asarray(res.status)
    solved = int(np.isin(statuses, SOLVED_STATUSES).sum())
    print(
        json.dumps(
            {
                "backend": which,
                "max_iter": max_iter,
                "best": round(min(times), 3),
                "times": [round(t, 3) for t in times],
                "solved": solved,
                "iters": np.asarray(res.iterations).tolist()[:10],
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
