"""Per-iteration anatomy probe (round 3): where do GOATS's ~75 ms/iter go?

Runs ONE IPMParams variant (argv[1]) of the GOATS-14 SOCP mixed solve on
TPU and prints a JSON line with warm best-of-5 time + iterations, so
per-phase costs can be recovered from deltas between variants:

  base       defaults (2 gondzio correctors, 1 refinement pass)
  nogondzio  gondzio_correctors=0      (delta = 2 condensed solves/iter)
  norefine   dir_refine_steps=0        (delta = 1 condensed solve + 2
                                        full-system residual sets/iter)
  bare       both off                  (per-iter floor: factor + 2 solves)
  iter6      defaults, max_iter=6      (slope vs fixed overhead)

Launch all variants concurrently (the remote compile service runs them in
parallel); an flock around the measurement region serializes chip use.
"""
import fcntl
import json
import sys
import time

import numpy as np


def main():
    variant = sys.argv[1]
    workload = sys.argv[2] if len(sys.argv) > 2 else "goats"
    import jax

    assert jax.default_backend() == "tpu", jax.default_backend()

    from score_tpu.assembly.conic import build_conic_problem
    from score_tpu.assembly.normalize import normalize_factor_graph
    from score_tpu.datasets import goats_pickle_path
    from score_tpu.fg import parse_pickle_file
    from score_tpu.solver.chain_arrow import (
        MixedChainArrowBackend,
        build_chain_arrow,
    )
    from score_tpu.solver.ipm import IPMParams, solve_conic

    relaxation = "SOCP"
    if workload == "goats":
        fg = parse_pickle_file(goats_pickle_path())
    elif workload == "qcqp":
        fg = parse_pickle_file(goats_pickle_path())
        relaxation = "QCQP"
    elif workload == "robot20":
        from score_tpu.sim.manhattan import (
            ManhattanWorldParams,
            simulate_manhattan_world,
        )

        fg = simulate_manhattan_world(
            ManhattanWorldParams(
                num_robots=20,
                num_poses_per_robot=100,
                num_landmarks=10,
                grid_size=30,
                range_measure_prob=0.25,
                inter_robot_measure_prob=0.05,
                seed=20,
            )
        )
    else:
        raise SystemExit(f"unknown workload {workload}")
    scaled, _ = normalize_factor_graph(fg)
    problem, idx = build_conic_problem(scaled, relaxation)
    aux = build_chain_arrow(problem, idx)

    params = {
        "base": IPMParams(max_iter=60),
        "ungated": IPMParams(max_iter=60, dir_refine_gate=0.0),
        "nogondzio": IPMParams(max_iter=60, gondzio_correctors=0),
        "gondzio1": IPMParams(max_iter=60, gondzio_correctors=1),
        "norefine": IPMParams(max_iter=60, dir_refine_steps=0),
        "bare": IPMParams(
            max_iter=60, gondzio_correctors=0, dir_refine_steps=0
        ),
        "iter6": IPMParams(max_iter=6),
    }[variant]

    def solve():
        res = solve_conic(
            problem, params, backend=MixedChainArrowBackend, backend_aux=aux
        )
        # scalar fetch forces completion through the axon tunnel
        _ = float(np.asarray(res.pobj))
        return res

    t0 = time.perf_counter()
    res = solve()  # compile + warmup
    compile_s = time.perf_counter() - t0

    with open("/tmp/tpu_measure.lock", "w") as lk:
        fcntl.flock(lk, fcntl.LOCK_EX)
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            res = solve()
            times.append(time.perf_counter() - t0)

    relgap = float(res.gap) / max(1.0, abs(float(res.pobj)))
    print(
        json.dumps(
            {
                "workload": workload,
                "variant": variant,
                "best": round(min(times), 4),
                "times": [round(t, 4) for t in times],
                "iters": int(res.iterations),
                "status": int(res.status),
                "relgap": float(f"{relgap:.3e}"),
                "compile_s": round(compile_s, 1),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
