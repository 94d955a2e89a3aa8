#!/usr/bin/env python
"""Benchmark: GOATS-14 SOCP relaxation solve wall-clock on TPU.

Workload: the reference's primary real-data example (679-pose AUV
trajectory, 4 landmarks, 1558 range measurements — SURVEY.md §6) compiled to
a second-order cone program and solved to 1e-8-grade relative accuracy by
the native interior-point solver. The reference publishes no numbers
(BASELINE.md), so `vs_baseline` reports speedup against the SAME solver and
tolerances executed on the host CPU backend (XLA CPU, native f64 LAPACK) —
the solver a TPU-less user would run. CPU baseline measured on this image:
85.4 s warm solve (13 IPM iterations, pobj=330.487268).

Prints exactly one JSON line.
"""

import json
import sys
import time

import numpy as np

CPU_BASELINE_SECONDS = 85.4  # measured: same solve, JAX_PLATFORMS=cpu, f64
GOATS = "/root/reference/examples/goats_14_data/goats_14_6_2002_15_20.pkl"


def main() -> None:
    from score_tpu.fg import parse_pickle_file
    from score_tpu.assembly.conic import build_conic_problem
    from score_tpu.solver.chain_arrow import ChainArrowBackend, build_chain_arrow
    from score_tpu.solver.ipm import SOLVED_STATUSES, solve_conic, IPMParams

    fg = parse_pickle_file(GOATS)
    problem, idx = build_conic_problem(fg, "SOCP")
    ca = build_chain_arrow(problem, idx)
    params = IPMParams(max_iter=60)

    def run():
        return solve_conic(
            problem, params, backend=ChainArrowBackend, backend_aux=ca
        )

    # Warmup (compile; persistent cache makes this fast after the first run).
    res = run()
    status = int(res.status)
    assert status in SOLVED_STATUSES, f"solver failed: status={status}"

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        res = run()
        float(res.pobj)  # block
        times.append(time.perf_counter() - t0)
    best = min(times)

    print(
        json.dumps(
            {
                "metric": "goats14_socp_solve_wall_clock",
                "value": round(best, 4),
                "unit": "seconds",
                "vs_baseline": round(CPU_BASELINE_SECONDS / best, 2),
            }
        )
    )
    # Extra context on stderr (not part of the contract line).
    print(
        f"status={status} iters={int(res.iterations)} "
        f"pobj={float(res.pobj):.6f} gap={float(res.gap):.3e} "
        f"pres={float(res.pres):.3e} dres={float(res.dres):.3e} "
        f"times={['%.2f' % t for t in times]}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
