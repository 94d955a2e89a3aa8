"""Per-lane iteration dispersion of the bench MC workload (CPU).

The batched while_loop exits at the slowest lane; every trip runs the
full step for all 100 lanes. This probe measures how many trips the
batch actually needs vs. the per-lane iteration counts a sequential
solve would use — the gap is the ceiling for any restart-compaction
scheme (solve the batch for K trips, then re-run only the unconverged
lanes in a smaller batch).

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scratch/mc_dispersion.py
"""
import numpy as np


def main():
    from score_tpu.assembly.conic import build_conic_problem
    from score_tpu.parallel.batch import solve_conic_batch, stack_problems
    from score_tpu.sim.manhattan import (
        ManhattanWorldParams,
        resample_measurements,
        simulate_manhattan_world,
    )
    from score_tpu.solver.chain_arrow import (
        ChainArrowBackend,
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
    params = IPMParams(max_iter=20)
    res = solve_conic_batch(
        batch, params, backend=ChainArrowBackend, backend_aux=ca
    )
    its = np.asarray(res.iterations)
    st = np.asarray(res.status)
    solved = np.isin(st, SOLVED_STATUSES)
    print("solved:", int(solved.sum()), "/", len(st))
    print("iters: min", its.min(), "p50", int(np.percentile(its, 50)),
          "p90", int(np.percentile(its, 90)), "max", its.max())
    print("hist:", np.bincount(its, minlength=21).tolist())
    # compaction ceiling: full-batch trips at percentile p + remainder at
    # (1 - p) lane fraction
    mx = its.max()
    for p in (50, 75, 90):
        k = int(np.percentile(its, p))
        frac_live = (its > k).mean()
        eq = k + (mx - k) * max(frac_live, 0.0)
        print(f"two-stage @p{p}: stage1={k} trips + {frac_live:.2f} lanes x "
              f"{mx - k} trips -> equivalent {eq:.1f} vs {mx} "
              f"({1 - eq / mx:.0%} saved, ignoring 2nd compile)")


if __name__ == "__main__":
    main()
