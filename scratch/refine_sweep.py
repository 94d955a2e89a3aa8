"""Robust-kernel sweep on GOATS refinement: huber vs GNC-GM at several
widths, each from the same LS-refined base. Reports ATE rmse.

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scratch/refine_sweep.py
"""
import dataclasses


def main():
    from score_tpu.api import ScoreSolverParams, solve_score
    from score_tpu.fg import parse_pickle_file
    from score_tpu.refine import RefineParams, refine_solution
    from score_tpu.utils.metrics import ate_against_ground_truth
    from score_tpu.datasets import goats_pickle_path

    fg = parse_pickle_file(goats_pickle_path())
    res = solve_score(fg, "SOCP", ScoreSolverParams(max_iter=60))

    def ate(results):
        m = ate_against_ground_truth(results, fg)
        return {k: v["rmse"] for k, v in m.items()}

    print("init ATE:", ate(res), flush=True)
    base = refine_solution(fg, res.variables, RefineParams(max_iter=60))
    base_res = dataclasses.replace(res, variables=base.values)
    print("LS ATE:", ate(base_res), flush=True)

    configs = [
        ("huber d=30", RefineParams(max_iter=60, robust="huber",
                                    robust_delta=30.0)),
        ("huber d=10", RefineParams(max_iter=60, robust="huber",
                                    robust_delta=10.0)),
        ("gm d=30", RefineParams(max_iter=60, robust="gm",
                                 robust_delta=30.0)),
        ("gm d=10", RefineParams(max_iter=60, robust="gm",
                                 robust_delta=10.0)),
        ("gm d=3", RefineParams(max_iter=60, robust="gm",
                                robust_delta=3.0)),
        ("gm d=1", RefineParams(max_iter=60, robust="gm",
                                robust_delta=1.0)),
    ]
    for tag, rp in configs:
        out = refine_solution(fg, base.values, rp)
        rr = dataclasses.replace(res, variables=out.values)
        print(f"{tag}: iters={out.iterations} cost={out.cost:.4e} "
              f"ATE={ate(rr)}", flush=True)


if __name__ == "__main__":
    main()
