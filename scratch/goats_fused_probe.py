"""GOATS SOCP e2e after the round-4 fused solve+extract dispatch
(api._solve_extract_jit): compile + warm best-of-5. Validates VERDICT r3
task 4 (GOATS <= 0.10 s) on hardware. One JSON line per step."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    x = jax.jit(lambda a: a * 2 + 1)(jnp.ones((8, 128)))
    float(x.ravel()[0])
    assert jax.default_backend() == "tpu"
    print(json.dumps({"step": "probe", "s": round(time.perf_counter() - t0, 2)}),
          flush=True)

    from score_tpu.api import ScoreSolverParams, solve_score
    from score_tpu.datasets import goats_pickle_path
    from score_tpu.fg import parse_pickle_file

    fg = parse_pickle_file(goats_pickle_path())
    params = ScoreSolverParams(max_iter=60)
    t0 = time.perf_counter()
    res = solve_score(fg, "SOCP", params)
    first = time.perf_counter() - t0
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        res = solve_score(fg, "SOCP", params)
        times.append(time.perf_counter() - t0)
    rg = res.gap / max(1.0, abs(res.primal_objective))
    print(
        json.dumps(
            {
                "step": "goats_fused",
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
