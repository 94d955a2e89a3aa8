"""End-to-end AOT-cache validation on TPU: solve GOATS-14 SOCP through
the full solve_score path twice in THIS process (first = compile-or-load
+ warm, then timed warm repeats) and report the first-call wall.

Run once with a cold cache (pays the remote compile, saves executables),
then again in a FRESH process: the second process's first call should
drop from ~340 s to seconds if the AOT executable disk cache works for
the production graph (Pallas band + scatters in prepare).

argv[1] (optional): cache dir override (else the default
~/.cache/score_tpu/aot).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if len(sys.argv) > 1:
    os.environ["SCORE_TPU_AOT_CACHE"] = sys.argv[1]


def main():
    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    x = jax.jit(lambda a: a * 2 + 1)(jnp.ones((8, 128)))
    float(x.ravel()[0])
    print(json.dumps({"step": "probe", "s": round(time.perf_counter() - t0, 2),
                      "backend": jax.default_backend()}), flush=True)

    from score_tpu.api import ScoreSolverParams, solve_score
    from score_tpu.datasets import goats_pickle_path
    from score_tpu.fg import parse_pickle_file
    from score_tpu.utils import aotcache

    fg = parse_pickle_file(goats_pickle_path())
    params = ScoreSolverParams(max_iter=60)

    t0 = time.perf_counter()
    res = solve_score(fg, "SOCP", params)
    first_s = time.perf_counter() - t0
    assert res.solved, (res.iterations, res.gap)

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        res = solve_score(fg, "SOCP", params)
        times.append(round(time.perf_counter() - t0, 4))

    d = aotcache.cache_dir()
    entries = sorted(os.listdir(d)) if os.path.isdir(d) else []
    print(
        json.dumps(
            {
                "step": "goats_aot_e2e",
                "first_s": round(first_s, 1),
                "warm_best": min(times),
                "times": times,
                "solved": bool(res.solved),
                "iters": int(res.iterations),
                "relgap": float(f"{res.gap / max(1.0, abs(res.primal_objective)):.3e}"),
                "cache_dir": d,
                "cache_entries": [
                    (e, os.path.getsize(os.path.join(d, e))) for e in entries
                ],
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
