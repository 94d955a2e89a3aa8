"""3D bench candidate: 4-robot x 250-pose world (1000 poses, T=256 —
the largest chain length the plain Db=12 Pallas kernels take without
segmenting). Measures the full solve_score compile + warm best-of-3, to
size a `solve3d` bench row that fits the driver budget (VERDICT r3 #5:
3D is first-class in the reference builder, gurobi_utils.py:37-50, but
has no bench artifact because the 1x1000 segmented compile is ~55 min).
One JSON line per step.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


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
    from score_tpu.sim.world3d import World3DParams, simulate_3d_world

    fg = simulate_3d_world(
        World3DParams(
            num_robots=4, num_poses_per_robot=250, num_landmarks=6,
            range_measure_prob=0.4, seed=3,
        )
    )
    nr = len(fg.range_measurements)
    params = ScoreSolverParams(max_iter=60)
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
                "step": "solve3d_4x250",
                "num_ranges": nr,
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
