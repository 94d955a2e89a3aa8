#!/usr/bin/env python
"""Benchmark suite: the framework's headline workloads on TPU.

Primary metric (the single stdout JSON line the driver records): the
GOATS-14 SOCP relaxation solve wall-clock — the reference's primary
real-data example (679-pose AUV trajectory, 4 landmarks, 1,558 range
measurements — SURVEY.md §6) through the full user-facing path: factor
graph -> normalized conic assembly -> chain+arrow structured
interior-point solve (mixed two-float Pallas band on TPU) -> SO(2)-rounded
solution (`solve_score`, the analogue of the reference's
solve_score.py:54-86 whose time was all inside Gurobi).

The reference publishes no numbers (BASELINE.md), so `vs_baseline`
reports speedup against a CPU barrier-method solve of the same problem:
the dense f64 Cholesky IPM on the host CPU backend (the general-purpose
approach a Gurobi/MOSEK-class CPU solver embodies), measured at 55.2 s
through the same solve_score path on this image.

The rest of the perf table (stderr, one JSON line per workload, each
with status/relgap asserted): GOATS QCQP, Manhattan 4-robot SOCP, the
simulated 20-robot 2000-pose world, and a 100-trial Monte-Carlo batch
through the vmapped mixed band. SCORE_TPU_BENCH_QUICK=1 runs only the
primary workload. Every workload pays its own TPU compile on this
runtime (no persistent cache) — the full suite is compile-dominated.
"""

import json
import os
import sys
import time
import traceback

CPU_DENSE_BASELINE_SECONDS = 55.2  # dense-KKT IPM via solve_score, JAX_PLATFORMS=cpu, f64

# ----- wall-clock budget guard (VERDICT r3: the round-3 run was killed
# at the driver's time budget mid-compile, rc=124, dropping 3 of 5
# workloads from the artifact). The driver window is ~40 min; default
# slightly under it so the guard — not the driver's SIGKILL — ends the
# run, emitting a {"skipped": [...]} line and exiting 0 with every row
# that fit. Override with SCORE_TPU_BENCH_BUDGET=<seconds>.
_T0 = time.monotonic()
BUDGET_S = float(os.environ.get("SCORE_TPU_BENCH_BUDGET", "2250"))
_SAFETY_S = 90.0  # leave room for the final emit + interpreter teardown


def _remaining() -> float:
    return BUDGET_S - (time.monotonic() - _T0) - _SAFETY_S


def _ensure_backend_reachable() -> str:
    """Probe the TPU tunnel from a throwaway subprocess; fall back to CPU
    if it is unreachable.

    The axon pool is single-client and can wedge for hours (backend init
    hangs or fails UNAVAILABLE — see CLAUDE.md). A bench run launched into
    a wedged pool would hang at init and produce NO artifact, so before
    importing jax in this process we jit a trivial kernel in a subprocess
    under a timeout. On failure we clear ``PALLAS_AXON_POOL_IPS`` (required
    — ``JAX_PLATFORMS=cpu`` alone is overridden by the plugin) so the whole
    bench runs on the CPU chain+arrow path instead of hanging. Returns the
    platform string recorded in the primary metric line.
    """
    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        return "cpu"
    timeout_s = float(os.environ.get("SCORE_TPU_PROBE_TIMEOUT", "300"))
    import subprocess

    code = (
        "import jax, jax.numpy as jnp;"
        "x = jax.jit(lambda a: a*2+1)(jnp.ones((8,128)));"
        "print('PROBE_OK', float(x.ravel()[0]), jax.default_backend())"
    )
    try:
        out = subprocess.run(
            [sys.executable, "-c", code],
            timeout=timeout_s, capture_output=True, text=True,
        )
        if "PROBE_OK" in out.stdout:
            return out.stdout.split()[-1].strip()
    except subprocess.TimeoutExpired:
        pass
    print(
        "TPU probe failed/timed out — falling back to CPU (primary metric "
        "will carry platform='cpu')",
        file=sys.stderr, flush=True,
    )
    # The axon sitecustomize registers the PJRT plugin (and imports jax)
    # at interpreter startup, so mutating os.environ here is too late —
    # this process would still try to initialize the wedged backend.
    # Re-exec with a clean environment instead; the cleared POOL_IPS makes
    # the probe in the fresh process return "cpu" immediately.
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    # CPU extras are minutes-slow; keep the artifact timely unless the
    # caller explicitly asked for the full table.
    env.setdefault("SCORE_TPU_BENCH_QUICK", "1")
    sys.stderr.flush()
    sys.stdout.flush()
    os.execve(sys.executable, [sys.executable] + sys.argv, env)
    return "cpu"  # unreachable


def _emit(obj, primary=False):
    line = json.dumps(obj)
    print(line, file=sys.stderr, flush=True)
    if primary:
        print(line, flush=True)


def _relgap(res) -> float:
    return res.gap / max(1.0, abs(res.primal_objective))


def bench_solve_score(fg, relaxation, params, repeats=3):
    from score_tpu.api import solve_score

    res = solve_score(fg, relaxation, params)  # compile + warmup
    assert res.solved, (
        f"{relaxation} not converged: iters={res.iterations} gap={res.gap:.3e}"
        f" pres={res.primal_residual:.3e} dres={res.dual_residual:.3e}"
    )
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        res = solve_score(fg, relaxation, params)
        times.append(time.perf_counter() - t0)
    return min(times), res, times


def run_primary(platform):
    from score_tpu.api import ScoreSolverParams
    from score_tpu.datasets import goats_pickle_path
    from score_tpu.fg import parse_pickle_file

    fg = parse_pickle_file(goats_pickle_path())
    best, res, times = bench_solve_score(fg, "SOCP", ScoreSolverParams(max_iter=60))
    rg = _relgap(res)
    assert rg <= 1e-6, rg
    line = {
        "metric": "goats14_socp_solve_wall_clock",
        "value": round(best, 4),
        "unit": "seconds",
        "vs_baseline": round(CPU_DENSE_BASELINE_SECONDS / best, 2),
        "status": "OPTIMAL" if res.solved else "NOT_SOLVED",
        "relgap": float(f"{rg:.3e}"),
        "iterations": res.iterations,
        "times": [round(t, 3) for t in times],
        "platform": platform,
    }
    _emit(line, primary=True)
    return fg, line


def extra_qcqp(goats_fg):
    # GOATS QCQP (the reference's default relaxation)
    from score_tpu.api import ScoreSolverParams

    best, res, _ = bench_solve_score(
        goats_fg, "QCQP", ScoreSolverParams(max_iter=60), repeats=2
    )
    rg = _relgap(res)
    assert res.solved and rg <= 1e-5, (res.solved, rg)
    _emit(
        {
            "metric": "goats14_qcqp_solve_wall_clock",
            "value": round(best, 4),
            "unit": "seconds",
            "status": "OPTIMAL",
            "relgap": float(f"{rg:.3e}"),
            "iterations": res.iterations,
        }
    )


def extra_manhattan4(goats_fg):
    # Manhattan 4-robot (the reference's simulated dataset)
    from score_tpu.api import ScoreSolverParams
    from score_tpu.datasets import manhattan_pickle_path
    from score_tpu.fg import parse_pickle_file

    fg = parse_pickle_file(manhattan_pickle_path())
    best, res, _ = bench_solve_score(
        fg, "SOCP", ScoreSolverParams(max_iter=60), repeats=2
    )
    rg = _relgap(res)
    assert res.solved and rg <= 1e-5, (res.solved, rg)
    _emit(
        {
            "metric": "manhattan4_socp_solve_wall_clock",
            "value": round(best, 4),
            "unit": "seconds",
            "status": "OPTIMAL",
            "relgap": float(f"{rg:.3e}"),
            "iterations": res.iterations,
        }
    )


def extra_robot20(goats_fg):
    # 20-robot 2000-pose world (reference shows it as an animation only;
    # regenerated by the simulator — examples/large_scale...)
    from score_tpu.api import ScoreSolverParams
    from score_tpu.sim.manhattan import (
        ManhattanWorldParams,
        simulate_manhattan_world,
    )

    fg20 = simulate_manhattan_world(
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
    best, res, _ = bench_solve_score(
        fg20, "SOCP", ScoreSolverParams(max_iter=60), repeats=2
    )
    rg = _relgap(res)
    assert res.solved and rg <= 1e-6, (res.solved, rg)
    _emit(
        {
            "metric": "manhattan20_socp_solve_wall_clock",
            "value": round(best, 4),
            "unit": "seconds",
            "status": "OPTIMAL",
            "relgap": float(f"{rg:.3e}"),
            "iterations": res.iterations,
        }
    )


def extra_3d(goats_fg):
    # 3D 1000-pose world (dim 3 is first-class in the reference builder,
    # gurobi_utils.py:37-50). 4 robots x 250 poses: T = 256 chains run
    # the plain Db=12 Pallas band — the single-chain 1x1000 variant needs
    # the SPIKE-segmented band whose compile does not fit a bench budget.
    from score_tpu.api import ScoreSolverParams
    from score_tpu.sim.world3d import World3DParams, simulate_3d_world

    fg3 = simulate_3d_world(
        World3DParams(
            num_robots=4, num_poses_per_robot=250, num_landmarks=6,
            range_measure_prob=0.4, seed=3,
        )
    )
    best, res, _ = bench_solve_score(
        fg3, "SOCP", ScoreSolverParams(max_iter=60), repeats=2
    )
    rg = _relgap(res)
    assert res.solved and rg <= 1e-6, (res.solved, rg)
    _emit(
        {
            "metric": "solve3d_1000pose_socp_wall_clock",
            "value": round(best, 4),
            "unit": "seconds",
            "status": "OPTIMAL",
            "relgap": float(f"{rg:.3e}"),
            "iterations": res.iterations,
        }
    )


def extra_mc_batch(goats_fg):
    # 100-trial Monte-Carlo batch (vmapped mixed band)
    import jax
    import numpy as np

    from score_tpu.sim.manhattan import (
        ManhattanWorldParams,
        simulate_manhattan_world,
    )

    from score_tpu.assembly.conic import build_conic_problem
    from score_tpu.parallel.batch import solve_conic_batch, stack_problems
    from score_tpu.sim.manhattan import resample_measurements
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
    backend = (
        MixedChainArrowBackend
        if jax.default_backend() == "tpu"
        else ChainArrowBackend
    )
    params = IPMParams(max_iter=20)
    res = solve_conic_batch(batch, params, backend=backend, backend_aux=ca)
    np.asarray(res.x)  # compile + warmup
    t0 = time.perf_counter()
    res = solve_conic_batch(batch, params, backend=backend, backend_aux=ca)
    np.asarray(res.x)
    warm = time.perf_counter() - t0
    statuses = np.asarray(res.status)
    solved = int(np.isin(statuses, SOLVED_STATUSES).sum())
    assert solved == 100, statuses.tolist()
    _emit(
        {
            "metric": "monte_carlo_100trial_batch_wall_clock",
            "value": round(warm, 4),
            "unit": "seconds",
            "backend": backend.__name__,
            "solved": solved,
            "ms_per_trial": round(warm * 10.0, 2),
        }
    )


def main() -> None:
    platform = _ensure_backend_reachable()
    # host assembly is ~3x faster through the native extension; build it
    # on first use (best-effort — the pure-python fallback is correct)
    try:
        from score_tpu.native import _fastbuild  # noqa: F401
    except ImportError:
        import subprocess

        subprocess.run(
            [sys.executable, "-m", "score_tpu.native.build"],
            check=False, capture_output=True,
        )

    t_prim0 = time.monotonic()
    try:
        goats_fg, primary_line = run_primary(platform)
    except Exception:
        # Safety net for the newest kernel-path feature (compacting CR):
        # if the Mosaic compile or the accuracy assert fails, disable
        # compaction (call-time env knob), drop the traced/compiled
        # caches, and retry the primary once on the plain-PCR path.
        traceback.print_exc()
        print(
            "primary failed — retrying once with CR compaction disabled",
            file=sys.stderr, flush=True,
        )
        os.environ["SCORE_TPU_CR_MIN_LANES"] = str(1 << 30)
        import jax

        jax.clear_caches()
        goats_fg, primary_line = run_primary(platform)
    t_primary = time.monotonic() - t_prim0

    skipped = []
    if os.environ.get("SCORE_TPU_BENCH_QUICK") != "1":
        # Extras in order of importance (VERDICT r3: the 20-robot north
        # star and the MC batch immediately after the primary), each
        # gated on the remaining wall-clock budget: the cost of one
        # extra is compile-dominated, so it is estimated as a multiple
        # of the primary's measured compile+solve time (PROFILE.md
        # compile anatomy: GOATS ~12 min, robot20 ~18, MC batch ~48,
        # QCQP ~12, Manhattan-4 ~14 — ratios below carry ~15% padding).
        # An extra that does not fit is skipped — not killed mid-compile
        # — so every row that fits lands in the artifact and rc is 0.
        for extra, cost_ratio in (
            (extra_robot20, 5.0),
            (extra_3d, 2.5),
            (extra_qcqp, 1.15),
            (extra_manhattan4, 1.35),
            (extra_mc_batch, 4.5),
        ):
            est = cost_ratio * t_primary
            for attempt in (1, 2):
                if _remaining() < est:
                    skipped.append(extra.__name__)
                    print(
                        f"bench extra {extra.__name__} skipped: estimated "
                        f"{est:.0f}s > remaining {_remaining():.0f}s "
                        f"(budget {BUDGET_S:.0f}s)",
                        file=sys.stderr, flush=True,
                    )
                    break
                try:
                    extra(goats_fg)
                    break
                except Exception:
                    # ONE retry when the budget still fits it (the
                    # remote-compile service fails transiently — e.g.
                    # "response body closed before all bytes were read")
                    traceback.print_exc()
                    print(
                        f"bench extra {extra.__name__} failed "
                        f"(attempt {attempt}; primary already emitted)",
                        file=sys.stderr, flush=True,
                    )
    if skipped:
        _emit({"skipped": skipped, "reason": "wall-clock budget",
               "budget_s": BUDGET_S})
    # Re-emit the primary metric line last on stdout so a parser that
    # reads the final JSON line of the run's output records the primary
    # workload (BENCH_r03's `parsed` field picked up the qcqp row).
    print(json.dumps(primary_line), flush=True)


if __name__ == "__main__":
    main()
