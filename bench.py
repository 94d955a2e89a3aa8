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

# The AOT executable cache lives INSIDE the repo by default: the home
# directory (~/.cache) has been observed to be wiped between driver
# sessions while /root/repo persists, and losing the cache turns a
# ~5-min cache-loaded bench into hours of remote compile. The dir is
# gitignored; an explicit SCORE_TPU_AOT_CACHE still wins.
os.environ.setdefault(
    "SCORE_TPU_AOT_CACHE",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".aotcache"),
)

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
    """Probe the TPU tunnel from throwaway subprocesses; fall back to CPU
    only after several attempts spread over minutes.

    The axon pool is single-client and wedges TRANSIENTLY (backend init
    hangs or fails UNAVAILABLE "until the pool recovers on its own" —
    CLAUDE.md). A bench run launched into a wedged pool would hang at
    init and produce NO artifact, so before importing jax in this process
    we jit a trivial kernel in a subprocess under a timeout — and because
    one failed probe is weak evidence of a durable outage (the r4 driver
    run lost its entire TPU table to a single-shot probe), we retry up to
    SCORE_TPU_PROBE_ATTEMPTS times (default 4) with a pause between
    attempts, ~8 minutes worst case. Only then do we clear
    ``PALLAS_AXON_POOL_IPS`` (required — ``JAX_PLATFORMS=cpu`` alone is
    overridden by the plugin) and re-exec onto the CPU chain+arrow path,
    where the FULL table still runs (CPU compiles are local and fast; a
    complete CPU artifact beats one row). Returns the platform string
    recorded in the primary metric line.
    """
    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        return "cpu"
    # Healthy-pool backend init has been measured at 75-175 s through the
    # tunnel — but a healthy pool with a cold remote-compile service has
    # been measured taking 413 s for this same trivial kernel (r5), so
    # per-attempt timeouts must stay ≥ the slow-but-healthy envelope;
    # later attempts shorten (a recovered pool grants fast). Worst case
    # ~18 min of probing still leaves room for the cache-loaded TPU
    # table (~5 min) inside the 2250 s budget.
    timeouts = [
        float(t)
        for t in os.environ.get(
            "SCORE_TPU_PROBE_TIMEOUT", "480,300,240"
        ).split(",")
    ]
    retry_pause_s = float(os.environ.get("SCORE_TPU_PROBE_PAUSE", "30"))
    import subprocess

    code = (
        "import jax, jax.numpy as jnp;"
        "x = jax.jit(lambda a: a*2+1)(jnp.ones((8,128)));"
        "print('PROBE_OK', float(x.ravel()[0]), jax.default_backend())"
    )
    attempts = len(timeouts)
    for attempt, timeout_s in enumerate(timeouts, start=1):
        try:
            out = subprocess.run(
                [sys.executable, "-c", code],
                timeout=timeout_s, capture_output=True, text=True,
            )
            if "PROBE_OK" in out.stdout:
                return out.stdout.split()[-1].strip()
            detail = (out.stderr or out.stdout).strip().splitlines()
            detail = detail[-1] if detail else "no output"
        except subprocess.TimeoutExpired:
            detail = f"timed out after {timeout_s:.0f}s"
        print(
            f"TPU probe attempt {attempt}/{attempts} failed ({detail})",
            file=sys.stderr, flush=True,
        )
        if attempt < attempts:
            # a killed/waiting client can hold the grant for a while;
            # give the pool time to recover before re-probing
            time.sleep(retry_pause_s)
    print(
        f"TPU unreachable after {attempts} probe attempts — falling back "
        "to CPU (full table; primary metric will carry platform='cpu')",
        file=sys.stderr, flush=True,
    )
    # The axon sitecustomize registers the PJRT plugin (and imports jax)
    # at interpreter startup, so mutating os.environ here is too late —
    # this process would still try to initialize the wedged backend.
    # Re-exec with a clean environment instead; the cleared POOL_IPS makes
    # the probe in the fresh process return "cpu" immediately. The full
    # extras table still runs (budget-guarded) — QUICK=1 is NOT forced.
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    # never load AOT-cached executables on the CPU path: XLA:CPU AOT
    # results are pinned to the compile machine's CPU features and
    # SEGFAULT when the host changes across driver sessions (measured:
    # cpu_aot_loader "+prefer-no-scatter not supported" then SIGSEGV).
    # CPU compiles are local and fast; the cache buys nothing here.
    env["SCORE_TPU_AOT_CACHE"] = "0"
    sys.stderr.flush()
    sys.stdout.flush()
    os.execve(sys.executable, [sys.executable] + sys.argv, env)
    return "cpu"  # unreachable


_PLATFORM = "unknown"  # set by main() from the probe result

# every metric row emitted this run, last emission wins per metric —
# re-emitted as ONE {"summary": [...]} line at the very end, because
# the driver's BENCH artifact records only the TAIL of combined output
# (BENCH_r03/r04: ~4 lines) and rows printed early in a 7-workload run
# would otherwise scroll out of the artifact
_ROWS = {}


def _emit(obj, primary=False):
    obj.setdefault("platform", _PLATFORM)
    if "metric" in obj:
        _ROWS[obj["metric"]] = obj
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


def run_primary(platform, fg=None):
    from score_tpu.api import ScoreSolverParams
    from score_tpu.datasets import goats_pickle_path
    from score_tpu.fg import parse_pickle_file

    if fg is None:
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


class _SolveScoreExtra:
    """One solve_score-shaped extra, split into warm() (build + first
    solve: compile-dominated, thread-safe, untimed) and run() (timed
    repeats + the metric emit). The split lets the warm phases of all
    extras execute CONCURRENTLY from threads — the remote-compile
    service overlaps distinct graphs' compiles, so the suite pays
    ~max(compile) instead of sum(compile)."""

    def __init__(self, name, metric, build_fg, relaxation="SOCP",
                 relgap_tol=1e-6, repeats=2):
        self.name = name
        self.metric = metric
        self.build_fg = build_fg
        self.relaxation = relaxation
        self.relgap_tol = relgap_tol
        self.repeats = repeats
        self.fg = None

    def warm(self):
        from score_tpu.api import ScoreSolverParams, solve_score

        self.fg = self.build_fg()
        res = solve_score(
            self.fg, self.relaxation, ScoreSolverParams(max_iter=60)
        )
        assert res.solved, (self.name, res.iterations, res.gap)

    def run(self):
        from score_tpu.api import ScoreSolverParams

        if self.fg is None:
            self.warm()
        best, res, _ = bench_solve_score(
            self.fg, self.relaxation, ScoreSolverParams(max_iter=60),
            repeats=self.repeats,
        )
        rg = _relgap(res)
        assert res.solved and rg <= self.relgap_tol, (res.solved, rg)
        _emit(
            {
                "metric": self.metric,
                "value": round(best, 4),
                "unit": "seconds",
                "status": "OPTIMAL",
                "relgap": float(f"{rg:.3e}"),
                "iterations": res.iterations,
            }
        )


def _build_goats(goats_fg):
    return lambda: goats_fg


def _build_manhattan4():
    from score_tpu.datasets import manhattan_pickle_path
    from score_tpu.fg import parse_pickle_file

    return parse_pickle_file(manhattan_pickle_path())


def _build_robot20():
    # 20-robot 2000-pose world (the reference shows it as an animation
    # only, media/20robot_animation.gif; regenerated by the simulator)
    from score_tpu.sim.manhattan import (
        ManhattanWorldParams,
        simulate_manhattan_world,
    )

    return simulate_manhattan_world(
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


def _build_3d():
    # 3D 1000-pose world (dim 3 is first-class in the reference builder,
    # gurobi_utils.py:37-50). 4 robots x 250 poses: T = 256 chains run
    # the plain Db=12 Pallas band — the single-chain 1x1000 variant needs
    # the SPIKE-segmented band whose compile does not fit a bench budget.
    from score_tpu.sim.world3d import World3DParams, simulate_3d_world

    return simulate_3d_world(
        World3DParams(
            num_robots=4, num_poses_per_robot=250, num_landmarks=6,
            range_measure_prob=0.4, seed=3,
        )
    )


def _build_3d_single_chain():
    # 3D 1000-pose SINGLE-chain world: the genuine long-single-chain
    # configuration the reference's dim-3 builder implies for an
    # AUV-style deployment (gurobi_utils.py:37-50). T ~ 1024 > 256, so
    # the mixed backend routes the SPIKE-segmented Pallas band
    # (pallas_pcr.seg_factor_pallas; tests/test_pallas_pcr.py::
    # test_segmented_band_matches_dense). Its compile is the most
    # expensive of the suite (~55 min remote), so the extra is LAST in
    # priority: with the AOT cache populated it loads in ~1 s; cold it
    # is abandoned/skipped at the budget deadline without harming the
    # other rows. CPU-validated: 2363 ranges, 16 iters, relgap 3.7e-7.
    from score_tpu.sim.world3d import World3DParams, simulate_3d_world

    return simulate_3d_world(
        World3DParams(
            num_robots=1, num_poses_per_robot=1000, num_landmarks=6,
            range_measure_prob=0.4, seed=3,
        )
    )


class _McBatchExtra:
    """100-trial Monte-Carlo batch (vmapped mixed band)."""

    name = "extra_mc_batch"

    def __init__(self):
        self._state = None

    def warm(self):
        import jax
        import numpy as np

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
        from score_tpu.solver.ipm import IPMParams

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
        # No Gondzio correctors for the batch: each corrector is one more
        # condensed band solve in EVERY trip of the batched while_loop,
        # but the batch runs to the SLOWEST lane — and the measured trip
        # count barely moves without them (scratch/mc_gondzio_sweep.py,
        # 100 trials: trips_max 15 -> 14, all solved, relgap_max 9.2e-7
        # vs 1.0e-6). Solves per pre-endgame trip drop 4 -> 2.
        import dataclasses

        params = dataclasses.replace(
            IPMParams(max_iter=20), gondzio_correctors=0
        )
        res = solve_conic_batch(batch, params, backend=backend,
                                backend_aux=ca)
        np.asarray(res.x)  # compile + warmup
        self._state = (batch, params, backend, ca)

    def run(self):
        import numpy as np

        from score_tpu.parallel.batch import solve_conic_batch
        from score_tpu.solver.ipm import SOLVED_STATUSES

        if self._state is None:
            self.warm()
        batch, params, backend, ca = self._state
        t0 = time.perf_counter()
        res = solve_conic_batch(batch, params, backend=backend,
                                backend_aux=ca)
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
    global _PLATFORM
    platform = _ensure_backend_reachable()
    _PLATFORM = platform
    if platform != "tpu":
        # same hazard as the re-exec path above: a direct CPU run
        # (POOL_IPS unset) must not load machine-pinned XLA:CPU AOT
        # blobs compiled on an earlier host. score_tpu reads the env
        # var lazily, so disabling here is effective.
        os.environ["SCORE_TPU_AOT_CACHE"] = "0"
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

    quick = os.environ.get("SCORE_TPU_BENCH_QUICK") == "1"
    # Concurrent warms are the DEFAULT (set SCORE_TPU_BENCH_THREADS=0 to
    # force serial): the remote-compile service overlaps distinct
    # graphs' compiles issued from threads of the single tunnel client
    # (probed: overlap 0.8), and the r4 populate run held 5 warm
    # threads + the primary on TPU for 2 h without incident. With the
    # AOT executable cache populated, each warm is just a disk load.
    threaded = (
        not quick
        and os.environ.get("SCORE_TPU_BENCH_THREADS", "1") == "1"
    )

    extras = []
    warm_ok = {}
    if not quick:
        # Extras in order of importance (VERDICT r3: the 20-robot north
        # star first), with per-extra cost estimated as a multiple of
        # the primary's measured compile+solve time (r4 measured
        # compiles: GOATS ~305 s, robot20 ~1450 s; ratios carry ~15%
        # padding). An extra that does not fit the remaining budget is
        # skipped — not killed mid-compile — so every row that fits
        # lands in the artifact and rc is 0.
        from score_tpu.datasets import goats_pickle_path
        from score_tpu.fg import parse_pickle_file

        goats_fg = parse_pickle_file(goats_pickle_path())
        extras = [
            (_SolveScoreExtra(
                "extra_robot20", "manhattan20_socp_solve_wall_clock",
                _build_robot20), 5.0),
            (_SolveScoreExtra(
                "extra_3d", "solve3d_1000pose_socp_wall_clock",
                _build_3d), 2.5),
            # relgap asserts at the BASELINE.md north-star 1e-6 — the
            # solver delivers 4.9e-8 (QCQP) / 2.3e-7 (manhattan-4), so
            # the loose 1e-5 of earlier rounds understated it
            (_SolveScoreExtra(
                "extra_qcqp", "goats14_qcqp_solve_wall_clock",
                _build_goats(goats_fg), relaxation="QCQP"), 1.15),
            (_SolveScoreExtra(
                "extra_manhattan4", "manhattan4_socp_solve_wall_clock",
                _build_manhattan4), 1.35),
            (_McBatchExtra(), 4.5),
            # last: ~55-min cold compile, ~1 s from the AOT cache; the
            # budget guard skips it when cold rather than losing rows
            (_SolveScoreExtra(
                "extra_3d_single_chain",
                "solve3d_single_chain_socp_wall_clock",
                _build_3d_single_chain), 12.0),
        ]
    else:
        goats_fg = None

    # Concurrent warm phase: the remote-compile service overlaps
    # distinct graphs' compiles issued from separate threads of the
    # single tunnel client, so warming every extra concurrently (and
    # the primary with them) costs ~max(compile) instead of
    # sum(compile). Daemon threads: a warm that outlives the budget
    # deadline is abandoned (its extra is skipped) and dies with the
    # process.
    threads = {}
    if threaded:
        import threading

        def _warm(extra):
            try:
                extra.warm()
                warm_ok[extra.name] = True
            except Exception:
                traceback.print_exc()
                warm_ok[extra.name] = False

        threads = {
            e.name: threading.Thread(target=_warm, args=(e,), daemon=True)
            for e, _ in extras
        }
        for t in threads.values():
            t.start()

    t_prim0 = time.monotonic()
    try:
        goats_fg, primary_line = run_primary(platform, goats_fg)
    except Exception:
        # Safety net for the newest kernel-path feature (compacting CR):
        # if the Mosaic compile or the accuracy assert fails, disable
        # compaction (call-time env knob), drop the traced/compiled
        # caches, and retry the primary once on the plain-PCR path.
        # (clear_caches also drops any concurrently-warmed extras — the
        # failure path pays their compiles again in run().)
        traceback.print_exc()
        print(
            "primary failed — retrying once with CR compaction disabled",
            file=sys.stderr, flush=True,
        )
        os.environ["SCORE_TPU_CR_MIN_LANES"] = str(1 << 30)
        import jax

        jax.clear_caches()
        warm_ok.clear()
        goats_fg, primary_line = run_primary(platform, goats_fg)
    t_primary = time.monotonic() - t_prim0

    skipped = []
    if not quick and threaded:
        # Event loop over the warm threads (replaces in-order joins: a
        # slow first warm must not starve already-warmed extras of
        # their seconds-long timed runs — the r4 populate run lost
        # every extra row to exactly that). Each extra runs as soon as
        # ITS warm completes; warms still compiling when the budget
        # runs out are abandoned (daemon threads die with the process).
        import time as _time

        pending = [e for e, _ in extras]
        while pending and _remaining() > 30.0:
            progressed = False
            for extra in list(pending):
                t = threads[extra.name]
                if t.is_alive():
                    continue
                pending.remove(extra)
                progressed = True
                if warm_ok.get(extra.name) is False:
                    # surfaced in the artifact log: this extra's timed
                    # run() re-pays its compile inline (warm failed)
                    print(
                        f"bench extra {extra.name}: warm phase failed — "
                        "run() will re-pay the compile",
                        file=sys.stderr, flush=True,
                    )
                for attempt in (1, 2):
                    if _remaining() < 30.0:
                        skipped.append(extra.name)
                        break
                    try:
                        extra.run()  # warm succeeded: seconds; failed:
                        break        # re-pays its compile inline
                    except Exception:
                        # ONE retry (the remote-compile service fails
                        # transiently — e.g. "response body closed
                        # before all bytes were read")
                        traceback.print_exc()
                        print(
                            f"bench extra {extra.name} failed "
                            f"(attempt {attempt}; primary already "
                            f"emitted)",
                            file=sys.stderr, flush=True,
                        )
            if pending and not progressed:
                _time.sleep(10.0)
        for extra in pending:
            skipped.append(extra.name)
            print(
                f"bench extra {extra.name} skipped: warm still compiling "
                f"at the budget deadline (budget {BUDGET_S:.0f}s)",
                file=sys.stderr, flush=True,
            )
    elif not quick:
        for extra, cost_ratio in extras:
            # serial mode (SCORE_TPU_BENCH_THREADS=0): estimate each
            # extra's cost as a multiple of the primary's measured
            # compile+solve time and skip what cannot fit — never die
            # mid-compile at the driver's deadline
            est = cost_ratio * t_primary
            for attempt in (1, 2):
                if _remaining() < est:
                    skipped.append(extra.name)
                    print(
                        f"bench extra {extra.name} skipped: estimated "
                        f"{est:.0f}s > remaining {_remaining():.0f}s "
                        f"(budget {BUDGET_S:.0f}s)",
                        file=sys.stderr, flush=True,
                    )
                    break
                try:
                    extra.run()
                    break
                except Exception:
                    traceback.print_exc()
                    print(
                        f"bench extra {extra.name} failed "
                        f"(attempt {attempt}; primary already emitted)",
                        file=sys.stderr, flush=True,
                    )
    if skipped:
        _emit({"skipped": skipped, "reason": "wall-clock budget",
               "budget_s": BUDGET_S})
    if threaded and _remaining() > 30.0:
        # the primary's timed repeats ran while the warm threads'
        # first executions could interleave on the device; re-measure
        # on the now-quiet device and keep the better (smaller) time
        try:
            from score_tpu.api import ScoreSolverParams

            best2, res2, times2 = bench_solve_score(
                goats_fg, "SOCP", ScoreSolverParams(max_iter=60)
            )
            if res2.solved and best2 < primary_line["value"]:
                primary_line["value"] = round(best2, 4)
                primary_line["vs_baseline"] = round(
                    CPU_DENSE_BASELINE_SECONDS / best2, 2
                )
                primary_line["times"] = [round(t, 3) for t in times2]
                _emit(primary_line)
        except Exception:
            traceback.print_exc()
    # The driver's BENCH artifact keeps only the tail of combined
    # output, so pack EVERY row into one summary line here at the end
    # (the full table survives any tail length >= 2 lines)...
    _ROWS[primary_line["metric"]] = primary_line
    if len(_ROWS) > 1:
        print(
            json.dumps(
                {"summary": list(_ROWS.values()), "platform": _PLATFORM}
            ),
            flush=True,
        )
    # ...and re-emit the primary metric line LAST on stdout so a parser
    # that reads the final JSON line of the run's output records the
    # primary workload (BENCH_r03's `parsed` field picked up the qcqp
    # row).
    print(json.dumps(primary_line), flush=True)


if __name__ == "__main__":
    main()
