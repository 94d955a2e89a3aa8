"""Characterize remote-compile cost through the axon tunnel (round 4).

The round-3 bench was killed at the driver's time budget with only 2 of 5
workloads captured; fitting the full table needs to know WHERE compile
time goes: per-Mosaic-kernel cost, whether identical kernels dedupe
across separate jit executables in one process, and how much the
compacting-CR preamble's extra kernel variants cost vs plain PCR.

Steps (one JSON line each):
  probe              tiny jit (tunnel health + backend)
  kernelgraph1       jit of band factor + K=1 solve + K=8 panel solve at
                     GOATS shapes (C=1, T=1024, Db=6) — compile + exec
  kernelgraph2       a DIFFERENT jit containing the same pallas kernels —
                     if compile2 << compile1, kernels dedupe in-process
  goats_e2e          solve_score GOATS SOCP: first call (full-graph
                     compile) + warm best of 3
  goats_cr_off       same after SCORE_TPU_CR_MIN_LANES=1<<30 +
                     clear_caches (plain-PCR band: fewer kernel variants)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def log(step, **kw):
    print(json.dumps({"step": step, **kw}), flush=True)


def main():
    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    x = jax.jit(lambda a: a * 2 + 1)(jnp.ones((8, 128)))
    v = float(x.ravel()[0])
    log("probe", s=round(time.perf_counter() - t0, 2),
        backend=jax.default_backend(), v=v)
    assert jax.default_backend() == "tpu"

    from score_tpu.ops import twofloat as tfm
    from score_tpu.ops.twofloat import TF
    from score_tpu.ops.pallas_pcr import (
        ppcr_factor_pallas,
        ppcr_solve_pallas,
    )

    C, T, Db = 1, 1024, 6
    rng = np.random.default_rng(0)
    D64 = np.broadcast_to(4.0 * np.eye(Db), (C, T, Db, Db)) + 0.1 * rng.random(
        (C, T, Db, Db)
    )
    D64 = 0.5 * (D64 + np.swapaxes(D64, -1, -2))
    U64 = 0.05 * rng.random((C, T, Db, Db))
    U64[:, T - 1] = 0.0
    r1 = rng.standard_normal((C, T, Db, 1))
    r8 = rng.standard_normal((C, T, Db, 8))
    Dt = tfm.from_f64(jnp.asarray(D64))
    Ut = tfm.from_f64(jnp.asarray(U64))
    R1 = tfm.from_f64(jnp.asarray(r1))
    R8 = tfm.from_f64(jnp.asarray(r8))

    def fac_solve(dh, dl, uh, ul, r1h, r1l, r8h, r8l):
        f = ppcr_factor_pallas(TF(dh, dl), TF(uh, ul))
        x1 = ppcr_solve_pallas(f, TF(r1h, r1l))
        x8 = ppcr_solve_pallas(f, TF(r8h, r8l))
        return jnp.sum(x1.hi) + jnp.sum(x1.lo) + jnp.sum(x8.hi)

    args = (Dt.hi, Dt.lo, Ut.hi, Ut.lo, R1.hi, R1.lo, R8.hi, R8.lo)
    t0 = time.perf_counter()
    j1 = jax.jit(fac_solve)
    out = j1(*args)
    s = float(np.asarray(out))
    log("kernelgraph1", compile_s=round(time.perf_counter() - t0, 1), sink=s)
    t0 = time.perf_counter()
    s = float(np.asarray(j1(*args)))
    log("kernelgraph1_warm", s=round(time.perf_counter() - t0, 3))

    def fac_solve2(dh, dl, uh, ul, r1h, r1l, r8h, r8l):
        f = ppcr_factor_pallas(TF(dh, dl), TF(uh, ul))
        x1 = ppcr_solve_pallas(f, TF(r1h, r1l))
        x8 = ppcr_solve_pallas(f, TF(r8h, r8l))
        return jnp.sum(x1.hi) - jnp.sum(x8.lo) + 1.0

    t0 = time.perf_counter()
    s = float(np.asarray(jax.jit(fac_solve2)(*args)))
    log("kernelgraph2", compile_s=round(time.perf_counter() - t0, 1), sink=s)

    from score_tpu.api import ScoreSolverParams, solve_score
    from score_tpu.datasets import goats_pickle_path
    from score_tpu.fg import parse_pickle_file

    fg = parse_pickle_file(goats_pickle_path())
    params = ScoreSolverParams(max_iter=60)
    t0 = time.perf_counter()
    res = solve_score(fg, "SOCP", params)
    log("goats_e2e_first", s=round(time.perf_counter() - t0, 1),
        solved=res.solved, iters=res.iterations,
        relgap=float(f"{res.gap / max(1.0, abs(res.primal_objective)):.3e}"))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        res = solve_score(fg, "SOCP", params)
        times.append(time.perf_counter() - t0)
    log("goats_e2e_warm", best=round(min(times), 4),
        times=[round(t, 3) for t in times])

    os.environ["SCORE_TPU_CR_MIN_LANES"] = str(1 << 30)
    jax.clear_caches()
    from score_tpu import api as _api
    _api._ASSEMBLY_CACHE.clear()
    _api._prepare_jit.cache_clear()
    t0 = time.perf_counter()
    res = solve_score(fg, "SOCP", params)
    log("goats_cr_off_first", s=round(time.perf_counter() - t0, 1),
        solved=res.solved, iters=res.iterations,
        relgap=float(f"{res.gap / max(1.0, abs(res.primal_objective)):.3e}"))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        res = solve_score(fg, "SOCP", params)
        times.append(time.perf_counter() - t0)
    log("goats_cr_off_warm", best=round(min(times), 4),
        times=[round(t, 3) for t in times])


if __name__ == "__main__":
    main()
