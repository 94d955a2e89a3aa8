"""Per-trip anatomy of the 100-trial Monte-Carlo batch (VERDICT r3 #7).

The bench MC workload runs ~15 batch-level while_loop trips at ~575 ms
each (8.6 s warm). Each phase here is scan-repeated inside one jit
(tunnel-floor-free) at the EXACT bench scale (100 trials x 4x50-pose
worlds, MixedChainArrowBackend, branchless):

  trip     one full batch body: vmapped book + shared gates + vmapped
           apply, carried along the REAL solve trajectory
  book     vmapped _advance_book only (residual/convergence bookkeeping)
  factor   vmapped backend.factor (assembly + band factorization)
  solve    one vmapped condensed solve (fixed factors)

argv[1] = comma-separated phases. Prints one JSON line per phase.
"""
import fcntl
import json
import sys
import time

import numpy as np


def main():
    import os

    import jax
    import jax.numpy as jnp

    phases = (sys.argv[1].split(",") if len(sys.argv) > 1
              else ["empty", "book", "factor", "solve", "trip"])
    if os.environ.get("MB_ALLOW_CPU") != "1":
        assert jax.default_backend() == "tpu", jax.default_backend()

    import dataclasses

    from score_tpu.assembly.conic import build_conic_problem
    from score_tpu.parallel.batch import stack_problems
    from score_tpu.sim.manhattan import (
        ManhattanWorldParams,
        resample_measurements,
        simulate_manhattan_world,
    )
    from score_tpu.solver import ipm as _ipm
    from score_tpu.solver.chain_arrow import (
        MixedChainArrowBackend as be,
        build_chain_arrow,
    )
    from score_tpu.solver.ipm import IPMParams

    NTRIALS = int(os.environ.get("MB_TRIALS", "100"))
    base = simulate_manhattan_world(
        ManhattanWorldParams(
            num_robots=4, num_poses_per_robot=50, num_landmarks=4,
            grid_size=10, range_measure_prob=0.4, seed=0,
        )
    )
    trials = [resample_measurements(base, seed=s) for s in range(NTRIALS)]
    problems = [build_conic_problem(t, "SOCP")[0] for t in trials]
    batch = stack_problems(problems)
    _, idx = build_conic_problem(trials[0], "SOCP")
    aux = build_chain_arrow(problems[0], idx)
    params = dataclasses.replace(IPMParams(max_iter=20), branchless=True)

    so_axes = getattr(be, "state_batch_axes", 0)

    def prep_one(pb):
        so = be.prepare(pb, aux)
        st0 = _ipm._make_initial_state(be, pb, so, params)
        return so, st0

    so_b, st_b = jax.jit(
        lambda b: jax.vmap(prep_one, out_axes=(so_axes, 0))(b)
    )(batch)

    REPS = 15

    def timed(name, fn, *args):
        jfn = jax.jit(fn)
        out = jfn(*args)  # compile
        s = float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        with open("/tmp/tpu_measure.lock", "w") as lk:
            fcntl.flock(lk, fcntl.LOCK_EX)
            best = np.inf
            for _ in range(3):
                t0 = time.perf_counter()
                out = jfn(*args)
                s = float(
                    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
                )
                best = min(best, time.perf_counter() - t0)
        print(
            json.dumps(
                {"phase": name, "total_ms": round(best * 1e3, 2),
                 "per_call_ms": round(best * 1e3 / REPS, 3), "sink": s}
            ),
            flush=True,
        )

    book = jax.vmap(
        lambda pb, so, s: _ipm._advance_book(be, pb, so, params, s),
        in_axes=(0, so_axes, 0),
    )

    gate_refine = params.dir_refine_gate > 0.0 and params.dir_refine_steps > 0

    def trip_body(st):
        st, terminal, rx, rz = book(batch, so_b, st)
        live = ~terminal
        near = jnp.any((st.best_metric < params.dir_refine_gate) & live)
        shared_refine = near if gate_refine else None
        shared_center = near | jnp.any((st.stall > 0) & live)
        return jax.vmap(
            lambda pb, so, s, t, rx_, rz_: _ipm._advance_apply(
                be, pb, so, params, s, t, rx_, rz_,
                shared_refine=shared_refine, shared_center=shared_center,
            ),
            in_axes=(0, so_axes, 0, 0, 0, 0),
        )(batch, so_b, st, terminal, rx, rz)

    if "empty" in phases:
        def empty(st0):
            def step(c, _):
                return c * 1.0000001, None
            c, _ = jax.lax.scan(step, jnp.asarray(0.0, jnp.float64), None,
                                length=REPS)
            return c
        timed("empty", empty, st_b)

    if "trip" in phases:
        # real trajectory: REPS trips from the initial state — exactly
        # the while_loop body the bench pays, sans the cond evaluation
        def trip_loop(st0):
            def step(st, _):
                return trip_body(st), None
            st, _ = jax.lax.scan(step, st0, None, length=REPS)
            return st.x
        timed("trip", trip_loop, st_b)

    if "book" in phases:
        def book_loop(st0):
            def step(st, _):
                st2, terminal, rx, rz = book(batch, so_b, st)
                # consume outputs; keep state frozen so cost is constant
                pert = 1e-15 * (jnp.sum(rx[0]) + jnp.sum(rz[0]))
                return st2._replace(x=st2.x * (1.0 + pert)), None
            st, _ = jax.lax.scan(step, st0, None, length=REPS)
            return st.x
        timed("book", book_loop, st_b)

    # batched NT-like scalings for factor/solve phases
    N, k = problems[0].num_cones, problems[0].k
    rng = np.random.default_rng(0)
    W_b = jnp.asarray(
        np.broadcast_to(np.eye(k), (NTRIALS, N, k, k))
        * (1.0 + 0.5 * rng.random((NTRIALS, N, 1, 1)))
    )
    rhs_b = jnp.asarray(rng.standard_normal((NTRIALS, problems[0].n)))

    vfactor = jax.vmap(
        lambda pb, so, W: be.factor(pb, so, W, params),
        in_axes=(0, so_axes, 0),
    )

    if "factor" in phases:
        def factor_loop(W0):
            def step(c, _):
                f = vfactor(batch, so_b, W0 * (1.0 + 1e-12 * c))
                leaves = jax.tree_util.tree_leaves(f)
                s = sum(jnp.sum(jnp.abs(l.astype(jnp.float64)))
                        for l in leaves)
                return 1e-15 * s, None
            c, _ = jax.lax.scan(step, jnp.asarray(0.0, jnp.float64), None,
                                length=REPS)
            return c
        timed("factor", factor_loop, W_b)

    if "solve" in phases:
        factors_b = jax.jit(
            lambda W: vfactor(batch, so_b, W)
        )(W_b)
        vsolve = jax.vmap(
            lambda pb, so, f, r: be._solve_once(pb, so, f, r),
            in_axes=(0, so_axes, 0, 0),
        )

        def solve_loop(r0):
            def step(c, _):
                x = vsolve(batch, so_b, factors_b, r0 * (1.0 + 1e-12 * c))
                return 1e-15 * jnp.sum(jnp.abs(x)), None
            c, _ = jax.lax.scan(step, jnp.asarray(0.0, jnp.float64), None,
                                length=REPS)
            return c
        timed("solve", solve_loop, rhs_b)


if __name__ == "__main__":
    main()
