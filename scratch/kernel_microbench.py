"""Device-accurate per-phase microbench (mixed path).

The axon tunnel imposes ~30 ms per individually-timed dispatch, so each
phase here is run REPS times inside one jitted lax.scan (carry-dependent
so XLA cannot hoist it) and the per-call time is (wall - base)/REPS.
argv[1] = comma-separated phases; argv[2] = workload (goats | robot20).
Phases:

  factor    full MixedChainArrowBackend.factor (assembly + band factor)
  assemble  _assemble only (W-dependent KKT block build, f64 einsums)
  band      _factor_band only (two-float Pallas PCR + arrow Schur)
  bandfac   two-float Pallas PCR factorization alone
  panel     the arrow coupling-panel solve Z = T^-1 B alone (K = A rhs)
  schur     S - B'Z formation + dense Cholesky alone
  solve     one condensed band solve (_solve_once)
  ops       one P/G/G' residual operator set
  advance   one full IPM iteration

Prints one JSON line per phase.
"""
import fcntl
import json
import time

import numpy as np


def main():
    import os
    import sys

    import jax
    import jax.numpy as jnp

    phases = (sys.argv[1].split(",") if len(sys.argv) > 1
              else ["empty", "factor", "assemble", "band", "solve", "ops"])
    workload = sys.argv[2] if len(sys.argv) > 2 else "goats"

    if os.environ.get("MB_ALLOW_CPU") != "1":
        assert jax.default_backend() == "tpu", jax.default_backend()

    from score_tpu.assembly.conic import build_conic_problem
    from score_tpu.assembly.normalize import normalize_factor_graph
    from score_tpu.datasets import goats_pickle_path
    from score_tpu.fg import parse_pickle_file
    from score_tpu.solver.chain_arrow import (
        ChainArrowBackend,
        MixedChainArrowBackend,
        build_chain_arrow,
    )
    from score_tpu.solver.ipm import IPMParams

    if workload == "goats":
        fg = parse_pickle_file(goats_pickle_path())
    elif workload == "robot20":
        from score_tpu.sim.manhattan import (
            ManhattanWorldParams,
            simulate_manhattan_world,
        )

        fg = simulate_manhattan_world(
            ManhattanWorldParams(
                num_robots=20, num_poses_per_robot=100, num_landmarks=10,
                grid_size=30, range_measure_prob=0.25,
                inter_robot_measure_prob=0.05, seed=20,
            )
        )
    else:
        raise SystemExit(f"unknown workload {workload}")
    fg, _ = normalize_factor_graph(fg)
    problem, idx = build_conic_problem(fg, "SOCP")
    aux = build_chain_arrow(problem, idx)
    # device arrays: phases close over `problem`, and numpy leaves cannot
    # be indexed by tracers inside the jitted loops
    problem = jax.tree_util.tree_map(jnp.asarray, problem)
    params = IPMParams()
    be = MixedChainArrowBackend
    state = be.prepare(problem, aux)
    N, k = problem.num_cones, problem.k
    rng = np.random.default_rng(0)
    # realistic non-identity NT scalings
    w = jnp.asarray(1.0 + 0.5 * rng.random((N, 1, 1)))
    Winv2 = jnp.broadcast_to(jnp.eye(k), (N, k, k)) * w
    rhs = jnp.asarray(rng.standard_normal(problem.n)) * state.mask

    REPS = 30

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

    def scan_over(body):
        # carry a perturbation so every trip depends on the last
        def wrapped(W0):
            def step(c, _):
                out = body(W0 * (1.0 + 1e-12 * c))
                leaves = jax.tree_util.tree_leaves(out)
                # consume EVERY element so XLA cannot slice/DCE any of
                # the phase's work out of the loop
                s = sum(jnp.sum(jnp.abs(l.astype(jnp.float64)))
                        for l in leaves)
                return 1e-15 * s, None
            c, _ = jax.lax.scan(step, jnp.asarray(0.0, jnp.float64),
                                None, length=REPS)
            return c
        return wrapped

    # baseline: empty scan of same length (loop overhead)
    def empty(W0):
        def step(c, _):
            return c * 1.0000001, None
        c, _ = jax.lax.scan(step, jnp.asarray(0.0, jnp.float64), None,
                            length=REPS)
        return c

    if "empty" in phases:
        timed("empty", empty, Winv2)

    if "factor" in phases:
        timed("factor",
              scan_over(lambda W: be.factor(problem, state, W, params)),
              Winv2)
    if "assemble" in phases:
        timed(
            "assemble",
            scan_over(lambda W: ChainArrowBackend._assemble(
                problem, state, W, params)[:4]),
            Winv2,
        )

    st = state.structure
    Dg, Ug, Bg, Sg, kdd, wv, Hhat, delta = ChainArrowBackend._assemble(
        problem, state, Winv2, params
    )

    def band_only(W):
        # W-dependent scale keeps the scan honest without re-assembling
        sc = 1.0 + 1e-12 * jnp.sum(W[..., :1, :1])
        return be._factor_band(st, Dg * sc, Ug, Bg, Sg, delta, params,
                               use_tf=True)[2]

    if "band" in phases:
        timed("band", scan_over(band_only), Winv2)

    if any(p in phases for p in ("bandfac", "panel", "schur")):
        # decompose the band phase: equilibrate exactly like the mixed
        # factor, then time each stage against FIXED upstream inputs
        from score_tpu.ops import twofloat as tfm
        from score_tpu.ops.pallas_pcr import (
            ppcr_factor_pallas,
            ppcr_solve_pallas,
        )
        from score_tpu.solver.pcr import pcr_pad_length

        C, T, D, A = st.C, st.T, st.D, st.A
        iD = jnp.arange(D)
        dCs = 1.0 / jnp.sqrt(Dg[..., iD, iD])
        dAs = 1.0 / jnp.sqrt(jnp.diag(Sg))
        DgE = Dg * dCs[..., :, None] * dCs[..., None, :]
        UgE = (Ug * dCs[:, :-1, :, None] * dCs[:, 1:, None, :]
               if T > 1 else Ug)
        BgE = Bg * dCs[..., :, None] * dAs[None, None, None, :]
        SgE = Sg * dAs[:, None] * dAs[None, :]
        Tp = pcr_pad_length(T)
        Dp = jnp.broadcast_to(
            jnp.eye(D, dtype=Dg.dtype), (C, Tp, D, D)
        ).at[:, :T].set(DgE)
        Up = jnp.zeros((C, Tp, D, D), Dg.dtype)
        if T > 1:
            Up = Up.at[:, : T - 1].set(UgE)
        Bp2 = jnp.zeros((C, Tp, D, A), Dg.dtype).at[:, :T].set(BgE)

        if "bandfac" in phases:
            timed(
                "bandfac",
                scan_over(lambda W: ppcr_factor_pallas(
                    tfm.from_f64(
                        Dp * (1.0 + 1e-12 * jnp.sum(W[..., :1, :1]))
                    ),
                    tfm.from_f64(Up),
                )),
                Winv2,
            )
        pcrf2 = jax.jit(
            lambda d: ppcr_factor_pallas(tfm.from_f64(d), tfm.from_f64(Up))
        )(Dp)
        if "panel" in phases:
            timed(
                "panel",
                scan_over(lambda W: ppcr_solve_pallas(
                    pcrf2,
                    tfm.from_f64(
                        Bp2 * (1.0 + 1e-12 * jnp.sum(W[..., :1, :1]))
                    ),
                )),
                Winv2,
            )
        Z2 = jax.jit(
            lambda b: tfm.to_f64(
                ppcr_solve_pallas(pcrf2, tfm.from_f64(b))
            )
        )(Bp2)
        if "schur" in phases:
            # route exactly like production _factor_band: exact_mm for
            # the B'Z product and the blocked arrow Cholesky when those
            # paths would be taken for this workload
            from score_tpu.ops import ozaki
            from score_tpu.solver.chain_arrow import (
                _use_blocked_arrow,
                _use_exact_mm,
            )
            from score_tpu.solver.smallblocks import chol_blocked

            Kc2 = C * Tp * D
            use_mm = _use_exact_mm(st, Dg.dtype, Kc2 * A * A)
            use_blk = _use_blocked_arrow(st, Dg.dtype, A)

            def schur_once(W):
                sc = 1.0 + 1e-12 * jnp.sum(W[..., :1, :1])
                if use_mm:
                    S2 = SgE * sc - ozaki.mm_f64(
                        Bp2.reshape(Kc2, A), Z2.reshape(Kc2, A)
                    ).astype(Dg.dtype)
                else:
                    S2 = SgE * sc - jnp.einsum("ctia,ctib->ab", Bp2, Z2)
                if use_blk:
                    return chol_blocked(S2)[0]
                return jnp.linalg.cholesky(S2)

            print(json.dumps({"schur_routing": {
                "exact_mm": bool(use_mm), "blocked_arrow": bool(use_blk),
            }}), flush=True)
            timed("schur", scan_over(schur_once), Winv2)

    # NOTE: must be jitted — an eager/standalone compile of the factor
    # kernel adds an operand copy into its scoped-vmem stack and goes
    # ~224K over the 16 MB budget (production always runs it inside the
    # solve jit, where it fits)
    factors = jax.jit(
        lambda W: be.factor(problem, state, W, params)
    )(Winv2)

    def solve_only(W):
        sc = 1.0 + 1e-12 * jnp.sum(W[..., :1, :1])
        return be._solve_once(problem, state, factors, rhs * sc)

    if "solve" in phases:
        timed("solve", scan_over(solve_only), Winv2)

    def ops_only(W):
        sc = 1.0 + 1e-12 * jnp.sum(W[..., :1, :1])
        v = rhs * sc
        return (
            be.P_matvec(state, v),
            be.GT(problem, state, be.G(problem, state, v)),
        )

    if "ops" in phases:
        timed("ops", scan_over(ops_only), Winv2)

    if "advance" in phases:
        # one full IPM iteration (bookkeeping + Mehrotra step) iterated
        # REPS times on its own state — the true per-iteration cost
        from score_tpu.solver import ipm as _ipm

        def advance_loop(W):
            so = be.prepare(problem, aux)
            st0 = _ipm._make_initial_state(be, problem, so, params)
            st0 = st0._replace(x=st0.x * (1.0 + 1e-12 * jnp.sum(W[0, 0, 0])))

            def step(st, _):
                return _ipm._advance(be, problem, so, params, st), None

            st, _ = jax.lax.scan(step, st0, None, length=REPS)
            return st.x

        timed("advance", advance_loop, Winv2)


if __name__ == "__main__":
    main()
