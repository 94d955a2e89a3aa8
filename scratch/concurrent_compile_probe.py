"""Does the remote-compile service overlap compiles of DISTINCT graphs
issued from two threads of one process (the tunnel is single-CLIENT,
but one client may pipeline)? If yes, bench.py can warm every extra's
graph concurrently via AOT lower().compile() and the suite cost becomes
max(compile) + sum(run) instead of sum(compile + run).

Method: build two structurally-different band-kernel graphs (distinct
shapes so nothing dedupes), compile one serially (reference), then two
more variants concurrently from two threads. Compares wall clocks.
"""
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    x = jax.jit(lambda a: a * 2 + 1)(jnp.ones((8, 128)))
    float(x.ravel()[0])
    assert jax.default_backend() == "tpu"
    print(json.dumps({"step": "probe", "s": round(time.perf_counter() - t0, 2)}),
          flush=True)

    from score_tpu.ops import twofloat as tfm
    from score_tpu.ops.twofloat import TF
    from score_tpu.ops.pallas_pcr import ppcr_factor_pallas, ppcr_solve_pallas

    def make_graph(T, K, seed):
        C, Db = 1, 6
        rng = np.random.default_rng(seed)
        D64 = np.broadcast_to(4.0 * np.eye(Db), (C, T, Db, Db)) + 0.1 * (
            rng.random((C, T, Db, Db))
        )
        D64 = 0.5 * (D64 + np.swapaxes(D64, -1, -2))
        U64 = 0.05 * rng.random((C, T, Db, Db))
        U64[:, T - 1] = 0.0
        r = rng.standard_normal((C, T, Db, K))
        Dt = tfm.from_f64(jnp.asarray(D64))
        Ut = tfm.from_f64(jnp.asarray(U64))
        R = tfm.from_f64(jnp.asarray(r))

        def fac_solve(dh, dl, uh, ul, rh, rl):
            f = ppcr_factor_pallas(TF(dh, dl), TF(uh, ul))
            x = ppcr_solve_pallas(f, TF(rh, rl))
            return jnp.sum(x.hi) + jnp.sum(x.lo) * (1.0 + seed)

        args = (Dt.hi, Dt.lo, Ut.hi, Ut.lo, R.hi, R.lo)
        return fac_solve, args

    # serial reference: one compile
    fn, args = make_graph(512, 2, 0)
    t0 = time.perf_counter()
    lowered = jax.jit(fn).lower(*args)
    c = lowered.compile()
    s_serial = time.perf_counter() - t0
    float(np.asarray(c(*args)))
    print(json.dumps({"step": "serial_one", "compile_s": round(s_serial, 1)}),
          flush=True)

    # concurrent: two distinct graphs from two threads
    jobs = [make_graph(256, 3, 1), make_graph(1024, 5, 2)]
    done = [None, None]

    def work(i):
        fn, args = jobs[i]
        t0 = time.perf_counter()
        jax.jit(fn).lower(*args).compile()
        done[i] = time.perf_counter() - t0

    t0 = time.perf_counter()
    ts = [threading.Thread(target=work, args=(i,)) for i in range(2)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    wall = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "step": "concurrent_two",
                "wall_s": round(wall, 1),
                "each_s": [round(d, 1) for d in done],
                "overlap": round((sum(done) - wall) / max(wall, 1e-9), 2),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
