"""Probe: does the axon PJRT client support executable serialization?

If yes, bench.py can persist AOT-compiled executables to disk during the
round and the driver's bench run can LOAD them instead of paying the
remote compile (~68 min across all 6 workloads vs a ~37 min window) —
the persistent jax compilation cache does not work through the
remote-compile path, but serialize_executable snapshots the loaded
executable directly.

argv[1] = save | load. Run save in one process, load in a FRESH process
(the tunnel is single-client: strictly serial).
"""
import json
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

CACHE = "/tmp/tpuq4/aot_probe.pkl"


def make_graph():
    import jax.numpy as jnp

    from score_tpu.ops import twofloat as tfm
    from score_tpu.ops.twofloat import TF
    from score_tpu.ops.pallas_pcr import ppcr_factor_pallas, ppcr_solve_pallas

    T, C, Db, K = 512, 1, 6, 2
    rng = np.random.default_rng(0)
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
        return jnp.sum(x.hi) + jnp.sum(x.lo)

    return fac_solve, (Dt.hi, Dt.lo, Ut.hi, Ut.lo, R.hi, R.lo)


def main():
    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    x = jax.jit(lambda a: a * 2 + 1)(jnp.ones((8, 128)))
    float(x.ravel()[0])
    assert jax.default_backend() == "tpu"
    print(json.dumps({"step": "probe", "s": round(time.perf_counter() - t0, 2)}),
          flush=True)

    from jax.experimental.serialize_executable import (
        deserialize_and_load,
        serialize,
    )

    mode = sys.argv[1] if len(sys.argv) > 1 else "save"
    fn, args = make_graph()

    if mode == "save":
        t0 = time.perf_counter()
        compiled = jax.jit(fn).lower(*args).compile()
        t_compile = time.perf_counter() - t0
        ref = float(np.asarray(compiled(*args)))
        t0 = time.perf_counter()
        payload, in_tree, out_tree = serialize(compiled)
        t_ser = time.perf_counter() - t0
        with open(CACHE, "wb") as f:
            pickle.dump(
                {"payload": payload, "in_tree": in_tree,
                 "out_tree": out_tree, "ref": ref},
                f,
            )
        print(
            json.dumps(
                {
                    "step": "save",
                    "compile_s": round(t_compile, 1),
                    "serialize_s": round(t_ser, 2),
                    "bytes": os.path.getsize(CACHE),
                    "ref": ref,
                }
            ),
            flush=True,
        )
        # same-process roundtrip sanity
        t0 = time.perf_counter()
        loaded = deserialize_and_load(payload, in_tree, out_tree)
        got = float(np.asarray(loaded(*args)))
        print(
            json.dumps(
                {
                    "step": "same_proc_load",
                    "load_s": round(time.perf_counter() - t0, 2),
                    "match": bool(abs(got - ref) <= 1e-9 * max(1.0, abs(ref))),
                }
            ),
            flush=True,
        )
    else:
        with open(CACHE, "rb") as f:
            blob = pickle.load(f)
        t0 = time.perf_counter()
        loaded = deserialize_and_load(
            blob["payload"], blob["in_tree"], blob["out_tree"]
        )
        t_load = time.perf_counter() - t0
        t0 = time.perf_counter()
        got = float(np.asarray(loaded(*args)))
        t_run = time.perf_counter() - t0
        ok = abs(got - blob["ref"]) <= 1e-9 * max(1.0, abs(blob["ref"]))
        print(
            json.dumps(
                {
                    "step": "fresh_proc_load",
                    "load_s": round(t_load, 2),
                    "first_run_s": round(t_run, 2),
                    "match": bool(ok),
                    "got": got,
                    "ref": blob["ref"],
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
