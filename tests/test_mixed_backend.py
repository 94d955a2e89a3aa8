"""Mixed-precision (two-float band) chain+arrow backend.

Regression coverage for the GOATS-conditioning regime: the band keeps
kappa ~1e8-1e9 after Jacobi equilibration, where a plain-f32
factorization diverges — the round-1 mixed path shipped exactly that bug
because it was only ever tested on small, well-conditioned graphs.
These tests pin the mixed backend at real-problem conditioning on CPU
(jnp two-float path) and in Pallas interpret mode.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from score_tpu.assembly.conic import build_conic_problem
from score_tpu.assembly.normalize import normalize_factor_graph
from score_tpu.solver.chain_arrow import (
    ChainArrowBackend,
    MixedChainArrowBackend,
    build_chain_arrow,
)
from score_tpu.solver.ipm import IPMParams, SOLVED_STATUSES, solve_conic
from score_tpu.solver.linops import G_apply

from tests.conftest import GOATS_PICKLE


def _truncate(fg, n_poses):
    """First n_poses of the (single-chain) GOATS graph plus every
    measurement among the kept variables — keeps the pinned-odometry-chain
    conditioning regime (kappa ~ T^2 * weight spread) at test-size cost."""
    import copy

    out = copy.copy(fg)
    kept_chain = fg.pose_variables[0][:n_poses]
    kept = {p.name for p in kept_chain}
    kept |= {l.name for l in fg.landmark_variables}
    out.pose_variables = [kept_chain]
    out.odom_measurements = [
        [m for m in fg.odom_measurements[0]
         if m.base_pose in kept and m.to_pose in kept]
    ]
    out.loop_closure_measurements = [
        m for m in fg.loop_closure_measurements
        if m.base_pose in kept and m.to_pose in kept
    ]
    seen = set()
    ranges = []
    for r in fg.range_measurements:
        key = (r.first_key, r.second_key)
        if r.first_key in kept and r.second_key in kept and key not in seen:
            seen.add(key)
            ranges.append(r)
    out.range_measurements = ranges
    return out


@pytest.fixture(scope="module")
def goats_problem():
    from score_tpu.fg import parse_pickle_file

    # truncated to keep XLA-CPU test compiles small; the chain keeps
    # kappa >> 1/eps32, which is the regime these tests exist to pin
    # (full-GOATS mixed solves are covered by the verify recipe / bench)
    fg = _truncate(parse_pickle_file(GOATS_PICKLE), 180)
    fg, _ = normalize_factor_graph(fg)
    problem, idx = build_conic_problem(fg, "SOCP")
    return problem, build_chain_arrow(problem, idx)


def test_mixed_kkt_solve_residual_at_goats_conditioning(goats_problem):
    problem, st = goats_problem
    # one inner refinement pass (the IPM's own direction-level refinement
    # plays this role in production; backend.solve honors the knob)
    params = IPMParams(kkt_refine_steps=1)
    state = MixedChainArrowBackend.prepare(problem, st)
    N, k = problem.num_cones, problem.k
    eyes = jnp.broadcast_to(jnp.eye(k, dtype=jnp.float64), (N, k, k))
    factors = MixedChainArrowBackend.factor(problem, state, eyes, params)
    rhs = jnp.asarray(
        np.random.default_rng(0).standard_normal(problem.n)
    ) * state.mask
    dx = MixedChainArrowBackend.solve(problem, state, factors, rhs, params)
    Gv = G_apply(problem, dx)
    Kdx = MixedChainArrowBackend.P_matvec(state, dx) + MixedChainArrowBackend.GT(
        problem, state, jnp.einsum("mij,mj->mi", eyes, Gv)
    )
    resid = np.asarray(state.mask * (rhs - Kdx))
    rel = np.linalg.norm(resid) / np.linalg.norm(np.asarray(rhs))
    # refined two-float solve: measured ~8e-7 at kappa ~2e8 (the broken f32
    # path gave ~15; the raw f64 backend's unrefined solve gives ~1.5e-4)
    assert rel < 1e-5, rel


def test_mixed_full_solve_goats(goats_problem):
    problem, st = goats_problem
    params = IPMParams(max_iter=40)
    res = solve_conic(
        problem, params, backend=MixedChainArrowBackend, backend_aux=st
    )
    assert int(res.status) in SOLVED_STATUSES, int(res.status)
    relgap = float(res.gap) / max(1.0, abs(float(res.pobj)))
    assert relgap < 2e-6, relgap
    # objective parity with the f64 backend
    res64 = solve_conic(
        problem, params, backend=ChainArrowBackend, backend_aux=st
    )
    assert abs(float(res.pobj) - float(res64.pobj)) < 1e-4 * abs(
        float(res64.pobj)
    )


def test_mixed_full_solve_goats_qcqp():
    # QCQP relaxation: exercises the d-by-d pivot-inverse range
    # elimination (inv_small_spd) under the two-float band
    from score_tpu.fg import parse_pickle_file

    fg = _truncate(parse_pickle_file(GOATS_PICKLE), 120)
    fg, _ = normalize_factor_graph(fg)
    problem, idx = build_conic_problem(fg, "QCQP")
    st = build_chain_arrow(problem, idx)
    res = solve_conic(
        problem, IPMParams(max_iter=40),
        backend=MixedChainArrowBackend, backend_aux=st,
    )
    assert int(res.status) in SOLVED_STATUSES, int(res.status)
    res64 = solve_conic(
        problem, IPMParams(max_iter=40),
        backend=ChainArrowBackend, backend_aux=st,
    )
    assert abs(float(res.pobj) - float(res64.pobj)) < 1e-4 * max(
        1.0, abs(float(res64.pobj))
    )


def test_mixed_pallas_band_matches_jnp_band(goats_problem, monkeypatch):
    """The fused Pallas kernels (interpret mode here) and the jnp two-float
    PCR must produce the same factor-solve answer on the real band."""
    problem, st = goats_problem
    params = IPMParams()
    state = MixedChainArrowBackend.prepare(problem, st)
    N, k = problem.num_cones, problem.k
    eyes = jnp.broadcast_to(jnp.eye(k, dtype=jnp.float64), (N, k, k))
    rhs = jnp.asarray(
        np.random.default_rng(1).standard_normal(problem.n)
    ) * state.mask

    monkeypatch.setenv("SCORE_TPU_PALLAS_PCR", "0")
    f_jnp = MixedChainArrowBackend.factor(problem, state, eyes, params)
    dx_jnp = MixedChainArrowBackend.solve(problem, state, f_jnp, rhs, params)

    monkeypatch.setenv("SCORE_TPU_PALLAS_PCR", "1")
    f_pl = MixedChainArrowBackend.factor(problem, state, eyes, params)
    dx_pl = MixedChainArrowBackend.solve(problem, state, f_pl, rhs, params)

    # the two are distinct 2^-47-grade algorithms (compacting CR vs
    # all-positions PCR) at band kappa ~2e8: agreement to ~kappa * eps_tf
    a, b = np.asarray(dx_jnp), np.asarray(dx_pl)
    assert np.max(np.abs(a - b)) / max(np.max(np.abs(a)), 1e-30) < 1e-5
