"""Exact split-f32 (Ozaki-style) MXU matmuls: accuracy of the slice
decomposition, the one-hot pair contraction, vmap composition, and parity
of the chain+arrow backend with the path forced on vs off."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from score_tpu.ops import ozaki
from score_tpu.sim.manhattan import ManhattanWorldParams, simulate_manhattan_world
from score_tpu.assembly.conic import SOCP_RELAXATION, build_conic_problem
from score_tpu.solver.chain_arrow import ChainArrowBackend, build_chain_arrow
from score_tpu.solver.ipm import IPMParams


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _normwise(err, X, Y):
    return err / np.outer(
        np.linalg.norm(X, axis=0), np.linalg.norm(Y, axis=0)
    )


class TestMMF64:
    def test_wide_dynamic_range(self, rng):
        K, M, N = 5000, 37, 29
        X = rng.standard_normal((K, M)) * 10.0 ** rng.uniform(-6, 6, (1, M))
        Y = rng.standard_normal((K, N)) * 10.0 ** rng.uniform(-6, 6, (1, N))
        out = np.asarray(ozaki.mm_f64(jnp.asarray(X), jnp.asarray(Y)))
        rel = _normwise(np.abs(out - X.T @ Y), X, Y)
        assert rel.max() < 1e-12

    def test_cancellation(self, rng):
        # Y ~ -X + tiny: the true product is ~1e-9 of the naive term
        # magnitudes — a plain f32/bf16 matmul would lose everything
        K, M = 4096, 16
        X = rng.standard_normal((K, M))
        Y = -X + rng.standard_normal((K, M)) * 1e-9
        out = np.asarray(ozaki.mm_f64(jnp.asarray(X), jnp.asarray(Y)))
        rel = _normwise(np.abs(out - X.T @ Y), X, Y)
        assert rel.max() < 1e-12

    def test_unpadded_chunk_boundary(self, rng):
        # K not a multiple of the chunk size exercises the zero padding
        K, M = 1500, 9
        X = rng.standard_normal((K, M))
        out = np.asarray(ozaki.mm_f64(jnp.asarray(X), jnp.asarray(X)))
        rel = _normwise(np.abs(out - X.T @ X), X, X)
        assert rel.max() < 1e-12

    def test_vmap(self, rng):
        B, K, M = 3, 600, 8
        X = rng.standard_normal((B, K, M))
        Y = rng.standard_normal((B, K, M))
        out = np.asarray(
            jax.vmap(ozaki.mm_f64)(jnp.asarray(X), jnp.asarray(Y))
        )
        for b in range(B):
            assert np.max(np.abs(out[b] - X[b].T @ Y[b])) < 1e-12 * np.max(
                np.abs(X[b].T @ Y[b])
            ) + 1e-13


class TestOnehotPair:
    def test_matches_einsum(self, rng):
        m, A, d = 2400, 17, 2
        oh_a = np.eye(A)[rng.integers(0, A, m)]
        oh_b = np.eye(A)[rng.integers(0, A, m)]
        H = rng.standard_normal((m, d, d)) * 10.0 ** rng.uniform(
            -4, 4, (m, 1, 1)
        )
        ref = np.einsum("ma,mb,mij->aibj", oh_a, oh_b, H)
        out = np.asarray(
            ozaki.onehot_pair_contract(
                jnp.asarray(oh_a), jnp.asarray(oh_b), jnp.asarray(H)
            )
        )
        assert np.abs(out - ref).max() < 1e-12 * np.abs(ref).max()


class TestBackendParity:
    def test_factor_solve_forced_on_matches_off(self, monkeypatch):
        """The exact-MM Schur/cross path must agree with the emulated-f64
        einsums to factorization grade on a multi-robot world with
        inter-robot (pose-pose) ranges."""
        fg = simulate_manhattan_world(
            ManhattanWorldParams(
                num_robots=6,
                num_poses_per_robot=8,
                num_landmarks=3,
                grid_size=8,
                range_measure_prob=0.6,
                inter_robot_measure_prob=0.3,
                inter_robot_sensing_radius=14.0,
                seed=3,
            )
        )
        problem, idx = build_conic_problem(fg, SOCP_RELAXATION)
        st = build_chain_arrow(problem, idx)
        params = IPMParams()
        state = ChainArrowBackend.prepare(problem, st)
        N, k = problem.num_cones, problem.k
        Winv2 = jnp.broadcast_to(
            jnp.eye(k, dtype=jnp.float64), (N, k, k)
        ) * (1.0 + jnp.arange(N, dtype=jnp.float64)[:, None, None])
        rhs = jnp.asarray(
            np.random.default_rng(1).standard_normal(problem.n)
        ) * state.mask

        monkeypatch.setenv("SCORE_TPU_EXACT_MM", "0")
        f0 = ChainArrowBackend.factor(problem, state, Winv2, params)
        dx0 = ChainArrowBackend.solve(problem, state, f0, rhs, params)

        monkeypatch.setenv("SCORE_TPU_EXACT_MM", "1")
        f1 = ChainArrowBackend.factor(problem, state, Winv2, params)
        dx1 = ChainArrowBackend.solve(problem, state, f1, rhs, params)

        a, b = np.asarray(dx0), np.asarray(dx1)
        assert np.max(np.abs(a - b)) / max(np.max(np.abs(a)), 1e-30) < 1e-9
        # the Schur factor itself agrees to slice-truncation grade
        ls0, ls1 = np.asarray(f0.LS), np.asarray(f1.LS)
        assert np.max(np.abs(ls0 - ls1)) < 1e-10 * max(
            np.max(np.abs(ls0)), 1.0
        )

        # blocked-arrow Cholesky/substitution path (forced): must agree
        # with the LAPACK/custom-call path to f64 factorization grade
        monkeypatch.setenv("SCORE_TPU_EXACT_MM", "0")
        monkeypatch.setenv("SCORE_TPU_BLOCKED_ARROW", "1")
        f2 = ChainArrowBackend.factor(problem, state, Winv2, params)
        assert f2.arrow_Lb is not None
        dx2 = ChainArrowBackend.solve(problem, state, f2, rhs, params)
        c = np.asarray(dx2)
        assert np.max(np.abs(a - c)) / max(np.max(np.abs(a)), 1e-30) < 1e-9
        ls2 = np.asarray(f2.LS)
        assert np.max(np.abs(ls0 - ls2)) < 1e-10 * max(
            np.max(np.abs(ls0)), 1.0
        )
