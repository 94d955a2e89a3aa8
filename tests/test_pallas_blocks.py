"""Pallas batched small-block kernels vs the unrolled jnp implementations
(interpret mode on the CPU test mesh; compiled on TPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from score_tpu.ops import pallas_blocks as pb
from score_tpu.solver.smallblocks import chol_small, tri_lower_solve


@pytest.fixture
def rng():
    return np.random.default_rng(17)


def spd_blocks(rng, M, D):
    A = rng.normal(size=(M, D, D)).astype(np.float32)
    return jnp.asarray(
        A @ np.transpose(A, (0, 2, 1)) + D * np.eye(D, dtype=np.float32)
    )


class TestPallasBlocks:
    def test_chol_matches_unrolled(self, rng):
        A = spd_blocks(rng, 64, 6)
        L_pl = pb.chol_blocks_pallas(A)
        L_ref = chol_small(A)
        np.testing.assert_allclose(
            np.asarray(L_pl), np.asarray(L_ref), atol=1e-4
        )

    def test_tri_solve_matches_unrolled(self, rng):
        A = spd_blocks(rng, 32, 6)
        L = chol_small(A)
        B = jnp.asarray(rng.normal(size=(32, 6, 4)).astype(np.float32))
        Y_pl = pb.tri_lower_solve_blocks_pallas(L, B)
        Y_ref = tri_lower_solve(L, B)
        np.testing.assert_allclose(
            np.asarray(Y_pl), np.asarray(Y_ref), atol=1e-4
        )

    def test_solve_recovers_rhs(self, rng):
        A = spd_blocks(rng, 16, 4)
        L = pb.chol_blocks_pallas(A)
        B = jnp.asarray(rng.normal(size=(16, 4, 2)).astype(np.float32))
        Y = pb.tri_lower_solve_blocks_pallas(L, B)
        np.testing.assert_allclose(
            np.asarray(jnp.einsum("mij,mjk->mik", L, Y)),
            np.asarray(B),
            atol=1e-4,
        )
