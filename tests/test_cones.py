"""Unit tests for the batched SOC algebra (NT scaling identities, Jordan
ops, boundary step computation)."""

import numpy as np
import pytest

import jax.numpy as jnp

from score_tpu.solver import cones


def random_interior(rng, N, k, scale=1.0):
    """Random strictly-interior cone points."""
    u1 = rng.normal(size=(N, k - 1)) * scale
    u0 = np.linalg.norm(u1, axis=1) + rng.uniform(0.1, 2.0, size=N) * scale
    return jnp.asarray(np.concatenate([u0[:, None], u1], axis=1))


@pytest.fixture
def rng():
    return np.random.default_rng(42)


class TestJordan:
    def test_identity(self, rng):
        u = random_interior(rng, 7, 3)
        e = cones.soc_identity(7, 3, u.dtype)
        np.testing.assert_allclose(cones.jordan_mul(u, e), u, atol=1e-12)

    def test_solve_inverts_mul(self, rng):
        lam = random_interior(rng, 5, 4)
        d = jnp.asarray(rng.normal(size=(5, 4)))
        u = cones.jordan_solve(lam, d)
        np.testing.assert_allclose(cones.jordan_mul(lam, u), d, atol=1e-10)


class TestNTScaling:
    @pytest.mark.parametrize("k", [3, 4])
    def test_scaling_identities(self, rng, k):
        N = 11
        s = random_interior(rng, N, k, scale=3.0)
        z = random_interior(rng, N, k, scale=0.5)
        nt = cones.nt_scaling(s, z)
        # wbar^T J wbar = 1
        JwbarTwbar = nt.wbar[:, 0] ** 2 - jnp.sum(nt.wbar[:, 1:] ** 2, axis=1)
        np.testing.assert_allclose(JwbarTwbar, 1.0, atol=1e-10)
        # lambda = W z = W^{-1} s
        lam_z = cones.apply_W(nt, z)
        lam_s = cones.apply_Winv(nt, s)
        np.testing.assert_allclose(lam_z, lam_s, atol=1e-9)
        # W (W z) = s
        np.testing.assert_allclose(cones.apply_W(nt, lam_z), s, atol=1e-9)
        # W^{-1} (W^{-1} s) = z, consistent with winv2_matrices
        Winv2 = cones.winv2_matrices(nt)
        z_rec = jnp.einsum("mij,mj->mi", Winv2, s)
        np.testing.assert_allclose(z_rec, z, atol=1e-9)
        # lambda is interior (it is a geometric mean of two interior points)
        assert np.all(np.asarray(cones.min_eig(lam_z)) > 0)

    def test_scaling_matches_dense_matrix(self, rng):
        """Rank-1 apply formulas == dense W^{-2} matrices."""
        N, k = 6, 3
        s = random_interior(rng, N, k)
        z = random_interior(rng, N, k)
        nt = cones.nt_scaling(s, z)
        u = jnp.asarray(rng.normal(size=(N, k)))
        Winv2 = cones.winv2_matrices(nt)
        via_mat = jnp.einsum("mij,mj->mi", Winv2, u)
        via_apply = cones.apply_Winv(nt, cones.apply_Winv(nt, u))
        np.testing.assert_allclose(via_mat, via_apply, atol=1e-9)


class TestMaxStep:
    def brute_force(self, u, du, cap=10.0, steps=200000):
        alphas = np.linspace(0.0, cap, steps)
        u = np.asarray(u)
        du = np.asarray(du)
        for a in alphas:
            v = u + a * du
            if np.any(v[:, 0] - np.linalg.norm(v[:, 1:], axis=1) < 0):
                return a
        return cap

    def test_against_brute_force(self, rng):
        for trial in range(10):
            u = random_interior(rng, 4, 3)
            du = jnp.asarray(rng.normal(size=(4, 3)))
            a_fast = float(cones.max_step(u, du))
            a_brute = self.brute_force(u, du)
            assert a_fast == pytest.approx(a_brute, abs=2e-4)

    def test_interior_direction_unbounded(self, rng):
        u = random_interior(rng, 4, 3)
        e = cones.soc_identity(4, 3, u.dtype)
        assert float(cones.max_step(u, e)) == pytest.approx(10.0)

    def test_step_keeps_interior(self, rng):
        u = random_interior(rng, 8, 4)
        du = jnp.asarray(rng.normal(size=(8, 4)))
        a = float(cones.max_step(u, du))
        if a < 10.0:
            v = u + 0.999 * a * du
            assert np.all(np.asarray(cones.min_eig(v)) > -1e-9)
            w = u + 1.01 * a * du
            assert np.any(np.asarray(cones.min_eig(w)) < 1e-9)


class TestShift:
    def test_shift_makes_interior(self, rng):
        u = jnp.asarray(rng.normal(size=(9, 3)) * 5.0)
        v = cones.shift_to_interior(u)
        assert np.all(np.asarray(cones.min_eig(v)) > 0)

    def test_no_shift_when_interior(self, rng):
        u = random_interior(rng, 9, 3)
        v = cones.shift_to_interior(u)
        np.testing.assert_allclose(u, v)
