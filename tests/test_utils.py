"""Tests for matrix utilities, metrics, rounding ops, and plotting
(headless)."""

import math
import os

import numpy as np
import pytest

import jax.numpy as jnp

from score_tpu.ops.rounding import homogenize_batched, round_rotations_batched
from score_tpu.utils import matrix as mu
from score_tpu.utils.metrics import compute_ate, compute_rpe, umeyama_alignment


@pytest.fixture
def rng():
    return np.random.default_rng(9)


class TestMatrixUtils:
    def test_round_to_special_orthogonal(self, rng):
        R = mu.get_random_rotation_matrix(2, rng)
        noisy = R + rng.normal(0, 0.05, size=(2, 2))
        R2 = mu.round_to_special_orthogonal(noisy)
        assert np.linalg.det(R2) == pytest.approx(1.0, abs=1e-9)
        np.testing.assert_allclose(R2 @ R2.T, np.eye(2), atol=1e-9)

    def test_round_fixes_reflection(self):
        M = np.diag([1.0, -1.0])  # det = -1
        R = mu.round_to_special_orthogonal(M)
        assert np.linalg.det(R) == pytest.approx(1.0, abs=1e-9)

    def test_theta_roundtrip(self, rng):
        for theta in rng.uniform(-np.pi, np.pi, 5):
            R = mu.get_rotation_matrix_from_theta(theta)
            assert mu.get_theta_from_rotation_matrix(R) == pytest.approx(theta)

    def test_quat_roundtrip(self, rng):
        R = mu.get_random_rotation_matrix(3, rng)
        q = mu.get_quat_from_rotation_matrix(R)
        R2 = mu.get_rotation_matrix_from_quat(q)
        np.testing.assert_allclose(R, R2, atol=1e-9)

    def test_quat_2d_embedding(self):
        R = mu.get_rotation_matrix_from_theta(np.pi / 2)
        q = mu.get_quat_from_rotation_matrix(R)
        # rotation about z by pi/2: qz = sin(pi/4), qw = cos(pi/4)
        assert abs(q[2]) == pytest.approx(math.sin(np.pi / 4), abs=1e-9)
        assert abs(q[3]) == pytest.approx(math.cos(np.pi / 4), abs=1e-9)

    def test_transformation_helpers(self, rng):
        T = mu.get_random_transformation_matrix(2, rng)
        mu._check_transformation_matrix(T)
        t = mu.get_translation_from_transformation_matrix(T)
        R = mu.get_rotation_from_transformation_matrix(T)
        T2 = mu.make_transformation_matrix(R, t)
        np.testing.assert_allclose(T, T2, atol=1e-12)

    def test_perturbation_magnitude(self, rng):
        T = np.eye(3)
        P = mu.apply_transformation_matrix_perturbation(T, 0.5, 0.1, rng)
        mu._check_transformation_matrix(P)
        assert np.linalg.norm(P[:2, 2]) == pytest.approx(0.5, abs=1e-9)

    def test_validators(self):
        with pytest.raises(ValueError):
            mu._check_rotation_matrix(np.eye(2) * 2.0, assert_test=True)
        mu._check_psd(np.eye(3))
        L = np.array([[1.0, -1.0], [-1.0, 1.0]])
        mu._check_is_laplacian(L)


class TestBatchedRounding:
    def test_matches_host_rounding(self, rng):
        mats = rng.normal(size=(10, 2, 2)) * 2.0
        batched = np.asarray(round_rotations_batched(jnp.asarray(mats)))
        for i in range(10):
            expected = mu.round_to_special_orthogonal(mats[i])
            np.testing.assert_allclose(batched[i], expected, atol=1e-8)

    def test_homogenize(self, rng):
        Rt = rng.normal(size=(5, 2, 3))
        T = np.asarray(homogenize_batched(jnp.asarray(Rt)))
        assert T.shape == (5, 3, 3)
        np.testing.assert_allclose(T[:, 2], [[0, 0, 1]] * 5)
        dets = np.linalg.det(T[:, :2, :2])
        np.testing.assert_allclose(dets, 1.0, atol=1e-9)
        np.testing.assert_allclose(T[:, :2, 2], Rt[:, :, 2])


class TestMetrics:
    def test_umeyama_recovers_transform(self, rng):
        src = rng.normal(size=(50, 2))
        R = mu.get_rotation_matrix_from_theta(0.7)
        t = np.array([3.0, -2.0])
        dst = src @ R.T + t
        R2, t2, s = umeyama_alignment(src, dst)
        np.testing.assert_allclose(R2, R, atol=1e-9)
        np.testing.assert_allclose(t2, t, atol=1e-9)
        assert s == 1.0

    def test_ate_zero_for_rigidly_moved(self, rng):
        traj = rng.normal(size=(30, 2))
        moved = traj @ mu.get_rotation_matrix_from_theta(1.1).T + [5, 5]
        ate = compute_ate(moved, traj, align=True)
        assert ate["rmse"] == pytest.approx(0.0, abs=1e-9)
        ate_noalign = compute_ate(moved, traj, align=False)
        assert ate_noalign["rmse"] > 1.0

    def test_rpe(self, rng):
        traj = np.cumsum(rng.normal(size=(20, 2)), axis=0)
        assert compute_rpe(traj, traj)["rmse"] == 0.0


class TestPlots:
    def test_plot_trajectories_saves(self, goats_fg, tmp_path, rng):
        # build a fake "solution" from ground truth
        from score_tpu.fg.solver_utils import SolverResults, VariableValues

        poses = {}
        for chain in goats_fg.pose_variables:
            for p in chain:
                poses[p.name] = p.transformation_matrix
        landmarks = {
            l.name: np.asarray(l.true_position, dtype=float)
            for l in goats_fg.landmark_variables
        }
        res = SolverResults(
            variables=VariableValues(2, poses, landmarks, {}),
            total_time=0.0,
            solved=True,
            pose_chain_names=goats_fg.get_pose_chain_names(),
        )
        from score_tpu.utils.plot import plot_trajectories, visualize_solution

        out = str(tmp_path / "traj.png")
        plot_trajectories(goats_fg, res, save_path=out)
        assert os.path.exists(out) and os.path.getsize(out) > 1000
        out2 = str(tmp_path / "viz.png")
        visualize_solution(res, goats_fg, save_path=out2)
        assert os.path.exists(out2)

    def test_plot_error_final_frame(self, tmp_path, rng):
        from score_tpu.sim.manhattan import (
            ManhattanWorldParams,
            simulate_manhattan_world,
        )
        from score_tpu.fg.solver_utils import SolverResults, VariableValues
        from score_tpu.utils.plot import plot_error

        fg = simulate_manhattan_world(
            ManhattanWorldParams(
                num_robots=2, num_poses_per_robot=8, num_landmarks=2,
                grid_size=5, seed=2,
            )
        )
        poses = {
            p.name: p.transformation_matrix
            for c in fg.pose_variables
            for p in c
        }
        landmarks = {
            l.name: np.asarray(l.true_position, dtype=float)
            for l in fg.landmark_variables
        }
        res = SolverResults(
            variables=VariableValues(2, poses, landmarks, {}),
            total_time=0.0,
            solved=True,
            pose_chain_names=fg.get_pose_chain_names(),
        )
        out = str(tmp_path / "err.png")
        plot_error(fg, res, show=False, save_path=out, color_dist_circles=True)
        assert os.path.exists(out)

        # GIF export (regenerates the reference's media/*_animation.gif
        # artifacts headlessly): a multi-frame animated GIF is written
        gif = str(tmp_path / "anim.gif")
        plot_error(
            fg, res, show=False, save_animation_path=gif, num_frames_skip=4
        )
        from PIL import Image

        with Image.open(gif) as im:
            assert im.format == "GIF" and getattr(im, "n_frames", 1) >= 2


class TestTUMExport:
    def test_save_to_tum_multi_robot(self, manhattan_fg, tmp_path):
        from score_tpu.fg.solver_utils import (
            SolverResults,
            VariableValues,
            save_to_tum,
        )
        from score_tpu.fg.io import parse_tum_file

        poses = {
            p.name: p.transformation_matrix
            for c in manhattan_fg.pose_variables
            for p in c
        }
        res = SolverResults(
            variables=VariableValues(2, poses, {}, {}),
            total_time=0.0,
            solved=True,
            pose_chain_names=manhattan_fg.get_pose_chain_names(),
        )
        files = save_to_tum(res, str(tmp_path / "traj.tum"))
        assert len(files) == 4  # one per robot chain
        ts, t, q = parse_tum_file(files[0])
        assert t.shape == (400, 3)
        np.testing.assert_allclose(np.linalg.norm(q, axis=1), 1.0, atol=1e-9)
