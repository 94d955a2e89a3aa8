"""Assembly tests: the encoded quadratic cost must match a brute-force
evaluation of the reference cost expressions (gurobi_utils.py:358-526), and
the conic structure must be internally consistent."""

import numpy as np
import pytest

import jax.numpy as jnp

from score_tpu.assembly.conic import (
    QCQP_RELAXATION,
    SOCP_RELAXATION,
    build_conic_problem,
    evaluate_objective,
)
from score_tpu.fg import (
    FactorGraphData,
    FGRangeMeasurement,
    LandmarkPrior2D,
    LandmarkVariable2D,
    PoseMeasurement2D,
    PoseVariable2D,
)
from score_tpu.solver.linops import (
    G_apply,
    GT_apply,
    cost_constant,
    cost_matvec_dense_P,
    cost_q,
    prepare_operators,
)


def small_graph(rng, num_poses=6, num_landmarks=2, loop=True, prior=True):
    fg = FactorGraphData(dimension=2)
    for i in range(num_poses):
        fg.add_pose_variable(PoseVariable2D(f"A{i}", (float(i), 0.0), 0.1 * i))
    for j in range(num_landmarks):
        fg.add_landmark_variable(LandmarkVariable2D(f"L{j}", (1.0 + j, 2.0)))
    for i in range(num_poses - 1):
        fg.add_odom_measurement(
            PoseMeasurement2D(
                f"A{i}", f"A{i+1}",
                1.0 + rng.normal(0, 0.05),
                rng.normal(0, 0.05),
                0.1 + rng.normal(0, 0.02),
                translation_precision=50.0,
                rotation_precision=200.0,
            )
        )
    if loop:
        fg.loop_closure_measurements.append(
            PoseMeasurement2D("A0", f"A{num_poses-1}", 4.9, 0.1, 0.45, 25.0, 80.0)
        )
    for i in range(num_poses):
        for j in range(num_landmarks):
            d = abs(np.hypot(i - (1.0 + j), 2.0) + rng.normal(0, 0.1))
            fg.add_range_measurement(
                FGRangeMeasurement((f"A{i}", f"L{j}"), d, 0.5)
            )
    # one inter-pose range too (inter-robot analogue)
    fg.add_range_measurement(FGRangeMeasurement(("A0", f"A{num_poses-1}"), 5.0, 1.0))
    if prior:
        fg.landmark_priors.append(LandmarkPrior2D("L0", (1.0, 2.0), 10.0))
    return fg


def brute_force_cost(fg, idx, x, relaxation):
    """Direct transcription of the reference cost (gurobi_utils.py:358-526)
    evaluated with numpy on named blocks."""
    d = fg.dimension

    def pose_mat(name):
        sl = idx.pose_slice(name)
        block = np.asarray(x[sl]).reshape(d + 1, d).T  # column-major -> [R|t]
        return block

    def translation(name):
        return np.asarray(x[list(idx.translation_cols(name))])

    cost = 0.0
    all_pose_meas = [m for chain in fg.odom_measurements for m in chain]
    all_pose_meas += list(fg.loop_closure_measurements)
    for m in all_pose_meas:
        Pi = pose_mat(m.base_pose)
        Pj = pose_mat(m.to_pose)
        Ri, ti = Pi[:, :d], Pi[:, d]
        Rj, tj = Pj[:, :d], Pj[:, d]
        term = tj - ti - Ri @ m.translation_vector
        cost += m.translation_precision * float(term @ term)
        dR = Rj - Ri @ m.rotation_matrix
        cost += m.rotation_precision * float((dR * dR).sum())
    for mi, m in enumerate(fg.range_measurements):
        dist_cols = list(idx.dist_cols(mi))
        if relaxation == SOCP_RELAXATION:
            dv = float(x[dist_cols[0]])
            cost += m.precision * (m.dist**2 - 2 * m.dist * dv + dv**2)
        else:
            dv = np.asarray(x[dist_cols])
            r = translation(m.first_key) - translation(m.second_key) - m.dist * dv
            cost += m.precision * float(r @ r)
    for p in fg.landmark_priors:
        r = translation(p.name) - p.translation_vector
        cost += p.translation_precision * float(r @ r)
    return cost


@pytest.fixture
def rng():
    return np.random.default_rng(7)


@pytest.mark.parametrize("relaxation", [SOCP_RELAXATION, QCQP_RELAXATION])
class TestCostParity:
    def test_sparse_encoding_matches_brute_force(self, rng, relaxation):
        fg = small_graph(rng)
        problem, idx = build_conic_problem(fg, relaxation)
        for _ in range(3):
            x = rng.normal(size=problem.n)
            assert evaluate_objective(problem, x) == pytest.approx(
                brute_force_cost(fg, idx, x, relaxation), rel=1e-10
            )

    def test_dense_P_q_match_encoding(self, rng, relaxation):
        fg = small_graph(rng)
        problem, idx = build_conic_problem(fg, relaxation)
        P = np.asarray(cost_matvec_dense_P(problem))
        q = np.asarray(cost_q(problem))
        c = float(cost_constant(problem))
        np.testing.assert_allclose(P, P.T, atol=1e-9)
        # P is PSD
        eigs = np.linalg.eigvalsh(P)
        assert eigs.min() > -1e-8
        for _ in range(3):
            x = rng.normal(size=problem.n)
            quad = 0.5 * x @ P @ x + q @ x + c
            assert quad == pytest.approx(evaluate_objective(problem, x), rel=1e-9)

    def test_cone_geometry(self, rng, relaxation):
        """s = h - Gx must be (d_m, t_a - t_b) for SOCP / (1, d_m) for QCQP."""
        fg = small_graph(rng)
        problem, idx = build_conic_problem(fg, relaxation)
        x = rng.normal(size=problem.n)
        s = np.asarray(problem.cone_h) - np.asarray(
            G_apply(problem, jnp.asarray(x))
        )
        for mi, m in enumerate(fg.range_measurements):
            if relaxation == SOCP_RELAXATION:
                assert s[mi, 0] == pytest.approx(x[idx.dist_cols(mi)[0]])
                diff = (
                    x[list(idx.translation_cols(m.first_key))]
                    - x[list(idx.translation_cols(m.second_key))]
                )
                np.testing.assert_allclose(s[mi, 1:], diff, atol=1e-12)
            else:
                assert s[mi, 0] == pytest.approx(1.0)
                np.testing.assert_allclose(
                    s[mi, 1:], x[list(idx.dist_cols(mi))], atol=1e-12
                )

    def test_G_adjoint(self, rng, relaxation):
        fg = small_graph(rng)
        problem, _ = build_conic_problem(fg, relaxation)
        x = jnp.asarray(rng.normal(size=problem.n))
        z = jnp.asarray(rng.normal(size=(problem.num_cones, problem.k)))
        lhs = float(jnp.sum(G_apply(problem, x) * z))
        rhs = float(x @ GT_apply(problem, z))
        assert lhs == pytest.approx(rhs, rel=1e-10)


class TestPinning:
    def test_pin_is_first_pose_identity(self, rng):
        fg = small_graph(rng)
        problem, idx = build_conic_problem(fg, SOCP_RELAXATION)
        ops = prepare_operators(problem)
        xpin = np.asarray(ops.xpin)
        P0 = xpin[idx.pose_slice("A0")].reshape(3, 2).T
        np.testing.assert_allclose(P0[:, :2], np.eye(2))
        np.testing.assert_allclose(P0[:, 2], 0.0)
        # mask zero exactly on the first pose block
        mask = np.asarray(ops.mask)
        assert mask[:6].sum() == 0 and mask[6:].sum() == problem.n - 6


class TestGoldenSizes:
    def test_goats_socp_dimensions(self, goats_fg):
        problem, idx = build_conic_problem(goats_fg, SOCP_RELAXATION)
        assert problem.n == 679 * 6 + 4 * 2 + 1558  # = 5640
        assert problem.num_cones == 1558
        assert problem.k == 3
        # 678 odom * 6 rows + 1558 range rows
        assert problem.num_cost_rows == 678 * 6 + 1558

    def test_manhattan_qcqp_dimensions(self, manhattan_fg):
        problem, idx = build_conic_problem(manhattan_fg, QCQP_RELAXATION)
        assert problem.n == 1600 * 6 + 6 * 2 + 1160 * 2
        assert problem.num_cones == 1160
        # 1596 odom * 6 + 1160 ranges * 2 rows (no pose-prior rows!)
        assert problem.num_cost_rows == 1596 * 6 + 1160 * 2
