"""Data-layer tests: golden counts for the shipped datasets (SURVEY.md §6)
and round-trip/IO behavior."""

import numpy as np
import pytest

from score_tpu.fg import (
    FactorGraphData,
    FGRangeMeasurement,
    PoseMeasurement2D,
    PoseVariable2D,
    LandmarkVariable2D,
    parse_pickle_file,
    parse_tum_file,
    save_to_pickle_file,
)
from tests.conftest import GOATS_GT_TUM


class TestGoldenCounts:
    def test_goats(self, goats_fg):
        assert goats_fg.dimension == 2
        assert goats_fg.num_robots == 1
        assert goats_fg.num_poses == 679
        assert goats_fg.num_landmarks == 4
        assert goats_fg.num_odom_measurements == 678
        assert goats_fg.num_range_measurements == 1558
        assert goats_fg.num_loop_closures == 0
        assert all(
            abs(r.stddev - 0.75) < 1e-12 for r in goats_fg.range_measurements
        )
        assert len(goats_fg.unconnected_variable_names) == 0

    def test_manhattan(self, manhattan_fg):
        fg = manhattan_fg
        assert fg.dimension == 2
        assert fg.num_robots == 4
        assert fg.num_poses == 1600
        assert [len(c) for c in fg.pose_variables] == [400, 400, 400, 400]
        assert fg.num_landmarks == 6
        assert fg.num_odom_measurements == 1596
        assert fg.num_range_measurements == 1160
        assert len(fg.pose_priors) == 1
        # 246 inter-robot ranges (both keys are poses; directly measured)
        pose_names = fg.existing_pose_variables
        inter = [
            r
            for r in fg.range_measurements
            if r.first_key in pose_names and r.second_key in pose_names
        ]
        assert len(inter) == 246

    def test_range_precision_is_inverse_variance(self, goats_fg):
        r = goats_fg.range_measurements[0]
        assert r.precision == pytest.approx(1.0 / 0.75**2)

    def test_pose_chain_names(self, manhattan_fg):
        chains = manhattan_fg.get_pose_chain_names()
        assert chains[0][0] == "A0"
        assert len(set(c[0][0] for c in chains)) == 4  # A, B, C, D


class TestRoundTrip:
    def test_pickle_roundtrip(self, goats_fg, tmp_path):
        path = str(tmp_path / "fg.pickle")
        save_to_pickle_file(goats_fg, path)
        fg2 = parse_pickle_file(path)
        assert fg2.num_poses == goats_fg.num_poses
        assert fg2.num_range_measurements == goats_fg.num_range_measurements
        assert fg2.range_measurements[0].dist == pytest.approx(
            goats_fg.range_measurements[0].dist
        )

    def test_tum_parse(self):
        ts, t, q = parse_tum_file(GOATS_GT_TUM)
        assert t.shape == (679, 3)
        assert q.shape == (679, 4)
        # Quaternions should be (close to) unit norm.
        assert np.allclose(np.linalg.norm(q, axis=1), 1.0, atol=1e-6)


class TestDataModel:
    def test_measurement_properties(self):
        m = PoseMeasurement2D("A0", "A1", 1.0, 2.0, np.pi / 2, 10.0, 20.0)
        np.testing.assert_allclose(m.translation_vector, [1.0, 2.0])
        np.testing.assert_allclose(
            m.rotation_matrix, [[0, -1], [1, 0]], atol=1e-12
        )
        T = m.transformation_matrix
        assert T.shape == (3, 3)
        np.testing.assert_allclose(T[2], [0, 0, 1])

    def test_duplicate_variable_guard(self):
        fg = FactorGraphData(dimension=2)
        fg.add_pose_variable(PoseVariable2D("A0"))
        with pytest.raises(ValueError):
            fg.add_pose_variable(PoseVariable2D("A0"))
        fg.add_landmark_variable(LandmarkVariable2D("L0"))
        with pytest.raises(ValueError):
            fg.add_landmark_variable(LandmarkVariable2D("L0"))

    def test_unconnected_detection(self):
        fg = FactorGraphData(dimension=2)
        fg.add_pose_variable(PoseVariable2D("A0"))
        fg.add_pose_variable(PoseVariable2D("A1"))
        fg.add_landmark_variable(LandmarkVariable2D("L0"))
        fg.add_odom_measurement(PoseMeasurement2D("A0", "A1"))
        assert fg.unconnected_variable_names == {"L0"}
        fg.add_range_measurement(FGRangeMeasurement(("A1", "L0"), 1.0, 0.5))
        assert fg.unconnected_variable_names == set()

    def test_pose_to_range_measures_dict(self, goats_fg):
        d = goats_fg.pose_to_range_measures_dict
        total = sum(len(v) for v in d.values())
        # every range in GOATS is pose-landmark, anchored at exactly one pose
        assert total == 1558


class TestG2O:
    """g2o round-trip (reference README.md:49-56 format parity)."""

    def test_2d_roundtrip_solves_identically(self, tmp_path):
        import numpy as np

        from score_tpu.api import ScoreSolverParams, solve_score
        from score_tpu.fg import parse_g2o_file, save_to_g2o_file
        from tests.test_assembly import small_graph

        rng = np.random.default_rng(12)
        fg = small_graph(rng, loop=True)
        path = str(tmp_path / "g.g2o")
        save_to_g2o_file(fg, path)
        fg2 = parse_g2o_file(path)
        assert fg2.dimension == 2
        assert fg2.num_poses == fg.num_poses
        assert len(fg2.landmark_variables) == len(fg.landmark_variables)
        assert len(fg2.loop_closure_measurements) == len(
            fg.loop_closure_measurements
        )
        assert len(fg2.range_measurements) == len(fg.range_measurements)
        r1 = solve_score(fg, "SOCP", ScoreSolverParams())
        r2 = solve_score(fg2, "SOCP", ScoreSolverParams())
        assert r2.primal_objective == pytest.approx(
            r1.primal_objective, rel=1e-6
        )

    def test_3d_roundtrip(self, tmp_path):
        import numpy as np

        from score_tpu.fg import parse_g2o_file, save_to_g2o_file
        from tests.test_chain_arrow import small_graph_3d

        fg = small_graph_3d(np.random.default_rng(5))
        path = str(tmp_path / "g3.g2o")
        save_to_g2o_file(fg, path)
        fg2 = parse_g2o_file(path)
        assert fg2.dimension == 3
        assert fg2.num_poses == fg.num_poses
        m1 = fg.odom_measurements[0][0]
        m2 = fg2.odom_measurements[0][0]
        np.testing.assert_allclose(
            np.asarray(m2.rotation), np.asarray(m1.rotation), atol=1e-9
        )
        np.testing.assert_allclose(
            np.asarray(m2.translation), np.asarray(m1.translation), atol=1e-9
        )

    def test_unknown_tag_raises(self, tmp_path):
        from score_tpu.fg import parse_g2o_file

        path = tmp_path / "bad.g2o"
        path.write_text("VERTEX_SE2 0 0 0 0\nFIXME 1 2 3\n")
        with pytest.raises(ValueError, match="FIXME"):
            parse_g2o_file(str(path))
