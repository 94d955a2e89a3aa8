"""Chain+arrow structured KKT backend: exact parity with the dense backend
on operators, KKT solves, and full IPM solves — including arrow poses
(pose-pose ranges), loop closures (width-D arrow blocks), 3D graphs,
pinned/frozen endpoints, multi-robot chains of unequal length, and both
relaxations."""

import numpy as np
import pytest

import jax.numpy as jnp

from score_tpu.assembly.conic import (
    QCQP_RELAXATION,
    SOCP_RELAXATION,
    build_conic_problem,
)
from score_tpu.solver import cones
from score_tpu.solver.backend import DenseBackend
from score_tpu.solver.chain_arrow import ChainArrowBackend, build_chain_arrow
from score_tpu.solver.ipm import IPMParams, SOLVED_STATUSES, solve_conic
from score_tpu.sim.manhattan import ManhattanWorldParams, simulate_manhattan_world
from tests.test_assembly import small_graph


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def small_graph_3d(rng, num_poses=6, with_loop=True):
    """Synthetic SE(3) chain with landmarks, ranges, and a loop closure."""
    from score_tpu.fg import (
        FactorGraphData,
        FGRangeMeasurement,
        LandmarkVariable3D,
        PoseMeasurement3D,
        PoseVariable3D,
    )
    from score_tpu.utils.matrix import (
        get_random_rotation_matrix,
        round_to_special_orthogonal,
    )

    fg = FactorGraphData(dimension=3)
    R = np.eye(3)
    t = np.zeros(3)
    poses = []
    for i in range(num_poses):
        fg.add_pose_variable(PoseVariable3D(f"A{i}", tuple(t), R.copy()))
        poses.append((R.copy(), t.copy()))
        dR = round_to_special_orthogonal(
            0.15 * get_random_rotation_matrix(3, np.random.default_rng(50 + i))
            + 0.85 * np.eye(3)
        )
        t = t + R @ np.array([1.0, 0.15, -0.1])
        R = R @ dR
    fg.add_landmark_variable(LandmarkVariable3D("L0", (2.0, 1.0, 0.5)))
    for i in range(num_poses - 1):
        Ri, ti = poses[i]
        Rj, tj = poses[i + 1]
        fg.add_odom_measurement(
            PoseMeasurement3D(
                f"A{i}", f"A{i+1}",
                Ri.T @ (tj - ti) + rng_local(rng, 0.01),
                Ri.T @ Rj,
                translation_precision=60.0,
                rotation_precision=150.0,
            )
        )
    if with_loop:
        Ri, ti = poses[1]
        Rj, tj = poses[num_poses - 1]
        fg.loop_closure_measurements.append(
            PoseMeasurement3D(
                "A1", f"A{num_poses-1}",
                Ri.T @ (tj - ti) + rng_local(rng, 0.02),
                Ri.T @ Rj,
                translation_precision=30.0,
                rotation_precision=70.0,
            )
        )
    for i in range(num_poses):
        d = float(np.linalg.norm(poses[i][1] - np.array([2.0, 1.0, 0.5])))
        fg.add_range_measurement(
            FGRangeMeasurement((f"A{i}", "L0"), d + abs(rng.normal(0, 0.05)), 0.4)
        )
    fg.add_range_measurement(
        FGRangeMeasurement(
            ("A1", f"A{num_poses-1}"),
            float(np.linalg.norm(poses[1][1] - poses[-1][1])) + 0.05,
            0.8,
        )
    )
    return fg


def rng_local(rng, s):
    return rng.normal(0, s, 3)


def graphs(rng):
    g1 = small_graph(rng, loop=False)  # chain + landmarks + pose-pose range
    g2 = simulate_manhattan_world(
        ManhattanWorldParams(
            num_robots=3,
            num_poses_per_robot=9,
            num_landmarks=2,
            grid_size=6,
            range_measure_prob=0.5,
            inter_robot_measure_prob=0.4,
            inter_robot_sensing_radius=10.0,
            seed=4,
        )
    )
    # loop closure touching the PINNED pose (frozen endpoint: coupling
    # must drop structurally) plus one between free poses (arrow block)
    g3 = small_graph(rng, loop=True)
    g3.loop_closure_measurements.append(
        type(g3.loop_closure_measurements[0])(
            "A1", "A4", 2.9, 0.05, 0.3, 20.0, 60.0
        )
    )
    g4 = small_graph_3d(rng)  # 3D with loop closure + pose-pose range
    return [
        ("single+ppr", g1),
        ("3robot", g2),
        ("loops", g3),
        ("3d+loop", g4),
    ]


def interior(rng, N, k):
    u1 = rng.normal(size=(N, k - 1))
    u0 = np.linalg.norm(u1, axis=1) + rng.uniform(0.5, 2.0, size=N)
    return jnp.asarray(np.concatenate([u0[:, None], u1], axis=1))


@pytest.mark.parametrize("relaxation", [SOCP_RELAXATION, QCQP_RELAXATION])
class TestOperatorParity:
    def test_P_q_GT_match_dense(self, rng, relaxation):
        for label, fg in graphs(rng):
            problem, idx = build_conic_problem(fg, relaxation)
            ca = build_chain_arrow(problem, idx)
            ds = DenseBackend.prepare(problem)
            cs = ChainArrowBackend.prepare(problem, ca)
            v = jnp.asarray(rng.normal(size=problem.n))
            np.testing.assert_allclose(
                np.asarray(DenseBackend.P_matvec(ds, v)),
                np.asarray(ChainArrowBackend.P_matvec(cs, v)),
                atol=1e-9,
                err_msg=f"P matvec mismatch ({label})",
            )
            np.testing.assert_allclose(
                np.asarray(ds.q), np.asarray(cs.q), atol=1e-12
            )
            assert float(ds.const) == pytest.approx(float(cs.const))
            z = jnp.asarray(
                rng.normal(size=(problem.num_cones, problem.k))
            )
            np.testing.assert_allclose(
                np.asarray(DenseBackend.GT(problem, ds, z)),
                np.asarray(ChainArrowBackend.GT(problem, cs, z)),
                atol=1e-12,
                err_msg=f"GT mismatch ({label})",
            )

    def test_kkt_solve_matches_dense(self, rng, relaxation):
        params = IPMParams(static_reg=0.0, kkt_refine_steps=1)
        for label, fg in graphs(rng):
            problem, idx = build_conic_problem(fg, relaxation)
            ca = build_chain_arrow(problem, idx)
            ds = DenseBackend.prepare(problem)
            cs = ChainArrowBackend.prepare(problem, ca)
            s = interior(rng, problem.num_cones, problem.k)
            z = interior(rng, problem.num_cones, problem.k)
            Winv2 = cones.winv2_matrices(cones.nt_scaling(s, z))
            fd = DenseBackend.factor(problem, ds, Winv2, params)
            fc = ChainArrowBackend.factor(problem, cs, Winv2, params)
            rhs = ds.mask * jnp.asarray(rng.normal(size=problem.n))
            dx_d = DenseBackend.solve(problem, ds, fd, rhs, params)
            dx_c = ChainArrowBackend.solve(problem, cs, fc, rhs, params)
            scale = float(jnp.max(jnp.abs(dx_d))) + 1e-12
            np.testing.assert_allclose(
                np.asarray(dx_c) / scale,
                np.asarray(dx_d) / scale,
                atol=1e-9,
                err_msg=f"KKT solve mismatch ({label})",
            )

    def test_full_ipm_matches_dense(self, rng, relaxation):
        for label, fg in graphs(rng):
            problem, idx = build_conic_problem(fg, relaxation)
            ca = build_chain_arrow(problem, idx)
            r_dense = solve_conic(problem, IPMParams(max_iter=40))
            r_ca = solve_conic(
                problem,
                IPMParams(max_iter=40),
                backend=ChainArrowBackend,
                backend_aux=ca,
            )
            assert int(r_ca.status) in SOLVED_STATUSES, label
            assert float(r_ca.pobj) == pytest.approx(
                float(r_dense.pobj), rel=1e-6, abs=1e-8
            ), label


class TestLoopClosureStructure:
    def test_loop_cover_builds_width_D_arrow(self, rng):
        fg = small_graph(rng, loop=True)
        fg.loop_closure_measurements.append(
            type(fg.loop_closure_measurements[0])(
                "A1", "A4", 2.9, 0.05, 0.3, 20.0, 60.0
            )
        )
        problem, idx = build_conic_problem(fg, SOCP_RELAXATION)
        ca = build_chain_arrow(problem, idx)
        assert ca.NLC == 2
        # the (A1, A4) loop needs one full-pose arrow block (D = d(d+1));
        # the (A0, A5) loop touches the pinned pose and needs none
        d = idx.dim
        assert ca.A >= ca.NTB * d + d * d

    def test_pinned_endpoint_loop_needs_no_arrow(self, rng):
        fg = small_graph(rng, loop=True)  # single loop (A0=pinned, A5)
        problem, idx = build_conic_problem(fg, SOCP_RELAXATION)
        ca = build_chain_arrow(problem, idx)
        # arrow holds only the landmarks (the pose-pose range (A0, A5)
        # also touches the pinned pose, so no range cover either)
        assert ca.A == idx.num_landmarks * idx.dim

    def test_api_auto_backend(self, rng):
        from score_tpu.api import ScoreSolverParams, solve_score

        fg = small_graph(rng, loop=False)
        res = solve_score(fg, SOCP_RELAXATION, ScoreSolverParams())
        assert res.solved
        fg2 = small_graph(rng, loop=True)
        res2 = solve_score(fg2, SOCP_RELAXATION, ScoreSolverParams())
        assert res2.solved  # loop closures ride the structured backend now

    def test_api_3d_auto_backend(self, rng):
        from score_tpu.api import ScoreSolverParams, solve_score

        fg = small_graph_3d(rng)
        res = solve_score(fg, SOCP_RELAXATION, ScoreSolverParams())
        assert res.solved


class TestManyRobots:
    """Regression: >= 12 robots once collided robot letter 'L' with landmark
    names, silently corrupting the graph wiring."""

    def test_letter_L_reserved(self):
        from score_tpu.sim.manhattan import _ROBOT_LETTERS

        assert "L" not in _ROBOT_LETTERS

    def test_name_collision_rejected(self):
        from score_tpu.fg import (
            FactorGraphData,
            LandmarkVariable2D,
            PoseVariable2D,
        )

        fg = FactorGraphData(dimension=2)
        fg.add_landmark_variable(LandmarkVariable2D("L0", (0.0, 0.0)))
        with pytest.raises(ValueError):
            fg.add_pose_variable(PoseVariable2D("L0"))
        fg2 = FactorGraphData(dimension=2)
        fg2.add_pose_variable(PoseVariable2D("X0"))
        with pytest.raises(ValueError):
            fg2.add_landmark_variable(LandmarkVariable2D("X0", (0.0, 0.0)))

    def test_multi_letter_names_past_25_robots(self):
        from score_tpu.sim.manhattan import _robot_name

        names = [_robot_name(r) for r in range(80)]
        assert len(set(names)) == 80
        assert names[24] == "Z" and names[25] == "AA"
        assert all("L" not in n for n in names)
        fg = simulate_manhattan_world(
            ManhattanWorldParams(
                num_robots=28,
                num_poses_per_robot=3,
                num_landmarks=2,
                grid_size=6,
                range_measure_prob=0.6,
                seed=3,
            )
        )
        assert len(fg.pose_variables) == 28
        assert fg.pose_variables[27][0].name.startswith("AC")

    def test_13_robot_world_converges_and_matches_dense(self):
        fg = simulate_manhattan_world(
            ManhattanWorldParams(
                num_robots=13,
                num_poses_per_robot=6,
                num_landmarks=3,
                grid_size=8,
                range_measure_prob=0.5,
                inter_robot_measure_prob=0.2,
                inter_robot_sensing_radius=12.0,
                seed=1,
            )
        )
        problem, idx = build_conic_problem(fg, SOCP_RELAXATION)
        ca = build_chain_arrow(problem, idx)
        r_ca = solve_conic(
            problem, IPMParams(max_iter=40),
            backend=ChainArrowBackend, backend_aux=ca,
        )
        r_d = solve_conic(problem, IPMParams(max_iter=40))
        # multi-robot problems must reach the full 1e-6-grade north-star
        # accuracy (OPTIMAL, not the reduced acceptance band): the
        # pre-round-3 endgame froze at ~5e-6 relgap once a cone went
        # degenerate (explicit W^{-2} roundoff — cones.apply_Winv2)
        assert int(r_ca.status) == 1  # OPTIMAL
        relgap = float(r_ca.gap) / max(1.0, abs(float(r_ca.pobj)))
        assert relgap <= 1e-6
        # near-zero optimum: absolute agreement at solver tolerance
        assert float(r_ca.pobj) == pytest.approx(
            float(r_d.pobj), rel=1e-5, abs=1e-6
        )


class TestPanelSolve:
    """K-wide multi-RHS condensed solves (`solve_panel`) must match K
    independent `solve` calls exactly — the panel threads the SAME
    factorization through one band traversal (the fused-predictor IPM
    path rides on this)."""

    def _check(self, backend, problem, state, factors, rhs_K, params):
        dx_panel = backend.solve_panel(problem, state, factors, rhs_K, params)
        dx_loop = jnp.stack(
            [
                backend.solve(problem, state, factors, rhs_K[i], params)
                for i in range(rhs_K.shape[0])
            ]
        )
        scale = float(jnp.max(jnp.abs(dx_loop))) + 1e-12
        np.testing.assert_allclose(
            np.asarray(dx_panel) / scale,
            np.asarray(dx_loop) / scale,
            atol=1e-12,
        )

    @pytest.mark.parametrize(
        "relaxation", [SOCP_RELAXATION, QCQP_RELAXATION]
    )
    def test_panel_matches_stacked_solves(self, rng, relaxation):
        params = IPMParams(kkt_refine_steps=1)
        for label, fg in graphs(rng):
            problem, idx = build_conic_problem(fg, relaxation)
            ca = build_chain_arrow(problem, idx)
            s = interior(rng, problem.num_cones, problem.k)
            z = interior(rng, problem.num_cones, problem.k)
            Winv2 = cones.winv2_matrices(cones.nt_scaling(s, z))
            rhs_K = jnp.asarray(rng.normal(size=(3, problem.n)))
            ds = DenseBackend.prepare(problem)
            rhs_K = rhs_K * ds.mask
            fd = DenseBackend.factor(problem, ds, Winv2, params)
            self._check(DenseBackend, problem, ds, fd, rhs_K, params)
            cs = ChainArrowBackend.prepare(problem, ca)
            fc = ChainArrowBackend.factor(problem, cs, Winv2, params)
            self._check(ChainArrowBackend, problem, cs, fc, rhs_K, params)

    def test_panel_matches_stacked_solves_mixed(self, rng):
        from score_tpu.solver.chain_arrow import MixedChainArrowBackend

        params = IPMParams(kkt_refine_steps=1)
        fg = graphs(rng)[1][1]  # 3robot
        problem, idx = build_conic_problem(fg, SOCP_RELAXATION)
        ca = build_chain_arrow(problem, idx)
        s = interior(rng, problem.num_cones, problem.k)
        z = interior(rng, problem.num_cones, problem.k)
        Winv2 = cones.winv2_matrices(cones.nt_scaling(s, z))
        cs = MixedChainArrowBackend.prepare(problem, ca)
        rhs_K = jnp.asarray(rng.normal(size=(3, problem.n))) * cs.mask
        fc = MixedChainArrowBackend.factor(problem, cs, Winv2, params)
        self._check(MixedChainArrowBackend, problem, cs, fc, rhs_K, params)

    def test_fused_predictor_qcqp_converges(self, rng):
        """The experimental fuse_predictor path (see IPMParams: a measured
        LOSS, kept off by default) must still converge on QCQP — this
        pins the documented behavior (more iterations, same solution)
        and keeps the _condensed_panel code path exercised end-to-end."""
        fg = graphs(rng)[1][1]  # 3robot
        problem, idx = build_conic_problem(fg, QCQP_RELAXATION)
        aux = build_chain_arrow(problem, idx)
        r_ref = solve_conic(
            problem, IPMParams(max_iter=50),
            backend=ChainArrowBackend, backend_aux=aux,
        )
        r_fuse = solve_conic(
            problem, IPMParams(max_iter=50, fuse_predictor=True),
            backend=ChainArrowBackend, backend_aux=aux,
        )
        assert int(r_fuse.status) in SOLVED_STATUSES
        assert float(r_fuse.pobj) == pytest.approx(
            float(r_ref.pobj), rel=1e-5, abs=1e-6
        )
        # the documented cost: the fused path converges SLOWER
        assert int(r_fuse.iterations) >= int(r_ref.iterations)
