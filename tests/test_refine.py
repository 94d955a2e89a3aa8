"""Nonlinear LM refinement (refine/lm.py): the L7 stage of the pipeline."""

import numpy as np

from score_tpu.assembly.conic import evaluate_objective  # noqa: F401 (parity helper)
from score_tpu.refine import RefineParams, refine_solution
from score_tpu.sim.manhattan import ManhattanWorldParams, simulate_manhattan_world


def _true_cost(fg, values):
    """The nonlinear MLE objective evaluated at named values (host)."""
    d = fg.dimension
    c = 0.0
    meas = [m for chain in fg.odom_measurements for m in chain]
    meas += list(fg.loop_closure_measurements)
    for m in meas:
        Ti = np.asarray(values.poses[m.base_pose])
        Tj = np.asarray(values.poses[m.to_pose])
        Ri, ti = Ti[:d, :d], Ti[:d, d]
        Rj, tj = Tj[:d, :d], Tj[:d, d]
        c += m.rotation_precision * np.sum(
            (Rj - Ri @ np.asarray(m.rotation_matrix)) ** 2
        )
        c += m.translation_precision * np.sum(
            (tj - ti - Ri @ np.asarray(m.translation_vector)) ** 2
        )
    for r in fg.range_measurements:
        def pos(name):
            if name in values.poses:
                T = np.asarray(values.poses[name])
                return T[:d, d]
            return np.asarray(values.landmarks[name])
        dist = np.linalg.norm(pos(r.first_key) - pos(r.second_key))
        c += r.precision * (dist - r.dist) ** 2
    for p in fg.landmark_priors:
        c += p.translation_precision * np.sum(
            (np.asarray(values.landmarks[p.name]) - np.asarray(p.position)[:d]) ** 2
        )
    return float(c)


def _sim(seed=0, **kw):
    params = ManhattanWorldParams(
        num_robots=1,
        num_poses_per_robot=10,
        num_landmarks=2,
        grid_size=4,
        range_measure_prob=0.5,
        seed=seed,
        **kw,
    )
    return simulate_manhattan_world(params)


def test_refine_decreases_true_cost_from_score_init():
    from score_tpu.api import ScoreSolverParams, solve_score

    fg = _sim(seed=3)
    res = solve_score(fg, "SOCP", ScoreSolverParams(max_iter=40))
    assert res.solved
    c_init = _true_cost(fg, res.variables)
    out = refine_solution(fg, res.variables, RefineParams(max_iter=30))
    c_ref = _true_cost(fg, out.values)
    assert abs(out.initial_cost - c_init) < 1e-6 * max(1.0, c_init)
    assert abs(out.cost - c_ref) < 1e-6 * max(1.0, c_ref)
    assert c_ref <= c_init + 1e-12
    # rotations stay on the manifold
    for T in out.values.poses.values():
        R = np.asarray(T)[:2, :2]
        assert np.allclose(R.T @ R, np.eye(2), atol=1e-8)
        assert np.linalg.det(R) > 0


def test_refine_through_solve_score_api():
    from score_tpu.api import ScoreSolverParams, solve_score

    fg = _sim(seed=7)
    base = solve_score(fg, "SOCP", ScoreSolverParams(max_iter=40))
    refined = solve_score(
        fg, "SOCP", ScoreSolverParams(max_iter=40, refine=True)
    )
    assert refined.solved
    assert _true_cost(fg, refined.variables) <= _true_cost(fg, base.variables) + 1e-12


def test_refine_params_passthrough_solve_score():
    """ScoreSolverParams.refine_params reaches the refinement stage: a
    huber-kernel refinement through the public API must differ from the
    least-squares one when the data carries a range outlier."""
    from score_tpu.api import ScoreSolverParams, solve_score
    from score_tpu.refine import RefineParams

    fg = _sim(seed=9)
    fg.range_measurements[0].dist += 25.0  # gross outlier
    r_ls = solve_score(fg, "SOCP", ScoreSolverParams(max_iter=40, refine=True))
    r_hub = solve_score(
        fg, "SOCP",
        ScoreSolverParams(
            max_iter=40, refine=True,
            refine_params=RefineParams(robust="huber", robust_delta=3.0),
        ),
    )
    assert r_ls.solved and r_hub.solved
    a = np.asarray(list(r_ls.poses.values())[-1])
    b = np.asarray(list(r_hub.poses.values())[-1])
    assert not np.allclose(a, b)


def test_refine_perturbed_groundtruth_recovers():
    # start from a perturbed ground truth on near-noiseless data: LM must
    # come back to ~the ground truth (cost near the noise floor)
    fg = _sim(seed=5)
    from score_tpu.fg.solver_utils import VariableValues

    gt = VariableValues(
        dim=2,
        poses={
            p.name: p.transformation_matrix
            for chain in fg.pose_variables
            for p in chain
        },
        landmarks={
            l.name: np.asarray(l.true_position, dtype=float)
            for l in fg.landmark_variables
        },
        distances={},
    )
    rng = np.random.default_rng(0)
    pert = type(gt)(
        dim=gt.dim,
        poses={
            n: np.asarray(T)
            + np.pad(
                0.05 * rng.standard_normal((2, 3)), ((0, 1), (0, 0))
            )
            for n, T in gt.poses.items()
        },
        landmarks={
            n: np.asarray(v) + 0.05 * rng.standard_normal(2)
            for n, v in gt.landmarks.items()
        },
        distances={},
    )
    # re-orthonormalize the perturbed rotations
    for n, T in pert.poses.items():
        U, _, Vt = np.linalg.svd(T[:2, :2])
        T[:2, :2] = U @ np.diag([1.0, np.linalg.det(U @ Vt)]) @ Vt
    c_gt = _true_cost(fg, gt)
    out = refine_solution(fg, pert, RefineParams(max_iter=40))
    assert out.cost <= _true_cost(fg, pert)
    assert out.cost <= c_gt * 1.5 + 1e-9


def test_robust_refine_rejects_outliers():
    """Gross range outliers: robust kernels (huber / GNC-GM) must beat
    plain least squares on ATE (VERDICT r2 item 6; the GOATS data has
    range outliers to -210 m)."""
    import dataclasses

    from score_tpu.api import ScoreSolverParams, solve_score
    from score_tpu.fg.measurements import FGRangeMeasurement
    from score_tpu.utils.metrics import ate_against_ground_truth

    fg = simulate_manhattan_world(
        ManhattanWorldParams(
            num_robots=2, num_poses_per_robot=20, num_landmarks=3,
            grid_size=8, range_measure_prob=0.5, seed=4,
        )
    )
    rng = np.random.default_rng(0)
    ms = list(fg.range_measurements)
    for i in rng.choice(len(ms), size=max(2, len(ms) // 10), replace=False):
        m = ms[i]
        ms[i] = FGRangeMeasurement(
            tuple(m.association), m.dist + 60.0, m.stddev, m.timestamp
        )
    fg.range_measurements = ms
    res = solve_score(
        fg, "SOCP", ScoreSolverParams(max_iter=40, tol_gap_reduced=1e-3)
    )

    def ate_of(values):
        r2 = dataclasses.replace(res, variables=values)
        return max(
            v["rmse"] for v in ate_against_ground_truth(r2, fg).values()
        )

    r_ls = refine_solution(fg, res.variables, RefineParams(robust="none"))
    r_gm = refine_solution(
        fg, res.variables, RefineParams(robust="gm", robust_delta=3.0)
    )
    ate_ls, ate_gm = ate_of(r_ls.values), ate_of(r_gm.values)
    assert ate_gm < ate_ls
    assert ate_gm < 0.5
