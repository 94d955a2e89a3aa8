"""Interior-point solver tests: KKT/complementarity conditions at the
returned solution, cross-check against scipy on small problems, and the
iterates variant (SURVEY.md §4 test plan: property tests on random conic
programs + tiny golden problems)."""

import numpy as np
import pytest

import jax.numpy as jnp

from score_tpu.assembly.conic import (
    QCQP_RELAXATION,
    SOCP_RELAXATION,
    build_conic_problem,
    evaluate_objective,
)
from score_tpu.solver import cones
from score_tpu.solver.ipm import (
    IPMParams,
    OPTIMAL,
    SOLVED_STATUSES,
    solve_conic,
    solve_conic_with_iterates,
)
from score_tpu.solver.linops import G_apply, GT_apply, prepare_operators
from tests.test_assembly import small_graph


@pytest.fixture
def rng():
    return np.random.default_rng(3)


def solve_with_scipy(problem):
    """Solve the same conic program with scipy SLSQP (host reference)."""
    from scipy.optimize import NonlinearConstraint, minimize

    ops = prepare_operators(problem)
    P = np.asarray(ops.P)
    q = np.asarray(ops.q)
    const = float(ops.const)
    pin_idx = np.asarray(problem.pin_idx)
    pin_val = np.asarray(problem.pin_val)
    cone_h = np.asarray(problem.cone_h)
    n = problem.n

    def fun(x):
        return 0.5 * x @ P @ x + q @ x + const

    def jac(x):
        return P @ x + q

    def s_of(x):
        return cone_h - np.asarray(G_apply(problem, jnp.asarray(x)))

    def cone_margin(x):
        s = s_of(x)
        return s[:, 0] - np.linalg.norm(s[:, 1:], axis=1)

    constraints = [NonlinearConstraint(cone_margin, 0.0, np.inf)]
    # pin as equality constraints
    A_pin = np.zeros((len(pin_idx), n))
    A_pin[np.arange(len(pin_idx)), pin_idx] = 1.0
    from scipy.optimize import LinearConstraint

    constraints.append(LinearConstraint(A_pin, pin_val, pin_val))
    x0 = np.zeros(n)
    x0[pin_idx] = pin_val
    res = minimize(
        fun, x0, jac=jac, method="SLSQP", constraints=constraints,
        options={"maxiter": 500, "ftol": 1e-12},
    )
    return res.x, fun(res.x)


@pytest.mark.parametrize("relaxation", [SOCP_RELAXATION, QCQP_RELAXATION])
class TestIPMCorrectness:
    def test_kkt_conditions_hold(self, rng, relaxation):
        fg = small_graph(rng)
        problem, _ = build_conic_problem(fg, relaxation)
        params = IPMParams(max_iter=50)
        res = solve_conic(problem, params)
        assert int(res.status) in SOLVED_STATUSES
        x, s, z = res.x, res.s, res.z
        # primal feasibility: G x + s = h, s in K
        rz = np.asarray(G_apply(problem, x) + s - problem.cone_h)
        assert np.abs(rz).max() < 1e-6
        assert np.asarray(cones.min_eig(s)).min() > -1e-9
        # dual feasibility: z in K, P x + q + G^T z = 0 on free coords
        assert np.asarray(cones.min_eig(z)).min() > -1e-9
        ops = prepare_operators(problem)
        rx = np.asarray(ops.mask * (ops.P @ x + ops.q + GT_apply(problem, z)))
        assert np.abs(rx).max() < 1e-3
        # complementarity
        assert float(cones.inner(s, z)) < 1e-4

    def test_matches_scipy(self, rng, relaxation):
        fg = small_graph(rng, num_poses=4, num_landmarks=1)
        problem, _ = build_conic_problem(fg, relaxation)
        res = solve_conic(problem, IPMParams(max_iter=50))
        assert int(res.status) in SOLVED_STATUSES
        _, obj_scipy = solve_with_scipy(problem)
        obj_ipm = evaluate_objective(problem, np.asarray(res.x))
        # IPM should match (or beat — SLSQP is loose) the scipy objective
        assert obj_ipm <= obj_scipy + 1e-5 * max(1.0, abs(obj_scipy))
        assert obj_ipm == pytest.approx(obj_scipy, rel=1e-4, abs=1e-5)

    def test_objective_reported_correctly(self, rng, relaxation):
        fg = small_graph(rng)
        problem, _ = build_conic_problem(fg, relaxation)
        res = solve_conic(problem, IPMParams())
        assert float(res.pobj) == pytest.approx(
            evaluate_objective(problem, np.asarray(res.x)), rel=1e-6, abs=1e-8
        )

    def test_pin_respected(self, rng, relaxation):
        fg = small_graph(rng)
        problem, _ = build_conic_problem(fg, relaxation)
        res = solve_conic(problem, IPMParams())
        x = np.asarray(res.x)
        np.testing.assert_allclose(
            x[np.asarray(problem.pin_idx)], np.asarray(problem.pin_val), atol=1e-12
        )

    def test_deterministic(self, rng, relaxation):
        fg = small_graph(rng)
        problem, _ = build_conic_problem(fg, relaxation)
        r1 = solve_conic(problem, IPMParams())
        r2 = solve_conic(problem, IPMParams())
        np.testing.assert_array_equal(np.asarray(r1.x), np.asarray(r2.x))


class TestIterates:
    def test_iterates_converge_to_solution(self, rng):
        fg = small_graph(rng)
        problem, _ = build_conic_problem(fg, SOCP_RELAXATION)
        params = IPMParams(max_iter=40)
        res_direct = solve_conic(problem, params)
        res_it, xs, ms = solve_conic_with_iterates(problem, params, num_iters=40)
        assert int(res_it.status) in SOLVED_STATUSES
        n_it = int(res_it.iterations)
        # iterates freeze after convergence (xs records raw iterates; the
        # returned x is the best iterate and may differ infinitesimally)
        np.testing.assert_allclose(
            np.asarray(xs[-1]), np.asarray(xs[n_it]), atol=1e-12
        )
        # near-degenerate optima: compare objectives, not coordinates
        obj_last = evaluate_objective(problem, np.asarray(xs[n_it]))
        obj_best = evaluate_objective(problem, np.asarray(res_it.x))
        obj_direct = evaluate_objective(problem, np.asarray(res_direct.x))
        assert obj_best == pytest.approx(obj_last, rel=1e-5, abs=1e-7)
        assert obj_best == pytest.approx(obj_direct, rel=1e-5, abs=1e-7)

    def test_objective_monotone_tail(self, rng):
        """The objective of iterates should approach the optimum."""
        fg = small_graph(rng)
        problem, _ = build_conic_problem(fg, SOCP_RELAXATION)
        res, xs, ms = solve_conic_with_iterates(problem, IPMParams(), num_iters=40)
        objs = [evaluate_objective(problem, np.asarray(x)) for x in xs]
        n_it = int(res.iterations)
        final = objs[n_it]
        assert abs(objs[max(0, n_it - 1)] - final) < abs(objs[0] - final) + 1e-9
