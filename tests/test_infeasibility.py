"""Infeasibility certificates (SURVEY.md §5 failure-detection role,
§7 "infeasibility detection"): hand-built contradictory conic programs
must return PRIMAL_INFEASIBLE with a Farkas certificate instead of
thrashing to MAX_ITER. The reference's only failure handling is a
Gurobi-error retry (solve_score.py:76-85); this is strictly stronger.

Dual infeasibility (unboundedness) is structurally unreachable for
problems built from factor graphs — the cost encoding is a sum of
squares, bounded below — so only the primal certificate has a
constructible test case.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from score_tpu.assembly.conic import ConicProblem, SOCP_RELAXATION
from score_tpu.solver.ipm import (
    IPMParams,
    OPTIMAL,
    PRIMAL_INFEASIBLE,
    solve_conic,
)


def _toy_problem(second_cone_sign, pin_first=False):
    """n = 1 variable x0; two SOC(3) cones:
    cone 0:  s = (x0, 1, 0)                     <=>  x0 >= 1
    cone 1:  s = (sign * x0, 1, 0)              <=>  sign * x0 >= 1
    sign = -1 makes the pair contradictory (x0 >= 1 and x0 <= -1).
    With pin_first, x0 is frozen at 0 instead, contradicting cone 0.
    One tiny cost row keeps P nondegenerate."""
    n, k, nnz = 1, 3, 2
    cost_cols = np.full((1, nnz), n, dtype=np.int32)
    cost_cols[0, 0] = 0
    cost_coefs = np.zeros((1, nnz))
    cost_coefs[0, 0] = 1.0
    cone_cols = np.full((2, k, 2), n, dtype=np.int32)
    cone_coefs = np.zeros((2, k, 2))
    cone_h = np.zeros((2, k))
    # cone 0 head: s0 = 0 - (-1 * x0) = x0
    cone_cols[0, 0, 0] = 0
    cone_coefs[0, 0, 0] = -1.0
    cone_h[0, 1] = 1.0
    # cone 1 head: s0 = sign * x0
    cone_cols[1, 0, 0] = 0
    cone_coefs[1, 0, 0] = -float(second_cone_sign)
    cone_h[1, 1] = 1.0
    if pin_first:
        pin_idx = np.array([0], dtype=np.int32)
        pin_val = np.array([0.0])
    else:
        pin_idx = np.zeros((0,), dtype=np.int32)
        pin_val = np.zeros((0,))
    return ConicProblem(
        cost_cols=jnp.asarray(cost_cols),
        cost_coefs=jnp.asarray(cost_coefs),
        cost_b=jnp.asarray(np.zeros(1)),
        cost_w=jnp.asarray(np.ones(1)),
        cone_cols=jnp.asarray(cone_cols),
        cone_coefs=jnp.asarray(cone_coefs),
        cone_h=jnp.asarray(cone_h),
        pin_idx=jnp.asarray(pin_idx),
        pin_val=jnp.asarray(pin_val),
        c0=jnp.asarray(0.0),
        n=n,
        k=k,
        dim=2,
        relaxation=SOCP_RELAXATION,
    )


def test_contradictory_cones_certified_primal_infeasible():
    problem = _toy_problem(second_cone_sign=-1)
    res = solve_conic(problem, IPMParams(max_iter=100, stall_limit=100))
    assert int(res.status) == PRIMAL_INFEASIBLE, (
        f"status={int(res.status)} gap={float(res.gap):.3e}"
    )
    # the returned z is (proportional to) the Farkas certificate:
    # z in K*, G'z ~ 0 on free coords, h'z < 0
    z = np.asarray(res.z)
    znorm = np.linalg.norm(z)
    hz = float(np.sum(np.zeros((2, 3)) + np.array([[0, 1, 0], [0, 1, 0]]) * z))
    assert hz < 0.0
    # G'z = -z0_head + z1_head (coefs -1 and +1 on x0)
    gtz = -z[0, 0] + z[1, 0]
    assert abs(gtz) < 1e-6 * znorm


def test_pin_contradiction_certified_primal_infeasible():
    problem = _toy_problem(second_cone_sign=1, pin_first=True)
    res = solve_conic(problem, IPMParams(max_iter=100, stall_limit=100))
    assert int(res.status) == PRIMAL_INFEASIBLE


def test_feasible_control_still_optimal():
    # sign = +1: both cones say x0 >= 1 — feasible, optimum at x0 = 1
    problem = _toy_problem(second_cone_sign=1)
    res = solve_conic(problem, IPMParams(max_iter=60))
    assert int(res.status) == OPTIMAL
    assert float(res.x[0]) == pytest.approx(1.0, abs=1e-5)
