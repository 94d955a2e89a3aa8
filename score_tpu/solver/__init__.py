"""Interior-point solver package: SOC cone algebra, Mehrotra IPM, and the
dense / chain-arrow KKT backends."""

from score_tpu.solver.backend import DenseBackend
from score_tpu.solver.ipm import (
    IPMParams,
    IPMResult,
    OPTIMAL,
    OPTIMAL_INACCURATE,
    SOLVED_STATUSES,
    solve_conic,
    solve_conic_fixed,
    solve_conic_traced,
    solve_conic_with_iterates,
)
from score_tpu.solver.params import ScoreSolverParams

__all__ = [
    "DenseBackend",
    "IPMParams",
    "IPMResult",
    "OPTIMAL",
    "OPTIMAL_INACCURATE",
    "SOLVED_STATUSES",
    "solve_conic",
    "solve_conic_fixed",
    "solve_conic_traced",
    "solve_conic_with_iterates",
    "ScoreSolverParams",
]
