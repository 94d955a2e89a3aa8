"""Downstream nonlinear refinement (SURVEY.md §1 L7).

The reference pipeline uses SCORE only to *initialize* a local solver
(its README points users at GTSAM/iSAM2 for the refinement step,
/root/reference/README.md:57-63). This package is the TPU-native
equivalent: a matrix-free Levenberg-Marquardt pose-graph/range optimizer
(jit-compiled, static shapes, autodiff Jacobian products) that consumes
the :class:`~score_tpu.fg.solver_utils.VariableValues` produced by
``solve_score`` and returns the refined maximum-likelihood estimate.
"""

from score_tpu.refine.lm import RefineParams, RefineResult, refine_solution

__all__ = ["RefineParams", "RefineResult", "refine_solution"]
