"""User-facing solver configuration.

Realizes the ``ScoreSolverParams`` config the reference's example intended
but never shipped (/root/reference/examples/solve_goats_example_score.py:21,
28-34 — fields solver/verbose/save_results/init_technique/custom_init_file),
extended with the interior-point and TPU-precision controls of this
framework (SURVEY.md §5 config plan).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

from score_tpu.solver.ipm import IPMParams

__all__ = ["ScoreSolverParams"]


@dataclasses.dataclass(frozen=True)
class ScoreSolverParams:
    """Configuration for :func:`score_tpu.api.solve_score`.

    Tolerances default to 1e-8-grade accuracy — far tighter than the
    reference's BarQCPConvTol=1e-1 (gurobi_utils.py:212), which it could
    afford because SCORE is only an initializer. Loosen via ``tol_*`` for
    initializer-grade speed.
    """

    # reference-intended fields
    solver: str = "ipm"  # the native TPU interior-point method
    verbose: bool = False
    save_results: bool = False
    results_filepath: str = ""
    init_technique: str = "default"  # default | random | zero | odom | gt
    custom_init_file: Optional[str] = None

    # interior-point controls
    max_iter: int = 60
    tol_feas: float = 1e-8
    tol_gap_abs: float = 1e-8
    tol_gap_rel: float = 1e-6  # BASELINE.md north-star relative gap
    # Reduced ("solved to lower accuracy") acceptance used when the
    # iteration stops on stall/max_iter. None keeps the IPMParams
    # defaults (1e-6 feas / 1e-5 gap); the largest multi-robot problems
    # floor near 1e-4 relative gap on TPU — explicitly opt into
    # initializer-grade acceptance there (still 1000x tighter than the
    # reference's 1e-1 tolerance, and the true gap is always reported).
    tol_feas_reduced: Optional[float] = None
    tol_gap_reduced: Optional[float] = None
    step_fraction: float = 0.99

    # precision policy:
    #   "auto"  — f64 on CPU hosts, "mixed" on TPU (the production default)
    #   "f64"   — everything in f64 (true f64 on CPU; the runtime's
    #             double-f32-style emulation on TPU)
    #   "mixed" — f64 assembly/operators/refinement + rigorous two-float
    #             (double-f32) band factorization via the fused Pallas
    #             kernels; same accuracy as "f64" on TPU, substantially
    #             faster (native f32 arithmetic, one launch per band op)
    #   "f32"   — initializer-grade fast mode (loose tolerances)
    precision: str = "auto"
    # Inner iterative-refinement passes per KKT solve (against the true
    # K = P + G'W^{-2}G); subsumed to first order by dir_refine_steps.
    kkt_refine_steps: int = 0
    # Residual-guarded refinement passes of each search direction against
    # the full unreduced Newton system — what lets the endgame reach the
    # 1e-6-grade gap target (see solver/ipm.py).
    dir_refine_steps: int = 1
    # Gondzio multiple-centrality correctors per iteration (see
    # IPMParams.gondzio_correctors; each costs one extra condensed solve
    # per iteration and typically cuts the iteration count).
    gondzio_correctors: int = 2

    # Solve in normalized translation units (conditioning; exact
    # reparameterization, see assembly/normalize.py).
    normalize: bool = True

    # Run the downstream nonlinear refinement (matrix-free LM on the true
    # MLE objective, score_tpu.refine) on the rounded solution — the
    # TPU-native equivalent of the reference pipeline's GTSAM stage
    # (reference README.md:57-63).
    refine: bool = False
    # Optional score_tpu.refine.RefineParams for the refinement stage
    # (robust range kernels etc. — huber delta=30 is the measured best
    # on the GOATS outliers); None uses the RefineParams defaults.
    refine_params: Optional[object] = None

    # KKT backend: "auto" picks the structure-exploiting chain+arrow
    # factorization (2D and 3D, loop closures and inter-robot ranges
    # handled as arrow blocks) whenever the graph has a pose chain, and
    # falls back to dense Cholesky only for pose-free problems.
    backend: str = "auto"  # auto | chain_arrow | dense

    def ipm_params(self) -> IPMParams:
        if self.precision == "f32":
            # initializer-grade fast mode: f32 reaches ~1e-3..1e-4 relative
            # accuracy (still far tighter than the reference's 1e-1,
            # gurobi_utils.py:212)
            return IPMParams(
                max_iter=self.max_iter,
                tol_feas=max(self.tol_feas, 1e-5),
                tol_gap_abs=max(self.tol_gap_abs, 1e-5),
                tol_gap_rel=max(self.tol_gap_rel, 1e-5),
                step_fraction=self.step_fraction,
                kkt_refine_steps=max(self.kkt_refine_steps, 1),
                dir_refine_steps=self.dir_refine_steps,
                gondzio_correctors=self.gondzio_correctors,
                tol_feas_reduced=(
                    1e-2 if self.tol_feas_reduced is None
                    else self.tol_feas_reduced
                ),
                tol_gap_reduced=(
                    1e-2 if self.tol_gap_reduced is None
                    else self.tol_gap_reduced
                ),
                static_reg=1e-7,
            )
        extra = {}
        if self.tol_feas_reduced is not None:
            extra["tol_feas_reduced"] = self.tol_feas_reduced
        if self.tol_gap_reduced is not None:
            extra["tol_gap_reduced"] = self.tol_gap_reduced
        return IPMParams(
            max_iter=self.max_iter,
            tol_feas=self.tol_feas,
            tol_gap_abs=self.tol_gap_abs,
            tol_gap_rel=self.tol_gap_rel,
            step_fraction=self.step_fraction,
            kkt_refine_steps=self.kkt_refine_steps,
            dir_refine_steps=self.dir_refine_steps,
            gondzio_correctors=self.gondzio_correctors,
            **extra,
        )
