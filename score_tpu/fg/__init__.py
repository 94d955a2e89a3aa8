"""Factor-graph data layer: variables, measurements, priors, the
FactorGraphData container, IO, and solution containers.

This is the TPU framework's replacement for the PyFactorGraph surface the
reference consumes (SURVEY.md §2.2).
"""

from score_tpu.fg.factor_graph import FactorGraphData
from score_tpu.fg.io import (
    parse_g2o_file,
    parse_pickle_file,
    parse_tum_file,
    save_to_g2o_file,
    save_to_pickle_file,
)
from score_tpu.fg.measurements import (
    AmbiguousFGRangeMeasurement,
    AmbiguousPoseMeasurement2D,
    FGRangeMeasurement,
    POSE_MEASUREMENT_TYPES,
    PoseMeasurement2D,
    PoseMeasurement3D,
)
from score_tpu.fg.priors import (
    LandmarkPrior2D,
    LandmarkPrior3D,
    PosePrior2D,
    PosePrior3D,
)
from score_tpu.fg.solver_utils import (
    SolverResults,
    VariableValues,
    save_results_to_file,
    save_to_tum,
)
from score_tpu.fg.variables import (
    LANDMARK_VARIABLE_TYPES,
    LandmarkVariable2D,
    LandmarkVariable3D,
    POSE_VARIABLE_TYPES,
    PoseVariable2D,
    PoseVariable3D,
)

__all__ = [
    "FactorGraphData",
    "parse_g2o_file",
    "parse_pickle_file",
    "parse_tum_file",
    "save_to_g2o_file",
    "save_to_pickle_file",
    "FGRangeMeasurement",
    "PoseMeasurement2D",
    "PoseMeasurement3D",
    "AmbiguousPoseMeasurement2D",
    "AmbiguousFGRangeMeasurement",
    "POSE_MEASUREMENT_TYPES",
    "PosePrior2D",
    "PosePrior3D",
    "LandmarkPrior2D",
    "LandmarkPrior3D",
    "SolverResults",
    "VariableValues",
    "save_to_tum",
    "save_results_to_file",
    "PoseVariable2D",
    "PoseVariable3D",
    "LandmarkVariable2D",
    "LandmarkVariable3D",
    "POSE_VARIABLE_TYPES",
    "LANDMARK_VARIABLE_TYPES",
]
