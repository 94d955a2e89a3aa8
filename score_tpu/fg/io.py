"""Parsers and exporters for factor-graph data.

- :func:`parse_pickle_file` loads both py_factor_graph-produced pickles (the
  two datasets shipped with the reference) and pickles produced by this
  package, via a module-remapping unpickler.
- :func:`parse_tum_file` reads TUM trajectories (e.g. the shipped
  ``gt_traj_A.tum`` ground truth).

Parity: py_factor_graph ``parse_pickle_file`` as used at
/root/reference/examples/solve_goats_example_score.py:18,40.
"""

from __future__ import annotations

import pickle
from typing import Dict, List, Tuple

import numpy as np

from score_tpu.fg import measurements as _meas
from score_tpu.fg import priors as _priors
from score_tpu.fg import variables as _vars
from score_tpu.fg.factor_graph import FactorGraphData

__all__ = ["parse_pickle_file", "save_to_pickle_file", "parse_tum_file"]


# Map py_factor_graph global names -> our classes. Anything not listed here
# that lives under py_factor_graph.* raises (surfacing schema gaps loudly).
_CLASS_MAP = {
    ("py_factor_graph.factor_graph", "FactorGraphData"): FactorGraphData,
    ("py_factor_graph.variables", "PoseVariable2D"): _vars.PoseVariable2D,
    ("py_factor_graph.variables", "PoseVariable3D"): _vars.PoseVariable3D,
    ("py_factor_graph.variables", "LandmarkVariable2D"): _vars.LandmarkVariable2D,
    ("py_factor_graph.variables", "LandmarkVariable3D"): _vars.LandmarkVariable3D,
    ("py_factor_graph.measurements", "PoseMeasurement2D"): _meas.PoseMeasurement2D,
    ("py_factor_graph.measurements", "PoseMeasurement3D"): _meas.PoseMeasurement3D,
    ("py_factor_graph.measurements", "FGRangeMeasurement"): _meas.FGRangeMeasurement,
    (
        "py_factor_graph.measurements",
        "AmbiguousPoseMeasurement2D",
    ): _meas.AmbiguousPoseMeasurement2D,
    (
        "py_factor_graph.measurements",
        "AmbiguousFGRangeMeasurement",
    ): _meas.AmbiguousFGRangeMeasurement,
    ("py_factor_graph.priors", "PosePrior2D"): _priors.PosePrior2D,
    ("py_factor_graph.priors", "PosePrior3D"): _priors.PosePrior3D,
    ("py_factor_graph.priors", "LandmarkPrior2D"): _priors.LandmarkPrior2D,
    ("py_factor_graph.priors", "LandmarkPrior3D"): _priors.LandmarkPrior3D,
}


class _RemappingUnpickler(pickle.Unpickler):
    def find_class(self, module: str, name: str):
        if module.startswith("py_factor_graph"):
            key = (module, name)
            if key in _CLASS_MAP:
                return _CLASS_MAP[key]
            raise pickle.UnpicklingError(
                f"Unsupported py_factor_graph class in pickle: {module}.{name}"
            )
        return super().find_class(module, name)


def parse_pickle_file(filepath: str) -> FactorGraphData:
    """Load a pickled factor graph (py_factor_graph schema or ours)."""
    with open(filepath, "rb") as f:
        fg = _RemappingUnpickler(f).load()
    if not isinstance(fg, FactorGraphData):
        raise TypeError(f"{filepath} did not contain a FactorGraphData: {type(fg)}")
    _normalize(fg)
    return fg


def _normalize(fg: FactorGraphData) -> None:
    """Fill derived/bookkeeping fields that old pickles may lack."""
    if not fg.existing_pose_variables:
        fg.existing_pose_variables = {
            p.name for chain in fg.pose_variables for p in chain
        }
    if not fg.existing_landmark_variables:
        fg.existing_landmark_variables = {l.name for l in fg.landmark_variables}


def save_to_pickle_file(fg: FactorGraphData, filepath: str) -> None:
    with open(filepath, "wb") as f:
        pickle.dump(fg, f)


def parse_tum_file(filepath: str) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Read a TUM trajectory file.

    Returns ``(timestamps (N,), translations (N,3), quaternions (N,4))`` with
    quaternions in (qx, qy, qz, qw) order.
    """
    rows: List[List[float]] = []
    with open(filepath) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            vals = [float(v) for v in line.replace(",", " ").split()]
            if len(vals) != 8:
                raise ValueError(f"Malformed TUM line in {filepath}: {line!r}")
            rows.append(vals)
    arr = np.asarray(rows, dtype=np.float64).reshape(-1, 8)
    return arr[:, 0], arr[:, 1:4], arr[:, 4:8]
