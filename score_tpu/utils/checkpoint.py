"""Checkpoint / resume for solver state.

The interior-point state is a flat pytree of arrays, so checkpointing is a
save/load of named arrays (SURVEY.md §5: "solver state is a pytree;
checkpointing is trivial"). Combined with `solve_conic(..., warm_start=
(x, s, z))` this gives warm restart across processes.
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np

__all__ = ["save_solver_state", "load_solver_state"]


def save_solver_state(path: str, result) -> None:
    """Persist an IPMResult's iterate (x, s, z) and telemetry to .npz."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez_compressed(
        path,
        x=np.asarray(result.x),
        s=np.asarray(result.s),
        z=np.asarray(result.z),
        iterations=np.asarray(result.iterations),
        status=np.asarray(result.status),
        pobj=np.asarray(result.pobj),
        gap=np.asarray(result.gap),
    )


def load_solver_state(path: str) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Load a checkpoint as a (x, s, z) warm-start triple."""
    data = np.load(path)
    return data["x"], data["s"], data["z"]
