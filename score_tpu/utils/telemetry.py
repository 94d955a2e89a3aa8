"""Observability: structured logging, per-phase timers, solve tracing, and
profiler hooks.

The reference's only observability is Gurobi's wall-clock in
``SolverResults.total_time`` plus coloredlogs (SURVEY.md §5). Here:

- :func:`setup_logging` — the `[file:line] name level - message` format the
  reference used, without external dependencies;
- :class:`PhaseTimer` — assembly / solve / rounding phase wall-clock;
- :func:`trace_solve` — per-iteration residual/gap/objective telemetry from
  the on-device traced solver;
- :func:`profiler_trace` — context manager around `jax.profiler` for
  TensorBoard-compatible device traces.
"""

from __future__ import annotations

import contextlib
import logging
import sys
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np

__all__ = ["setup_logging", "PhaseTimer", "SolveTrace", "trace_solve",
           "profiler_trace"]

_FORMAT = "[%(filename)s:%(lineno)d] %(name)s %(levelname)s - %(message)s"

# coloredlogs-style per-level ANSI colors (the reference installs
# coloredlogs at import time, solve_score.py:11-15).
_LEVEL_COLORS = {
    logging.DEBUG: "\x1b[32m",  # green
    logging.INFO: "\x1b[0m",  # default
    logging.WARNING: "\x1b[33m",  # yellow
    logging.ERROR: "\x1b[31m",  # red
    logging.CRITICAL: "\x1b[1;31m",  # bold red
}
_RESET = "\x1b[0m"


class _ColorFormatter(logging.Formatter):
    def format(self, record: logging.LogRecord) -> str:
        msg = super().format(record)
        color = _LEVEL_COLORS.get(record.levelno, "")
        return f"{color}{msg}{_RESET}" if color else msg


def setup_logging(level: int = logging.INFO, color: Optional[bool] = None) -> None:
    """Configure the reference-style log format with per-level ANSI
    coloring (parity: solve_score.py:11-15 coloredlogs install, without
    the external dependency). ``color=None`` auto-detects a TTY."""
    if color is None:
        color = sys.stderr.isatty()
    handler = logging.StreamHandler()
    handler.setFormatter(
        _ColorFormatter(_FORMAT) if color else logging.Formatter(_FORMAT)
    )
    root = logging.getLogger()
    for h in list(root.handlers):
        root.removeHandler(h)
    root.addHandler(handler)
    root.setLevel(level)


@dataclass
class PhaseTimer:
    """Accumulates wall-clock per named phase."""

    phases: Dict[str, float] = field(default_factory=dict)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.phases[name] = self.phases.get(name, 0.0) + (
                time.perf_counter() - t0
            )

    def summary(self) -> str:
        total = sum(self.phases.values())
        parts = [f"{k}={v:.3f}s" for k, v in self.phases.items()]
        return f"total={total:.3f}s ({', '.join(parts)})"


@dataclass
class SolveTrace:
    """Per-iteration interior-point telemetry."""

    pres: np.ndarray
    dres: np.ndarray
    gap: np.ndarray
    pobj: np.ndarray
    iterations: int
    status: int

    def log(self, logger: Optional[logging.Logger] = None) -> None:
        logger = logger or logging.getLogger("score_tpu.solver")
        for i in range(self.iterations + 1):
            logger.info(
                "iter %3d: pres=%.3e dres=%.3e gap=%.3e pobj=%.8e",
                i, self.pres[i], self.dres[i], self.gap[i], self.pobj[i],
            )

    def as_dict(self) -> Dict[str, List[float]]:
        k = self.iterations + 1
        return {
            "pres": self.pres[:k].tolist(),
            "dres": self.dres[:k].tolist(),
            "gap": self.gap[:k].tolist(),
            "pobj": self.pobj[:k].tolist(),
        }


def trace_solve(problem, params=None, backend=None, backend_aux=None,
                num_iters: int = 50) -> "tuple":
    """Solve with per-iteration telemetry. Returns (IPMResult, SolveTrace)."""
    from score_tpu.solver.backend import DenseBackend
    from score_tpu.solver.ipm import IPMParams, solve_conic_traced

    params = params or IPMParams()
    backend = backend or DenseBackend
    result, metrics = solve_conic_traced(
        problem, params, num_iters=num_iters, backend=backend,
        backend_aux=backend_aux,
    )
    m = np.asarray(metrics)
    trace = SolveTrace(
        pres=m[:, 0],
        dres=m[:, 1],
        gap=m[:, 2],
        pobj=m[:, 3],
        iterations=int(result.iterations),
        status=int(result.status),
    )
    return result, trace


@contextlib.contextmanager
def profiler_trace(log_dir: str = "/tmp/score_tpu_trace"):
    """Capture a jax.profiler device trace (view with TensorBoard)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
