"""score_tpu — a TPU-native range-aided SLAM initialization framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
MarineRoboticsGroup/score: it compiles a range-aided SLAM factor graph into a
second-order cone program (SOCP) or ball-constrained QCQP relaxation and
solves it with a from-scratch primal-dual interior-point method
(Mehrotra predictor-corrector with Nesterov-Todd scaling), batched and
sharded across TPU devices.

Public API mirrors the reference's three-call UX
(load -> solve -> visualize):

    from score_tpu import parse_pickle_file, solve_score
    fg = parse_pickle_file("factor_graph.pickle")
    results = solve_score(fg, relaxation_type="SOCP")
"""

from __future__ import annotations

import os

# The solver's high-accuracy (f64) path requires x64; TPU hot paths request
# f32/bf16 explicitly. Opt out with SCORE_TPU_NO_X64=1.
if not os.environ.get("SCORE_TPU_NO_X64"):
    import jax

    jax.config.update("jax_enable_x64", True)

# TPU matmuls on f32 inputs default to one-pass bf16 (measured relative
# error 2e-3 on this runtime) — catastrophic inside a direct factorization
# (the f32 PCR block eliminations lose positive definiteness and NaN).
# A numerical solver must never get implicit bf16: force true-f32 matmul
# accumulation everywhere (f64 paths are unaffected; the MXU runs the
# 6-pass decomposition, still far faster than emulated f64).
if not os.environ.get("SCORE_TPU_NO_HIGHEST_MATMUL"):
    import jax

    jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: the emulated-f64 linear-algebra pipelines are
# expensive to compile (minutes on remote-compile TPU setups) but compile
# once per (shape, dtype). Opt out with SCORE_TPU_NO_COMPILE_CACHE=1.
# Skipped on CPU: remote-compile setups can poison the cache with CPU AOT
# artifacts built for a different host machine type (SIGILL / bad numerics).
if not os.environ.get("SCORE_TPU_NO_COMPILE_CACHE") and (
    os.environ.get("JAX_PLATFORMS", "") != "cpu"
):
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get(
            "SCORE_TPU_COMPILE_CACHE", os.path.expanduser("~/.cache/score_tpu_jax")
        ),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from score_tpu.fg import (  # noqa: E402
    FactorGraphData,
    FGRangeMeasurement,
    LandmarkVariable2D,
    LandmarkVariable3D,
    PoseMeasurement2D,
    PoseMeasurement3D,
    PoseVariable2D,
    PoseVariable3D,
    SolverResults,
    VariableValues,
    parse_pickle_file,
    save_to_tum,
)

__version__ = "0.1.0"

# Relaxation-mode constants (parity: gurobi_utils.py:26-28).
SOCP_RELAXATION = "SOCP"
QCQP_RELAXATION = "QCQP"
ACCEPTABLE_RELAXATIONS = (SOCP_RELAXATION, QCQP_RELAXATION)

# Initialization-technique constants (parity: gurobi_utils.py:30-34).
RANDOM_INIT = "random"
ZERO_INIT = "zero"
ODOM_INIT = "odom"
GT_INIT = "gt"
ACCEPTABLE_INIT = (RANDOM_INIT, ZERO_INIT, ODOM_INIT, GT_INIT)


def __getattr__(name):
    # Lazy imports to keep `import score_tpu` light and cycle-free.
    if name in ("solve_score", "solve_problem_with_intermediate_iterates",
                "ScoreSolverParams"):
        from score_tpu import api

        return getattr(api, name)
    if name in ("visualize_solution", "plot_error", "plot_trajectories"):
        from score_tpu.utils import plot

        return getattr(plot, name)
    if name in ("refine_solution", "RefineParams", "RefineResult"):
        from score_tpu import refine

        return getattr(refine, name)
    raise AttributeError(f"module 'score_tpu' has no attribute {name!r}")


__all__ = [
    "FactorGraphData",
    "FGRangeMeasurement",
    "PoseMeasurement2D",
    "PoseMeasurement3D",
    "PoseVariable2D",
    "PoseVariable3D",
    "LandmarkVariable2D",
    "LandmarkVariable3D",
    "SolverResults",
    "VariableValues",
    "parse_pickle_file",
    "save_to_tum",
    "solve_score",
    "solve_problem_with_intermediate_iterates",
    "ScoreSolverParams",
    "SOCP_RELAXATION",
    "QCQP_RELAXATION",
    "ACCEPTABLE_RELAXATIONS",
]
