"""Host-side per-call cost of solve_score's non-solver phases on GOATS."""
import time

import numpy as np


def t(label, f, n=3):
    best = 1e9
    out = None
    for _ in range(n):
        t0 = time.perf_counter()
        out = f()
        best = min(best, time.perf_counter() - t0)
    print(f"{label:28s} {best*1000:8.1f} ms")
    return out


from score_tpu.assembly.conic import build_conic_problem
from score_tpu.assembly.normalize import normalize_factor_graph
from score_tpu.datasets import goats_pickle_path
from score_tpu.fg import parse_pickle_file
from score_tpu.solver.chain_arrow import build_chain_arrow

fg = t("parse_pickle_file", lambda: parse_pickle_file(goats_pickle_path()))
scaled, scale = t("normalize_factor_graph", lambda: normalize_factor_graph(fg))
problem, idx = t(
    "build_conic_problem", lambda: build_conic_problem(scaled, "SOCP")
)
aux = t("build_chain_arrow", lambda: build_chain_arrow(problem, idx))

# extraction path (device-independent parts): rounding needs x — fake one
n = problem.n
x = np.random.default_rng(0).standard_normal(n)

from score_tpu.api import variable_values_from_x

t("variable_values_from_x", lambda: variable_values_from_x(x, idx))

from score_tpu.fg.factor_graph import FactorGraphData

t("unconnected_check", lambda: fg.unconnected_variable_names)
