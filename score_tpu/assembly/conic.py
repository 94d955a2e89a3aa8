"""Compile a :class:`FactorGraphData` into a standard-form conic program.

The relaxations (semantics parity with
/root/reference/score/utils/gurobi_utils.py):

    minimize    0.5 x^T P x + q^T x + c0
    subject to  G x + s = h,   s in K = SOC(k) x ... x SOC(k)

with x = [poses | landmarks | distances] and per-pose blocks the free
d x (d+1) matrix [R | t] (rotation unconstrained — the SO(d) manifold is
relaxed away, gurobi_utils.py:240-245). The first pose of the first chain is
pinned to [I | 0] (gurobi_utils.py:181-183,316-333); we realize the pin by
freezing those coordinates in the KKT system (no variable elimination, no
index remapping).

Cost terms (gurobi_utils.py:358-526), each encoded as a sparse weighted
least-squares row  w * (a^T x - b)^2 :

  * odometry / loop closure:  k_ij ||t_j - t_i - R_i t_ij||^2
                            + tau_ij ||R_j - R_i R_ij||_F^2
  * range SOCP:  precision * (d_ij - dist)^2   [expanded form :486-487]
  * range QCQP:  precision * ||t_i - t_j - dist * d_ij||^2   [:489-496]
  * landmark priors: precision * ||l - prior||^2   [:433-446]
  * pose priors: NEVER in the cost (reference semantics).

Cones (gurobi_utils.py:336-352), all of identical dimension k = d + 1 so
every cone operation batches perfectly on TPU vector units:

  * SOCP:  s = (d_ij, t_i - t_j) in SOC  <=>  ||t_i - t_j|| <= d_ij
  * QCQP:  s = (1, d_ij) in SOC          <=>  ||d_ij|| <= 1

Everything is encoded with static shapes: column-index arrays (structure,
built host-side in numpy) plus value arrays (jit/vmap-compatible), so a
batch of Monte-Carlo trials over one graph structure is a single vmap.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Tuple

import numpy as np

import jax
from jax.tree_util import register_dataclass

from score_tpu.fg.factor_graph import FactorGraphData

SOCP_RELAXATION = "SOCP"
QCQP_RELAXATION = "QCQP"
ACCEPTABLE_RELAXATIONS = (SOCP_RELAXATION, QCQP_RELAXATION)

__all__ = [
    "ConicProblem",
    "VariableIndex",
    "build_conic_problem",
    "evaluate_objective",
    "SOCP_RELAXATION",
    "QCQP_RELAXATION",
]


def _check_valid_relaxation(relaxation: str) -> None:
    if relaxation not in ACCEPTABLE_RELAXATIONS:
        raise ValueError(
            f"Relaxation {relaxation} is not supported. "
            f"Acceptable relaxations are {list(ACCEPTABLE_RELAXATIONS)}"
        )


@dataclasses.dataclass(frozen=True)
class VariableIndex:
    """Host-side name <-> column-range bookkeeping.

    Column layout (all 0-based, dense, no gaps):
      pose p (global chain order):  [p*D, (p+1)*D) with D = d*(d+1),
          column-major within the pose block: R[r, c] -> p*D + c*d + r,
          t[r] -> p*D + d*d + r.
      landmark l: L0 + l*d + r
      distance m: D0 + m (SOCP scalar) or D0 + m*d + r (QCQP vector)
    """

    dim: int
    relaxation: str
    pose_names: Tuple[str, ...]
    landmark_names: Tuple[str, ...]
    dist_keys: Tuple[Tuple[str, str], ...]
    chain_lengths: Tuple[int, ...]
    # (base_pose, to_pose) name pairs of loop-closure measurements, in
    # cost-row emission order (used by the chain+arrow backend to keep
    # loop edges out of the chain band)
    loop_pairs: Tuple[Tuple[str, str], ...] = ()

    @property
    def num_poses(self) -> int:
        return len(self.pose_names)

    @property
    def num_landmarks(self) -> int:
        return len(self.landmark_names)

    @property
    def num_ranges(self) -> int:
        return len(self.dist_keys)

    @property
    def pose_block(self) -> int:
        return self.dim * (self.dim + 1)

    @property
    def landmark_offset(self) -> int:
        return self.num_poses * self.pose_block

    @property
    def distance_offset(self) -> int:
        return self.landmark_offset + self.num_landmarks * self.dim

    @property
    def dist_size(self) -> int:
        return 1 if self.relaxation == SOCP_RELAXATION else self.dim

    @property
    def num_cols(self) -> int:
        return self.distance_offset + self.num_ranges * self.dist_size

    # -- column calculators ------------------------------------------- #

    def pose_index(self, name: str) -> int:
        return self._pose_lookup[name]

    def landmark_index(self, name: str) -> int:
        return self._landmark_lookup[name]

    def __post_init__(self):
        object.__setattr__(
            self, "_pose_lookup", {n: i for i, n in enumerate(self.pose_names)}
        )
        object.__setattr__(
            self,
            "_landmark_lookup",
            {n: i for i, n in enumerate(self.landmark_names)},
        )

    def rot_col(self, pose_idx: int, r: int, c: int) -> int:
        return pose_idx * self.pose_block + c * self.dim + r

    def trans_cols(self, pose_idx: int) -> np.ndarray:
        base = pose_idx * self.pose_block + self.dim * self.dim
        return np.arange(base, base + self.dim)

    def landmark_cols(self, lm_idx: int) -> np.ndarray:
        base = self.landmark_offset + lm_idx * self.dim
        return np.arange(base, base + self.dim)

    def translation_cols(self, name: str) -> np.ndarray:
        """Columns of the translation of a pose OR landmark (dispatch parity:
        gurobi_utils.py:103-109)."""
        if name in self._pose_lookup:
            return self.trans_cols(self._pose_lookup[name])
        if name in self._landmark_lookup:
            return self.landmark_cols(self._landmark_lookup[name])
        raise ValueError(f"Variable name {name} not found")

    def dist_cols(self, m: int) -> np.ndarray:
        base = self.distance_offset + m * self.dist_size
        return np.arange(base, base + self.dist_size)

    def pose_slice(self, name: str) -> slice:
        p = self._pose_lookup[name]
        return slice(p * self.pose_block, (p + 1) * self.pose_block)


@register_dataclass
@dataclasses.dataclass(frozen=True)
class ConicProblem:
    """A static-shape conic program (pytree; `meta` fields are static).

    Cost:  sum_r cost_w[r] * (sum_j cost_coefs[r, j] * x[cost_cols[r, j]]
           - cost_b[r])^2 + c0,
    Cones: s = cone_h - (G x) with
           (G x)[m, i] = sum_j cone_coefs[m, i, j] * x[cone_cols[m, i, j]],
           and every s[m] in SOC(k).

    Column index ``n`` is a padding slot (reads as 0, writes discarded).
    """

    # data fields (arrays)
    cost_cols: jax.Array  # (R, NNZ) int32, padded with n
    cost_coefs: jax.Array  # (R, NNZ)
    cost_b: jax.Array  # (R,)
    cost_w: jax.Array  # (R,)
    cone_cols: jax.Array  # (N, k, 2) int32, padded with n
    cone_coefs: jax.Array  # (N, k, 2)
    cone_h: jax.Array  # (N, k)
    pin_idx: jax.Array  # (npin,) int32
    pin_val: jax.Array  # (npin,)
    c0: jax.Array  # scalar
    # static fields
    n: int = dataclasses.field(metadata=dict(static=True))
    k: int = dataclasses.field(metadata=dict(static=True))
    dim: int = dataclasses.field(metadata=dict(static=True))
    relaxation: str = dataclasses.field(metadata=dict(static=True))

    @property
    def num_cones(self) -> int:
        return self.cone_h.shape[0]

    @property
    def num_cost_rows(self) -> int:
        return self.cost_b.shape[0]


def _flatten_pose_measurements(fg: FactorGraphData):
    """All relative-pose measurements: odometry chains flattened, then loop
    closures (cost treats them identically, gurobi_utils.py:380-430)."""
    out = []
    for chain in fg.odom_measurements:
        out.extend(chain)
    out.extend(fg.loop_closure_measurements)
    return out


def _native_pose_rows(fg, idx, pose_meas, nnz, n, dtype):
    """Emit pose-measurement cost rows through the native C++ assembly
    kernel when available (score_tpu/native/fastbuild.cpp); returns None to
    fall back to the Python emission loop (3D, missing extension, or
    non-f64 dtype)."""
    if fg.dimension != 2 or dtype != np.float64 or not pose_meas:
        return None
    try:
        from score_tpu.native import _fastbuild
    except ImportError:
        return None
    NE = len(pose_meas)
    pi = np.empty(NE, dtype=np.int64)
    pj = np.empty(NE, dtype=np.int64)
    Rm = np.empty((NE, 2, 2), dtype=np.float64)
    tm = np.empty((NE, 2), dtype=np.float64)
    kij = np.empty(NE, dtype=np.float64)
    tau = np.empty(NE, dtype=np.float64)
    for e, m in enumerate(pose_meas):
        pi[e] = idx.pose_index(m.base_pose)
        pj[e] = idx.pose_index(m.to_pose)
        Rm[e] = m.rotation_matrix
        tm[e] = m.translation_vector
        kij[e] = m.translation_precision
        tau[e] = m.rotation_precision
    cols, coefs, b, w = _fastbuild.assemble_pose_rows_2d(
        pi, pj, Rm, tm, kij, tau, int(nnz), int(n)
    )
    return cols, coefs, b, w


def build_conic_problem(
    fg: FactorGraphData,
    relaxation: str = SOCP_RELAXATION,
    dtype=np.float64,
) -> Tuple[ConicProblem, VariableIndex]:
    """Host-side compilation of a factor graph into a ConicProblem."""
    _check_valid_relaxation(relaxation)
    d = fg.dimension
    # Duplicate-variable guard (parity: gurobi_utils.py:62-80 — the reference
    # registry rejects duplicate distance keys / variable names).
    keys = [(r.first_key, r.second_key) for r in fg.range_measurements]
    if len(keys) != len(set(keys)):
        raise ValueError("Duplicate range-measurement associations found")
    idx = VariableIndex(
        dim=d,
        relaxation=relaxation,
        pose_names=tuple(p.name for chain in fg.pose_variables for p in chain),
        landmark_names=tuple(l.name for l in fg.landmark_variables),
        dist_keys=tuple(
            (r.first_key, r.second_key) for r in fg.range_measurements
        ),
        chain_lengths=tuple(len(c) for c in fg.pose_variables),
        loop_pairs=tuple(
            (m.base_pose, m.to_pose) for m in fg.loop_closure_measurements
        ),
    )
    n = idx.num_cols
    nnz = d + 2  # widest row: 3D translation term (t_j, t_i, 3x R_i entries)

    rows_cols: List[np.ndarray] = []
    rows_coefs: List[np.ndarray] = []
    rows_b: List[np.ndarray] = []
    rows_w: List[np.ndarray] = []

    def pad_row(cols, coefs):
        cols = np.asarray(cols, dtype=np.int64)
        coefs = np.asarray(coefs, dtype=dtype)
        pc = np.full(nnz, n, dtype=np.int64)
        pv = np.zeros(nnz, dtype=dtype)
        pc[: len(cols)] = cols
        pv[: len(coefs)] = coefs
        return pc, pv

    def add_row(cols, coefs, b, w):
        pc, pv = pad_row(cols, coefs)
        rows_cols.append(pc)
        rows_coefs.append(pv)
        rows_b.append(np.asarray(b, dtype=dtype))
        rows_w.append(np.asarray(w, dtype=dtype))

    # ---- relative-pose costs (odometry + loop closures) -------------- #
    pose_meas = _flatten_pose_measurements(fg)
    native_rows = _native_pose_rows(fg, idx, pose_meas, nnz, n, dtype)
    if native_rows is not None:
        cols_nat, coefs_nat, b_nat, w_nat = native_rows
        rows_cols.extend(cols_nat.astype(np.int64))
        rows_coefs.extend(coefs_nat.astype(dtype))
        rows_b.extend(b_nat.astype(dtype))
        rows_w.extend(w_nat.astype(dtype))
    else:
        for meas in pose_meas:
            pi = idx.pose_index(meas.base_pose)
            pj = idx.pose_index(meas.to_pose)
            Rm = np.asarray(meas.rotation_matrix, dtype=dtype)
            tm = np.asarray(meas.translation_vector, dtype=dtype)
            tau = float(meas.rotation_precision)
            kij = float(meas.translation_precision)
            # rotation rows: (R_j - R_i Rm)[r, c]
            for c in range(d):
                for r in range(d):
                    cols = [idx.rot_col(pj, r, c)] + [
                        idx.rot_col(pi, r, kk) for kk in range(d)
                    ]
                    coefs = [1.0] + [-Rm[kk, c] for kk in range(d)]
                    add_row(cols, coefs, 0.0, tau)
            # translation rows: (t_j - t_i - R_i tm)[r]
            ti = idx.trans_cols(pi)
            tj = idx.trans_cols(pj)
            for r in range(d):
                cols = [tj[r], ti[r]] + [
                    idx.rot_col(pi, r, kk) for kk in range(d)
                ]
                coefs = [1.0, -1.0] + [-tm[kk] for kk in range(d)]
                add_row(cols, coefs, 0.0, kij)

    # ---- range costs (vectorized: M is the largest row family) -------- #
    M_r = len(fg.range_measurements)
    if M_r:
        prec_v = np.array(
            [float(m.precision) for m in fg.range_measurements], dtype=dtype
        )
        dist_v = np.array(
            [float(m.dist) for m in fg.range_measurements], dtype=dtype
        )
        ta_v = np.stack(
            [idx.translation_cols(m.first_key) for m in fg.range_measurements]
        )
        tb_v = np.stack(
            [idx.translation_cols(m.second_key) for m in fg.range_measurements]
        )
        dcols_v = idx.distance_offset + np.arange(
            M_r * idx.dist_size, dtype=np.int64
        ).reshape(M_r, idx.dist_size)
        if relaxation == SOCP_RELAXATION:
            # precision * (d_m - dist)^2  (expanded at :486-487; same
            # quadratic, we keep the exact constant in c0 via b)
            pc = np.full((M_r, nnz), n, dtype=np.int64)
            pv = np.zeros((M_r, nnz), dtype=dtype)
            pc[:, 0] = dcols_v[:, 0]
            pv[:, 0] = 1.0
            rows_cols.extend(pc)
            rows_coefs.extend(pv)
            rows_b.extend(dist_v)
            rows_w.extend(prec_v)
        else:
            pc = np.full((M_r, d, nnz), n, dtype=np.int64)
            pv = np.zeros((M_r, d, nnz), dtype=dtype)
            pc[:, :, 0] = ta_v
            pc[:, :, 1] = tb_v
            pc[:, :, 2] = dcols_v
            pv[:, :, 0] = 1.0
            pv[:, :, 1] = -1.0
            pv[:, :, 2] = -dist_v[:, None]
            rows_cols.extend(pc.reshape(M_r * d, nnz))
            rows_coefs.extend(pv.reshape(M_r * d, nnz))
            rows_b.extend(np.zeros(M_r * d, dtype=dtype))
            rows_w.extend(np.repeat(prec_v, d))

    # ---- landmark priors ---------------------------------------------- #
    for prior in fg.landmark_priors:
        lcols = idx.translation_cols(prior.name)
        pv = np.asarray(prior.translation_vector, dtype=dtype)
        prec = float(prior.translation_precision)
        for r in range(d):
            add_row([lcols[r]], [1.0], pv[r], prec)

    # ---- cones (vectorized over the M ranges) -------------------------- #
    k = d + 1
    N = idx.num_ranges
    cone_cols = np.full((N, k, 2), n, dtype=np.int64)
    cone_coefs = np.zeros((N, k, 2), dtype=dtype)
    cone_h = np.zeros((N, k), dtype=dtype)
    if N:
        if relaxation == SOCP_RELAXATION:
            # s = (d_m, t_a - t_b) in SOC  (gurobi_utils.py:345-352)
            cone_cols[:, 0, 0] = dcols_v[:, 0]
            cone_coefs[:, 0, 0] = -1.0
            cone_cols[:, 1:, 0] = ta_v
            cone_coefs[:, 1:, 0] = -1.0
            cone_cols[:, 1:, 1] = tb_v
            cone_coefs[:, 1:, 1] = 1.0
        else:
            # s = (1, d_m) in SOC  <=>  ||d_m|| <= 1  (:341-344)
            cone_h[:, 0] = 1.0
            cone_cols[:, 1:, 0] = dcols_v
            cone_coefs[:, 1:, 0] = -1.0

    # ---- gauge pin: first pose of the first nonempty chain ------------- #
    first_chain = next(c for c in fg.pose_variables if c)
    pin_slice = idx.pose_slice(first_chain[0].name)
    pin_idx = np.arange(pin_slice.start, pin_slice.stop, dtype=np.int64)
    # [I | 0] in the column-major pose layout: R[r, c] = (r == c), t = 0.
    pin_val = np.zeros(idx.pose_block, dtype=dtype)
    for c in range(d):
        pin_val[c * d + c] = 1.0

    if rows_cols:
        cost_cols = np.stack(rows_cols)
        cost_coefs = np.stack(rows_coefs)
        cost_b = np.stack(rows_b)
        cost_w = np.stack(rows_w)
    else:  # pathological empty graph
        cost_cols = np.zeros((0, nnz), dtype=np.int64)
        cost_coefs = np.zeros((0, nnz), dtype=dtype)
        cost_b = np.zeros((0,), dtype=dtype)
        cost_w = np.zeros((0,), dtype=dtype)

    problem = ConicProblem(
        cost_cols=cost_cols.astype(np.int32),
        cost_coefs=cost_coefs,
        cost_b=cost_b,
        cost_w=cost_w,
        cone_cols=cone_cols.astype(np.int32),
        cone_coefs=cone_coefs,
        cone_h=cone_h,
        pin_idx=pin_idx.astype(np.int32),
        pin_val=pin_val,
        c0=np.asarray(0.0, dtype=dtype),
        n=n,
        k=k,
        dim=d,
        relaxation=relaxation,
    )
    return problem, idx


def evaluate_objective(problem: ConicProblem, x: np.ndarray) -> float:
    """Reference (host) evaluation of the cost at x — ground truth for parity
    tests against a brute-force expression of the gurobi_utils costs."""
    xpad = np.concatenate([np.asarray(x), [0.0]])
    ax = (problem.cost_coefs * xpad[np.asarray(problem.cost_cols)]).sum(axis=1)
    r = ax - np.asarray(problem.cost_b)
    return float((np.asarray(problem.cost_w) * r * r).sum() + problem.c0)
