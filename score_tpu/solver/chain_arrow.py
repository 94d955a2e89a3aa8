"""Structure-exploiting KKT backend: chain + arrow factorization.

The range-SLAM KKT matrix K = P + G'W^{-2}G has a fixed sparsity pattern
(SURVEY.md §5 "block-tridiagonal + arrow"):

  * distance variables couple only to their own cone/cost rows and the two
    endpoint translations -> eliminated analytically per range (batched
    closed forms);
  * pose blocks form per-robot chains coupled only by odometry
    (block-tridiagonal, D=6-wide blocks in 2D);
  * landmarks, plus the translations of poses touched by pose-pose (e.g.
    inter-robot) ranges, form a small dense "arrow" block coupled to the
    chains.

One interior-point iteration then costs O(num_poses * D^3 + A^2 * num_poses
+ A^3) instead of the dense backend's O(n^3): a block-tridiagonal Cholesky
`lax.scan` per chain (vmapped over robots), a dense Schur complement on the
arrow, and two substitution sweeps. Every assembly step is batched matmuls /
one-hot einsums (MXU work) instead of TPU-hostile scatters; layout
conversions are pure gathers through host-precomputed permutations.

Scope: dim == 2 and no loop closures (callers fall back to the dense
backend otherwise; both shipped datasets qualify). Numeric values are read
out of the generic :class:`ConicProblem` row encoding through static index
maps, so a vmapped batch of problems (Monte-Carlo trials) shares one
structure.

Replaces (with exact arithmetic, not approximation) the sparse-Cholesky
work Gurobi's barrier performs inside the reference's `model.optimize()`
(/root/reference/score/solve_score.py:76).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.tree_util import register_dataclass

from score_tpu.assembly.conic import (
    ConicProblem,
    SOCP_RELAXATION,
    VariableIndex,
)
from score_tpu.solver.linops import G_apply
from score_tpu.solver.pcr import PCRFactors, pcr_factor, pcr_pad_length, pcr_solve
from score_tpu.solver.smallblocks import chol_small, tri_lower_solve, tri_upper_solve

__all__ = ["ChainArrowStructure", "build_chain_arrow", "ChainArrowBackend"]


# ------------------------------------------------------------------ #
# Host-side structure analysis
# ------------------------------------------------------------------ #


@register_dataclass
@dataclasses.dataclass(frozen=True)
class ChainArrowStructure:
    """Static structure (index maps, masks, one-hots) for the backend.

    One structure serves every numeric instance (Monte-Carlo batch) of the
    same graph. Canonical "struct" layout of x: [pose slots (C*T*D) |
    landmarks (NL*d) | distances (NR*ds)]; the arrow is an assembly-side
    grouping (landmark blocks then arrow-pose translation blocks)."""

    # chain layout
    cm: jax.Array  # (C, T, D) chain-active column mask
    av: jax.Array  # (C, T, D) arrow-resident column mask (translations)
    x_to_chain: jax.Array  # (C, T, D) gather: padded x -> pose slots
    x_to_lm: jax.Array  # (NL, d) gather: x -> landmark cols
    x_to_dist: jax.Array  # (NR, ds)
    struct_to_x: jax.Array  # (n,) gather from flat struct -> x
    oh_slot_arrow: jax.Array  # (C*T, NAb) arrow block of each slot's trans
    # odometry rows
    odom_row_base: jax.Array  # (C, T-1) int32 (clamped; *_valid masks pads)
    odom_valid: jax.Array  # (C, T-1)
    odom_local_onehot: jax.Array  # (D_rows, nnz, 13)
    # ranges
    range_row_base: jax.Array  # (NR,) int32
    end_a_cols: jax.Array  # (NR, d) x cols of endpoint-a translation
    end_b_cols: jax.Array  # (NR, d)
    oh_pose_a: jax.Array  # (NR, C*T) one-hot: endpoint a is pose at slot
    oh_pose_b: jax.Array  # (NR, C*T)
    oh_lm_a: jax.Array  # (NR, NL)
    oh_lm_b: jax.Array  # (NR, NL)
    oh_chain_a: jax.Array  # (NR, C*T) pose endpoints resident in the CHAIN
    oh_chain_b: jax.Array  # (NR, C*T)
    oh_arrow_a: jax.Array  # (NR, NAb) endpoints resident in the ARROW
    oh_arrow_b: jax.Array  # (NR, NAb)
    # priors
    prior_diag_sites: jax.Array  # (NPp,) int32 arrow block of each prior
    prior_row_base: jax.Array  # (NPp,) int32
    # pinning
    arrow_active: jax.Array  # (A,) 1.0 on active arrow cols
    # statics
    C: int = dataclasses.field(metadata=dict(static=True))
    T: int = dataclasses.field(metadata=dict(static=True))
    D: int = dataclasses.field(metadata=dict(static=True))
    d: int = dataclasses.field(metadata=dict(static=True))
    NL: int = dataclasses.field(metadata=dict(static=True))
    NAb: int = dataclasses.field(metadata=dict(static=True))  # arrow blocks
    A: int = dataclasses.field(metadata=dict(static=True))  # = NAb * d
    NR: int = dataclasses.field(metadata=dict(static=True))
    ds: int = dataclasses.field(metadata=dict(static=True))
    relaxation: str = dataclasses.field(metadata=dict(static=True))


def build_chain_arrow(
    problem: ConicProblem, idx: VariableIndex, num_loop_closures: int = 0
) -> ChainArrowStructure:
    """Host-side (numpy) structure analysis."""
    d = idx.dim
    if d != 2:
        raise NotImplementedError("chain-arrow backend currently supports 2D")
    if num_loop_closures:
        raise NotImplementedError(
            "chain-arrow backend does not support loop closures yet; "
            "use the dense backend"
        )
    D = idx.pose_block
    C = len(idx.chain_lengths)
    T = max(idx.chain_lengths)
    NR = idx.num_ranges
    NL = idx.num_landmarks
    ds = idx.dist_size
    n = problem.n

    pose_cpos = {}
    g = 0
    for c, ln in enumerate(idx.chain_lengths):
        for t in range(ln):
            pose_cpos[g] = (c, t)
            g += 1
    name_to_pose = {nm: i for i, nm in enumerate(idx.pose_names)}
    name_to_lm = {nm: i for i, nm in enumerate(idx.landmark_names)}

    # Arrow poses: a VERTEX COVER of the pose-pose range graph. A range
    # edge only needs ONE endpoint in the arrow — the other side stays
    # chain-resident and couples through B exactly like a pose-landmark
    # edge. Greedy max-degree cover roughly halves the arrow width (and
    # the dominant A^2/A^3 factor cost) vs taking every endpoint.
    pp_edges = []
    degree: dict = {}
    for (a, b) in idx.dist_keys:
        if a in name_to_pose and b in name_to_pose:
            pa, pb = name_to_pose[a], name_to_pose[b]
            pp_edges.append((pa, pb))
            degree[pa] = degree.get(pa, 0) + 1
            degree[pb] = degree.get(pb, 0) + 1
    arrow_pose_set = set()
    for pa, pb in sorted(
        pp_edges, key=lambda e: -(degree[e[0]] + degree[e[1]])
    ):
        if pa not in arrow_pose_set and pb not in arrow_pose_set:
            arrow_pose_set.add(pa if degree[pa] >= degree[pb] else pb)
    arrow_poses = sorted(arrow_pose_set)
    NAb = NL + len(arrow_poses)
    NAb_eff = max(NAb, 1)
    A = NAb_eff * d
    arrow_block_of_pose = {p: NL + i for i, p in enumerate(arrow_poses)}

    pin_cols = set(int(v) for v in np.asarray(problem.pin_idx))

    cm = np.zeros((C, T, D))
    av = np.zeros((C, T, D))
    x_to_chain = np.full((C, T, D), n, dtype=np.int64)
    oh_slot_arrow = np.zeros((C * T, NAb_eff))
    for g, (c, t) in pose_cpos.items():
        base = g * D
        cols = np.arange(base, base + D)
        x_to_chain[c, t] = cols
        cm[c, t] = 1.0
        if g in arrow_block_of_pose:
            cm[c, t, d * d :] = 0.0
            av[c, t, d * d :] = 1.0
            oh_slot_arrow[c * T + t, arrow_block_of_pose[g]] = 1.0
        for k_, col in enumerate(cols):
            if col in pin_cols:
                cm[c, t, k_] = 0.0
                av[c, t, k_] = 0.0

    x_to_lm = np.stack(
        [np.asarray(idx.landmark_cols(l), dtype=np.int64) for l in range(NL)]
    ) if NL else np.zeros((0, d), dtype=np.int64)
    x_to_dist = np.stack(
        [np.asarray(idx.dist_cols(m), dtype=np.int64) for m in range(NR)]
    ) if NR else np.zeros((0, ds), dtype=np.int64)

    # struct -> x permutation
    struct_len = C * T * D + NL * d + NR * ds
    struct_to_x = np.full((n,), struct_len, dtype=np.int64)
    for flat_pos, xcol in enumerate(x_to_chain.reshape(-1)):
        if xcol < n:
            struct_to_x[xcol] = flat_pos
    off = C * T * D
    for flat_pos, xcol in enumerate(x_to_lm.reshape(-1)):
        struct_to_x[xcol] = off + flat_pos
    off += NL * d
    for flat_pos, xcol in enumerate(x_to_dist.reshape(-1)):
        struct_to_x[xcol] = off + flat_pos

    # arrow activity (pin can in principle hit an arrow pose)
    arrow_active = np.ones((A,))
    for i, p in enumerate(arrow_poses):
        blk = NL + i
        for r in range(d):
            if p * D + d * d + r in pin_cols:
                arrow_active[blk * d + r] = 0.0

    # cost-row bases (row emission order: odometry chains flattened, loop
    # closures (none here), ranges, landmark priors — assembly/conic.py)
    rows_per_edge = d * d + d
    odom_row_base = np.zeros((C, max(T - 1, 1)), dtype=np.int64)
    odom_valid = np.zeros((C, max(T - 1, 1)))
    e = 0
    for c, ln in enumerate(idx.chain_lengths):
        for t in range(ln - 1):
            odom_row_base[c, t] = e * rows_per_edge
            odom_valid[c, t] = 1.0
            e += 1
    range_rows_start = e * rows_per_edge
    rows_per_range = 1 if idx.relaxation == SOCP_RELAXATION else d
    range_row_base = range_rows_start + np.arange(NR, dtype=np.int64) * rows_per_range
    prior_rows_start = range_rows_start + NR * rows_per_range
    n_priors = (int(problem.cost_b.shape[0]) - prior_rows_start) // d
    prior_row_base = prior_rows_start + np.arange(n_priors, dtype=np.int64) * d
    prior_diag_sites = np.zeros((n_priors,), dtype=np.int64)
    cost_cols_np = np.asarray(problem.cost_cols)
    for j in range(n_priors):
        col = int(cost_cols_np[prior_row_base[j], 0])
        prior_diag_sites[j] = (col - idx.landmark_offset) // d

    # range endpoint maps
    end_a_cols = np.full((NR, d), n, dtype=np.int64)
    end_b_cols = np.full((NR, d), n, dtype=np.int64)
    oh_pose_a = np.zeros((NR, C * T))
    oh_pose_b = np.zeros((NR, C * T))
    oh_lm_a = np.zeros((NR, max(NL, 1)))
    oh_lm_b = np.zeros((NR, max(NL, 1)))
    oh_chain_a = np.zeros((NR, C * T))
    oh_chain_b = np.zeros((NR, C * T))
    oh_arrow_a = np.zeros((NR, NAb_eff))
    oh_arrow_b = np.zeros((NR, NAb_eff))
    for m, (a, b) in enumerate(idx.dist_keys):
        for name, ec, ohp, ohl, ohc, oha in (
            (a, end_a_cols, oh_pose_a, oh_lm_a, oh_chain_a, oh_arrow_a),
            (b, end_b_cols, oh_pose_b, oh_lm_b, oh_chain_b, oh_arrow_b),
        ):
            ec[m] = np.asarray(idx.translation_cols(name))
            # pose-first dispatch, consistent with
            # VariableIndex.translation_cols (gurobi_utils.py:103-109)
            if name not in name_to_pose and name in name_to_lm:
                l = name_to_lm[name]
                ohl[m, l] = 1.0
                oha[m, l] = 1.0
            else:
                p = name_to_pose[name]
                c, t = pose_cpos[p]
                ohp[m, c * T + t] = 1.0
                if p in arrow_block_of_pose:
                    oha[m, arrow_block_of_pose[p]] = 1.0
                else:
                    ohc[m, c * T + t] = 1.0

    # odometry local-position one-hot (static pattern from assembly/conic:
    # local pose layout col-major [R00,R10,R01,R11,t0,t1], pose_i at 0..5,
    # pose_j at 6..11, slot 12 = trash for padding)
    nnz = int(problem.cost_cols.shape[1])
    local_pos = np.full((rows_per_edge, nnz), 12, dtype=np.int64)
    for c in range(d):
        for r in range(d):
            row = c * d + r
            local_pos[row, 0] = D + c * d + r
            local_pos[row, 1] = 0 * d + r
            local_pos[row, 2] = 1 * d + r
    for r in range(d):
        row = d * d + r
        local_pos[row, 0] = D + d * d + r
        local_pos[row, 1] = d * d + r
        local_pos[row, 2] = 0 * d + r
        local_pos[row, 3] = 1 * d + r
    odom_local_onehot = np.zeros((rows_per_edge, nnz, 2 * D + 1))
    for row in range(rows_per_edge):
        for jj in range(nnz):
            odom_local_onehot[row, jj, local_pos[row, jj]] = 1.0

    dtype = np.asarray(problem.cost_coefs).dtype

    def farr(a):
        return jnp.asarray(np.asarray(a, dtype=dtype))

    def iarr(a):
        return jnp.asarray(np.asarray(a, dtype=np.int32))

    return ChainArrowStructure(
        cm=farr(cm),
        av=farr(av),
        x_to_chain=iarr(x_to_chain),
        x_to_lm=iarr(x_to_lm),
        x_to_dist=iarr(x_to_dist),
        struct_to_x=iarr(struct_to_x),
        oh_slot_arrow=farr(oh_slot_arrow),
        odom_row_base=iarr(odom_row_base),
        odom_valid=farr(odom_valid),
        odom_local_onehot=farr(odom_local_onehot),
        range_row_base=iarr(range_row_base),
        end_a_cols=iarr(end_a_cols),
        end_b_cols=iarr(end_b_cols),
        oh_pose_a=farr(oh_pose_a),
        oh_pose_b=farr(oh_pose_b),
        oh_lm_a=farr(oh_lm_a),
        oh_lm_b=farr(oh_lm_b),
        oh_chain_a=farr(oh_chain_a),
        oh_chain_b=farr(oh_chain_b),
        oh_arrow_a=farr(oh_arrow_a),
        oh_arrow_b=farr(oh_arrow_b),
        prior_diag_sites=iarr(prior_diag_sites),
        prior_row_base=iarr(prior_row_base),
        arrow_active=farr(arrow_active),
        C=C, T=T, D=D, d=d, NL=NL, NAb=NAb_eff, A=A, NR=NR, ds=ds,
        relaxation=idx.relaxation,
    )


# ------------------------------------------------------------------ #
# Device-side state
# ------------------------------------------------------------------ #


class CAState(NamedTuple):
    """Per-solve prepared quantities (q/const/mask/xpin/hnorm/qnorm match
    the solver's backend-state field contract)."""

    structure: ChainArrowStructure
    q: jnp.ndarray
    const: jnp.ndarray
    mask: jnp.ndarray
    xpin: jnp.ndarray
    hnorm: jnp.ndarray
    qnorm: jnp.ndarray
    edge_ii: jnp.ndarray  # (C, T-1, D, D) odometry edge blocks (P side)
    edge_ij: jnp.ndarray
    edge_jj: jnp.ndarray
    D0: jnp.ndarray  # (C, T, D, D) chain diag base (chain-masked)
    U0: jnp.ndarray  # (C, T-1, D, D) chain off-diag (chain-masked)
    B0: jnp.ndarray  # (C, T, D, A) chain-arrow base coupling
    S0: jnp.ndarray  # (A, A) arrow base (odometry spill + priors)
    prior_diag: jnp.ndarray  # (NL*d,) 2*precision on prior landmark cols
    rng_prec: jnp.ndarray  # (NR,)
    rng_dist: jnp.ndarray  # (NR,)


class CAFactors(NamedTuple):
    pcr: PCRFactors  # vmapped-over-chains cyclic-reduction factors
    B: jnp.ndarray  # (C, Tp, D, A) masked chain-arrow coupling
    Z: jnp.ndarray  # (C, Tp, D, A) = T^{-1} B chain solves of the panels
    LS: jnp.ndarray  # (A, A) arrow Schur Cholesky
    kdd: jnp.ndarray  # SOCP (NR,) pivots; QCQP (NR,d,d) pivot inverses
    wv: jnp.ndarray  # SOCP (NR,d) coupling vectors; QCQP zeros
    Hhat: jnp.ndarray  # (NR, d, d)
    Winv2: jnp.ndarray  # (NR, k, k) NT scalings (for refinement matvecs)


def _tri(L, b):
    return jax.scipy.linalg.solve_triangular(L, b, lower=True)


def _tri_T(L, b):
    return jax.scipy.linalg.solve_triangular(L.T, b, lower=False)


class ChainArrowBackend:
    """KKT backend exploiting the SLAM chain+arrow structure. Use via
    ``solve_conic(problem, params, backend=ChainArrowBackend,
    backend_aux=build_chain_arrow(problem, idx))``."""

    # ---------------- struct layout helpers ---------------- #

    @staticmethod
    def _gather(state: "CAState", v):
        st = state.structure
        vp = jnp.concatenate([v, jnp.zeros((1,), dtype=v.dtype)])
        vc = vp[st.x_to_chain]  # (C, T, D) all pose columns
        vl = vp[st.x_to_lm]  # (NL, d)
        vd = vp[st.x_to_dist]  # (NR, ds)
        return vc, vl, vd

    @staticmethod
    def _to_x(state: "CAState", vc, vl, vd):
        st = state.structure
        flat = jnp.concatenate(
            [
                vc.reshape(-1),
                vl.reshape(-1),
                vd.reshape(-1),
                jnp.zeros((1,), dtype=vc.dtype),
            ]
        )
        return flat[st.struct_to_x]

    @staticmethod
    def _range_endpoint_values(state: "CAState", v):
        """Gather (ta, tb) translations of each range's endpoints from a
        full x vector."""
        st = state.structure
        vp = jnp.concatenate([v, jnp.zeros((1,), dtype=v.dtype)])
        return vp[st.end_a_cols], vp[st.end_b_cols]

    @staticmethod
    def _range_endpoint_adjoint(state: "CAState", ga, gb):
        """Accumulate per-range endpoint gradients (NR, d) onto the pose-
        slot translation layout (C, T, D) and landmark layout (NL, d)."""
        st = state.structure
        d, D = st.d, st.D
        tr = jnp.einsum("mp,mi->pi", st.oh_pose_a, ga) + jnp.einsum(
            "mp,mi->pi", st.oh_pose_b, gb
        )  # (C*T, d)
        vc = jnp.zeros((st.C * st.T, D), dtype=ga.dtype)
        vc = vc.at[:, d * d :].set(tr).reshape(st.C, st.T, D)
        vl = jnp.einsum("ml,mi->li", st.oh_lm_a, ga) + jnp.einsum(
            "ml,mi->li", st.oh_lm_b, gb
        )
        return vc, vl[: st.NL]

    # ---------------- prepare ---------------- #

    @staticmethod
    def prepare(problem: ConicProblem, aux: ChainArrowStructure) -> CAState:
        st = aux
        dtype = problem.cost_coefs.dtype
        C, T, D, d, A = st.C, st.T, st.D, st.d, st.A

        # q (only b-carrying rows contribute; one small one-off scatter)
        n = problem.n
        q = jnp.zeros((n + 1,), dtype=dtype)
        contrib = (
            -2.0 * (problem.cost_w * problem.cost_b)[:, None] * problem.cost_coefs
        )
        q = q.at[problem.cost_cols].add(contrib)[:n]
        const = problem.c0 + jnp.sum(problem.cost_w * problem.cost_b**2)
        mask = jnp.ones((n,), dtype=dtype).at[problem.pin_idx].set(0.0)
        xpin = (
            jnp.zeros((n,), dtype=dtype)
            .at[problem.pin_idx]
            .set(problem.pin_val.astype(dtype))
        )

        # odometry edge blocks M_e = 2 A_loc' diag(w) A_loc (batched matmuls)
        rows_per_edge = D
        row_idx = st.odom_row_base[..., None] + jnp.arange(rows_per_edge)
        coefs = problem.cost_coefs[row_idx]  # (C, T-1, D, nnz)
        w = problem.cost_w[row_idx]
        A_loc = jnp.einsum("ctrj,rjl->ctrl", coefs, st.odom_local_onehot)[
            ..., : 2 * D
        ]
        M = 2.0 * jnp.einsum("ctrl,ctr,ctrm->ctlm", A_loc, w, A_loc)
        M = M * st.odom_valid[..., None, None]
        edge_ii = M[..., :D, :D]
        edge_ij = M[..., :D, D:]
        edge_jj = M[..., D:, D:]

        # split edge blocks by (chain | arrow) column residency
        cm_i, cm_j = st.cm[:, :-1], st.cm[:, 1:]
        av_i, av_j = st.av[:, :-1], st.av[:, 1:]
        oh = st.oh_slot_arrow.reshape(C, T, st.NAb)
        oh_i, oh_j = oh[:, :-1], oh[:, 1:]

        D0 = jnp.zeros((C, T, D, D), dtype=dtype)
        D0 = D0.at[:, :-1].add(edge_ii * cm_i[..., :, None] * cm_i[..., None, :])
        D0 = D0.at[:, 1:].add(edge_jj * cm_j[..., :, None] * cm_j[..., None, :])
        U0 = edge_ij * cm_i[..., :, None] * cm_j[..., None, :]

        Bfull = jnp.zeros((C, T, D, st.NAb, d), dtype=dtype)
        S0 = jnp.zeros((st.NAb, d, st.NAb, d), dtype=dtype)

        # ordered pairs (u, v): (rows of u) x (cols of v)
        pairs = (
            (edge_ii, 0, cm_i, av_i, oh_i, cm_i, av_i, oh_i),
            (edge_jj, 1, cm_j, av_j, oh_j, cm_j, av_j, oh_j),
            (edge_ij, 0, cm_i, av_i, oh_i, cm_j, av_j, oh_j),
            (jnp.swapaxes(edge_ij, -1, -2), 1, cm_j, av_j, oh_j, cm_i, av_i, oh_i),
        )
        for (blk, ushift, cmu, avu, ohu, cmv, avv, ohv) in pairs:
            # chain rows x arrow cols -> B at slot u
            ca = (blk * cmu[..., :, None] * avv[..., None, :])[..., :, d * d :]
            contrib = jnp.einsum("ctle,ctb->ctlbe", ca, ohv)
            if ushift == 0:
                Bfull = Bfull.at[:, :-1].add(contrib)
            else:
                Bfull = Bfull.at[:, 1:].add(contrib)
            # arrow rows x arrow cols -> S
            aa = (blk * avu[..., :, None] * avv[..., None, :])[
                ..., d * d :, d * d :
            ]
            S0 = S0 + jnp.einsum("ctij,cta,ctb->aibj", aa, ohu, ohv)

        B0 = Bfull.reshape(C, T, D, st.NAb * d)[..., :A]
        S0 = S0.reshape(st.NAb * d, st.NAb * d)[:A, :A]

        # landmark priors on the arrow diagonal (landmark blocks lead)
        prior_diag = jnp.zeros((st.NL * d,), dtype=dtype)
        if st.prior_row_base.shape[0] > 0:
            pw = 2.0 * problem.cost_w[st.prior_row_base]  # (NPp,)
            sites = st.prior_diag_sites  # (NPp,) landmark index
            site_oh = (
                sites[:, None] == jnp.arange(st.NL)[None, :]
            ).astype(dtype)
            per_lm = jnp.einsum("pl,p->l", site_oh, pw)
            prior_diag = jnp.repeat(per_lm, d)
            S0 = S0 + jnp.diag(
                jnp.concatenate(
                    [prior_diag, jnp.zeros((A - st.NL * d,), dtype=dtype)]
                )
            )

        # range numeric data
        if st.NR > 0:
            if st.relaxation == SOCP_RELAXATION:
                rng_prec = problem.cost_w[st.range_row_base]
                rng_dist = problem.cost_b[st.range_row_base]
            else:
                rng_prec = problem.cost_w[st.range_row_base]
                rng_dist = -problem.cost_coefs[st.range_row_base, 2]
        else:
            rng_prec = jnp.zeros((0,), dtype=dtype)
            rng_dist = jnp.zeros((0,), dtype=dtype)

        return CAState(
            structure=st,
            q=q,
            const=const,
            mask=mask,
            xpin=xpin,
            hnorm=jnp.maximum(1.0, jnp.linalg.norm(problem.cone_h)),
            qnorm=jnp.maximum(1.0, jnp.linalg.norm(q)),
            edge_ii=edge_ii,
            edge_ij=edge_ij,
            edge_jj=edge_jj,
            D0=D0,
            U0=U0,
            B0=B0,
            S0=S0,
            prior_diag=prior_diag,
            rng_prec=rng_prec,
            rng_dist=rng_dist,
        )

    # ---------------- operator applications ---------------- #

    @staticmethod
    def P_matvec(state: CAState, v):
        st = state.structure
        d, D = st.d, st.D
        vc, vl, vd = ChainArrowBackend._gather(state, v)

        # odometry
        vi, vj = vc[:, :-1], vc[:, 1:]
        oi = jnp.einsum("ctlm,ctm->ctl", state.edge_ii, vi) + jnp.einsum(
            "ctlm,ctm->ctl", state.edge_ij, vj
        )
        oj = jnp.einsum("ctml,ctm->ctl", state.edge_ij, vi) + jnp.einsum(
            "ctlm,ctm->ctl", state.edge_jj, vj
        )
        out_c = jnp.zeros_like(vc)
        out_c = out_c.at[:, :-1].add(oi)
        out_c = out_c.at[:, 1:].add(oj)

        # ranges
        out_d = jnp.zeros_like(vd)
        out_l = jnp.zeros_like(vl)
        if st.NR:
            if st.relaxation == SOCP_RELAXATION:
                out_d = 2.0 * state.rng_prec[:, None] * vd
            else:
                ta, tb = ChainArrowBackend._range_endpoint_values(state, v)
                r = ta - tb - state.rng_dist[:, None] * vd
                w2 = 2.0 * state.rng_prec[:, None]
                gc, gl = ChainArrowBackend._range_endpoint_adjoint(
                    state, w2 * r, -w2 * r
                )
                out_c = out_c + gc
                out_l = out_l + gl
                out_d = -state.rng_dist[:, None] * w2 * r

        # priors
        if st.NL:
            out_l = out_l + state.prior_diag.reshape(st.NL, d) * vl

        return ChainArrowBackend._to_x(state, out_c, out_l, out_d)

    @staticmethod
    def G(problem: ConicProblem, state: CAState, x):
        return G_apply(problem, x)

    @staticmethod
    def GT(problem: ConicProblem, state: CAState, z):
        st = state.structure
        d = st.d
        if st.relaxation == SOCP_RELAXATION:
            out_d = -z[:, 0:1]
            ga, gb = -z[:, 1:], z[:, 1:]
        else:
            out_d = -z[:, 1:]
            ga = jnp.zeros((st.NR, d), dtype=z.dtype)
            gb = ga
        gc, gl = ChainArrowBackend._range_endpoint_adjoint(state, ga, gb)
        return ChainArrowBackend._to_x(state, gc, gl, out_d)

    # ---------------- factorization ---------------- #

    @staticmethod
    def _range_elimination(state: CAState, Winv2):
        st = state.structure
        d = st.d
        prec, dist = state.rng_prec, state.rng_dist
        if st.relaxation == SOCP_RELAXATION:
            w00 = Winv2[:, 0, 0]
            wv = Winv2[:, 0, 1:]
            Mtt = Winv2[:, 1:, 1:]
            kdd = 2.0 * prec + w00
            Hhat = Mtt - wv[:, :, None] * wv[:, None, :] / kdd[:, None, None]
            return kdd, wv, Hhat
        eye = jnp.eye(d, dtype=Winv2.dtype)
        Kdd = 2.0 * (prec * dist**2)[:, None, None] * eye + Winv2[:, 1:, 1:]
        # closed-form SPD 2x2 inverse (TPU has no f64 LU kernel)
        a = Kdd[:, 0, 0]
        b = Kdd[:, 0, 1]
        c2 = Kdd[:, 1, 1]
        det = a * c2 - b * b
        Kdd_inv = (
            jnp.stack(
                [jnp.stack([c2, -b], axis=-1), jnp.stack([-b, a], axis=-1)],
                axis=-2,
            )
            / det[:, None, None]
        )
        c = 2.0 * prec * dist
        Hhat = 2.0 * prec[:, None, None] * eye - (c**2)[:, None, None] * Kdd_inv
        return Kdd_inv, jnp.zeros((st.NR, d), Winv2.dtype), Hhat

    @staticmethod
    def factor(problem: ConicProblem, state: CAState, Winv2, params):
        st = state.structure
        C, T, D, d, A = st.C, st.T, st.D, st.d, st.A
        dtype = state.q.dtype

        kdd, wv, Hhat = ChainArrowBackend._range_elimination(state, Winv2)

        Dg = state.D0.reshape(C * T, D, D)
        Sblk = jnp.zeros((st.NAb, d, st.NAb, d), dtype=dtype)
        Bg = state.B0
        if st.NR:
            # chain diagonals
            diag_c = jnp.einsum(
                "mp,mij->pij", st.oh_chain_a + st.oh_chain_b, Hhat
            )
            Dg = Dg.at[:, d * d :, d * d :].add(diag_c)
            # arrow diagonals
            diag_a = jnp.einsum(
                "mb,mij->bij", st.oh_arrow_a + st.oh_arrow_b, Hhat
            )
            iN = jnp.arange(st.NAb)
            Sblk = Sblk.at[iN, :, iN, :].add(diag_a)
            # arrow-arrow cross (-Hhat both ways)
            cross_aa = jnp.einsum(
                "ma,mb,mij->aibj", st.oh_arrow_a, st.oh_arrow_b, -Hhat
            )
            Sblk = Sblk + cross_aa + jnp.einsum("aibj->bjai", cross_aa)
            # chain-arrow cross terms, factorized into d*d plain matmuls
            # (a direct 'mp,mb,mij->pbij' einsum materializes a
            # (C*T, NAb, d, d) intermediate — hundreds of MB at Manhattan
            # scale; each (i, j) slice below is a (CT x NR)(NR x NAb)
            # matmul with small intermediates, MXU-friendly). Hhat symmetric.
            Badd = jnp.zeros((C * T, D, st.NAb, d), dtype=dtype)
            for i in range(d):
                for j in range(d):
                    w_ij = -Hhat[:, i, j]
                    cross_ij = (
                        (st.oh_chain_a * w_ij[:, None]).T @ st.oh_arrow_b
                        + (st.oh_chain_b * w_ij[:, None]).T @ st.oh_arrow_a
                    )  # (C*T, NAb)
                    Badd = Badd.at[:, d * d + i, :, j].add(cross_ij)
            Bg = Bg + Badd.reshape(C * T, D, st.NAb * d)[..., :A].reshape(
                C, T, D, A
            )

        Dg = Dg.reshape(C, T, D, D)
        Sg = state.S0 + Sblk.reshape(st.NAb * d, st.NAb * d)[:A, :A]

        # masks, pin fill, regularization
        cm = st.cm
        Dg = Dg * cm[..., :, None] * cm[..., None, :]
        scale = jnp.maximum(jnp.max(jnp.abs(Dg)), jnp.max(jnp.abs(Sg)))
        delta = params.static_reg * jnp.maximum(scale, 1.0)
        iD = jnp.arange(D)
        Dg = Dg.at[..., iD, iD].add(delta * cm + (1.0 - cm))
        Ug = state.U0 * cm[:, :-1, :, None] * cm[:, 1:, None, :]
        act = st.arrow_active
        Bg = Bg * cm[..., :, None] * act[None, None, None, :]
        Sg = Sg * act[:, None] * act[None, :]
        Sg = Sg + jnp.diag(delta * act + (1.0 - act))

        # block-tridiagonal factorization per chain via parallel cyclic
        # reduction (log-depth, level-batched — see solver/pcr.py)
        Tp = pcr_pad_length(T)
        Dp = jnp.broadcast_to(
            jnp.eye(D, dtype=dtype), (C, Tp, D, D)
        ).at[:, :T].set(Dg)
        Up = jnp.zeros((C, Tp, D, D), dtype=dtype)
        if T > 1:
            Up = Up.at[:, : T - 1].set(Ug)
        Bp = jnp.zeros((C, Tp, D, A), dtype=dtype).at[:, :T].set(Bg)

        pcrf = jax.vmap(pcr_factor)(Dp, Up)
        Z = jax.vmap(pcr_solve)(pcrf, Bp)
        Sg = Sg - jnp.einsum("ctia,ctib->ab", Bp, Z)
        LS1 = jnp.linalg.cholesky(Sg)
        LS = jax.lax.cond(
            jnp.all(jnp.isfinite(LS1)),
            lambda: LS1,
            lambda: jnp.linalg.cholesky(
                Sg
                + jnp.eye(A, dtype=dtype) * (params.reg_escalation * delta)
            ),
        )
        return CAFactors(
            pcr=pcrf, B=Bp, Z=Z, LS=LS, kdd=kdd, wv=wv, Hhat=Hhat,
            Winv2=Winv2,
        )

    # ---------------- solve ---------------- #

    @staticmethod
    def solve(problem: ConicProblem, state: CAState, factors: CAFactors,
              rhs, params):
        dx = ChainArrowBackend._solve_once(problem, state, factors, rhs)
        for _ in range(params.kkt_refine_steps):
            # refinement against the true K = P + G'W^{-2}G via structured
            # matvecs — recovers digits lost to roundoff in the (exact but
            # finite-precision) elimination, which matters on TPU where f64
            # is emulated.
            Gv = G_apply(problem, dx)
            Kdx = ChainArrowBackend.P_matvec(state, dx) + ChainArrowBackend.GT(
                problem, state, jnp.einsum("mij,mj->mi", factors.Winv2, Gv)
            )
            resid = state.mask * (rhs - Kdx)
            dx = dx + ChainArrowBackend._solve_once(
                problem, state, factors, resid
            )
        return dx

    @staticmethod
    def _solve_once(problem: ConicProblem, state: CAState,
                    factors: CAFactors, rhs):
        st = state.structure
        C, T, D, d, A = st.C, st.T, st.D, st.d, st.A
        dtype = rhs.dtype

        vc, vl, rd = ChainArrowBackend._gather(state, rhs)

        # eliminate distance variables from the rhs
        if st.NR:
            if st.relaxation == SOCP_RELAXATION:
                tvec = factors.wv * (rd / factors.kdd[:, None])
                ga, gb = -tvec, tvec
            else:
                tvec = jnp.einsum("mij,mj->mi", factors.kdd, rd)
                c = (2.0 * state.rng_prec * state.rng_dist)[:, None]
                ga, gb = c * tvec, -c * tvec
            dc, dl = ChainArrowBackend._range_endpoint_adjoint(state, ga, gb)
            vc = vc + dc
            vl = vl + dl

        # split into chain rhs and arrow rhs
        rc = vc * st.cm
        spill = (vc * st.av)[:, :, d * d :].reshape(C * T, d)
        ra_blocks = jnp.zeros((st.NAb, d), dtype=dtype)
        ra_blocks = ra_blocks.at[: st.NL].set(vl)
        ra_blocks = ra_blocks + jnp.einsum(
            "pb,pi->bi", st.oh_slot_arrow, spill
        )
        ra = ra_blocks.reshape(-1)[:A] * st.arrow_active

        # chain solve (PCR), arrow Schur solve, recombination:
        #   [T B; B' S][x; u] = [r; ra]  =>
        #   w = T^{-1} r,  u = Stilde^{-1}(ra - B' w),  x = w - T^{-1}B u
        Tp = factors.B.shape[1]
        rp = jnp.zeros((C, Tp, D, 1), dtype=dtype).at[:, :T].set(rc[..., None])
        w = jax.vmap(pcr_solve)(factors.pcr, rp)[..., 0]  # (C, Tp, D)
        ra_schur = ra - jnp.einsum("ctia,cti->a", factors.B, w)
        u = _tri_T(factors.LS, _tri(factors.LS, ra_schur))
        dxc = (w - jnp.einsum("ctia,a->cti", factors.Z, u))[:, :T]

        # recompose full pose slots: chain part + arrow-resident translations
        u_blocks = jnp.concatenate(
            [u, jnp.zeros((st.NAb * d - A,), dtype=dtype)]
        ).reshape(st.NAb, d)
        arrow_tr = jnp.einsum("pb,bi->pi", st.oh_slot_arrow, u_blocks)
        dx_full = dxc * st.cm
        dx_full = dx_full.reshape(C * T, D).at[:, d * d :].add(
            arrow_tr * st.av[:, :, d * d :].reshape(C * T, d)
        ).reshape(C, T, D)
        dxl = u_blocks[: st.NL]

        # back-substitute distances
        if st.NR:
            dx_for_ends = ChainArrowBackend._to_x(
                state, dx_full, dxl, jnp.zeros_like(rd)
            )
            ta, tb = ChainArrowBackend._range_endpoint_values(
                state, dx_for_ends
            )
            du = ta - tb
            if st.relaxation == SOCP_RELAXATION:
                dd = (
                    rd[:, 0] - jnp.einsum("mi,mi->m", factors.wv, du)
                ) / factors.kdd
                dd = dd[:, None]
            else:
                c = (2.0 * state.rng_prec * state.rng_dist)[:, None]
                dd = jnp.einsum("mij,mj->mi", factors.kdd, rd + c * du)
        else:
            dd = jnp.zeros_like(rd)

        return ChainArrowBackend._to_x(state, dx_full, dxl, dd)

        # NOTE: the factorization here is an EXACT multifrontal elimination
        # (up to the tiny static regularization delta), so the iterative
        # refinement used by the dense backend is unnecessary;
        # params.kkt_refine_steps is intentionally ignored.
