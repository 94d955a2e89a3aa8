"""Structure-exploiting KKT backend: chain + arrow factorization.

The range-SLAM KKT matrix K = P + G'W^{-2}G has a fixed sparsity pattern
(SURVEY.md §5 "block-tridiagonal + arrow"):

  * distance variables couple only to their own cone/cost rows and the two
    endpoint translations -> eliminated analytically per range (batched
    closed forms);
  * pose blocks form per-robot chains coupled only by odometry
    (block-tridiagonal, D = d(d+1)-wide blocks);
  * landmarks, the translations of poses touched by pose-pose (e.g.
    inter-robot) ranges, and the FULL pose blocks of a vertex cover of the
    loop-closure graph form a dense "arrow" block coupled to the chains.

One interior-point iteration then costs O(num_poses * D^3 + A^2 * num_poses
+ A^3) instead of the dense backend's O(n^3): a block-tridiagonal Cholesky
via parallel cyclic reduction per chain (vmapped over robots), a dense
Schur complement on the arrow, and two substitution sweeps. Per-iteration
assembly is batched matmuls / one-hot einsums (MXU work) plus gathers;
the only scatters run once per solve in `prepare` (static couplings).

Arrow column layout (host-chosen, static):

    [ landmarks | range-cover translations | loop-cover translations
      | loop-cover rotations ]

so every range-relevant column lives in a contiguous leading "translation
zone" of NTB d-wide sites — the W-dependent per-iteration range
elimination stays a dense block formulation over that prefix, while
loop-closure/odometry spill (static, W-independent) lands anywhere in the
(A, A) arrow via one-off scatters.

Scope: 2D and 3D, with loop closures (a loop edge is kept out of the
chain band by moving one endpoint's whole pose block into the arrow —
the same vertex-cover mechanism as inter-robot ranges, width D instead
of width d). Numeric values are read out of the generic
:class:`ConicProblem` row encoding through static index maps, so a
vmapped batch of problems (Monte-Carlo trials) shares one structure.

Replaces (with exact arithmetic, not approximation) the sparse-Cholesky
work Gurobi's barrier performs inside the reference's `model.optimize()`
(/root/reference/score/solve_score.py:76); loop-closure and 3D cost
semantics follow gurobi_utils.py:407-430 and :37-50.
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
import os

from score_tpu.ops import ozaki
from score_tpu.ops import twofloat as tfm
from score_tpu.ops.twofloat import TF
from score_tpu.ops.pallas_pcr import (
    CRFactors,
    PPCRFactors,
    SegPPCRFactors,
    ppcr_factor_pallas,
    ppcr_solve_pallas,
    ppcr_supported,
    seg_factor_pallas,
    seg_lengths,
    seg_solve_pallas,
)
from score_tpu.solver.linops import G_apply
from score_tpu.solver.pcr import PCRFactors, pcr_factor, pcr_pad_length, pcr_solve
from score_tpu.solver.pcr_tf import pcr_factor_tf, pcr_solve_tf
from score_tpu.solver.smallblocks import (
    blocked_dense_L,
    blocked_lower_solve,
    blocked_upper_solve,
    chol_blocked,
    inv_small_spd,
)

__all__ = [
    "ChainArrowStructure",
    "build_chain_arrow",
    "ChainArrowBackend",
    "MixedChainArrowBackend",
]


# ------------------------------------------------------------------ #
# Host-side structure analysis
# ------------------------------------------------------------------ #


@register_dataclass
@dataclasses.dataclass(frozen=True)
class ChainArrowStructure:
    """Static structure (index maps, masks, one-hots) for the backend.

    One structure serves every numeric instance (Monte-Carlo batch) of the
    same graph. Canonical "struct" layout of x: [pose slots (C*T*D) |
    landmarks (NL*d) | distances (NR*ds)]."""

    # residency maps
    cm: jax.Array  # (C, T, D) chain-active column mask
    av: jax.Array  # (C, T, D) arrow-resident column mask
    arrow_col: jax.Array  # (C, T, D) int32 arrow column of entry, A = none
    arrow_src: jax.Array  # (A,) int32 into [slots.flat | landmarks.flat]
    x_to_chain: jax.Array  # (C, T, D) gather: padded x -> pose slots
    x_to_lm: jax.Array  # (NL, d) gather: x -> landmark cols
    x_to_dist: jax.Array  # (NR, ds)
    struct_to_x: jax.Array  # (n,) gather from flat struct -> x
    # odometry rows
    odom_row_base: jax.Array  # (C, T-1) int32 (clamped; *_valid masks pads)
    odom_valid: jax.Array  # (C, T-1)
    odom_local_onehot: jax.Array  # (D_rows, nnz, 2D+1)
    # loop closures
    loop_row_base: jax.Array  # (NLC,) int32
    loop_slot_i: jax.Array  # (NLC,) int32 flat slot (c*T + t)
    loop_slot_j: jax.Array  # (NLC,) int32
    # ranges
    range_row_base: jax.Array  # (NR,) int32
    end_a_cols: jax.Array  # (NR, d) x cols of endpoint-a translation
    end_b_cols: jax.Array  # (NR, d)
    # Degree-padded incidence lists. The pose/chain-site contractions over
    # the NR measurements used to be (NR x C*T) one-hot f64 einsums —
    # ~NR*CT emulated-f64 MACs per application on TPU; a degree-padded
    # gather + small sum does the identical sums in ~CT*K f64 adds (f64
    # ADDITION is accurate and cheap on this runtime, multiplies are not).
    # Encoding: `pose_inc`/`lm_inc` index the per-call concatenation
    # [ga; gb; zero-row] (endpoint-b entries offset by NR, pad = 2*NR);
    # `chain_inc` holds the measurement index m (pad = NR) and
    # `chain_other` the arrow site of m's OTHER endpoint (pad = NTB,
    # which one-hot-compares to nothing) — the vertex cover guarantees a
    # chain-resident endpoint's partner is arrow-resident.
    pose_inc: jax.Array  # (C*T, Kp) int32
    lm_inc: jax.Array  # (max(NL,1), Kl) int32
    chain_inc: jax.Array  # (C*T, Kc) int32
    chain_other: jax.Array  # (C*T, Kc) int32
    oh_arrow_a: jax.Array  # (NR, NTB) endpoint translation-zone site
    oh_arrow_b: jax.Array  # (NR, NTB)
    # priors
    prior_diag_sites: jax.Array  # (NPp,) int32 landmark site of each prior
    prior_row_base: jax.Array  # (NPp,) int32
    # statics
    C: int = dataclasses.field(metadata=dict(static=True))
    T: int = dataclasses.field(metadata=dict(static=True))
    D: int = dataclasses.field(metadata=dict(static=True))
    d: int = dataclasses.field(metadata=dict(static=True))
    NL: int = dataclasses.field(metadata=dict(static=True))
    NTB: int = dataclasses.field(metadata=dict(static=True))  # trans sites
    A: int = dataclasses.field(metadata=dict(static=True))  # arrow width
    NR: int = dataclasses.field(metadata=dict(static=True))
    NLC: int = dataclasses.field(metadata=dict(static=True))
    ds: int = dataclasses.field(metadata=dict(static=True))
    relaxation: str = dataclasses.field(metadata=dict(static=True))
    # intra-problem sharding (parallel/intra.py): when set, the fused
    # Pallas band entries are wrapped in `jax.shard_map` over this mesh
    # axis — GSPMD cannot partition a gridless pallas_call, so each
    # device factors/solves its local chain slice with the same kernels
    # and the chain-axis layout stays sharded end to end. Mesh objects
    # are hashable, so these compose with jit caching like the int
    # statics above.
    shard_mesh: object = dataclasses.field(
        default=None, metadata=dict(static=True)
    )
    shard_axis: str = dataclasses.field(
        default=None, metadata=dict(static=True)
    )


def _greedy_cover(edges, excluded):
    """Greedy max-degree vertex cover of `edges`; nodes in `excluded` are
    treated as already covered (e.g. the pinned pose: all its entries are
    frozen, so its couplings vanish and the edge needs no arrow node)."""
    degree: dict = {}
    for a, b in edges:
        degree[a] = degree.get(a, 0) + 1
        degree[b] = degree.get(b, 0) + 1
    cover = set()
    for a, b in sorted(edges, key=lambda e: -(degree[e[0]] + degree[e[1]])):
        if a in excluded or b in excluded:
            continue
        if a not in cover and b not in cover:
            cover.add(a if degree[a] >= degree[b] else b)
    return cover


def build_chain_arrow(
    problem: ConicProblem,
    idx: VariableIndex,
    num_chains_pad: int = 0,
) -> ChainArrowStructure:
    """Host-side (numpy) structure analysis.

    ``num_chains_pad`` rounds the chain axis up (with fully inactive
    chains: cm = 0, zero couplings, identity diagonal fill) so the chain
    axis divides a device-mesh size for intra-problem sharding
    (SURVEY.md §2.4 "intra-problem sharding")."""
    d = idx.dim
    D = idx.pose_block
    C = max(len(idx.chain_lengths), num_chains_pad)
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

    pin_cols = set(int(v) for v in np.asarray(problem.pin_idx))
    pinned_poses = {
        col // D for col in pin_cols if col < idx.landmark_offset
    }
    fully_pinned = {
        p
        for p in pinned_poses
        if all(p * D + k in pin_cols for k in range(D))
    }

    # --- loop-closure cover: one endpoint's WHOLE pose into the arrow ---
    loop_pairs = [
        (name_to_pose[a], name_to_pose[b]) for (a, b) in idx.loop_pairs
    ]
    loop_cover = _greedy_cover(loop_pairs, fully_pinned)

    # --- range cover: one endpoint's TRANSLATION into the arrow -------
    # (loop-cover poses already have their translation in the arrow)
    pp_edges = [
        (name_to_pose[a], name_to_pose[b])
        for (a, b) in idx.dist_keys
        if a in name_to_pose and b in name_to_pose
    ]
    range_cover = _greedy_cover(
        [e for e in pp_edges
         if e[0] not in loop_cover and e[1] not in loop_cover],
        fully_pinned | loop_cover,
    )
    range_cover -= loop_cover

    # --- arrow layout ---------------------------------------------------
    rc_poses = sorted(range_cover)
    lp_poses = sorted(loop_cover)
    NRC, NLP = len(rc_poses), len(lp_poses)
    NTB = NL + NRC + NLP
    tz = NTB * d
    A = tz + NLP * d * d
    A_eff = max(A, 1)
    # translation-zone site of each arrow pose
    tsite_of_pose = {p: NL + i for i, p in enumerate(rc_poses)}
    tsite_of_pose.update({p: NL + NRC + i for i, p in enumerate(lp_poses)})
    rotbase_of_pose = {p: tz + i * d * d for i, p in enumerate(lp_poses)}

    # --- residency maps ---------------------------------------------------
    cm = np.zeros((C, T, D))
    av = np.zeros((C, T, D))
    arrow_col = np.full((C, T, D), A_eff, dtype=np.int64)
    x_to_chain = np.full((C, T, D), n, dtype=np.int64)
    arrow_src = np.full((A_eff,), C * T * D + NL * d, dtype=np.int64)  # pad
    for g, (c, t) in pose_cpos.items():
        base = g * D
        cols = np.arange(base, base + D)
        x_to_chain[c, t] = cols
        cm[c, t] = 1.0
        slot_flat = (c * T + t) * D
        if g in loop_cover:
            cm[c, t] = 0.0
            av[c, t] = 1.0
            for k in range(d * d):
                a = rotbase_of_pose[g] + k
                arrow_col[c, t, k] = a
                arrow_src[a] = slot_flat + k
            for r in range(d):
                a = tsite_of_pose[g] * d + r
                arrow_col[c, t, d * d + r] = a
                arrow_src[a] = slot_flat + d * d + r
        elif g in range_cover:
            cm[c, t, d * d :] = 0.0
            av[c, t, d * d :] = 1.0
            for r in range(d):
                a = tsite_of_pose[g] * d + r
                arrow_col[c, t, d * d + r] = a
                arrow_src[a] = slot_flat + d * d + r
        for k_, col in enumerate(cols):
            if col in pin_cols:
                cm[c, t, k_] = 0.0
                av[c, t, k_] = 0.0
                arrow_col[c, t, k_] = A_eff
    for l in range(NL):
        for r in range(d):
            a = l * d + r
            arrow_src[a] = C * T * D + l * d + r

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

    # --- cost-row bases (emission order: odometry chains flattened, loop
    # closures, ranges, landmark priors — assembly/conic.py) -------------
    rows_per_edge = d * d + d
    NLC = len(loop_pairs)
    odom_row_base = np.zeros((C, max(T - 1, 1)), dtype=np.int64)
    odom_valid = np.zeros((C, max(T - 1, 1)))
    e = 0
    for c, ln in enumerate(idx.chain_lengths):
        for t in range(ln - 1):
            odom_row_base[c, t] = e * rows_per_edge
            odom_valid[c, t] = 1.0
            e += 1
    loop_row_base = (e + np.arange(NLC, dtype=np.int64)) * rows_per_edge
    loop_slot_i = np.zeros((NLC,), dtype=np.int64)
    loop_slot_j = np.zeros((NLC,), dtype=np.int64)
    for m, (pi, pj) in enumerate(loop_pairs):
        ci, ti = pose_cpos[pi]
        cj, tj = pose_cpos[pj]
        loop_slot_i[m] = ci * T + ti
        loop_slot_j[m] = cj * T + tj
    range_rows_start = (e + NLC) * rows_per_edge
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

    # --- range endpoint maps (vectorized over the NR ranges) -------------
    end_a_cols = np.full((NR, d), n, dtype=np.int64)
    end_b_cols = np.full((NR, d), n, dtype=np.int64)
    oh_arrow_a = np.zeros((NR, max(NTB, 1)))
    oh_arrow_b = np.zeros((NR, max(NTB, 1)))

    def _pack_incidence(rows, vals, n_rows, pad, extra=None, extra_pad=0):
        """Pack (row, val[, extra]) entry lists into degree-padded
        (n_rows, Kmax) tables; Kmax = max per-row multiplicity (>= 1)."""
        rows = np.asarray(rows, dtype=np.int64).reshape(-1)
        vals = np.asarray(vals, dtype=np.int64).reshape(-1)
        if rows.size == 0:
            out = np.full((n_rows, 1), pad, dtype=np.int64)
            if extra is None:
                return out
            return out, np.full((n_rows, 1), extra_pad, dtype=np.int64)
        counts = np.bincount(rows, minlength=n_rows)
        K = int(counts.max())
        order = np.argsort(rows, kind="stable")
        r = rows[order]
        starts = np.zeros(n_rows + 1, dtype=np.int64)
        starts[1:] = np.cumsum(counts)
        pos = np.arange(r.size) - starts[r]
        out = np.full((n_rows, K), pad, dtype=np.int64)
        out[r, pos] = vals[order]
        if extra is None:
            return out
        extra = np.asarray(extra, dtype=np.int64).reshape(-1)
        out2 = np.full((n_rows, K), extra_pad, dtype=np.int64)
        out2[r, pos] = extra[order]
        return out, out2

    pose_rows: list = []
    pose_vals: list = []
    lm_rows_l: list = []
    lm_vals: list = []
    chain_rows: list = []
    chain_vals: list = []
    chain_oth: list = []
    if NR:
        # per-endpoint index tables (python dict lookups once per range;
        # everything below is vectorized fancy indexing)
        slot_of_pose = np.full(max(len(pose_cpos), 1), -1, dtype=np.int64)
        tsite_arr = np.full(max(len(pose_cpos), 1), -1, dtype=np.int64)
        for g, (c, t) in pose_cpos.items():
            slot_of_pose[g] = c * T + t
        for p_, site in tsite_of_pose.items():
            tsite_arr[p_] = site
        m_idx = np.arange(NR)
        side_site = []  # arrow site of each side's endpoint, -1 if chain
        side_data = []
        for keys_pos, ec, oha in (
            (0, end_a_cols, oh_arrow_a),
            (1, end_b_cols, oh_arrow_b),
        ):
            names = [key[keys_pos] for key in idx.dist_keys]
            ec[:] = np.stack([idx.translation_cols(nm) for nm in names])
            # pose-first dispatch, consistent with
            # VariableIndex.translation_cols (gurobi_utils.py:103-109)
            is_pose = np.array([nm in name_to_pose for nm in names])
            unknown = [
                nm for nm in names
                if nm not in name_to_pose and nm not in name_to_lm
            ]
            if unknown:
                raise KeyError(
                    f"range endpoint(s) {sorted(set(unknown))} are neither "
                    "pose nor landmark names"
                )
            pidx_v = np.array(
                [name_to_pose.get(nm, 0) for nm in names], dtype=np.int64
            )
            lidx_v = np.array(
                [name_to_lm.get(nm, 0) if nm not in name_to_pose else 0
                 for nm in names],
                dtype=np.int64,
            )
            lm_rows = m_idx[~is_pose]
            oha[lm_rows, lidx_v[~is_pose]] = 1.0
            p_rows = m_idx[is_pose]
            p_sel = pidx_v[is_pose]
            in_arrow = tsite_arr[p_sel] >= 0
            oha[p_rows[in_arrow], tsite_arr[p_sel[in_arrow]]] = 1.0

            # incidence entries: [ga; gb] gather index = side*NR + m
            pose_rows.append(slot_of_pose[p_sel])
            pose_vals.append(keys_pos * NR + p_rows)
            lm_rows_l.append(lidx_v[~is_pose])
            lm_vals.append(keys_pos * NR + lm_rows)
            site = np.full(NR, -1, dtype=np.int64)
            site[~is_pose] = lidx_v[~is_pose]
            site[p_rows[in_arrow]] = tsite_arr[p_sel[in_arrow]]
            side_site.append(site)
            side_data.append((is_pose, p_rows, p_sel, in_arrow))
        for s, (is_pose, p_rows, p_sel, in_arrow) in enumerate(side_data):
            ch_m = p_rows[~in_arrow]  # chain-resident endpoints
            other = side_site[1 - s][ch_m]
            # partner not arrow-resident => both endpoints chain-resident.
            # The cover only permits this when one endpoint is the PINNED
            # pose (excluded from the cover: its columns are masked, the
            # coupling vanishes) — route the cross term to the one-hot pad
            # site (contributes nothing), matching the one-hot einsums'
            # silent drop; the diagonal still lands (and is masked by cm
            # on the pinned slot).
            other = np.where(other < 0, max(NTB, 1), other)
            chain_rows.append(slot_of_pose[p_sel[~in_arrow]])
            chain_vals.append(ch_m)
            chain_oth.append(other)

    pose_inc = _pack_incidence(
        np.concatenate(pose_rows) if pose_rows else [],
        np.concatenate(pose_vals) if pose_vals else [],
        C * T, pad=2 * NR,
    )
    lm_inc = _pack_incidence(
        np.concatenate(lm_rows_l) if lm_rows_l else [],
        np.concatenate(lm_vals) if lm_vals else [],
        max(NL, 1), pad=2 * NR,
    )
    chain_inc, chain_other = _pack_incidence(
        np.concatenate(chain_rows) if chain_rows else [],
        np.concatenate(chain_vals) if chain_vals else [],
        C * T, pad=NR,
        extra=np.concatenate(chain_oth) if chain_oth else [],
        extra_pad=max(NTB, 1),
    )

    # --- relative-pose local-position one-hot (static pattern from
    # assembly/conic: local pose layout col-major [R | t], pose_i at
    # 0..D-1, pose_j at D..2D-1, slot 2D = trash for padding) -----------
    nnz = int(problem.cost_cols.shape[1])
    local_pos = np.full((rows_per_edge, nnz), 2 * D, dtype=np.int64)
    for c in range(d):
        for r in range(d):
            row = c * d + r
            local_pos[row, 0] = D + c * d + r
            for kk in range(d):
                local_pos[row, 1 + kk] = kk * d + r
    for r in range(d):
        row = d * d + r
        local_pos[row, 0] = D + d * d + r
        local_pos[row, 1] = d * d + r
        for kk in range(d):
            local_pos[row, 2 + kk] = kk * d + r
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
        arrow_col=iarr(arrow_col),
        arrow_src=iarr(arrow_src),
        x_to_chain=iarr(x_to_chain),
        x_to_lm=iarr(x_to_lm),
        x_to_dist=iarr(x_to_dist),
        struct_to_x=iarr(struct_to_x),
        odom_row_base=iarr(odom_row_base),
        odom_valid=farr(odom_valid),
        odom_local_onehot=farr(odom_local_onehot),
        loop_row_base=iarr(loop_row_base),
        loop_slot_i=iarr(loop_slot_i),
        loop_slot_j=iarr(loop_slot_j),
        range_row_base=iarr(range_row_base),
        end_a_cols=iarr(end_a_cols),
        end_b_cols=iarr(end_b_cols),
        pose_inc=iarr(pose_inc),
        lm_inc=iarr(lm_inc),
        chain_inc=iarr(chain_inc),
        chain_other=iarr(chain_other),
        oh_arrow_a=farr(oh_arrow_a),
        oh_arrow_b=farr(oh_arrow_b),
        prior_diag_sites=iarr(prior_diag_sites),
        prior_row_base=iarr(prior_row_base),
        C=C, T=T, D=D, d=d, NL=NL, NTB=NTB, A=A_eff, NR=NR, NLC=NLC,
        ds=ds, relaxation=idx.relaxation,
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
    loop_ii: jnp.ndarray  # (NLC, D, D) loop-closure edge blocks
    loop_ij: jnp.ndarray
    loop_jj: jnp.ndarray
    D0: jnp.ndarray  # (C, T, D, D) chain diag base (chain-masked)
    U0: jnp.ndarray  # (C, T-1, D, D) chain off-diag (chain-masked)
    B0: jnp.ndarray  # (C, T, D, A) chain-arrow base coupling
    S0: jnp.ndarray  # (A, A) arrow base (odometry/loop spill + priors)
    prior_diag: jnp.ndarray  # (NL*d,) 2*precision on prior landmark cols
    rng_prec: jnp.ndarray  # (NR,)
    rng_dist: jnp.ndarray  # (NR,)


class CAFactors(NamedTuple):
    # vmapped-over-chains cyclic-reduction factors; plain (C, ...) arrays
    # on the f64 backend, two-float TF pairs on the mixed backend
    pcr: PCRFactors
    B: jnp.ndarray  # (C, Tp, D, A) masked chain-arrow coupling
    Z: jnp.ndarray  # (C, Tp, D, A) = T^{-1} B chain solves of the panels
    LS: jnp.ndarray  # (A, A) arrow Schur Cholesky
    kdd: jnp.ndarray  # SOCP (NR,) pivots; QCQP (NR,d,d) pivot inverses
    wv: jnp.ndarray  # SOCP (NR,d) coupling vectors; QCQP zeros
    Hhat: jnp.ndarray  # (NR, d, d)
    Winv2: jnp.ndarray  # (NR, k, k) NT scalings (for refinement matvecs)
    # Jacobi column scales of the mixed-precision path (None on the plain
    # backend): the band factors above hold D K D with unit diagonal,
    # factored in two-float; solves scale in and out in f64.
    dC: jnp.ndarray = None  # (C, T, D)
    dA: jnp.ndarray = None  # (A,)
    # blocked-arrow factors (TPU, A >= _BLOCKED_ARROW_MIN_A): the
    # (nb, nb, b, b) block factor and its diagonal-block inverses — the
    # substitutions then run as jnp blocked sweeps instead of the slow
    # f64 triangular_solve custom calls (see smallblocks.chol_blocked)
    arrow_Lb: jnp.ndarray = None
    arrow_Dinv: jnp.ndarray = None


def _use_pallas_pcr() -> bool:
    """Two-float band factorizations run through the fused Pallas kernels
    by default on TPU (one launch per factor/solve instead of hundreds on
    this dispatch-bound runtime); the jnp two-float PCR everywhere else.
    Override with SCORE_TPU_PALLAS_PCR=0/1."""
    flag = os.environ.get("SCORE_TPU_PALLAS_PCR", "")
    if flag == "0":
        return False
    if flag == "1":
        return True
    return jax.default_backend() == "tpu"


_EXACT_MM_MIN_MACS = 2_000_000


def _use_exact_mm(st, dtype, macs: int) -> bool:
    """Route the large W-dependent dense contractions (arrow Schur product,
    arrow-arrow cross term) through the exact split-f32 MXU matmuls of
    :mod:`score_tpu.ops.ozaki` instead of emulated-f64 einsums. Default:
    on TPU, f64 data, and only where the contraction is big enough to
    matter (small problems keep the single fused einsum). Measured on the
    20-robot world (r4): warm 1.502 -> 1.417 s AND compile 1742 -> 1448 s
    at identical iterations/relgap, so it also stays on for
    intra-problem-sharded solves (ozaki is plain jnp — GSPMD partitions
    the slice einsums and psums the chunk partials; exact-parity-tested
    on the CPU mesh, test_parallel.py). Override with SCORE_TPU_EXACT_MM
    =0/1 (1 forces the path regardless of backend/size — the dtype guard
    always applies)."""
    if dtype != jnp.float64:
        return False
    flag = os.environ.get("SCORE_TPU_EXACT_MM", "")
    if flag == "0":
        return False
    if flag == "1":  # forced (tests): only the correctness guards apply
        return True
    return macs >= _EXACT_MM_MIN_MACS and jax.default_backend() == "tpu"


_BLOCKED_ARROW_MIN_A = 64


def _use_blocked_arrow(st, dtype, A: int) -> bool:
    """Route the arrow Cholesky + substitutions through the blocked jnp
    path (smallblocks.chol_blocked). Default: on TPU for f64 arrows of
    width >= _BLOCKED_ARROW_MIN_A, where the XLA f64 cholesky /
    triangular_solve custom calls are the measured per-iteration
    bottleneck (17 ms + 3 ms/substitution at A=258). CPU keeps LAPACK.
    Intra-problem-sharded solves keep the dense path too: the blocked
    Cholesky is a sequential scan of dynamic slices with no sharded
    parity test, and GSPMD would replicate/gather it anyway (the arrow
    is chain-replicated under shard_map). Override with
    SCORE_TPU_BLOCKED_ARROW=0/1 (1 forces it — the f64 dtype and
    sharding guards always apply)."""
    if dtype != jnp.float64 or st.shard_mesh is not None:
        return False
    flag = os.environ.get("SCORE_TPU_BLOCKED_ARROW", "")
    if flag == "0":
        return False
    if flag == "1":
        return True
    return A >= _BLOCKED_ARROW_MIN_A and jax.default_backend() == "tpu"


def _shmap_n_dev(st) -> int:
    return int(st.shard_mesh.shape[st.shard_axis])


def _local_shapes(tree, n_dev):
    """Per-device ShapeDtypeStructs of a chain-leading tree (axis 0 sharded)."""
    return jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(
            (a.shape[0] // n_dev,) + a.shape[1:], a.dtype
        ),
        tree,
    )


def _factor_specs(st, D: TF, U: TF):
    """Lane-axis PartitionSpec tree for the band factors, built from the
    factor entry's abstract output on PER-DEVICE shapes — every factor
    leaf (plain PCR or compacting-CR, any level width) is lane-major
    with chain-contiguous lanes, so the last axis shards on the chain
    mesh axis."""
    from jax.sharding import PartitionSpec as P

    n_dev = _shmap_n_dev(st)
    shapes = jax.eval_shape(
        lambda d, u: ppcr_factor_pallas(d, u),
        _local_shapes(D, n_dev), _local_shapes(U, n_dev),
    )
    spec_l = P(None, None, st.shard_axis)
    return jax.tree_util.tree_map(lambda _: spec_l, shapes)


def _shmap_ppcr_factor(st, D: TF, U: TF):
    """Chain-sharded Pallas band factorization: each device runs the
    gridless kernels on its local (C/n_dev)-chain slice. Factor outputs
    are lane-major with chain-contiguous lanes, so the lane axis is
    sharded on the same mesh axis; the matching solve wrapper consumes
    them without any resharding."""
    from jax.sharding import PartitionSpec as P

    spec_c = P(st.shard_axis)
    return jax.shard_map(
        lambda d, u: ppcr_factor_pallas(d, u),
        mesh=st.shard_mesh,
        in_specs=(spec_c, spec_c),
        out_specs=_factor_specs(st, D, U),
        # pallas_call out_shapes carry no vma info on this jax version
        check_vma=False,
    )(D, U)


def _shmap_ppcr_solve(st, factors, rhs: TF) -> TF:
    from jax.sharding import PartitionSpec as P

    spec_c = P(st.shard_axis)
    spec_l = P(None, None, st.shard_axis)
    fac_spec = jax.tree_util.tree_map(lambda _: spec_l, factors)
    return jax.shard_map(
        lambda f, r: ppcr_solve_pallas(f, r),
        mesh=st.shard_mesh,
        in_specs=(fac_spec, spec_c),
        out_specs=spec_c,
        check_vma=False,
    )(factors, rhs)


def _seg_specs(st, seg_struct: SegPPCRFactors):
    """(chain, factor) PartitionSpec trees for a SegPPCRFactors
    structure (arrays or ShapeDtypeStructs): every component of a
    segmented factorization is chain-local — interior factors (plain
    PCR or compacting-CR, any level count) are lane-major with
    chain-contiguous lanes (last axis), the Z panels / interface chain /
    coupling blocks carry a leading chain axis — so all of it shards on
    the structure's chain mesh axis."""
    from jax.sharding import PartitionSpec as P

    spec_c = P(st.shard_axis)
    spec_l = P(None, None, st.shard_axis)
    tm = jax.tree_util.tree_map
    return spec_c, SegPPCRFactors(
        interior=tm(lambda _: spec_l, seg_struct.interior),
        ZL=spec_c, ZR=spec_c,
        iface=tm(lambda _: spec_c, seg_struct.iface),
        UgL=spec_c, UmR=spec_c,
    )


def _shmap_seg_factor(st, D: TF, U: TF, Ts: int) -> SegPPCRFactors:
    """Chain-sharded SEGMENTED band factorization (3D long chains): the
    SPIKE-style substructuring of ops/pallas_pcr.py is per-chain, so each
    device factors its local chain slice (interior kernels + its own
    interface chains) with zero collectives."""
    n_dev = _shmap_n_dev(st)
    shapes = jax.eval_shape(
        lambda d, u: seg_factor_pallas(d, u, Ts),
        _local_shapes(D, n_dev), _local_shapes(U, n_dev),
    )
    spec_c, spec_f = _seg_specs(st, shapes)
    return jax.shard_map(
        lambda d, u: seg_factor_pallas(d, u, Ts),
        mesh=st.shard_mesh,
        in_specs=(spec_c, spec_c),
        out_specs=spec_f,
        check_vma=False,
    )(D, U)


def _shmap_seg_solve(st, factors: SegPPCRFactors, rhs: TF) -> TF:
    spec_c, spec_f = _seg_specs(st, factors)
    return jax.shard_map(
        seg_solve_pallas,
        mesh=st.shard_mesh,
        in_specs=(spec_f, spec_c),
        out_specs=spec_c,
        check_vma=False,
    )(factors, rhs)


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
        slot translation layout (C, T, D) and landmark layout (NL, d).

        Degree-padded gather + sum over the incidence lists: the same
        sums a (NR x C*T) one-hot einsum computes, at ~CT*K f64 ADDS
        instead of NR*CT emulated-f64 MACs (this runs in every condensed
        KKT solve — it is the hottest structured operator)."""
        st = state.structure
        d, D = st.d, st.D
        gab = jnp.concatenate(
            [ga, gb, jnp.zeros((1, d), dtype=ga.dtype)], axis=0
        )
        tr = jnp.sum(gab[st.pose_inc], axis=1)  # (C*T, d)
        vc = jnp.zeros((st.C * st.T, D), dtype=ga.dtype)
        vc = vc.at[:, d * d :].set(tr).reshape(st.C, st.T, D)
        vl = jnp.sum(gab[st.lm_inc], axis=1)
        return vc, vl[: st.NL]

    # ---------------- prepare ---------------- #

    @staticmethod
    def _edge_blocks(problem, st, row_base):
        """Relative-pose cost blocks 2 A_loc' diag(w) A_loc from the row
        encoding; row_base (..., ) gives each edge's first row."""
        D = st.D
        row_idx = row_base[..., None] + jnp.arange(D)
        coefs = problem.cost_coefs[row_idx]  # (..., D, nnz)
        w = problem.cost_w[row_idx]
        A_loc = jnp.einsum(
            "...rj,rjl->...rl", coefs, st.odom_local_onehot
        )[..., : 2 * D]
        M = 2.0 * jnp.einsum("...rl,...r,...rm->...lm", A_loc, w, A_loc)
        return M[..., :D, :D], M[..., :D, D:], M[..., D:, D:]

    # Batch-axis declaration for the batch driver (parallel/batch.py):
    # `structure` is the shared static layout (passed through `prepare`
    # untouched) and must stay UNBATCHED under vmap — broadcasting it to
    # a leading trial axis materializes trial-count copies of the one-hot
    # layout arrays and fattens every structure-side operand of the
    # per-iteration einsums (measured: 100-trial MC batch 13.1 s with the
    # structure batched vs 9.7 s with it closed over unbatched).
    state_batch_axes = CAState(
        structure=None, q=0, const=0, mask=0, xpin=0, hnorm=0, qnorm=0,
        edge_ii=0, edge_ij=0, edge_jj=0, loop_ii=0, loop_ij=0, loop_jj=0,
        D0=0, U0=0, B0=0, S0=0, prior_diag=0, rng_prec=0, rng_dist=0,
    )

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

        # odometry edge blocks (batched matmuls)
        eii, eij, ejj = ChainArrowBackend._edge_blocks(
            problem, st, st.odom_row_base
        )
        ov = st.odom_valid[..., None, None]
        edge_ii, edge_ij, edge_jj = eii * ov, eij * ov, ejj * ov

        # loop-closure edge blocks
        if st.NLC:
            loop_ii, loop_ij, loop_jj = ChainArrowBackend._edge_blocks(
                problem, st, st.loop_row_base
            )
        else:
            z = jnp.zeros((0, D, D), dtype=dtype)
            loop_ii = loop_ij = loop_jj = z

        cm_f = st.cm.reshape(C * T, D)
        av_f = st.av.reshape(C * T, D)
        ac_f = st.arrow_col.reshape(C * T, D)

        # chain-band pieces (dense, einsum-free masks)
        cm_i, cm_j = st.cm[:, :-1], st.cm[:, 1:]
        D0 = jnp.zeros((C, T, D, D), dtype=dtype)
        D0 = D0.at[:, :-1].add(edge_ii * cm_i[..., :, None] * cm_i[..., None, :])
        D0 = D0.at[:, 1:].add(edge_jj * cm_j[..., :, None] * cm_j[..., None, :])
        U0 = edge_ij * cm_i[..., :, None] * cm_j[..., None, :]

        # static arrow couplings: scatter once per solve. B0 has a pad
        # column (index A) and S0 a pad row/col for non-arrow entries.
        B0p = jnp.zeros((C * T, D, A + 1), dtype=dtype)
        S0p = jnp.zeros((A + 1, A + 1), dtype=dtype)

        def add_coupling(B0p, S0p, D0f, blk, su, sv):
            """blk (E, D, D): rows at flat slots su, cols at slots sv."""
            cmu, avu, acu = cm_f[su], av_f[su], ac_f[su]
            cmv, avv, acv = cm_f[sv], av_f[sv], ac_f[sv]
            l_idx = jnp.arange(D)[None, :, None]
            valB = blk * cmu[:, :, None] * avv[:, None, :]
            B0p = B0p.at[su[:, None, None], l_idx, acv[:, None, :]].add(valB)
            valS = blk * avu[:, :, None] * avv[:, None, :]
            S0p = S0p.at[acu[:, :, None], acv[:, None, :]].add(valS)
            # same-slot chain x chain (loop endpoints; odometry diagonals
            # are handled densely above, so only call this for loops)
            if D0f is not None:
                valD = blk * cmu[:, :, None] * cmv[:, None, :]
                D0f = D0f.at[su].add(valD)
            return B0p, S0p, D0f

        # odometry spill into the arrow (statically skipped when no pose
        # has arrow residency — e.g. GOATS: robot-landmark ranges only)
        has_arrow_poses = (st.NTB > st.NL) or st.NLC > 0
        if has_arrow_poses and T > 1:
            slots = jnp.arange(C * T).reshape(C, T)
            si = slots[:, :-1].reshape(-1)
            sj = slots[:, 1:].reshape(-1)
            vmask = st.odom_valid.reshape(-1)[:, None, None]
            bii = (edge_ii.reshape(-1, D, D)) * vmask
            bij = (edge_ij.reshape(-1, D, D)) * vmask
            bjj = (edge_jj.reshape(-1, D, D)) * vmask
            B0p, S0p, _ = add_coupling(B0p, S0p, None, bii, si, si)
            B0p, S0p, _ = add_coupling(B0p, S0p, None, bjj, sj, sj)
            B0p, S0p, _ = add_coupling(B0p, S0p, None, bij, si, sj)
            B0p, S0p, _ = add_coupling(
                B0p, S0p, None, jnp.swapaxes(bij, -1, -2), sj, si
            )

        # loop-closure couplings (cover guarantees no cross-slot
        # chain x chain term; same-slot chain x chain goes to D0)
        D0f = D0.reshape(C * T, D, D)
        if st.NLC:
            si, sj = st.loop_slot_i, st.loop_slot_j
            B0p, S0p, D0f = add_coupling(B0p, S0p, D0f, loop_ii, si, si)
            B0p, S0p, D0f = add_coupling(B0p, S0p, D0f, loop_jj, sj, sj)
            B0p, S0p, D0f = add_coupling(B0p, S0p, D0f, loop_ij, si, sj)
            B0p, S0p, D0f = add_coupling(
                B0p, S0p, D0f, jnp.swapaxes(loop_ij, -1, -2), sj, si
            )
        D0 = D0f.reshape(C, T, D, D)

        B0 = B0p[:, :, :A].reshape(C, T, D, A)
        S0 = S0p[:A, :A]

        # landmark priors on the arrow diagonal (landmark sites lead)
        prior_diag = jnp.zeros((st.NL * d,), dtype=dtype)
        if st.prior_row_base.shape[0] > 0:
            pw = 2.0 * problem.cost_w[st.prior_row_base]  # (NPp,)
            site_oh = (
                st.prior_diag_sites[:, None] == jnp.arange(st.NL)[None, :]
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
            loop_ii=loop_ii,
            loop_ij=loop_ij,
            loop_jj=loop_jj,
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
        d = st.d
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

        # loop closures (few edges: gather endpoints, blocked matvecs,
        # small scatter-add back)
        if st.NLC:
            vflat = vc.reshape(st.C * st.T, st.D)
            li = vflat[st.loop_slot_i]  # (NLC, D)
            lj = vflat[st.loop_slot_j]
            gi = jnp.einsum("elm,em->el", state.loop_ii, li) + jnp.einsum(
                "elm,em->el", state.loop_ij, lj
            )
            gj = jnp.einsum("eml,em->el", state.loop_ij, li) + jnp.einsum(
                "elm,em->el", state.loop_jj, lj
            )
            oflat = jnp.zeros_like(vflat)
            oflat = oflat.at[st.loop_slot_i].add(gi)
            oflat = oflat.at[st.loop_slot_j].add(gj)
            out_c = out_c + oflat.reshape(st.C, st.T, st.D)

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
        # unrolled small-SPD inverse (no XLA LU/cholesky custom calls,
        # which are slow or missing for f64 on TPU); dim-agnostic
        Kdd_inv = inv_small_spd(Kdd)
        c = 2.0 * prec * dist
        Hhat = 2.0 * prec[:, None, None] * eye - (c**2)[:, None, None] * Kdd_inv
        return Kdd_inv, jnp.zeros((st.NR, d), Winv2.dtype), Hhat

    @staticmethod
    def _assemble(problem: ConicProblem, state: CAState, Winv2, params):
        """W-dependent KKT block assembly (everything except the actual
        factorization): returns the chain band (Dg, Ug), coupling Bg,
        arrow Sg (regularized, identity on decoupled padding), the
        distance-elimination data, and the regularization delta."""
        st = state.structure
        C, T, D, d, A = st.C, st.T, st.D, st.d, st.A
        tz = st.NTB * d
        dtype = state.q.dtype

        kdd, wv, Hhat = ChainArrowBackend._range_elimination(state, Winv2)

        Dg = state.D0.reshape(C * T, D, D)
        Sblk = jnp.zeros((st.NTB, d, st.NTB, d), dtype=dtype)
        Bg = state.B0
        if st.NR:
            # chain diagonals: gather each slot's incident Hhat blocks and
            # sum (degree-padded; identical sums to the one-hot einsum at
            # a tiny fraction of the emulated-f64 multiply work)
            Hp = jnp.concatenate(
                [Hhat, jnp.zeros((1, d, d), dtype=dtype)], axis=0
            )
            diag_c = jnp.sum(Hp[st.chain_inc], axis=1)  # (C*T, d, d)
            Dg = Dg.at[:, d * d :, d * d :].add(diag_c)
            # arrow diagonals (translation-zone sites; NR x NTB stays an
            # einsum — NTB is small, the contraction is cheap)
            diag_a = jnp.einsum(
                "mb,mij->bij", st.oh_arrow_a + st.oh_arrow_b, Hhat
            )
            iN = jnp.arange(st.NTB)
            Sblk = Sblk.at[iN, :, iN, :].add(diag_a)
            # arrow-arrow cross (-Hhat both ways)
            aa_macs = st.NR * (st.NTB * d) ** 2
            if st.NR < (1 << 16) and _use_exact_mm(st, dtype, aa_macs):
                cross_aa = ozaki.onehot_pair_contract(
                    st.oh_arrow_a, st.oh_arrow_b, -Hhat
                ).astype(dtype)
            else:
                cross_aa = jnp.einsum(
                    "ma,mb,mij->aibj", st.oh_arrow_a, st.oh_arrow_b, -Hhat
                )
            Sblk = Sblk + cross_aa + jnp.einsum("aibj->bjai", cross_aa)
            # chain-arrow cross terms: each chain-resident endpoint
            # couples to its partner's arrow site with -Hhat (Hhat
            # symmetric, so both sides use the same block). Gather the
            # incident blocks per slot and one-hot them onto the (small)
            # NTB axis — (CT, K, NTB, d, d) worth of work instead of the
            # old d*d (CT x NR)(NR x NTB) emulated-f64 matmuls.
            Hg = -Hp[st.chain_inc]  # (C*T, Kc, d, d)
            oh_other = (
                st.chain_other[..., None] == jnp.arange(st.NTB)
            ).astype(dtype)  # (C*T, Kc, NTB; NR > 0 implies NTB >= 1)
            cross = jnp.einsum("pkij,pkb->pibj", Hg, oh_other)
            Badd = jnp.zeros((C * T, D, st.NTB, d), dtype=dtype)
            Badd = Badd.at[:, d * d :].set(cross)
            Bg = Bg.at[..., :tz].add(
                Badd.reshape(C * T, D, st.NTB * d)[..., :tz].reshape(
                    C, T, D, tz
                )
            )

        Dg = Dg.reshape(C, T, D, D)
        Sg = state.S0.at[:tz, :tz].add(
            Sblk.reshape(st.NTB * d, st.NTB * d)[:tz, :tz]
        )

        # masks, pin fill, regularization
        cm = st.cm
        Dg = Dg * cm[..., :, None] * cm[..., None, :]
        scale = jnp.maximum(jnp.max(jnp.abs(Dg)), jnp.max(jnp.abs(Sg)))
        delta = params.static_reg * jnp.maximum(scale, 1.0)
        iD = jnp.arange(D)
        Dg = Dg.at[..., iD, iD].add(delta * cm + (1.0 - cm))
        Ug = state.U0 * cm[:, :-1, :, None] * cm[:, 1:, None, :]
        Bg = Bg * cm[..., :, None]
        # decoupled-identity rows for padding when the arrow is a dummy
        inactive = jnp.all(Sg == 0.0, axis=0) & jnp.all(Sg == 0.0, axis=1)
        Sg = Sg + jnp.diag(
            jnp.where(inactive, 1.0, delta).astype(dtype)
        )
        return Dg, Ug, Bg, Sg, kdd, wv, Hhat, delta

    @staticmethod
    def _factor_band(st, Dg, Ug, Bg, Sg, delta, params, use_tf=False):
        """Block-tridiagonal factorization per chain via parallel cyclic
        reduction (log-depth, level-batched — see solver/pcr.py) plus the
        dense arrow Schur complement. With ``use_tf`` the band factors are
        computed in two-float (double-f32) arithmetic — the coupling
        panels Z and the arrow Schur complement stay in the input dtype."""
        C, T, D, A = st.C, st.T, st.D, st.A
        dtype = Dg.dtype
        Tp = pcr_pad_length(T)
        Dp = jnp.broadcast_to(
            jnp.eye(D, dtype=dtype), (C, Tp, D, D)
        ).at[:, :T].set(Dg)
        Up = jnp.zeros((C, Tp, D, D), dtype=dtype)
        if T > 1:
            Up = Up.at[:, : T - 1].set(Ug)
        Bp = jnp.zeros((C, Tp, D, A), dtype=dtype).at[:, :T].set(Bg)

        # Two-float band selection: the fused Pallas kernels chunk chains
        # into lane-budgeted calls, so only a single chain too long for
        # the per-call VMEM budget is unservable directly — those (3D
        # blocks, Db = 12, at T > 256) go through the SEGMENTED band
        # (pallas_pcr.seg_factor_pallas: SPIKE-style substructuring into
        # budget-sized interior pseudo-chains + a small two-float
        # interface chain). CPU keeps the jnp two-float path (tests,
        # reference).
        pallas_fits = ppcr_supported(Tp, D)
        seg = None if pallas_fits else seg_lengths(Tp, D)
        on_tpu = jax.default_backend() == "tpu"
        if use_tf and _use_pallas_pcr() and pallas_fits:
            if st.shard_mesh is not None:
                pcrf = _shmap_ppcr_factor(
                    st, tfm.from_f64(Dp), tfm.from_f64(Up)
                )
                Z = tfm.to_f64(
                    _shmap_ppcr_solve(st, pcrf, tfm.from_f64(Bp))
                ).astype(dtype)
            else:
                pcrf = ppcr_factor_pallas(
                    tfm.from_f64(Dp), tfm.from_f64(Up)
                )
                Z = tfm.to_f64(
                    ppcr_solve_pallas(pcrf, tfm.from_f64(Bp))
                ).astype(dtype)
        elif use_tf and _use_pallas_pcr() and seg is not None:
            if st.shard_mesh is not None:
                pcrf = _shmap_seg_factor(
                    st, tfm.from_f64(Dp), tfm.from_f64(Up), seg[0]
                )
                Z = tfm.to_f64(
                    _shmap_seg_solve(st, pcrf, tfm.from_f64(Bp))
                ).astype(dtype)
            else:
                pcrf = seg_factor_pallas(
                    tfm.from_f64(Dp), tfm.from_f64(Up), seg[0]
                )
                Z = tfm.to_f64(
                    seg_solve_pallas(pcrf, tfm.from_f64(Bp))
                ).astype(dtype)
        elif use_tf and (not on_tpu or st.shard_mesh is not None):
            # jnp two-float band: the CPU/tests path, and the sharded
            # fallback for shapes the wrapped Pallas kernels can't take
            # (it is plain jnp, so GSPMD partitions it over the chain
            # axis; inside the one solve jit it is not dispatch-bound)
            pcrf = jax.vmap(pcr_factor_tf)(tfm.from_f64(Dp), tfm.from_f64(Up))
            Z = tfm.to_f64(
                jax.vmap(pcr_solve_tf)(pcrf, tfm.from_f64(Bp))
            ).astype(dtype)
        else:
            pcrf = jax.vmap(pcr_factor)(Dp, Up)
            Z = jax.vmap(pcr_solve)(pcrf, Bp)
        Kc = C * Tp * D
        if _use_exact_mm(st, dtype, Kc * A * A):
            # arrow Schur product as exact split-f32 MXU matmuls — the
            # dominant per-iteration contraction at multi-robot scale
            # (~1e9 emulated-f64 MACs/iter at 20 robots as an einsum)
            Sg = Sg - ozaki.mm_f64(
                Bp.reshape(Kc, A), Z.reshape(Kc, A)
            ).astype(dtype)
        else:
            Sg = Sg - jnp.einsum("ctia,ctib->ab", Bp, Z)
        esc = jnp.eye(A, dtype=dtype) * (
            params.reg_escalation * delta
        ).astype(dtype)
        if _use_blocked_arrow(st, dtype, A):
            Lb1, Dinv1 = chol_blocked(Sg)
            # escalate on non-finite entries in EITHER factor output: an
            # exactly-singular Sg with its zero pivot in the last diagonal
            # block yields a finite Lb but inf in Dinv (the block inverse
            # divides by the zero pivot), and skipping escalation there
            # would emit non-finite directions where the dense cholesky
            # path would have retried
            Lb, Dinv = jax.lax.cond(
                jnp.all(jnp.isfinite(Lb1)) & jnp.all(jnp.isfinite(Dinv1)),
                lambda: (Lb1, Dinv1),
                lambda: chol_blocked(Sg + esc),
            )
            # dense LS kept for consumers that want the plain factor
            # (parity tests compare factors across routing paths). It IS
            # materialized each factorization — the cost is one
            # transpose/reshape of already-computed blocks — but the
            # solve fast path reads only (Lb, Dinv).
            LS = blocked_dense_L(Lb, A)
            return pcrf, Bp, Z, LS, (Lb, Dinv)
        LS1 = jnp.linalg.cholesky(Sg)
        LS = jax.lax.cond(
            jnp.all(jnp.isfinite(LS1)),
            lambda: LS1,
            lambda: jnp.linalg.cholesky(Sg + esc),
        )
        return pcrf, Bp, Z, LS, None

    @staticmethod
    def factor(problem: ConicProblem, state: CAState, Winv2, params):
        st = state.structure
        Dg, Ug, Bg, Sg, kdd, wv, Hhat, delta = ChainArrowBackend._assemble(
            problem, state, Winv2, params
        )
        pcrf, Bp, Z, LS, arrowb = ChainArrowBackend._factor_band(
            st, Dg, Ug, Bg, Sg, delta, params
        )
        return CAFactors(
            pcr=pcrf, B=Bp, Z=Z, LS=LS, kdd=kdd, wv=wv, Hhat=Hhat,
            Winv2=Winv2,
            arrow_Lb=None if arrowb is None else arrowb[0],
            arrow_Dinv=None if arrowb is None else arrowb[1],
        )

    # ---------------- solve ---------------- #

    @staticmethod
    def solve(problem: ConicProblem, state: CAState, factors: CAFactors,
              rhs, params):
        """Solve K dx = rhs through the structured factorization, with
        optional inner iterative-refinement passes against the true
        K = P + G'W^{-2}G via structured matvecs (params.kkt_refine_steps;
        the outer solver's direction-level refinement subsumes this to
        first order)."""
        dx = ChainArrowBackend._solve_once(problem, state, factors, rhs)
        for _ in range(params.kkt_refine_steps):
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
    def _band_solve(st, factors: CAFactors, rc, ra):
        """Solve the chain+arrow band system
            [T B; B' S][x; u] = [rc; ra]  =>
            w = T^{-1} rc,  u = Stilde^{-1}(ra - B' w),  x = w - T^{-1}B u.
        With mixed-precision factors (factors.dC set), the band factors
        hold the Jacobi-equilibrated D K D in two-float: scale the rhs in,
        run the cyclic-reduction solve in two-float, scale back out; the
        arrow Schur solve and recombination stay in the rhs dtype."""
        C, T, D = st.C, st.T, st.D
        dtype = rc.dtype
        if factors.dC is not None:
            rc = rc * factors.dC
            ra = ra * factors.dA
        Tp = factors.B.shape[1]
        rp = jnp.zeros((C, Tp, D, 1), dtype=dtype).at[:, :T].set(rc[..., None])
        if isinstance(factors.pcr, SegPPCRFactors):
            if st.shard_mesh is not None:
                w = tfm.to_f64(
                    _shmap_seg_solve(st, factors.pcr, tfm.from_f64(rp))
                ).astype(dtype)[..., 0]
            else:
                w = tfm.to_f64(
                    seg_solve_pallas(factors.pcr, tfm.from_f64(rp))
                ).astype(dtype)[..., 0]
        elif isinstance(factors.pcr, (PPCRFactors, CRFactors)):
            if st.shard_mesh is not None:
                w = tfm.to_f64(
                    _shmap_ppcr_solve(st, factors.pcr, tfm.from_f64(rp))
                ).astype(dtype)[..., 0]
            else:
                w = tfm.to_f64(
                    ppcr_solve_pallas(factors.pcr, tfm.from_f64(rp))
                ).astype(dtype)[..., 0]
        elif isinstance(factors.pcr.L_odd, TF):
            w = tfm.to_f64(
                jax.vmap(pcr_solve_tf)(factors.pcr, tfm.from_f64(rp))
            ).astype(dtype)[..., 0]
        else:
            w = jax.vmap(pcr_solve)(factors.pcr, rp)[..., 0]  # (C, Tp, D)
        ra_schur = ra - jnp.einsum("ctia,cti->a", factors.B, w)
        if factors.arrow_Lb is not None:
            u = blocked_upper_solve(
                factors.arrow_Lb, factors.arrow_Dinv,
                blocked_lower_solve(
                    factors.arrow_Lb, factors.arrow_Dinv, ra_schur
                ),
            )
        else:
            u = _tri_T(factors.LS, _tri(factors.LS, ra_schur))
        dxc = (w - jnp.einsum("ctia,a->cti", factors.Z, u))[:, :T]
        if factors.dC is not None:
            dxc = dxc * factors.dC
            u = u * factors.dA
        return dxc, u

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

        # split into chain rhs and arrow rhs: each arrow column's rhs is
        # a single gather from its (unique) source entry
        rc = vc * st.cm
        combined = jnp.concatenate(
            [vc.reshape(-1), vl.reshape(-1), jnp.zeros((1,), dtype=dtype)]
        )
        ra = combined[st.arrow_src]

        # chain solve (PCR), arrow Schur solve, recombination
        dxc, u = ChainArrowBackend._band_solve(st, factors, rc, ra)

        # recompose full pose slots: chain part + arrow-resident entries
        # (one gather through the entry -> arrow-column map)
        u_pad = jnp.concatenate([u, jnp.zeros((1,), dtype=dtype)])
        dx_full = dxc * st.cm + u_pad[st.arrow_col] * st.av
        dxl = u[: st.NL * d].reshape(st.NL, d) if st.NL else jnp.zeros(
            (0, d), dtype=dtype
        )

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

    # ---------------- multi-RHS panel solve ---------------- #

    @staticmethod
    def _band_solve_panel(st, factors: CAFactors, rc_K, ra_K):
        """Panel variant of :meth:`_band_solve`: rc_K (K, C, T, D) and
        ra_K (K, A) right-hand sides through ONE K-wide band solve — the
        cyclic-reduction kernels take rhs panels natively (the arrow
        coupling panel Z is already solved A-wide every factorization),
        so a K-panel costs one factor traversal instead of K."""
        C, T, D = st.C, st.T, st.D
        K = rc_K.shape[0]
        dtype = rc_K.dtype
        if factors.dC is not None:
            rc_K = rc_K * factors.dC
            ra_K = ra_K * factors.dA
        Tp = factors.B.shape[1]
        rp = jnp.zeros((C, Tp, D, K), dtype=dtype).at[:, :T].set(
            jnp.moveaxis(rc_K, 0, -1)
        )
        if isinstance(factors.pcr, SegPPCRFactors):
            if st.shard_mesh is not None:
                w = tfm.to_f64(
                    _shmap_seg_solve(st, factors.pcr, tfm.from_f64(rp))
                ).astype(dtype)
            else:
                w = tfm.to_f64(
                    seg_solve_pallas(factors.pcr, tfm.from_f64(rp))
                ).astype(dtype)
        elif isinstance(factors.pcr, (PPCRFactors, CRFactors)):
            if st.shard_mesh is not None:
                w = tfm.to_f64(
                    _shmap_ppcr_solve(st, factors.pcr, tfm.from_f64(rp))
                ).astype(dtype)
            else:
                w = tfm.to_f64(
                    ppcr_solve_pallas(factors.pcr, tfm.from_f64(rp))
                ).astype(dtype)
        elif isinstance(factors.pcr.L_odd, TF):
            w = tfm.to_f64(
                jax.vmap(pcr_solve_tf)(factors.pcr, tfm.from_f64(rp))
            ).astype(dtype)
        else:
            w = jax.vmap(pcr_solve)(factors.pcr, rp)  # (C, Tp, D, K)
        ra_schur = ra_K - jnp.einsum("ctia,ctik->ka", factors.B, w)
        if factors.arrow_Lb is not None:
            u = jax.vmap(
                lambda r: blocked_upper_solve(
                    factors.arrow_Lb, factors.arrow_Dinv,
                    blocked_lower_solve(
                        factors.arrow_Lb, factors.arrow_Dinv, r
                    ),
                )
            )(ra_schur)
        else:
            u = _tri_T(factors.LS, _tri(factors.LS, ra_schur.T)).T
        dxc = (
            jnp.moveaxis(w, -1, 0)
            - jnp.einsum("ctia,ka->kcti", factors.Z, u)
        )[:, :, :T]
        if factors.dC is not None:
            dxc = dxc * factors.dC
            u = u * factors.dA
        return dxc, u

    @staticmethod
    def _solve_once_panel(problem: ConicProblem, state: CAState,
                          factors: CAFactors, rhs_K):
        """Panel variant of :meth:`_solve_once`: rhs_K (K, n). The
        gather/eliminate/back-substitute stages are vmapped over the panel
        (plain indexed jnp ops); the band+arrow core runs ONCE K-wide."""
        st = state.structure
        dtype = rhs_K.dtype

        vc, vl, rd = jax.vmap(
            lambda r: ChainArrowBackend._gather(state, r)
        )(rhs_K)

        if st.NR:
            if st.relaxation == SOCP_RELAXATION:
                tvec = factors.wv * (rd / factors.kdd[:, None])
                ga, gb = -tvec, tvec
            else:
                tvec = jnp.einsum("mij,kmj->kmi", factors.kdd, rd)
                c = (2.0 * state.rng_prec * state.rng_dist)[:, None]
                ga, gb = c * tvec, -c * tvec
            dc, dl = jax.vmap(
                lambda a, b: ChainArrowBackend._range_endpoint_adjoint(
                    state, a, b
                )
            )(ga, gb)
            vc = vc + dc
            vl = vl + dl

        rc = vc * st.cm
        combined = jnp.concatenate(
            [
                vc.reshape(vc.shape[0], -1),
                vl.reshape(vl.shape[0], -1),
                jnp.zeros((vc.shape[0], 1), dtype=dtype),
            ],
            axis=1,
        )
        ra = combined[:, st.arrow_src]

        dxc, u = ChainArrowBackend._band_solve_panel(st, factors, rc, ra)

        u_pad = jnp.concatenate(
            [u, jnp.zeros((u.shape[0], 1), dtype=dtype)], axis=1
        )
        dx_full = dxc * st.cm + u_pad[:, st.arrow_col] * st.av
        dxl = (
            u[:, : st.NL * st.d].reshape(-1, st.NL, st.d)
            if st.NL
            else jnp.zeros((u.shape[0], 0, st.d), dtype=dtype)
        )

        if st.NR:
            def backsub(dxf, dl, rd_):
                dx_for_ends = ChainArrowBackend._to_x(
                    state, dxf, dl, jnp.zeros_like(rd_)
                )
                ta, tb = ChainArrowBackend._range_endpoint_values(
                    state, dx_for_ends
                )
                du = ta - tb
                if st.relaxation == SOCP_RELAXATION:
                    dd = (
                        rd_[:, 0]
                        - jnp.einsum("mi,mi->m", factors.wv, du)
                    ) / factors.kdd
                    dd = dd[:, None]
                else:
                    c = (2.0 * state.rng_prec * state.rng_dist)[:, None]
                    dd = jnp.einsum("mij,mj->mi", factors.kdd, rd_ + c * du)
                return dd

            dd = jax.vmap(backsub)(dx_full, dxl, rd)
        else:
            dd = jnp.zeros_like(rd)

        return jax.vmap(
            lambda a, b, c_: ChainArrowBackend._to_x(state, a, b, c_)
        )(dx_full, dxl, dd)

    @staticmethod
    def solve_panel(problem: ConicProblem, state: CAState,
                    factors: CAFactors, rhs_K, params):
        """Solve K dx_k = rhs_k for a (K, n) panel through one
        factorization (see :meth:`solve`)."""
        dx = ChainArrowBackend._solve_once_panel(
            problem, state, factors, rhs_K
        )
        for _ in range(params.kkt_refine_steps):
            def kkt_resid(x, r):
                Gv = G_apply(problem, x)
                Kdx = ChainArrowBackend.P_matvec(state, x) + (
                    ChainArrowBackend.GT(
                        problem, state,
                        jnp.einsum("mij,mj->mi", factors.Winv2, Gv),
                    )
                )
                return state.mask * (r - Kdx)

            resid = jax.vmap(kkt_resid)(dx, rhs_K)
            dx = dx + ChainArrowBackend._solve_once_panel(
                problem, state, factors, resid
            )
        return dx


# ------------------------------------------------------------------ #
# Mixed precision
# ------------------------------------------------------------------ #


class MixedChainArrowBackend(ChainArrowBackend):
    """Mixed-precision chain+arrow backend: the W-dependent KKT blocks are
    assembled (and Jacobi-equilibrated) in f64; the band factorization and
    its cyclic-reduction solves run in rigorous two-float (double-f32,
    :mod:`score_tpu.ops.twofloat`) — native f32 TPU arithmetic instead of
    the ~3x-slower emulated f64; operators, residuals, the arrow Schur
    complement, and iterative refinement stay in f64.

    Two-float (not plain f32) is load-bearing: even after the Jacobi
    equilibration D = diag(K)^{-1/2}, the chain band of a GOATS-scale
    problem keeps kappa ~ 1e8-1e9 (the pinned odometry chain is a
    1D-Laplacian-like operator — the ill-conditioning is long-wavelength,
    which no diagonal scaling removes), so a plain-f32 factorization has
    error contraction kappa * eps32 > 1 and diverges. Two-float keeps a
    single band solve at ~kappa * 2^-47 ~ 1e-5 relative residual, and the
    f64 refinement pass below restores f64-grade directions — realizing
    the ``precision="mixed"`` policy promised by
    :class:`score_tpu.solver.params.ScoreSolverParams`.
    """

    @staticmethod
    def factor(problem: ConicProblem, state: CAState, Winv2, params):
        st = state.structure
        Dg, Ug, Bg, Sg, kdd, wv, Hhat, delta = ChainArrowBackend._assemble(
            problem, state, Winv2, params
        )
        iD = jnp.arange(st.D)
        dC = 1.0 / jnp.sqrt(Dg[..., iD, iD])  # (C, T, D); masked entries
        dA = 1.0 / jnp.sqrt(jnp.diag(Sg))  # hold identity fill > 0
        Dg = Dg * dC[..., :, None] * dC[..., None, :]
        if st.T > 1:
            Ug = Ug * dC[:, :-1, :, None] * dC[:, 1:, None, :]
        Bg = Bg * dC[..., :, None] * dA[None, None, None, :]
        Sg = Sg * dA[:, None] * dA[None, :]
        pcrf, Bp, Z, LS, arrowb = ChainArrowBackend._factor_band(
            st, Dg, Ug, Bg, Sg, delta, params, use_tf=True
        )
        return CAFactors(
            pcr=pcrf, B=Bp, Z=Z, LS=LS, kdd=kdd, wv=wv, Hhat=Hhat,
            Winv2=Winv2, dC=dC, dA=dA,
            arrow_Lb=None if arrowb is None else arrowb[0],
            arrow_Dinv=None if arrowb is None else arrowb[1],
        )

    # solve() is inherited unchanged: the two-float band solve is accurate
    # enough (kappa * 2^-47 ~ 1e-5 single-solve residual at GOATS
    # conditioning) that the solver's direction-level refinement
    # (IPMParams.dir_refine_steps, residuals in f64) recovers f64-grade
    # directions without a forced inner refinement pass — the band solves
    # are the per-iteration cost, so the default kkt_refine_steps applies
    # here exactly as on the f64 backend.
