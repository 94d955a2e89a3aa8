"""Primal-dual interior-point solver for conic QPs (the TPU-native
replacement of the reference's Gurobi barrier backend, SURVEY.md §2.3).

Solves    minimize    0.5 x^T P x + q^T x
          subject to  G x + s = h,   s in K = SOC(k)^N

with a Mehrotra predictor-corrector method under Nesterov-Todd scaling:

  * scaled complementarity linearization
        lambda o (W^{-1} ds + W dz) = d
    reduced to one SPD system per direction:
        (P + G^T W^{-2} G) dx = -rx - G^T W^{-2} (rz + W (lambda \\ d))
        dz = W^{-2} (G dx + rz + W (lambda \\ d))
        ds = -rz - G dx
  * the affine direction uses d = -lambda o lambda; the combined direction
    adds the Mehrotra second-order correction and centering sigma * mu * e;
  * one factorization of K = P + G^T W^{-2} G serves both solves;
  * the gauge pin (first pose = [I|0]) is enforced by masking pinned
    rows/columns of K and of the dual residual (free-subspace Newton step).

The Newton-system linear algebra is delegated to a pluggable KKT backend
(:mod:`score_tpu.solver.backend`): dense Cholesky (reference) or the
structure-exploiting chain+arrow factorization (production path).

The whole iteration is a `lax.while_loop` of dense/batched array ops — fully
jit-compiled with no host round-trips; the fixed-trip variants are
vmap-safe for batched Monte-Carlo solves.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from score_tpu.assembly.conic import ConicProblem
from score_tpu.solver import cones
from score_tpu.solver.backend import DenseBackend

__all__ = [
    "IPMParams",
    "IPMResult",
    "solve_conic",
    "solve_conic_fixed",
    "solve_conic_with_iterates",
    "solve_conic_traced",
]

# Status codes.
RUNNING = 0
OPTIMAL = 1
MAX_ITER = 2
NUMERICAL_ERROR = 3
OPTIMAL_INACCURATE = 4  # stopped early but meets the reduced tolerances
PRIMAL_INFEASIBLE = 5  # certificate z: z in K*, G'z ~ 0, h'z < 0
DUAL_INFEASIBLE = 6  # certificate x: P x ~ 0, q'x < 0, -G x in K (unbounded)
SOLVED_STATUSES = (OPTIMAL, OPTIMAL_INACCURATE)
INFEASIBLE_STATUSES = (PRIMAL_INFEASIBLE, DUAL_INFEASIBLE)


@dataclasses.dataclass(frozen=True)
class IPMParams:
    """Interior-point controls. Defaults target 1e-8-grade accuracy (vs the
    reference's BarQCPConvTol=1e-1, gurobi_utils.py:212)."""

    max_iter: int = 50
    tol_feas: float = 1e-8
    tol_gap_abs: float = 1e-8
    # Relative-gap target: the BASELINE.md north star (<= 1e-6 relative
    # duality gap; vs the reference's BarQCPConvTol = 1e-1,
    # gurobi_utils.py:212). The f64 endgame reaches ~4e-7 on GOATS-scale
    # SOCPs (residual-guarded direction refinement + wide-neighborhood
    # safeguard); tighten to 1e-8 for small well-conditioned problems.
    tol_gap_rel: float = 1e-6
    step_fraction: float = 0.99
    kkt_refine_steps: int = 0  # iterative-refinement passes per K solve
    # Refinement passes of each search direction against the FULL unreduced
    # Newton system (dual, primal, and scaled-complementarity rows). The
    # condensed back-substitution dz = W^{-2}(G dx + rz + v) amplifies
    # roundoff by ||W^{-2}|| ~ 1/mu near convergence; refining the full
    # 3-row system removes that floor and is what lets the endgame reach
    # 1e-8-grade gaps (one pass doubles the condensed-solve count per
    # direction but subsumes kkt_refine_steps to first order).
    dir_refine_steps: int = 1
    # Gate the direction-refinement solves on proximity to convergence:
    # refinement exists to remove the endgame W^{-2} roundoff floor, which
    # only emerges once the iterate is nearly converged — until the
    # best-iterate metric (max of scaled residuals and relative gap) drops
    # below this threshold the refinement correction is rejected-or-inert
    # (measured on GOATS: identical iterates and final relgap without it)
    # and costs one condensed solve + two full-system residual
    # evaluations per direction. 0 disables the gate (always refine).
    dir_refine_gate: float = 1e-3
    # Static diagonal regularization of K, relative to max|diag(K)|; the
    # refinement passes solve against the TRUE K, so the regularization
    # perturbs conditioning, not the answer (ECOS/Clarabel-style).
    static_reg: float = 1e-11
    # Escalation factor for the retry factorization when the first Cholesky
    # breaks down (produces non-finite entries).
    reg_escalation: float = 1e5
    # Reduced ("solved to lower accuracy") tolerances applied when the
    # iteration stops on max_iter, stagnation, or a numerical breakdown.
    # Still 1e4x tighter than the reference's 1e-1 (gurobi_utils.py:212).
    # The endgame floor after the round-2 fixes (residual-guarded
    # refinement, wide-neighborhood safeguard, compensated cone algebra)
    # is relgap ~4e-7 on GOATS SOCP; the QCQP relaxation's floor on the
    # same data is ~1.5e-6 (one degenerate cone with extreme internal
    # eigenvalue spread caps the step length), which the reduced band
    # covers with margin.
    tol_feas_reduced: float = 1e-6
    tol_gap_reduced: float = 1e-5
    # Stop after this many consecutive iterations without improving the
    # best-iterate metric (endgame thrashing at the precision floor).
    stall_limit: int = 5
    # Gondzio multiple centrality correctors: extra backsolves on the
    # already-computed factorization that push the trial point's scaled
    # complementarity products into [beta_min, beta_max] * target mu;
    # accepted only when they extend the step length.
    gondzio_correctors: int = 2
    gondzio_beta_min: float = 0.1
    gondzio_beta_max: float = 10.0
    # Infeasibility certificates (SURVEY.md §5 failure-detection role).
    # A diverging iterate is tested against the normalized Farkas
    # conditions: primal infeasibility via z (z in K*, ||G'z|| small
    # relative to ||z||, h'z < 0) and dual infeasibility / unboundedness
    # via x (||P x|| small, q'x < 0, -G x in K). Note: with the
    # weighted-least-squares cost encoding of assembly/conic.py the
    # objective is a sum of squares and q lies in range(P), so the dual
    # certificate is structurally unreachable for problems built from a
    # factor graph — it exists for hand-built conic programs. Likewise
    # h in K for both relaxations makes false primal positives impossible
    # at feasible optima (h'z > 0 for interior z).
    tol_infeas: float = 1e-8
    infeas_norm_gate: float = 100.0  # only test once the iterate diverges
    # Wide-neighborhood safeguard: backtrack the step until every cone's
    # scaled eigenvalue product rho_s * rho_z stays >= (gamma^2 mu). Pure
    # Mehrotra lets a single cone crash into the boundary (rho_z -> eps)
    # orders of magnitude before the gap closes, which destroys the NT
    # scaling (relative error eps/rho^2 > 1) and makes the endgame thrash;
    # the neighborhood keeps W computable all the way down.
    nbhd_gamma: float = 0.1
    # Replace the solver's internal `lax.cond`s (skip-when-terminal,
    # centering recovery) with compute-both + select. Required when the
    # KKT backend contains custom_vmap'd Pallas calls and the solve is
    # vmapped (jax cannot batch a custom_vmap inside a cond branch:
    # cond batching broadcasts the branch's closure constants, which
    # custom_vmap rejects) — and costs nothing extra under vmap, where
    # batched cond runs both branches as a select anyway. The batch
    # drivers (parallel/batch.py) enable this automatically.
    branchless: bool = False
    # Refine the affine (predictor) direction too. The affine direction
    # only sets sigma and seeds the Mehrotra correction — a first-order-
    # accurate one is enough (measured: GOATS SOCP/QCQP and the 20-robot
    # world keep identical iteration counts and relgaps without it), and
    # skipping its refinement saves one condensed solve + two full-system
    # residual evaluations per iteration. The combined direction (the one
    # actually stepped along) is always refined per dir_refine_steps.
    refine_affine: bool = False
    # EXPERIMENTAL (measured: a LOSS — keep off). Fuse the predictor:
    # solve [affine | pure-centering e] as ONE two-RHS condensed PANEL
    # and form the combined direction dirs_aff + sigma*mu*dirs_e by
    # linearity of the Newton system — dropping Mehrotra's second-order
    # correction term. The band kernels take rhs panels natively, so the
    # 2-RHS panel costs ~one factor traversal and the pre-endgame
    # condensed-solve count per iteration drops 2 -> 1. MEASURED
    # (3-robot Manhattan, CPU f64, gondzio_correctors=2): QCQP converges
    # but at 18 iterations vs 9 — the halved per-iteration cost is more
    # than repaid; SOCP trajectories cut the gap so much slower that they
    # traverse a relgap-INCREASING region (gap falls slower than |pobj|
    # -> 0) and the stall detector exits at MAX_ITER. Mehrotra's
    # correction is worth far more than one condensed solve per
    # iteration; Gondzio correctors do not recover it. Kept (off) so the
    # negative result stays reproducible; the panel machinery it rides on
    # (backend.solve_panel) is independently tested. Ignores
    # refine_affine (the panel's affine column is first-order, which is
    # all sigma needs).
    fuse_predictor: bool = False
    # Populate the per-step diagnostics channel (_State.diag) — includes
    # a full Newton-system residual evaluation (3 operator applications)
    # per step, so it's off on the production path; solve_conic_traced
    # switches it on.
    record_diag: bool = False


class IPMResult(NamedTuple):
    x: jnp.ndarray
    s: jnp.ndarray
    z: jnp.ndarray
    iterations: jnp.ndarray
    status: jnp.ndarray
    pobj: jnp.ndarray  # 0.5 x'Px + q'x + const (true relaxation objective)
    gap: jnp.ndarray  # s'z
    pres: jnp.ndarray
    dres: jnp.ndarray


class _State(NamedTuple):
    x: jnp.ndarray
    s: jnp.ndarray
    z: jnp.ndarray
    it: jnp.ndarray
    status: jnp.ndarray
    # best-iterate tracking: the returned solution is the best iterate seen
    # (by max of scaled residuals and relative gap), which makes the solver
    # robust to endgame thrashing at the floating-point floor.
    best_x: jnp.ndarray
    best_s: jnp.ndarray
    best_z: jnp.ndarray
    best_metric: jnp.ndarray
    stall: jnp.ndarray
    # step diagnostics of the LAST step taken, for solve_conic_traced:
    # [alpha_final, nbhd_frac, sigma, gap_affine/gap, min_detprod/mu^2,
    #  centering(0/1), alpha_pre_nbhd, newton_resid]
    diag: jnp.ndarray


def _residuals(backend, problem, state, x, s, z):
    rx = state.mask * (
        backend.P_matvec(state, x) + state.q + backend.GT(problem, state, z)
    )
    rz = backend.G(problem, state, x) + s - problem.cone_h
    return rx, rz


def _convergence(backend, problem, state, params: IPMParams, x, s, z):
    out = _convergence_full(backend, problem, state, params, x, s, z)
    return out[:6]


def _convergence_full(backend, problem, state, params: IPMParams, x, s, z):
    # Residuals scaled by the magnitude of their constituent terms
    # (SCS/Clarabel-style), so convergence is relative even when q or h
    # vanish (e.g. QCQP mode has q = 0 when there are no landmark priors).
    Px = backend.P_matvec(state, x)
    Gtz = backend.GT(problem, state, z)
    Gx = backend.G(problem, state, x)
    rx = state.mask * (Px + state.q + Gtz)
    rz = Gx + s - problem.cone_h
    dscale = jnp.maximum(
        1.0,
        jnp.maximum(
            jnp.linalg.norm(Px),
            jnp.maximum(jnp.linalg.norm(Gtz), state.qnorm),
        ),
    )
    pscale = jnp.maximum(
        1.0,
        jnp.maximum(
            jnp.linalg.norm(Gx),
            jnp.maximum(jnp.linalg.norm(s), state.hnorm),
        ),
    )
    pres = jnp.linalg.norm(rz) / pscale
    dres = jnp.linalg.norm(rx) / dscale
    gap = cones.inner(s, z)
    pq = 0.5 * x @ Px + state.q @ x
    # gap relative to the TRUE objective value (pq + const) — using |pq|
    # alone would inflate the denominator by the constant term sum(w b^2)
    # and declare convergence orders of magnitude early.
    relgap = gap / jnp.maximum(1.0, jnp.abs(pq + state.const))
    ok = (
        (pres < params.tol_feas)
        & (dres < params.tol_feas)
        & ((gap < params.tol_gap_abs) | (relgap < params.tol_gap_rel))
    )
    bad = ~(jnp.isfinite(pres) & jnp.isfinite(dres) & jnp.isfinite(gap))
    return ok, bad, pres, dres, gap, pq, rx, rz, Px, Gtz, Gx


def _metric(pres, dres, gap, pobj):
    relgap = jnp.abs(gap) / jnp.maximum(1.0, jnp.abs(pobj))
    m = jnp.maximum(jnp.maximum(pres, dres), relgap)
    return jnp.where(jnp.isfinite(m), m, jnp.inf)


def _advance(backend, problem, state_ops, params, st: _State) -> _State:
    """One loop trip: convergence bookkeeping (best-iterate + stall
    tracking), then a Mehrotra step unless terminal. The residuals computed
    for the convergence check are reused by the step (the operator
    applications are a meaningful share of structured-backend time)."""
    st, terminal, rx, rz = _advance_book(backend, problem, state_ops,
                                         params, st)
    return _advance_apply(backend, problem, state_ops, params, st,
                          terminal, rx, rz)


def _advance_book(backend, problem, state_ops, params, st: _State):
    """Bookkeeping half of :func:`_advance`: convergence/infeasibility
    tests, best-iterate + stall tracking, status update. Returns the
    updated state, the terminal flag, and the (rx, rz) residuals for the
    step. Split out so the batch driver (parallel/batch.py) can compute
    batch-level shared gates BETWEEN bookkeeping and the step."""
    ok, bad, pres, dres, gap, pq, rx, rz, Px, Gtz, Gx = _convergence_full(
        backend, problem, state_ops, params, st.x, st.s, st.z
    )
    m = _metric(pres, dres, gap, pq + state_ops.const)
    improved = m < st.best_metric
    best_x = jnp.where(improved, st.x, st.best_x)
    best_s = jnp.where(improved, st.s, st.best_s)
    best_z = jnp.where(improved, st.z, st.best_z)
    best_metric = jnp.minimum(m, st.best_metric)
    stall = jnp.where(improved, 0, st.stall + 1)

    # --- infeasibility certificates on diverging iterates -------------
    tol_i = params.tol_infeas
    znorm = jnp.linalg.norm(st.z)
    # Farkas: on the free subspace the effective rhs is h - G xpin
    hz = jnp.sum(problem.cone_h * st.z) - state_ops.xpin @ Gtz
    pinf = (
        (znorm > params.infeas_norm_gate)
        & (hz < -tol_i * znorm)
        & (jnp.linalg.norm(state_ops.mask * Gtz) < tol_i * znorm)
    )
    xnorm = jnp.linalg.norm(st.x)
    qx = state_ops.q @ st.x
    ray_in_cone = (
        jnp.min(cones.min_eig(-Gx)) > -tol_i * xnorm
        if problem.num_cones
        else jnp.asarray(True)
    )
    dinf = (
        (xnorm > params.infeas_norm_gate)
        & (qx < -tol_i * xnorm)
        & (jnp.linalg.norm(state_ops.mask * Px) < tol_i * xnorm)
        & ray_in_cone
    )

    stalled = stall >= params.stall_limit
    terminal = ok | bad | stalled | pinf | dinf | (st.status != RUNNING)
    status = jnp.where(
        st.status != RUNNING,
        st.status,
        jnp.where(ok, OPTIMAL,
                  jnp.where(pinf, PRIMAL_INFEASIBLE,
                            jnp.where(dinf, DUAL_INFEASIBLE,
                                      jnp.where(bad, NUMERICAL_ERROR,
                                                jnp.where(stalled, MAX_ITER,
                                                          RUNNING))))),
    )
    st = st._replace(
        status=status, best_x=best_x, best_s=best_s, best_z=best_z,
        best_metric=best_metric, stall=stall,
    )
    return st, terminal, rx, rz


def _advance_apply(backend, problem, state_ops, params, st: _State,
                   terminal, rx, rz, shared_refine=None,
                   shared_center=None) -> _State:
    """Step half of :func:`_advance`. ``shared_refine``/``shared_center``
    are optional UNBATCHED scalar gates supplied by the batch driver: under
    vmap, a `lax.cond` whose predicate is unbatched stays a real cond (the
    branch jaxpr is batched, not converted to a select), so all lanes skip
    the gated solves together while the per-lane `where` inside preserves
    exact per-lane semantics (a lane is refined iff ITS gate is open, and
    lane-open implies batch-open)."""
    if params.branchless:
        stepped = _step(backend, problem, state_ops, params, st,
                        residuals=(rx, rz), shared_refine=shared_refine,
                        shared_center=shared_center)
        return jax.tree_util.tree_map(
            lambda old, new: jnp.where(terminal, old, new), st, stepped
        )
    return jax.lax.cond(
        terminal,
        lambda s: s,
        lambda s: _step(backend, problem, state_ops, params, s,
                        residuals=(rx, rz)),
        st,
    )


def _step(backend, problem: ConicProblem, state_ops, params: IPMParams,
          st: _State, residuals=None, shared_refine=None,
          shared_center=None) -> _State:
    x, s, z = st.x, st.s, st.z
    N = problem.num_cones
    dtype = x.dtype

    nt = cones.nt_scaling(s, z)
    lam = cones.apply_W(nt, z)
    Winv2 = cones.winv2_matrices(nt)
    factors = backend.factor(problem, state_ops, Winv2, params)

    if residuals is None:
        rx, rz = _residuals(backend, problem, state_ops, x, s, z)
    else:
        rx, rz = residuals
    gap = cones.inner(s, z)
    mu = gap / N

    def _condensed(rx_, rz_, d):
        """One condensed Newton solve: directions satisfying
        P dx + G' dz = -rx_,  G dx + ds = -rz_,
        lambda o (W^{-1} ds + W dz) = d.

        W^{-2} is applied in operator form (two H applications, see
        :func:`cones.apply_Winv2`) — the dense per-cone matrices fed to
        the factorization lose the small eigenvalue of degenerate cones
        to roundoff, and using them here would poison the rhs and the dz
        back-substitution beyond what refinement can recover."""
        v = cones.apply_W(nt, cones.jordan_solve(lam, d))  # W (lambda \ d)
        rzv = rz_ + v
        wrz = cones.apply_Winv2(nt, rzv)
        rhs = state_ops.mask * (-(rx_) - backend.GT(problem, state_ops, wrz))
        dx = backend.solve(problem, state_ops, factors, rhs, params)
        Gdx = backend.G(problem, state_ops, dx)
        dz = cones.apply_Winv2(nt, Gdx + rzv)
        ds = -rz_ - Gdx
        return dx, ds, dz

    def _newton_resid(rx_, rz_, d, dx, ds, dz):
        f1 = state_ops.mask * (
            -(rx_)
            - backend.P_matvec(state_ops, dx)
            - backend.GT(problem, state_ops, dz)
        )
        f2 = -(rz_) - backend.G(problem, state_ops, dx) - ds
        f3 = d - cones.jordan_mul(
            lam, cones.apply_Winv(nt, ds) + cones.apply_W(nt, dz)
        )
        return f1, f2, f3

    def refine_dirs(rx_, rz_, d, dirs0):
        """Full-system iterative refinement of already-computed dirs:
        residuals of all three Newton rows (including the W^{-2}-amplified
        roundoff in the dz back-substitution) are corrected through one
        more condensed solve per pass. The correction is accepted only
        when it REDUCES the full-system residual: near mu -> 0 the
        condensed correction solve amplifies complementarity-row residuals
        by ~||W||^3 and refinement would otherwise diverge catastrophically
        (observed: f3 growing 1e4x at the GOATS endgame)."""
        if params.dir_refine_steps == 0:
            return dirs0

        def refined(dirs):
            dx, ds, dz = dirs
            for _ in range(params.dir_refine_steps):
                f1, f2, f3 = _newton_resid(rx_, rz_, d, dx, ds, dz)
                r0 = (
                    jnp.linalg.norm(f1)
                    + jnp.linalg.norm(f2)
                    + jnp.linalg.norm(f3)
                )
                cx, cs, cz = _condensed(-f1, -f2, f3)
                nx, ns, nz = dx + cx, ds + cs, dz + cz
                g1, g2, g3 = _newton_resid(rx_, rz_, d, nx, ns, nz)
                r1 = (
                    jnp.linalg.norm(g1)
                    + jnp.linalg.norm(g2)
                    + jnp.linalg.norm(g3)
                )
                better = r1 < r0
                dx = jnp.where(better, nx, dx)
                ds = jnp.where(better, ns, ds)
                dz = jnp.where(better, nz, dz)
            return dx, ds, dz

        if params.dir_refine_gate <= 0.0:
            return refined(dirs0)
        # refinement only matters near convergence (see IPMParams.
        # dir_refine_gate); skip its solves while the iterate is far
        near = st.best_metric < params.dir_refine_gate

        def refined_masked(dirs):
            rdx, rds, rdz = refined(dirs)
            dx_, ds_, dz_ = dirs
            return (
                jnp.where(near, rdx, dx_),
                jnp.where(near, rds, ds_),
                jnp.where(near, rdz, dz_),
            )

        if params.branchless:
            if shared_refine is None:
                return refined_masked(dirs0)
            # batch mode: skip the refinement solves for the WHOLE batch
            # while no lane is near (the unbatched predicate keeps this a
            # real cond under vmap); per-lane `near` still selects inside.
            return jax.lax.cond(
                shared_refine, refined_masked, lambda dirs: dirs, dirs0
            )
        return jax.lax.cond(near, refined, lambda dirs: dirs, dirs0)

    def solve_newton(rx_, rz_, d):
        return refine_dirs(rx_, rz_, d, _condensed(rx_, rz_, d))

    def _condensed_panel(rx_K, rz_K, d_K):
        """K condensed Newton solves through ONE K-wide band panel (see
        :func:`_condensed`; the cone algebra and operator applications
        are vmapped over the panel, the factor traversal runs once)."""
        v = jax.vmap(
            lambda dd: cones.apply_W(nt, cones.jordan_solve(lam, dd))
        )(d_K)
        rzv = rz_K + v
        wrz = jax.vmap(lambda r: cones.apply_Winv2(nt, r))(rzv)
        rhs = state_ops.mask * (
            -(rx_K)
            - jax.vmap(lambda w: backend.GT(problem, state_ops, w))(wrz)
        )
        dx = backend.solve_panel(problem, state_ops, factors, rhs, params)
        Gdx = jax.vmap(lambda x_: backend.G(problem, state_ops, x_))(dx)
        dz = jax.vmap(lambda g: cones.apply_Winv2(nt, g))(Gdx + rzv)
        ds = -rz_K - Gdx
        return dx, ds, dz

    def kkt_dirs(d):
        return solve_newton(rx, rz, d)

    def kkt_dirs_correction(d):
        # pure-centrality correction: zero primal/dual residual rows.
        # No direction refinement here — correctors/centering only
        # extend the step length and are accept-gated (alpha must
        # improve), so the refinement solves that matter for the final
        # accuracy (affine + combined) don't pay for them. Saves
        # dir_refine_steps condensed solves per corrector.
        zero_x = jnp.zeros_like(rx)
        zero_z = jnp.zeros_like(rz)
        return _condensed(zero_x, zero_z, d)

    d_aff = -cones.jordan_mul(lam, lam)
    if params.fuse_predictor:
        e = cones.soc_identity(N, problem.k, dtype)
        # --- fused predictor: [affine | centering] as ONE 2-RHS panel ---
        # By linearity of the Newton system the combined direction for
        # d = d_aff + sigma*mu*e is dirs_aff + sigma*mu*dirs_e, so both
        # solves collapse into one band-panel traversal; Mehrotra's
        # second-order correction term is dropped (see IPMParams.
        # fuse_predictor — Gondzio correctors re-supply it where enabled).
        zx, zz = jnp.zeros_like(rx), jnp.zeros_like(rz)
        dx_K, ds_K, dz_K = _condensed_panel(
            jnp.stack([rx, zx]),
            jnp.stack([rz, zz]),
            jnp.stack([d_aff, e]),
        )
        dx_a, ds_a, dz_a = dx_K[0], ds_K[0], dz_K[0]
        alpha_a = jnp.minimum(
            1.0,
            jnp.minimum(cones.max_step(s, ds_a), cones.max_step(z, dz_a)),
        )
        gap_a = cones.inner(s + alpha_a * ds_a, z + alpha_a * dz_a)
        sigma = jnp.clip((jnp.maximum(gap_a, 0.0) / gap) ** 3, 0.0, 1.0)
        d_comb = d_aff + sigma * mu * e
        dx = dx_a + sigma * mu * dx_K[1]
        ds = ds_a + sigma * mu * ds_K[1]
        dz = dz_a + sigma * mu * dz_K[1]
        dx, ds, dz = refine_dirs(rx, rz, d_comb, (dx, ds, dz))
    else:
        # --- affine (predictor) direction ---
        if params.refine_affine:
            dx_a, ds_a, dz_a = kkt_dirs(d_aff)
        else:
            dx_a, ds_a, dz_a = _condensed(rx, rz, d_aff)
        alpha_a = jnp.minimum(
            1.0,
            jnp.minimum(cones.max_step(s, ds_a), cones.max_step(z, dz_a)),
        )
        gap_a = cones.inner(s + alpha_a * ds_a, z + alpha_a * dz_a)
        sigma = jnp.clip((jnp.maximum(gap_a, 0.0) / gap) ** 3, 0.0, 1.0)

        # --- combined (corrector) direction ---
        # (soc_identity is built HERE, not hoisted above the branch: op
        # emission order is part of the lowered HLO, and the AOT
        # executable cache keys blobs on the HLO digest — keeping the
        # default path's trace byte-identical across refactors lets a
        # fresh tree adopt previously compiled executables)
        e = cones.soc_identity(N, problem.k, dtype)
        correction = cones.jordan_mul(
            cones.apply_Winv(nt, ds_a), cones.apply_W(nt, dz_a)
        )
        d_comb = d_aff - correction + sigma * mu * e
        dx, ds, dz = kkt_dirs(d_comb)

    def step_len(ds_, dz_):
        return jnp.minimum(
            1.0,
            params.step_fraction
            * jnp.minimum(cones.max_step(s, ds_), cones.max_step(z, dz_)),
        )

    alpha = step_len(ds, dz)

    # --- Gondzio multiple centrality correctors ---
    # rolled into a fori_loop (not unrolled): each unrolled corrector is
    # one more copy of the condensed-solve subgraph in the compiled
    # while_loop body, and compile time through the remote-compile
    # service scales with graph size. Numerics are unchanged — the loop
    # body is exactly the previous unrolled body.
    mu_t = sigma * mu

    def gondzio_body(_, dirs):
        dx, ds, dz, alpha = dirs
        a_trial = jnp.minimum(1.0, 1.1 * alpha + 0.1)
        s_t = s + a_trial * ds
        z_t = z + a_trial * dz
        prod = cones.jordan_mul(
            cones.apply_Winv(nt, s_t), cones.apply_W(nt, z_t)
        )
        lo = params.gondzio_beta_min * mu_t
        hi = params.gondzio_beta_max * mu_t
        head = prod[:, :1]
        target_head = jnp.clip(head, lo, hi)
        d_extra = jnp.concatenate(
            [target_head - head, -prod[:, 1:]], axis=1
        )
        # only correct meaningfully off-center cones
        off = (head < lo) | (head > hi)
        d_extra = jnp.where(off, d_extra, 0.0)
        dx_c, ds_c, dz_c = kkt_dirs_correction(d_extra)
        dx_n, ds_n, dz_n = dx + dx_c, ds + ds_c, dz + dz_c
        alpha_n = step_len(ds_n, dz_n)
        accept = alpha_n > alpha * 1.01
        return (
            jnp.where(accept, dx_n, dx),
            jnp.where(accept, ds_n, ds),
            jnp.where(accept, dz_n, dz),
            jnp.where(accept, alpha_n, alpha),
        )

    if params.gondzio_correctors:
        dx, ds, dz, alpha = jax.lax.fori_loop(
            0, params.gondzio_correctors, gondzio_body,
            (dx, ds, dz, alpha),
        )

    # --- wide-neighborhood safeguard (see IPMParams.nbhd_gamma) ---
    g4 = jnp.asarray(params.nbhd_gamma, dtype) ** 4
    fracs = jnp.asarray([1.0, 0.5, 0.25, 0.1, 0.05, 0.02, 0.01], dtype)

    def nbhd_ok(frac):
        a = alpha * frac
        s_t = s + a * ds
        z_t = z + a * dz
        gap_t = cones.inner(s_t, z_t)
        mu_t = gap_t / N
        det = cones.soc_residual(s_t) * cones.soc_residual(z_t)
        # gap_t <= gap: an exact Mehrotra/centering step always decreases
        # the gap ((1 - alpha(1 - sigma)) factor), so a gap increase means
        # the direction is dominated by roundoff — reject instead of
        # thrashing at the precision floor.
        return (gap_t > 0.0) & (gap_t <= gap) & jnp.all(det >= g4 * mu_t**2)

    ok_fracs = jax.vmap(nbhd_ok)(fracs)
    # largest acceptable fraction; 0 when even the smallest candidate
    # leaves the neighborhood or fails to decrease the gap.
    frac = jnp.max(jnp.where(ok_fracs, fracs, 0.0))

    # --- centering recovery ---
    # frac == 0 means the Mehrotra direction is roundoff-dominated at the
    # current centrality. Instead of freezing (which ends the solve via
    # stall detection), take a safeguarded pure-centering step (sigma = 1):
    # it keeps the gap but restores centrality, letting the next Mehrotra
    # step resume cutting the gap — worth a few extra digits at the floor.
    def centering_step(_):
        d_c = mu * e - cones.jordan_mul(lam, lam)
        dxc, dsc, dzc = kkt_dirs_correction(d_c)
        a_c = step_len(dsc, dzc)

        def c_ok(f):
            a = a_c * f
            s_t = s + a * dsc
            z_t = z + a * dzc
            gap_t = cones.inner(s_t, z_t)
            mu_t = gap_t / N
            det = cones.soc_residual(s_t) * cones.soc_residual(z_t)
            return (
                (gap_t > 0.0)
                & (gap_t <= gap * 1.01)
                & jnp.all(det >= g4 * mu_t**2)
            )

        okc = jax.vmap(c_ok)(fracs)
        fc = jnp.max(jnp.where(okc, fracs, 0.0))
        return dxc, dsc, dzc, a_c * fc

    def mehrotra_step(_):
        return dx, ds, dz, alpha * frac

    alpha_pre = alpha
    if params.branchless:
        if shared_center is None:
            cdx, cds, cdz, calpha = centering_step(None)
        else:
            # batch mode: the centering-recovery solve only matters when a
            # lane's Mehrotra direction is roundoff-dominated (frac == 0),
            # an endgame event. Skip the solve for the whole batch until
            # the driver's shared gate (any lane near convergence OR any
            # lane stalled) opens. A lane that hits frac == 0 while the
            # gate is closed takes a frozen step (alpha = 0) — identical
            # to selecting the zero direction below — and its stall
            # counter opens the gate on the next trip.
            zero_dirs = (
                jnp.zeros_like(dx), jnp.zeros_like(ds),
                jnp.zeros_like(dz), jnp.zeros_like(alpha),
            )
            cdx, cds, cdz, calpha = jax.lax.cond(
                shared_center,
                lambda _: centering_step(None),
                lambda _: zero_dirs,
                None,
            )
        use_c = frac == 0.0
        dx = jnp.where(use_c, cdx, dx)
        ds = jnp.where(use_c, cds, ds)
        dz = jnp.where(use_c, cdz, dz)
        alpha = jnp.where(use_c, calpha, alpha * frac)
    else:
        dx, ds, dz, alpha = jax.lax.cond(
            frac == 0.0, centering_step, mehrotra_step, None
        )

    if params.record_diag:
        detprod = cones.soc_residual(s) * cones.soc_residual(z)
        f1d, f2d, f3d = _newton_resid(rx, rz, d_comb, dx, ds, dz)
        diag = jnp.stack(
            [
                alpha,
                frac,
                sigma,
                jnp.maximum(gap_a, 0.0) / gap,
                jnp.min(detprod) / jnp.maximum(mu**2, jnp.finfo(dtype).tiny),
                jnp.where(frac == 0.0, 1.0, 0.0).astype(dtype),
                alpha_pre,
                jnp.linalg.norm(f1d)
                + jnp.linalg.norm(f2d)
                + jnp.linalg.norm(f3d),
            ]
        ).astype(dtype)
    else:
        diag = jnp.zeros((8,), dtype=dtype)

    x_new = x + alpha * dx
    s_new = s + alpha * ds
    z_new = z + alpha * dz

    finite = (
        jnp.all(jnp.isfinite(x_new))
        & jnp.all(jnp.isfinite(s_new))
        & jnp.all(jnp.isfinite(z_new))
    )
    x_new = jnp.where(finite, x_new, x)
    s_new = jnp.where(finite, s_new, s)
    z_new = jnp.where(finite, z_new, z)
    status = jnp.where(finite, st.status, NUMERICAL_ERROR)

    return st._replace(
        x=x_new, s=s_new, z=z_new, it=st.it + 1, status=status, diag=diag
    )


def _initial_point(backend, problem: ConicProblem, state_ops,
                   params: IPMParams):
    """CVXOPT-coneqp-style start: solve the W=I KKT system, then shift s, z
    to the cone interior."""
    dtype = state_ops.q.dtype
    N, k = problem.num_cones, problem.k
    eyes = jnp.broadcast_to(jnp.eye(k, dtype=dtype), (N, k, k))
    factors0 = backend.factor(problem, state_ops, eyes, params)
    rhs0 = -state_ops.q + backend.GT(problem, state_ops, problem.cone_h)
    pin_contrib = backend.P_matvec(state_ops, state_ops.xpin) + backend.GT(
        problem, state_ops, backend.G(problem, state_ops, state_ops.xpin)
    )
    dx0 = backend.solve(
        problem, state_ops, factors0,
        state_ops.mask * (rhs0 - pin_contrib), params,
    )
    x0 = state_ops.xpin + dx0
    z_raw = backend.G(problem, state_ops, x0) - problem.cone_h
    s0 = cones.shift_to_interior(-z_raw)
    z0 = cones.shift_to_interior(z_raw)
    return x0, s0, z0


def _degenerate_no_cones(backend, problem, state_ops, params):
    """No cones: an equality-pinned unconstrained QP, one factor+solve."""
    N, k = problem.num_cones, problem.k
    eyes = jnp.zeros((N, k, k), dtype=state_ops.q.dtype)
    factors = backend.factor(problem, state_ops, eyes, params)
    x = state_ops.xpin + backend.solve(
        problem, state_ops, factors,
        state_ops.mask * (
            -(state_ops.q) - backend.P_matvec(state_ops, state_ops.xpin)
        ),
        params,
    )
    zero = jnp.zeros((0, problem.k), dtype=x.dtype)
    pobj = 0.5 * x @ backend.P_matvec(state_ops, x) + state_ops.q @ x
    return IPMResult(
        x=x, s=zero, z=zero,
        iterations=jnp.asarray(0),
        status=jnp.asarray(OPTIMAL),
        pobj=pobj + state_ops.const,
        gap=jnp.asarray(0.0, x.dtype),
        pres=jnp.asarray(0.0, x.dtype),
        dres=jnp.asarray(0.0, x.dtype),
    )


def _finalize(backend, problem, state_ops, params, state: _State) -> IPMResult:
    # Evaluate on the BEST iterate seen (and fold in the final iterate in
    # case the loop exited before bookkeeping saw it).
    okf, badf, presf, dresf, gapf, pqf = _convergence(
        backend, problem, state_ops, params, state.x, state.s, state.z
    )
    final_better = (
        _metric(presf, dresf, gapf, pqf + state_ops.const) < state.best_metric
    )
    x = jnp.where(final_better, state.x, state.best_x)
    s = jnp.where(final_better, state.s, state.best_s)
    z = jnp.where(final_better, state.z, state.best_z)
    ok, bad, pres, dres, gap, pq = _convergence(
        backend, problem, state_ops, params, x, s, z
    )
    relgap = gap / jnp.maximum(1.0, jnp.abs(pq + state_ops.const))
    ok_reduced = (
        (pres < params.tol_feas_reduced)
        & (dres < params.tol_feas_reduced)
        & ((gap < params.tol_gap_reduced) | (relgap < params.tol_gap_reduced))
        & jnp.isfinite(gap)
    )
    status = jnp.where(
        ok,
        OPTIMAL,
        jnp.where(
            ok_reduced,
            OPTIMAL_INACCURATE,
            jnp.where(
                state.status == NUMERICAL_ERROR,
                NUMERICAL_ERROR,
                jnp.where(bad, NUMERICAL_ERROR, MAX_ITER),
            ),
        ),
    )
    # infeasibility certificates take precedence (the "best iterate" of a
    # diverging problem never meets the optimality tests anyway)
    status = jnp.where(
        (state.status == PRIMAL_INFEASIBLE)
        | (state.status == DUAL_INFEASIBLE),
        state.status,
        status,
    )
    return IPMResult(
        x=x, s=s, z=z,
        iterations=state.it, status=status,
        pobj=pq + state_ops.const, gap=gap, pres=pres, dres=dres,
    )


@partial(jax.jit, static_argnames=("params", "backend"))
def solve_conic(
    problem: ConicProblem,
    params: IPMParams = IPMParams(),
    backend=DenseBackend,
    backend_aux=None,
    warm_start=None,
    prepared=None,
) -> IPMResult:
    """Solve a ConicProblem. Fully jit-compiled; early-exits on
    convergence via `lax.while_loop` (use :func:`solve_conic_fixed` under
    vmap). ``backend_aux`` carries backend-specific static structure (e.g.
    the chain-arrow layout). ``warm_start`` may be an (x, s, z) triple —
    e.g. a checkpointed `IPMResult`'s iterate — used instead of the
    cold-start heuristic (s/z are shifted to the cone interior).
    ``prepared`` may carry a precomputed ``backend.prepare(problem,
    backend_aux)`` state: prepare is W-independent (pure problem
    assembly — it contains the backend's only scatters), so callers that
    solve the same graph repeatedly (the api.py assembly cache, Monte-
    Carlo re-solves, refinement loops) hoist it out of the per-solve
    graph."""
    state_ops = (
        prepared if prepared is not None
        else backend.prepare(problem, backend_aux)
    )

    if problem.num_cones == 0:
        return _degenerate_no_cones(backend, problem, state_ops, params)

    st0 = _make_initial_state(backend, problem, state_ops, params, warm_start)

    st = jax.lax.while_loop(
        lambda s: (s.status == RUNNING) & (s.it < params.max_iter),
        lambda s: _advance(backend, problem, state_ops, params, s),
        st0,
    )
    return _finalize(backend, problem, state_ops, params, st)


def _make_initial_state(backend, problem, state_ops, params,
                        warm_start=None) -> _State:
    if warm_start is not None:
        x0, s0, z0 = warm_start
        s0 = cones.shift_to_interior(s0)
        z0 = cones.shift_to_interior(z0)
    else:
        x0, s0, z0 = _initial_point(backend, problem, state_ops, params)
    inf = jnp.asarray(jnp.inf, dtype=x0.dtype)
    return _State(
        x=x0, s=s0, z=z0, it=jnp.asarray(0), status=jnp.asarray(RUNNING),
        best_x=x0, best_s=s0, best_z=z0, best_metric=inf,
        stall=jnp.asarray(0), diag=jnp.zeros((8,), dtype=x0.dtype),
    )


def _scan_solve(backend, problem, params, num_iters, record_iterates,
                backend_aux=None, record_metrics=False, warm_start=None,
                prepared=None):
    state_ops = (
        prepared if prepared is not None
        else backend.prepare(problem, backend_aux)
    )
    st0 = _make_initial_state(backend, problem, state_ops, params, warm_start)

    def scan_body(st, _):
        if params.branchless:
            # _advance's internal terminal select already freezes
            # finished lanes (branchless mode exists so no cond wraps
            # the backend's custom_vmap'd Pallas calls)
            new_st = _advance(backend, problem, state_ops, params, st)
        else:
            new_st = jax.lax.cond(
                (st.status == RUNNING),
                lambda s: _advance(backend, problem, state_ops, params, s),
                lambda s: s,
                st,
            )
        out = None
        if record_iterates:
            out = (new_st.x, _metrics5(new_st))
        elif record_metrics:
            out = jnp.concatenate([_metrics5(new_st), new_st.diag])
        return new_st, out

    def _metrics5(s):
        ok, bad, pres, dres, gap, pq = _convergence(
            backend, problem, state_ops, params, s.x, s.s, s.z
        )
        return jnp.stack(
            [pres, dres, gap, pq + state_ops.const,
             s.status.astype(pres.dtype)]
        )

    st, xs = jax.lax.scan(scan_body, st0, None, length=num_iters)
    result = _finalize(backend, problem, state_ops, params, st)
    if record_iterates:
        xs, ms = xs
        xs = jnp.concatenate([st0.x[None], xs], axis=0)
        ms = jnp.concatenate([_metrics5(st0)[None], ms], axis=0)
        return result, xs, ms
    return result, xs


@partial(jax.jit, static_argnames=("params", "num_iters", "backend"))
def solve_conic_fixed(
    problem: ConicProblem,
    params: IPMParams = IPMParams(),
    num_iters: int = 50,
    backend=DenseBackend,
    backend_aux=None,
) -> IPMResult:
    """Fixed-trip-count variant with convergence gating via `lax.cond` —
    the vmap-safe form for batched solves (a vmapped `while_loop` would keep
    applying the body to already-converged lanes; here they freeze)."""
    state_ops = backend.prepare(problem, backend_aux)
    if problem.num_cones == 0:
        return _degenerate_no_cones(backend, problem, state_ops, params)
    result, _ = _scan_solve(backend, problem, params, num_iters, False,
                            backend_aux)
    return result


@partial(jax.jit, static_argnames=("params", "num_iters", "backend"))
def solve_conic_traced(
    problem: ConicProblem,
    params: IPMParams = IPMParams(),
    num_iters: int = 50,
    backend=DenseBackend,
    backend_aux=None,
) -> Tuple[IPMResult, jnp.ndarray]:
    """Solve while recording per-iteration telemetry. Returns
    (result, metrics) with metrics of shape (num_iters, 13):
    [pres, dres, gap, pobj, status] after each iteration, followed by the
    step diagnostics [alpha, nbhd_frac, sigma, gap_affine/gap,
    min_detprod/mu^2, centering_flag, alpha_pre_nbhd, newton_resid] —
    the observability hook for convergence monitoring (SURVEY.md §5)."""
    params = dataclasses.replace(params, record_diag=True)
    return _scan_solve(
        backend, problem, params, num_iters, False, backend_aux,
        record_metrics=True,
    )


@partial(jax.jit, static_argnames=("params", "num_iters", "backend"))
def solve_conic_with_iterates(
    problem: ConicProblem,
    params: IPMParams = IPMParams(),
    num_iters: int = 50,
    backend=DenseBackend,
    backend_aux=None,
    warm_start=None,
    prepared=None,
) -> Tuple[IPMResult, jnp.ndarray, jnp.ndarray]:
    """Like :func:`solve_conic` but records x after every iteration
    (parity with the reference's BarIterLimit iterate sweep,
    solve_score.py:89-116 — here a single scan, not N re-solves).

    Returns (result, xs, metrics): xs of shape (num_iters + 1, n) —
    iterations after convergence repeat the converged x — and metrics of
    shape (num_iters + 1, 5) holding [pres, dres, gap, pobj, status] at
    each snapshot (the per-iterate objectives the reference's sweep
    reports through each re-solve's SolverResults, solve_score.py:111-114).
    """
    return _scan_solve(backend, problem, params, num_iters, True, backend_aux,
                       warm_start=warm_start, prepared=prepared)
