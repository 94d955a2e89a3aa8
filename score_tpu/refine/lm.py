"""Matrix-free Levenberg-Marquardt refinement of range-aided SLAM.

The TPU-native replacement for the GTSAM refinement stage the reference
README prescribes downstream of SCORE (/root/reference/README.md:57-63):
given a factor graph and the rounded initialization from ``solve_score``,
minimize the TRUE nonlinear maximum-likelihood objective

    sum_e  tau_e ||R_j - R_i R_e||_F^2 + k_e ||t_j - t_i - R_i t_e||^2
  + sum_m  p_m (||t_a - t_b|| - d_m)^2
  + sum_q  p_q ||l_q - v_q||^2

over poses on SE(d) (rotations updated multiplicatively through the
exponential map) and landmark positions.

TPU-first design: the whole solve is ONE jit-compiled ``lax.while_loop``;
each outer iteration linearizes the residual at the current manifold
point with ``jax.linearize`` (tangent space = one flat vector), solves
the damped normal equations (J'J + lambda I) dx = -J'r matrix-free with
a fixed-trip conjugate-gradient ``lax.scan`` (J and J' applied as
jvp/transpose products — no Jacobian is ever materialized), and accepts
or rejects the retracted trial point with standard LM lambda adaptation.
Static shapes throughout; composes with ``jax.vmap`` for batched
refinement of Monte-Carlo trials.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from score_tpu.fg.factor_graph import FactorGraphData
from score_tpu.fg.solver_utils import VariableValues

__all__ = ["RefineParams", "RefineResult", "refine_solution"]


@dataclasses.dataclass(frozen=True)
class RefineParams:
    max_iter: int = 60
    cg_iters: int = 60
    lm_lambda0: float = 1e-4
    lambda_up: float = 4.0
    lambda_down: float = 3.0
    # stop when an accepted step improves the cost by less than this
    # relative amount this many times in a row
    tol_rel_decrease: float = 1e-9
    stall_limit: int = 3
    # gauge: freeze the first pose (parity with the relaxation's pin)
    pin_first_pose: bool = True
    # Robust loss on RANGE residuals (the GOATS data carries gross range
    # outliers, to -210 m — pure least squares lets each one pull the
    # trajectory with unbounded influence):
    #   "none"  — plain least squares (reference-pipeline parity)
    #   "huber" — linear tail beyond robust_delta (whitened sigmas)
    #   "gm"    — Geman-McClure with GNC continuation (gross outliers
    #             get asymptotically ZERO influence; mu halves from a
    #             residual-scaled start toward 1, Yang et al.-style)
    # Implemented as iteratively-reweighted LM: per-iteration weights
    # sqrt(rho'(r)) frozen through each linearization (Ceres-style),
    # accept/reject on the consistently-weighted cost.
    robust: str = "none"
    robust_delta: float = 3.0  # kernel width in whitened-residual units
    gnc_init_factor: float = 64.0  # gm: mu0 = this (quadratic-ish start)
    # Plain least-squares iterations before the robust weights switch on.
    # At a poor initialization the residuals are dominated by trajectory
    # error, not measurement error, and immediate robustification
    # down-weights the genuinely informative measurements and locks the
    # bad init in (measured on GOATS: ATE 38 m robust-from-init vs
    # 19.7 m with an LS warmup then huber). Ignored when robust="none".
    robust_warmup_iters: int = 0


class RefineResult(NamedTuple):
    values: VariableValues
    initial_cost: float
    cost: float
    iterations: int


def _exp_so2(theta):
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.stack(
        [jnp.stack([c, -s], -1), jnp.stack([s, c], -1)], -2
    )


def _exp_so3(w):
    """Rodrigues with a series-safe small angle branch; w (..., 3)."""
    th2 = jnp.sum(w * w, axis=-1, keepdims=True)[..., None]
    th = jnp.sqrt(th2 + 1e-32)
    zero = jnp.zeros_like(w[..., 0])
    wx = jnp.stack(
        [
            jnp.stack([zero, -w[..., 2], w[..., 1]], -1),
            jnp.stack([w[..., 2], zero, -w[..., 0]], -1),
            jnp.stack([-w[..., 1], w[..., 0], zero], -1),
        ],
        -2,
    )
    small = th2 < 1e-12
    A = jnp.where(small, 1.0 - th2 / 6.0, jnp.sin(th) / th)
    B = jnp.where(small, 0.5 - th2 / 24.0, (1.0 - jnp.cos(th)) / th2)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), wx.shape)
    return eye + A * wx + B * (wx @ wx)


class _Graph(NamedTuple):
    """Static index arrays + measurement numerics (host-compiled once)."""

    d: int
    P: int
    L: int
    rdim: int
    edge_i: jnp.ndarray  # (E,)
    edge_j: jnp.ndarray
    edge_R: jnp.ndarray  # (E, d, d)
    edge_t: jnp.ndarray  # (E, d)
    edge_sqrt_tau: jnp.ndarray  # (E,)
    edge_sqrt_k: jnp.ndarray
    rng_a: jnp.ndarray  # (M,) index into [pose translations | landmarks]
    rng_b: jnp.ndarray
    rng_d: jnp.ndarray
    rng_sqrt_p: jnp.ndarray
    prior_l: jnp.ndarray  # (Q,)
    prior_v: jnp.ndarray  # (Q, d)
    prior_sqrt_p: jnp.ndarray


def _compile_graph(fg: FactorGraphData) -> Tuple[_Graph, Tuple[str, ...], Tuple[str, ...]]:
    d = fg.dimension
    pose_names = tuple(p.name for chain in fg.pose_variables for p in chain)
    lm_names = tuple(l.name for l in fg.landmark_variables)
    pidx = {n: i for i, n in enumerate(pose_names)}
    lidx = {n: i for i, n in enumerate(lm_names)}
    P, L = len(pose_names), len(lm_names)

    meas = [m for chain in fg.odom_measurements for m in chain]
    meas += list(fg.loop_closure_measurements)
    E = len(meas)
    edge_i = np.zeros(E, np.int32)
    edge_j = np.zeros(E, np.int32)
    edge_R = np.zeros((E, d, d))
    edge_t = np.zeros((E, d))
    st = np.zeros(E)
    sk = np.zeros(E)
    for e, m in enumerate(meas):
        edge_i[e] = pidx[m.base_pose]
        edge_j[e] = pidx[m.to_pose]
        edge_R[e] = np.asarray(m.rotation_matrix)
        edge_t[e] = np.asarray(m.translation_vector)
        st[e] = np.sqrt(m.rotation_precision)
        sk[e] = np.sqrt(m.translation_precision)

    M = len(fg.range_measurements)
    ra = np.zeros(M, np.int32)
    rb = np.zeros(M, np.int32)
    rd = np.zeros(M)
    rp = np.zeros(M)

    def tr_index(name):
        return pidx[name] if name in pidx else P + lidx[name]

    for m_, r in enumerate(fg.range_measurements):
        ra[m_] = tr_index(r.first_key)
        rb[m_] = tr_index(r.second_key)
        rd[m_] = r.dist
        rp[m_] = np.sqrt(r.precision)

    Q = len(fg.landmark_priors)
    pl_ = np.zeros(Q, np.int32)
    pv = np.zeros((Q, d))
    pp = np.zeros(Q)
    for q, pr in enumerate(fg.landmark_priors):
        pl_[q] = lidx[pr.name]
        pv[q] = np.asarray(pr.position, dtype=float)[:d]
        pp[q] = np.sqrt(pr.translation_precision)

    g = _Graph(
        d=d, P=P, L=L, rdim=1 if d == 2 else 3,
        edge_i=jnp.asarray(edge_i), edge_j=jnp.asarray(edge_j),
        edge_R=jnp.asarray(edge_R), edge_t=jnp.asarray(edge_t),
        edge_sqrt_tau=jnp.asarray(st), edge_sqrt_k=jnp.asarray(sk),
        rng_a=jnp.asarray(ra), rng_b=jnp.asarray(rb),
        rng_d=jnp.asarray(rd), rng_sqrt_p=jnp.asarray(rp),
        prior_l=jnp.asarray(pl_), prior_v=jnp.asarray(pv),
        prior_sqrt_p=jnp.asarray(pp),
    )
    return g, pose_names, lm_names


def _residuals(g: _Graph, R, t, l, rng_w=None):
    """Weighted residual stack at explicit (R (P,d,d), t (P,d), l (L,d)).

    ``rng_w`` (M,) multiplies the whitened range residuals — the sqrt
    robust weights of the IRLS scheme (None = plain least squares)."""
    Ri = R[g.edge_i]
    Rj = R[g.edge_j]
    rot = (Rj - Ri @ g.edge_R) * g.edge_sqrt_tau[:, None, None]
    tr = (
        t[g.edge_j] - t[g.edge_i]
        - jnp.einsum("eij,ej->ei", Ri, g.edge_t)
    ) * g.edge_sqrt_k[:, None]
    out = [rot.reshape(-1), tr.reshape(-1)]
    if g.rng_a.shape[0]:
        tall = jnp.concatenate([t, l], axis=0) if g.L else t
        diff = tall[g.rng_a] - tall[g.rng_b]
        dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-18)
        rr = (dist - g.rng_d) * g.rng_sqrt_p
        if rng_w is not None:
            rr = rr * rng_w
        out.append(rr)
    if g.prior_l.shape[0]:
        out.append(((l[g.prior_l] - g.prior_v) * g.prior_sqrt_p[:, None]).reshape(-1))
    return jnp.concatenate(out)


def _range_residuals(g: _Graph, t, l):
    """Whitened (unrobustified) range residuals, shape (M,)."""
    tall = jnp.concatenate([t, l], axis=0) if g.L else t
    diff = tall[g.rng_a] - tall[g.rng_b]
    dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-18)
    return (dist - g.rng_d) * g.rng_sqrt_p


def _robust_sqrt_weights(kind: str, r, delta: float, mu):
    """sqrt(rho'(r^2)) IRLS weights for the supported kernels."""
    r2 = r * r
    if kind == "huber":
        return jnp.sqrt(jnp.minimum(1.0, delta / jnp.maximum(jnp.abs(r), 1e-12)))
    if kind == "gm":  # GNC Geman-McClure (Yang et al. 2020 form)
        c2 = delta * delta
        return (mu * c2) / (r2 + mu * c2)
    raise ValueError(f"unknown robust kernel {kind!r}")


def _retract(g: _Graph, base, delta, mask):
    """Apply a masked tangent step to (R, t, l)."""
    R, t, l = base
    P, L, d, rdim = g.P, g.L, g.d, g.rdim
    delta = delta * mask
    dth = delta[: P * rdim].reshape(P, rdim)
    dt = delta[P * rdim : P * rdim + P * d].reshape(P, d)
    dl = delta[P * rdim + P * d :].reshape(L, d)
    dR = _exp_so2(dth[:, 0]) if d == 2 else _exp_so3(dth)
    return (R @ dR, t + dt, l + dl)


def _solve_normal_cg(jvp_fn, vjp_fn, rhs, lam, iters):
    """CG on (J'J + lam I) x = rhs, fixed trips (vmap/jit-safe)."""

    def Av(v):
        return vjp_fn(jvp_fn(v)) + lam * v

    x0 = jnp.zeros_like(rhs)
    r0 = rhs
    p0 = r0
    rs0 = r0 @ r0

    def body(carry, _):
        x, r, p, rs = carry
        Ap = Av(p)
        denom = p @ Ap
        alpha = jnp.where(denom > 0.0, rs / jnp.maximum(denom, 1e-300), 0.0)
        x = x + alpha * p
        r = r - alpha * Ap
        rs_new = r @ r
        beta = rs_new / jnp.maximum(rs, 1e-300)
        p = r + beta * p
        return (x, r, p, rs_new), None

    (x, _, _, _), _ = jax.lax.scan(body, (x0, r0, p0, rs0), None, length=iters)
    return x


def refine_solution(
    fg: FactorGraphData,
    values: VariableValues,
    params: RefineParams = RefineParams(),
) -> RefineResult:
    """Refine a SCORE initialization to the nonlinear MLE (L7 parity:
    the GTSAM stage of the reference pipeline, README.md:57-63)."""
    g, pose_names, lm_names = _compile_graph(fg)
    d = g.d

    R0 = jnp.stack(
        [jnp.asarray(values.poses[n])[:d, :d] for n in pose_names]
    )
    t0 = jnp.stack(
        [jnp.asarray(values.poses[n])[:d, d] for n in pose_names]
    )
    l0 = (
        jnp.stack([jnp.asarray(values.landmarks[n]) for n in lm_names])
        if g.L
        else jnp.zeros((0, d), dtype=R0.dtype)
    )

    n_delta = g.P * g.rdim + g.P * d + g.L * d
    mask = jnp.ones((n_delta,), dtype=R0.dtype)
    if params.pin_first_pose and g.P:
        mask = mask.at[: g.rdim].set(0.0)
        mask = mask.at[g.P * g.rdim : g.P * g.rdim + d].set(0.0)

    robust = params.robust
    have_ranges = int(np.asarray(g.rng_a.shape[0])) > 0
    use_robust = robust != "none" and have_ranges
    mu0 = float(params.gnc_init_factor) if robust == "gm" else 1.0

    warmup = int(params.robust_warmup_iters)

    @jax.jit
    def run(R0, t0, l0):
        def weights_at(base, mu, it):
            if not use_robust:
                return None
            r = _range_residuals(g, base[1], base[2])
            w = jax.lax.stop_gradient(
                _robust_sqrt_weights(robust, r, params.robust_delta, mu)
            )
            return jnp.where(it < warmup, jnp.ones_like(w), w)

        def cost_of(base, w):
            r = _residuals(g, *base, rng_w=w)
            return r @ r

        def body(carry):
            base, lam, cost, it, stall, mu = carry
            w = weights_at(base, mu, it)
            # reference cost under THIS iteration's weights (IRLS: the
            # carried cost was measured under stale weights)
            cost_w = cost_of(base, w)

            def r_of_delta(delta):
                return _residuals(g, *_retract(g, base, delta, mask), rng_w=w)

            zero = jnp.zeros((n_delta,), dtype=t0.dtype)
            r0_, jvp_fn = jax.linearize(r_of_delta, zero)
            vjp_fn = jax.linear_transpose(jvp_fn, zero)

            def vjp1(y):
                (out,) = vjp_fn(y)
                return out

            rhs = -vjp1(r0_)
            step = _solve_normal_cg(jvp_fn, vjp1, rhs, lam, params.cg_iters)
            trial = _retract(g, base, step, mask)
            new_cost = cost_of(trial, w)
            accept = new_cost < cost_w
            rel_impr = (cost_w - new_cost) / jnp.maximum(cost_w, 1e-300)
            base = jax.tree_util.tree_map(
                lambda a, b: jnp.where(accept, b, a), base, trial
            )
            lam = jnp.where(
                accept, lam / params.lambda_down, lam * params.lambda_up
            )
            lam = jnp.clip(lam, 1e-12, 1e12)
            cost = jnp.where(accept, new_cost, cost_w)
            # GNC continuation: halve mu toward 1 (quadratic -> GM) once
            # the warmup is over; stalling only counts after warmup AND
            # once the continuation has landed
            if robust == "gm":
                mu_next = jnp.where(
                    it >= warmup, jnp.maximum(1.0, mu * 0.5), mu
                )
            else:
                mu_next = mu
            settled = (mu <= 1.0 + 1e-9) & (it >= warmup)
            stall = jnp.where(
                (accept & (rel_impr > params.tol_rel_decrease)) | ~settled,
                0,
                stall + 1,
            )
            return (base, lam, cost, it + 1, stall, mu_next)

        def cond(carry):
            _, _, _, it, stall, _ = carry
            return (it < params.max_iter) & (stall < params.stall_limit)

        base0 = (R0, t0, l0)
        mu0j = jnp.asarray(mu0, dtype=t0.dtype)
        c0 = cost_of(base0, weights_at(base0, mu0j, jnp.asarray(warmup)))
        lam0 = jnp.asarray(params.lm_lambda0, dtype=t0.dtype)
        base, lam, cost, it, _, mu_f = jax.lax.while_loop(
            cond, body,
            (base0, lam0, c0, jnp.asarray(0), jnp.asarray(0), mu0j),
        )
        final_cost = cost_of(base, weights_at(base, mu_f, it))
        return base, c0, final_cost, it

    (Rf, tf_, lf), c0, cost, it = run(R0, t0, l0)

    Rf_np, tf_np, lf_np = np.asarray(Rf), np.asarray(tf_), np.asarray(lf)
    poses = {}
    for i, n in enumerate(pose_names):
        T = np.eye(d + 1)
        T[:d, :d] = Rf_np[i]
        T[:d, d] = tf_np[i]
        poses[n] = T
    landmarks = {n: lf_np[i] for i, n in enumerate(lm_names)}
    out = VariableValues(
        dim=d, poses=poses, landmarks=landmarks,
        distances=dict(values.distances),
    )
    return RefineResult(
        values=out,
        initial_cost=float(c0),
        cost=float(cost),
        iterations=int(it),
    )
