"""Jitted robust SE(3) pose-graph optimizer: GNC-TLS around LM + block-PCG.

From-scratch replacement for the reference's GTSAM back end
(``GncOptimizer<GncParams<LevenbergMarquardtParams>>`` at
``src/back_end/decentralized_pgo.cpp:796-856``), designed TPU-first:

- residuals/Jacobians are *batched over edges* (vmap of a forward-mode
  ``jacfwd`` through ``between``/``log`` at the identity chart — exact
  Jacobians without hand-derived formulas),
- the normal equations are never materialized: PCG runs on an implicit
  Hessian whose matvec is two batched ``[E, 6, 6] @ [E, 6]`` products plus
  scatter-adds — static shapes, no sparsity bookkeeping,
- block-Jacobi preconditioning from the ``[N, 6, 6]`` Hessian diagonal,
- Levenberg-Marquardt damping with accept/reject, all inside a single
  ``lax.while_loop`` so one optimize() is one device dispatch,
- GNC-TLS outer loop (Yang et al., arXiv:1909.08605 — the same scheme GTSAM
  implements) reweighting the robustified edges; odometry and the gauge
  prior stay weight-1, loop closures are robust by default.

Divergence from GTSAM worth knowing: GTSAM's default GNC robustifies every
factor; we robustify only edges flagged ``robust`` (loop closures), which is
the standard practice and avoids the degenerate case where GNC disables the
odometry chain itself.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from cslam_tpu.ops import highest_precision, se3
from cslam_tpu.pgo.factor_graph import PoseGraphArrays


# ---------------------------------------------------------------------------
# Residuals and linearization
# ---------------------------------------------------------------------------


def _whitened_edge_residual(xi12: jax.Array, Xi: jax.Array, Xj: jax.Array,
                            Z: jax.Array, sqrt_info: jax.Array) -> jax.Array:
    """r = sqrt_info * Log(Z^-1 (Xi Exp(xi_i))^-1 (Xj Exp(xi_j))), [6]."""
    Xi_p = se3.retract(Xi, xi12[:6])
    Xj_p = se3.retract(Xj, xi12[6:])
    return se3.log(se3.between(Z, se3.between(Xi_p, Xj_p))) * sqrt_info


def edge_residuals(poses: jax.Array, g: PoseGraphArrays) -> jax.Array:
    """Whitened residuals of all (padded) edges: ``[Ne, 6]``."""
    Xi = poses[g.edge_i]
    Xj = poses[g.edge_j]
    r = jax.vmap(_whitened_edge_residual, in_axes=(None, 0, 0, 0, 0))(
        jnp.zeros(12, poses.dtype), Xi, Xj, g.meas, g.sqrt_info)
    return r * g.edge_valid[:, None]


def _prior_residual(xi: jax.Array, X: jax.Array, target: jax.Array,
                    sqrt_info: jax.Array) -> jax.Array:
    """r = sqrt_info * Log(target^-1 (X Exp(xi))), [6]."""
    return se3.log(se3.between(target, se3.retract(X, xi))) * sqrt_info


def prior_residuals(poses: jax.Array, g: PoseGraphArrays) -> jax.Array:
    """Whitened residuals of all (padded) pose priors: ``[B, 6]``."""
    r = jax.vmap(_prior_residual, in_axes=(None, 0, 0, 0))(
        jnp.zeros(6, poses.dtype), poses[g.prior_idx], g.prior_pose,
        g.prior_sqrt_info)
    return r * g.prior_valid[:, None]


def cost(poses: jax.Array, g: PoseGraphArrays,
         weights: jax.Array) -> jax.Array:
    """0.5 * sum of weighted squared whitened residuals (+ priors)."""
    r = edge_residuals(poses, g)
    rp = prior_residuals(poses, g)
    return 0.5 * (jnp.sum(weights[:, None] * r * r) + jnp.sum(rp * rp))


def _linearize(poses: jax.Array, g: PoseGraphArrays):
    """Batched residuals + exact ANALYTIC Jacobians at the current estimate.

    Returns (r [Ne,6], Ji [Ne,6,6], Jj [Ne,6,6], rp [B,6], Jp [B,6,6]).

    With right perturbations X -> X Exp(xi) and raw residual
    ``e = Log(Z^-1 Xi^-1 Xj)``:

        de/dxi_j = Jr_inv(e)                      (inverse right Jacobian)
        de/dxi_i = -Jr_inv(e) Ad(Xj^-1 Xi)

    then every row is scaled by the diagonal sqrt information. The closed
    forms replace the vmapped ``jax.jacfwd`` through exp/log used
    previously — equality is asserted against that jacfwd oracle in
    tests/test_pgo.py (TestAnalyticJacobians).
    """
    Xi = poses[g.edge_i]
    Xj = poses[g.edge_j]
    E = se3.inverse(g.meas) @ se3.inverse(Xi) @ Xj
    r_raw = se3.log(E)
    Jr_inv = se3.se3_jr_inv(r_raw)
    Jj = g.sqrt_info[:, :, None] * Jr_inv
    Ad = se3.adjoint(se3.inverse(Xj) @ Xi)
    Ji = -(Jj @ Ad)
    r = (r_raw * g.sqrt_info) * g.edge_valid[:, None]
    Ji = Ji * g.edge_valid[:, None, None]
    Jj = Jj * g.edge_valid[:, None, None]

    Xp = poses[g.prior_idx]
    rp_raw = se3.log(se3.inverse(g.prior_pose) @ Xp)
    Jp = g.prior_sqrt_info[:, :, None] * se3.se3_jr_inv(rp_raw)
    rp = (rp_raw * g.prior_sqrt_info) * g.prior_valid[:, None]
    Jp = Jp * g.prior_valid[:, None, None]
    return r, Ji, Jj, rp, Jp


def _linearize_jacfwd(poses: jax.Array, g: PoseGraphArrays):
    """jacfwd-based linearization, kept as the differential oracle for the
    analytic Jacobians above (and as a fallback reference)."""
    Xi = poses[g.edge_i]
    Xj = poses[g.edge_j]
    zero12 = jnp.zeros(12, poses.dtype)

    def res_and_jac(Xi_, Xj_, Z_, si_):
        r = _whitened_edge_residual(zero12, Xi_, Xj_, Z_, si_)
        J = jax.jacfwd(_whitened_edge_residual)(zero12, Xi_, Xj_, Z_, si_)
        return r, J

    r, J = jax.vmap(res_and_jac)(Xi, Xj, g.meas, g.sqrt_info)
    r = r * g.edge_valid[:, None]
    J = J * g.edge_valid[:, None, None]
    Ji, Jj = J[:, :, :6], J[:, :, 6:]

    zero6 = jnp.zeros(6, poses.dtype)

    def prior_res_and_jac(X_, target_, si_):
        rp = _prior_residual(zero6, X_, target_, si_)
        Jp = jax.jacfwd(_prior_residual)(zero6, X_, target_, si_)
        return rp, Jp

    rp, Jp = jax.vmap(prior_res_and_jac)(poses[g.prior_idx], g.prior_pose,
                                         g.prior_sqrt_info)
    rp = rp * g.prior_valid[:, None]
    Jp = Jp * g.prior_valid[:, None, None]
    return r, Ji, Jj, rp, Jp


# ---------------------------------------------------------------------------
# Implicit-Hessian PCG
# ---------------------------------------------------------------------------


def _one_hots(g, dtype):
    """Edge/prior selection matrices for scatter-free assembly.

    TPU scatter-adds with potentially-colliding indices lower to a
    serialized per-index loop — profiled at ~3.5 ms for the 512-node
    tier's five Hessian scatters, dominating the dense solve. The same
    segment sums as one-hot matmuls ride the MXU in ~0.4 ms.
    """
    Np = g.num_nodes
    Si = jax.nn.one_hot(g.edge_i, Np, dtype=dtype)
    Sj = jax.nn.one_hot(g.edge_j, Np, dtype=dtype)
    Sp = jax.nn.one_hot(g.prior_idx, Np, dtype=dtype)
    return Si, Sj, Sp


def _hessian_blocks(g, Ji, Jj, Jp, weights, one_hots=None):
    """Block-diagonal of H = J^T W J: ``[Np, 6, 6]`` (scatter-free)."""
    w = (weights * g.edge_valid)[:, None, None]
    Si, Sj, Sp = one_hots if one_hots is not None else _one_hots(g, Ji.dtype)
    JiT_Ji = jnp.einsum("eki,ekj->eij", Ji, Ji) * w
    JjT_Jj = jnp.einsum("eki,ekj->eij", Jj, Jj) * w
    D = (jnp.einsum("en,eij->nij", Si, JiT_Ji)
         + jnp.einsum("en,eij->nij", Sj, JjT_Jj)
         + jnp.einsum("bn,bij->nij", Sp,
                      jnp.einsum("bki,bkj->bij", Jp, Jp)))
    # identity on padded nodes keeps them inert and invertible
    D = D + (1.0 - g.node_valid)[:, None, None] * jnp.eye(6, dtype=Ji.dtype)
    return D


def _assemble_grad(g, Ji, Jj, Jp, rw, rp, one_hots):
    """grad = J^T W r via one-hot matmuls: ``[Np, 6]`` (scatter-free)."""
    Si, Sj, Sp = one_hots
    grad = (jnp.einsum("en,ei->ni", Si,
                       jnp.einsum("eij,ei->ej", Ji, rw))
            + jnp.einsum("en,ei->ni", Sj,
                         jnp.einsum("eij,ei->ej", Jj, rw))
            + jnp.einsum("bn,bi->ni", Sp,
                         jnp.einsum("bij,bi->bj", Jp, rp)))
    return grad * g.node_valid[:, None]


def _make_matvec(g, Ji, Jj, Jp, weights, lam, diag_h, one_hots=None):
    """x -> (H + lam*diag(H)) x with H applied edge-wise (never formed)."""
    w = weights * g.edge_valid
    Si, Sj, Sp = one_hots if one_hots is not None else _one_hots(g, Ji.dtype)

    def matvec(x):
        ai = jnp.einsum("eij,ej->ei", Ji, x[g.edge_i])
        aj = jnp.einsum("eij,ej->ei", Jj, x[g.edge_j])
        aw = (ai + aj) * w[:, None]
        y = (jnp.einsum("en,ej->nj", Si,
                        jnp.einsum("eij,ei->ej", Ji, aw))
             + jnp.einsum("en,ej->nj", Sj,
                          jnp.einsum("eij,ei->ej", Jj, aw)))
        ap = jnp.einsum("bij,bj->bi", Jp, x[g.prior_idx])
        y = y + jnp.einsum("bn,bj->nj", Sp,
                           jnp.einsum("bij,bi->bj", Jp, ap))
        y = y + lam * diag_h * x
        # keep padded nodes at identity so PCG stays well-posed
        return y * g.node_valid[:, None] + x * (1.0 - g.node_valid)[:, None]

    return matvec


_DENSE_SOLVE_MAX_NODES = 512  # below this, one Cholesky beats iterative PCG
_DEMASK_IRLS_MAX = 4          # GM de-masking IRLS iteration cap


def _dense_normal_solve(g, Ji, Jj, Jp, weights, lam, diag_h, grad,
                        one_hots=None, D_blocks=None):
    """Solve (H + lam*diag(H)) delta = -grad by dense Cholesky.

    For small padded graphs the full Hessian is a ``[6Np, 6Np]`` matrix that
    the MXU factorizes quickly — far cheaper than a latency-bound PCG
    while_loop of tiny ops. Assembly is entirely scatter-free: diagonal
    blocks come from `_hessian_blocks`-style segment matmuls, off-diagonal
    blocks from one-hot einsums emitted DIRECTLY in ``[Np, 6, Np, 6]``
    layout (no [Np, Np, 6, 6] transpose), and the block diagonal is placed
    with an identity-mask broadcast. Profiled on the 512-node tier: the
    previous five scatter-adds cost ~3.5 ms/solve (TPU scatters serialize
    per index); this form runs the same assembly in ~0.4 ms, halving the
    GNC graduation round.
    """
    Np = g.num_nodes
    dtype = Ji.dtype
    w3 = (weights * g.edge_valid)[:, None, None]
    Si, Sj, Sp = one_hots if one_hots is not None else _one_hots(g, dtype)
    JiT_Jj = jnp.einsum("eki,ekj->eij", Ji, Jj) * w3
    # off-diagonal blocks, direct [n, a, m, b] layout
    Ho = jnp.einsum("en,eamb->namb", Si,
                    jnp.einsum("eab,em->eamb", JiT_Jj, Sj))
    Ho = Ho + jnp.einsum("en,eamb->namb", Sj,
                         jnp.einsum("eba,em->eamb", JiT_Jj, Si))
    # block diagonal (edge + prior terms, damping, padded-node identity);
    # both callers already assembled these blocks via _hessian_blocks for
    # the damping diagonal — reuse them instead of re-running the segment
    # matmuls every LM iteration
    eye6 = jnp.eye(6, dtype=dtype)
    if D_blocks is not None:
        # _hessian_blocks already placed the padded-node identity
        D = D_blocks + lam * diag_h[:, :, None] * eye6[None]
    else:
        D = (jnp.einsum("en,eij->nij", Si,
                        jnp.einsum("eki,ekj->eij", Ji, Ji) * w3)
             + jnp.einsum("en,eij->nij", Sj,
                          jnp.einsum("eki,ekj->eij", Jj, Jj) * w3)
             + jnp.einsum("bn,bij->nij", Sp,
                          jnp.einsum("bki,bkj->bij", Jp, Jp)))
        D = (D + lam * diag_h[:, :, None] * eye6[None]
             + (1.0 - g.node_valid)[:, None, None] * eye6[None])
    eyeN = jnp.eye(Np, dtype=dtype)
    H = Ho + eyeN[:, None, :, None] * D[:, :, None, :]
    Hm = H.reshape(Np * 6, Np * 6)
    chol = jax.scipy.linalg.cho_factor(Hm, lower=True)
    delta = jax.scipy.linalg.cho_solve(chol, -grad.reshape(Np * 6))
    return delta.reshape(Np, 6)


_COARSE_SEG = 32   # nodes per segment of the two-level PCG coarse space
_USE_COARSE = True  # trace-time switch (A/B probes flip + jax.clear_caches())


def _coarse_correction(g, poses, Ji, Jj, Jp, weights, lam, diag_h):
    """Two-level (segment-rigid) coarse correction for the PCG tier.

    Block-Jacobi alone moves long-wavelength error one hop per CG
    iteration, so chains of hundreds of poses need O(diameter) iterations
    (the same diffusion limit measured for the distributed solver's block
    sweeps). The cure is the same: a coarse space of segment-rigid motions.
    One SE(3) *left* increment ``eta_s`` per contiguous ``_COARSE_SEG``-node
    segment; with the solver's right retraction ``X -> X Exp(xi)``, moving a
    whole segment by ``Exp(eta)`` on the left corresponds per node to
    ``xi_n = Ad(X_n^{-1}) eta``, so the prolongation is ``P[n] =
    Ad(X_n^{-1})`` (zeroed on padded nodes). Between-factors interior to a
    segment are exactly invariant under that motion (``Ji P_i + Jj P_j =
    0``), so the Galerkin operator ``H_c = P^T (H + lam diag H) P`` couples
    segments only through crossing edges and priors — precisely the
    long-wavelength skeleton the fine smoother cannot see. Applied
    additively with block-Jacobi: ``z = M_bj^{-1} r + P H_c^{-1} P^T r``
    (SPD, standard two-level additive Schwarz).

    Returns ``apply(r) -> z_coarse`` with the ``[6S, 6S]`` Cholesky
    factored once per LM iteration.
    """
    Np = g.num_nodes
    S = max(1, Np // _COARSE_SEG)
    dtype = Ji.dtype
    seg_of_node = jnp.minimum(jnp.arange(Np) // _COARSE_SEG, S - 1)
    A = se3.adjoint(se3.inverse(poses)) * g.node_valid[:, None, None]
    Ns = jax.nn.one_hot(seg_of_node, S, dtype=dtype)            # [Np, S]
    Ei, Ej, Ep = (Ns[g.edge_i], Ns[g.edge_j], Ns[g.prior_idx])  # [E|B, S]
    # coarse-space residual Jacobian rows, one [6, S*6] block row per edge
    Gi = Ji @ A[g.edge_i]
    Gj = Jj @ A[g.edge_j]
    w1 = (weights * g.edge_valid)[:, None, None, None]
    R = (jnp.einsum("es,eab->easb", Ei, Gi)
         + jnp.einsum("es,eab->easb", Ej, Gj)) * jnp.sqrt(w1)
    Rp = jnp.einsum("qs,qac->qasc", Ep, Jp @ A[g.prior_idx])
    Rm = R.reshape(-1, S * 6)
    Rpm = Rp.reshape(-1, S * 6)
    Hc = Rm.T @ Rm + Rpm.T @ Rpm
    # damping term P^T (lam * diag H) P lands on the block diagonal
    T = jnp.einsum("nai,na,naj->nij", A, lam * diag_h, A)
    Dc = jnp.einsum("ns,nij->sij", Ns, T)
    eyeS = jnp.eye(S, dtype=dtype)
    Hc = Hc + (eyeS[:, None, :, None]
               * Dc[:, :, None, :]).reshape(S * 6, S * 6)
    # ridge: keeps all-padded segments (zero rows) and near-singular coarse
    # blocks factorable without biasing active ones
    d = jnp.diagonal(Hc)
    ridge = 1e-7 * jnp.max(d) + 1e-12
    Hc = Hc + ridge * jnp.eye(S * 6, dtype=dtype)
    chol = jax.scipy.linalg.cho_factor(Hc, lower=True)

    def apply(r):
        c = jnp.einsum("ns,nba,nb->sa", Ns, A, r)
        y = jax.scipy.linalg.cho_solve(chol, c.reshape(S * 6))
        return jnp.einsum("ns,nab,sb->na", Ns, A, y.reshape(S, 6))

    return apply


def _pcg(matvec, b, M_inv_blocks, max_iters: int, tol: float,
         coarse_apply=None):
    """Preconditioned conjugate gradients on [Np, 6] unknowns."""

    def apply_prec(r):
        z = jnp.einsum("nij,nj->ni", M_inv_blocks, r)
        if coarse_apply is not None:
            z = z + coarse_apply(r)
        return z

    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = apply_prec(r0)
    p0 = z0
    rz0 = jnp.sum(r0 * z0)
    b_norm = jnp.maximum(jnp.sqrt(jnp.sum(b * b)), 1e-30)

    def cond(state):
        i, _, r, _, _, _ = state
        return jnp.logical_and(i < max_iters,
                               jnp.sqrt(jnp.sum(r * r)) > tol * b_norm)

    def body(state):
        i, x, r, z, p, rz = state
        Ap = matvec(p)
        alpha = rz / jnp.maximum(jnp.sum(p * Ap), 1e-30)
        x = x + alpha * p
        r = r - alpha * Ap
        z = apply_prec(r)
        rz_new = jnp.sum(r * z)
        beta = rz_new / jnp.maximum(rz, 1e-30)
        p = z + beta * p
        return i + 1, x, r, z, p, rz_new

    _, x, _, _, _, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), x0, r0, z0, p0, rz0))
    return x


# ---------------------------------------------------------------------------
# Levenberg-Marquardt
# ---------------------------------------------------------------------------


class LMResult(NamedTuple):
    poses: jax.Array
    final_cost: jax.Array
    iterations: jax.Array


@jax.jit
@highest_precision
def lm_optimize(g: PoseGraphArrays, weights: jax.Array,
                max_iters: int = 50, cg_iters: int = 150,
                init_lambda: float = 1e-4, cg_tol: float = 1e-6,
                rel_tol: float = 1e-7) -> LMResult:
    """Levenberg-Marquardt with implicit-Hessian PCG inner solves.

    One compiled dispatch per call; ``weights`` are per-edge robust weights
    (1.0 = plain least squares). Iteration caps and tolerances are traced
    operands, so ONE compile per shape tier serves every (max_iters,
    cg_iters, rel_tol) combination — this keeps GNC's warm-up to a single
    compile per tier.
    """
    poses0 = g.poses
    cost0 = cost(poses0, g, weights)

    def lm_cond(state):
        i, _, _, _, done = state
        return jnp.logical_and(i < max_iters, jnp.logical_not(done))

    def lm_body(state):
        i, poses, current_cost, lam, _ = state
        r, Ji, Jj, rp, Jp = _linearize(poses, g)
        one_hots = _one_hots(g, poses.dtype)
        w = weights * g.edge_valid
        rw = r * w[:, None]
        grad = _assemble_grad(g, Ji, Jj, Jp, rw, rp, one_hots)

        D = _hessian_blocks(g, Ji, Jj, Jp, weights, one_hots)
        diag_h = jnp.maximum(jnp.einsum("nii->ni", D), 1e-8)
        if g.num_nodes <= _DENSE_SOLVE_MAX_NODES:
            delta = _dense_normal_solve(g, Ji, Jj, Jp, weights, lam, diag_h,
                                        grad, one_hots, D_blocks=D)
        else:
            M = (D + lam * diag_h[:, None]
                 * jnp.eye(6, dtype=poses.dtype)[None])
            M_inv = jnp.linalg.inv(M)
            matvec = _make_matvec(g, Ji, Jj, Jp, weights, lam, diag_h,
                                  one_hots)
            coarse = (_coarse_correction(g, poses, Ji, Jj, Jp, weights,
                                         lam, diag_h)
                      if _USE_COARSE else None)
            delta = _pcg(matvec, -grad, M_inv, cg_iters, cg_tol, coarse)
        delta = delta * g.node_valid[:, None]

        candidate = se3.retract(poses, delta)
        new_cost = cost(candidate, g, weights)
        accept = new_cost < current_cost
        poses_next = jnp.where(accept, candidate, poses)
        cost_next = jnp.where(accept, new_cost, current_cost)
        lam_next = jnp.clip(jnp.where(accept, lam * 0.3, lam * 5.0),
                            1e-9, 1e7)
        step_small = jnp.max(jnp.abs(delta)) < 1e-7
        # converged when the cost stops moving — whether or not the step was
        # accepted (a rejected step with negligible change means the warm
        # start was already at the optimum; without this, rejected steps
        # spin until max_iters)
        converged = (jnp.abs(current_cost - new_cost)
                     < rel_tol * (current_cost + 1e-12))
        done = jnp.logical_or(step_small, converged)
        return i + 1, poses_next, cost_next, lam_next, done

    init = (jnp.int32(0), poses0, cost0, jnp.asarray(init_lambda, poses0.dtype),
            jnp.bool_(False))
    iters, poses, final_cost, _, _ = jax.lax.while_loop(lm_cond, lm_body, init)
    return LMResult(poses, final_cost, iters)


# ---------------------------------------------------------------------------
# GNC-TLS outer loop
# ---------------------------------------------------------------------------


def _edge_chi2(poses: jax.Array, g: PoseGraphArrays) -> jax.Array:
    r = edge_residuals(poses, g)
    return jnp.sum(r * r, axis=-1)


def _tls_weights(chi2: jax.Array, mu: jax.Array, barc_sq: float) -> jax.Array:
    """Closed-form GNC-TLS weight update (arXiv:1909.08605, Prop. 4)."""
    upper = (mu + 1.0) / mu * barc_sq
    lower = mu / (mu + 1.0) * barc_sq
    mid = jnp.sqrt(barc_sq * mu * (mu + 1.0)
                   / jnp.maximum(chi2, 1e-12)) - mu
    w = jnp.where(chi2 >= upper, 0.0,
                  jnp.where(chi2 <= lower, 1.0, jnp.clip(mid, 0.0, 1.0)))
    return w


class GncResult(NamedTuple):
    poses: jax.Array
    weights: jax.Array
    final_cost: jax.Array
    outer_iterations: jax.Array


@jax.jit
@highest_precision
def gnc_optimize(g: PoseGraphArrays, max_outer: int = 100,
                 lm_iters: int = 30, cg_iters: int = 150,
                 barc_sq: float = 16.81, mu_step: float = 2.0,
                 graduation_lm_iters: int = 4,
                 mu0_chi2_cap: float = 50.0) -> GncResult:
    """Graduated non-convexity (TLS) robust PGO.

    Edges with ``g.robust == 1`` are reweighted; others stay weight 1.
    ``barc_sq`` defaults to the chi-square(6) 99% quantile so nominal-noise
    inliers (E[chi2] = 6 for whitened 6-DoF residuals) keep weight 1.
    Mirrors the behavior of GTSAM's GncOptimizer used at reference
    ``decentralized_pgo.cpp:805-808``; falls back gracefully (weights all 1 =
    plain LM) when everything is an inlier.

    ``mu_step`` defaults to 2.0 rather than GTSAM's 1.4: across 20
    randomized multi-loop/outlier scenarios plus the 500-pose benchmark
    graph, 2.0 produced bit-identical ATE, outlier rejection and
    false-rejection counts with 30-45% fewer graduation rounds (2.8 was
    too aggressive — one false rejection). Set
    ``backend.gnc_mu_step: 1.4`` to restore the GTSAM schedule.

    Wall-clock design: each graduation step runs a short warm-started LM
    (``graduation_lm_iters``; do NOT lower the default 4 — 3 measured
    bit-identical quality at 21% less wall-clock on 20 randomized
    scenarios up to ~550 poses, but on a 2048-pose 8-robot graph it
    degraded ATE 0.154 -> 0.237 m and falsely rejected a genuine loop
    closure; the short inner solves under-track graduation on large
    graphs), only the final weights get the full LM polish; and
    ``mu0`` is initialized from chi2 capped at ``mu0_chi2_cap * barc_sq``
    instead of the raw maximum — gross outliers beyond the cap start at
    weight 0 immediately (they need no graduation), which bounds the
    outer-iteration count regardless of outlier magnitude.
    """
    ones = jnp.ones(g.num_edges, g.poses.dtype)
    # initial solve: moderate tolerance — GNC refines it anyway
    res0_poses = lm_optimize(g, ones, max_iters=lm_iters,
                             cg_iters=cg_iters, rel_tol=1e-5).poses
    chi2 = _edge_chi2(res0_poses, g)
    robust_mask = g.robust * g.edge_valid > 0

    # De-masking IRLS: the unweighted init ACCOMMODATES gross outliers —
    # they drag the solution toward themselves, so at the init solution
    # their own chi2 hides among the genuine loops they inflated (measured
    # on an 8x256 graph: outlier chi2 335 = max genuine chi2; 13/182
    # genuine inter-robot loops falsely rejected by the mu0-round
    # classification, final ATE worse than odometry). A few re-solves with
    # SOFT Geman-McClure-style weights w = c2/(c2 + chi2) unmask them:
    # true outliers are crushed (w ~ 1e-4 once chi2 explodes to ~3e5)
    # while drag-inflated genuine edges keep enough weight (~0.1-0.2 at
    # chi2 50-335) to stay anchored as the solution snaps to the inlier
    # optimum — a hard mu = 1 TLS gate here cut them outright and the
    # graph drifted away from the cut set before it could recover
    # (measured: 8 of 11 hard-cut genuine edges never returned). Runs
    # only when something exceeds barc_sq at init; stops when the
    # suspicious set (chi2 > 2 * barc_sq) is stable.
    c2 = 4.0 * barc_sq

    def _gm_weights(chi2_now):
        return jnp.where(robust_mask, c2 / (c2 + chi2_now), 1.0)

    def irls_cond(state):
        i, _, cut_prev, cut_cur = state
        return jnp.logical_and(i < _DEMASK_IRLS_MAX,
                               jnp.any(cut_prev != cut_cur))

    def irls_body(state):
        i, poses, _, cut_cur = state
        g_i = dataclasses.replace(g, poses=poses)
        chi2_i = _edge_chi2(poses, g)
        poses = lm_optimize(g_i, _gm_weights(chi2_i), max_iters=lm_iters,
                            cg_iters=cg_iters, rel_tol=1e-5).poses
        cut_next = jnp.where(robust_mask,
                             _edge_chi2(poses, g) > 2.0 * barc_sq, False)
        return i + 1, poses, cut_cur, cut_next

    needs_irls = jnp.any(jnp.where(robust_mask, chi2, 0.0) > barc_sq)
    cut0 = jnp.where(robust_mask, chi2 > 2.0 * barc_sq, False)
    # seed cut_prev with the complement so the FIRST GM solve always runs
    # when needs_irls — with a zeros seed, moderate outliers sitting in
    # (barc_sq, 2*barc_sq] at init produced an all-False cut0 equal to the
    # seed and the loop body never executed (review finding): the
    # documented de-masking protection silently did not engage in exactly
    # the hiding-among-genuine-loops regime it exists for
    _, res0_poses, _, _ = jax.lax.while_loop(
        irls_cond, irls_body,
        (jnp.where(needs_irls, 0, _DEMASK_IRLS_MAX), res0_poses,
         jnp.logical_not(cut0), cut0))

    # Chordal restart: dead-reckoned inits on large graphs strand LM in
    # rotation local minima that de-masking alone cannot escape (measured
    # on the 8x256 bench graph: 4 genuine loops stuck at chi2 100-215 at
    # the converged solution vs 4-17 at ground truth, regardless of CG
    # budget). Re-initialize by weighted chordal relaxation — the GM
    # weights from the de-masked solution keep gross outliers out of the
    # otherwise non-robust linear solve — then re-polish and keep
    # whichever solution has lower robust cost. Runs only when the
    # de-masking phase ran (something looked like an outlier).
    def _chordal_restart(poses):
        from cslam_tpu.pgo.chordal import chordal_initialize
        w_gm = _gm_weights(_edge_chi2(poses, g))
        poses_c = chordal_initialize(g, w_gm)
        g_c = dataclasses.replace(g, poses=poses_c)
        poses_c = lm_optimize(g_c, w_gm, max_iters=lm_iters,
                              cg_iters=cg_iters, rel_tol=1e-5).poses
        better = (cost(poses_c, g, w_gm) < cost(poses, g, w_gm))
        return jnp.where(better, poses_c, poses)

    res0_poses = jax.lax.cond(needs_irls, _chordal_restart,
                              lambda poses: poses, res0_poses)
    chi2 = _edge_chi2(res0_poses, g)
    masked_chi2 = jnp.where(robust_mask, chi2, 0.0)
    max_chi2 = jnp.minimum(jnp.max(masked_chi2), mu0_chi2_cap * barc_sq)
    # TLS mu init (GTSAM GncOptimizer::initializeMu): barc^2/(2 r_max^2 - barc^2)
    mu0 = jnp.where(max_chi2 > barc_sq,
                    barc_sq / (2.0 * max_chi2 - barc_sq), 1e6)
    mu0 = jnp.maximum(mu0, 1e-6)
    all_inliers = jnp.max(masked_chi2) <= barc_sq

    def reweighted(poses, mu):
        chi2_i = _edge_chi2(poses, g)
        w_tls = _tls_weights(chi2_i, mu, barc_sq)
        return jnp.where(g.robust > 0, w_tls, 1.0)

    def outer_cond(state):
        i, _, _, _, done = state
        return jnp.logical_and(i < max_outer, jnp.logical_not(done))

    def outer_body(state):
        i, poses, mu, w_prev, _ = state
        weights = reweighted(poses, mu)
        g_i = dataclasses.replace(g, poses=poses)
        # short warm-started LM (accept/reject keeps graduation stable;
        # plain GN steps without it degrade large problems)
        new_poses = lm_optimize(g_i, weights, max_iters=graduation_lm_iters,
                                cg_iters=cg_iters, rel_tol=1e-5).poses
        # stop when weights are binary OR have stopped moving (GTSAM's
        # weight-convergence criterion for TLS)
        binary = jnp.all(jnp.logical_or(weights < 1e-3, weights > 1.0 - 1e-3))
        stable = jnp.max(jnp.abs(weights - w_prev)) < 1e-3
        return (i + 1, new_poses, mu * mu_step, weights,
                jnp.logical_or(binary, stable))

    init = (jnp.int32(0), res0_poses, mu0, ones, all_inliers)
    iters, poses, mu, weights, _ = jax.lax.while_loop(outer_cond, outer_body,
                                                      init)
    # final polish at full LM budget with the converged weights
    g_f = dataclasses.replace(g, poses=poses)
    res_f = lm_optimize(g_f, weights, max_iters=lm_iters, cg_iters=cg_iters)
    final_cost = cost(res_f.poses, g, weights)
    return GncResult(res_f.poses, weights, final_cost, iters)


@jax.jit
@highest_precision
def gnc_reoptimize(g: PoseGraphArrays, warm_weights: jax.Array,
                   lm_iters: int = 30, cg_iters: int = 150,
                   barc_sq: float = 16.81) -> GncResult:
    """Incremental robust re-solve: carry the previous round's TLS weights.

    The backend re-optimizes every few seconds on a graph that grew by a
    handful of keyframes; re-running the full GNC graduation from scratch
    wastes most of its outer iterations re-deciding weights it already
    decided (measured: a warm-posed full GNC is SLOWER than cold, because
    skipping the initial solve forces the mu schedule to graduate from the
    capped mu0). Instead: solve weighted LM with the previous weights
    (new edges enter at 1), refresh the weights with the hard TLS rule
    (the mu -> infinity limit GNC converges to), and polish once. Falls
    back to full :func:`gnc_optimize` at the call site on structural
    change; the backend also periodically forces a full solve so a
    wrongly-zeroed edge can recover
    (``backend.full_gnc_every_n_optimizations``).
    """
    # gate every robust edge by its residual AT THE WARM INIT (the previous
    # solution is trusted): a brand-new gross outlier (carried weight 1)
    # must not drag the first solve — measured, one full LM at weight 1 can
    # twist the graph out of the basin before the threshold refresh fires.
    # TLS weights at moderate mu (not hard) so a true new loop that sees
    # some accumulated drift is damped, not discarded.
    chi2_init = _edge_chi2(g.poses, g)
    init_gate = _tls_weights(chi2_init, jnp.float32(1.0), barc_sq)
    w0 = jnp.where(g.robust > 0, jnp.minimum(warm_weights, init_gate), 1.0)
    res1 = lm_optimize(g, w0, max_iters=lm_iters, cg_iters=cg_iters,
                       rel_tol=1e-6)
    chi2 = _edge_chi2(res1.poses, g)
    w1 = jnp.where(g.robust > 0,
                   (chi2 < barc_sq).astype(g.poses.dtype), 1.0)
    g1 = dataclasses.replace(g, poses=res1.poses)
    res2 = lm_optimize(g1, w1, max_iters=lm_iters, cg_iters=cg_iters)
    chi2 = _edge_chi2(res2.poses, g)
    w2 = jnp.where(g.robust > 0,
                   (chi2 < barc_sq).astype(g.poses.dtype), 1.0)
    final_cost = cost(res2.poses, g, w2)
    return GncResult(res2.poses, w2, final_cost, jnp.int32(2))
