"""On-device Fiedler (algebraic-connectivity) eigensolvers.

Replaces the reference's networkx ``tracemin_lu`` host eigensolver
(``cslam/mac/mac.py:35-59``, the hot loop of every Frank-Wolfe iteration)
with two jitted TPU-native paths:

1. **Dense tier** (small graphs): one symmetric eigendecomposition over a
   padded Laplacian with a deflation shift.
2. **Chain + low-rank tier** (large graphs): SLAM pose graphs are odometry
   *chains* (tridiagonal Laplacian) plus a sparse set of loop-closure edges
   (a low-rank correction). That structure admits an exact direct solve:

       B = T~ + U C U^T            (T~ tridiagonal PD, U incidence + deflation)
       B^-1 x = t - Y S^-1 U^T t   (Woodbury; t = T~^-1 x, Y = T~^-1 U,
                                    S = C^-1 + U^T Y)

   with batched ``tridiagonal_solve`` for T~. LOBPCG is then run on ``B^-1``
   — inverting flips the clustered smallest eigenvalues (the hard case for
   iterative methods on chains) into well-separated largest ones, so a few
   dozen iterations recover the Fiedler pair. This is the TPU replacement
   for the sparse-LU shift-invert power the reference gets from scipy.

Padding + deflation trick (keeps shapes static for XLA): graphs are embedded
in a fixed tier size ``P`` with an ``active`` mask; padded nodes get a large
diagonal shift ``sigma`` and the trivial constant eigenvector is deflated by
``sigma * u u^T`` with ``u = active/sqrt(p)`` (valid since ``L @ 1 = 0``).
With ``sigma > lambda_max(L)`` the smallest eigenvalue of the shifted matrix
is exactly ``lambda_2(L)``. Disconnected graphs give ``lambda_2 = 0`` instead
of the LU singular-matrix exception the reference has to catch
(``cslam/algebraic_connectivity_maximization.py:449-465``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental.sparse.linalg import lobpcg_standard

from cslam_tpu.ops import highest_precision

_EPS_SHIFT = 1e-5   # epsilon ridge on the whole spectrum (subtracted exactly)
_BIG_CINV = 1e12    # 1/weight stand-in for absent (zero-weight) edges


def laplacian_from_edges(idx_i: jax.Array, idx_j: jax.Array,
                         weights: jax.Array, size: int) -> jax.Array:
    """Dense weighted graph Laplacian from (padded) edge lists.

    Padding edges must carry weight 0 (they then contribute nothing).
    Equivalent to the reference's sparse triplet builder
    (``cslam/mac/utils.py:47-126``) but dense, so it feeds the MXU.
    """
    L = jnp.zeros((size, size), dtype=jnp.float32)
    w = weights.astype(jnp.float32)
    L = L.at[idx_i, idx_i].add(w)
    L = L.at[idx_j, idx_j].add(w)
    L = L.at[idx_i, idx_j].add(-w)
    L = L.at[idx_j, idx_i].add(-w)
    return L


def rayleigh_quotient(idx_i: jax.Array, idx_j: jax.Array, weights: jax.Array,
                      v: jax.Array) -> jax.Array:
    """x^T L x computed straight from edge lists: sum_e w_e (v_i - v_j)^2."""
    diff = v[idx_i] - v[idx_j]
    return jnp.sum(weights * diff * diff)


# ---------------------------------------------------------------------------
# Dense tier
# ---------------------------------------------------------------------------


@highest_precision
def fiedler_pair(L: jax.Array, active: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(lambda_2, Fiedler vector) via dense eigh on the deflated Laplacian.

    Args:
        L: ``[P, P]`` dense Laplacian (rows/cols of inactive nodes all zero).
        active: ``[P]`` float32 0/1 mask of real nodes.
    """
    active = active.astype(jnp.float32)
    p = jnp.maximum(jnp.sum(active), 1.0)
    sigma = 2.0 * jnp.max(jnp.diag(L)) + 1.0
    u = active / jnp.sqrt(p)
    B = (L
         + sigma * jnp.diag(1.0 - active)
         + sigma * jnp.outer(u, u))
    B = 0.5 * (B + B.T)  # enforce symmetry for eigh stability
    eigvals, eigvecs = jnp.linalg.eigh(B)
    lam2 = eigvals[0]
    v = eigvecs[:, 0] * active
    return lam2, v


def algebraic_connectivity(idx_i: jax.Array, idx_j: jax.Array,
                           weights: jax.Array, active: jax.Array) -> jax.Array:
    """Convenience: lambda_2 of the graph given by weighted edge lists."""
    L = laplacian_from_edges(idx_i, idx_j, weights, active.shape[0])
    return fiedler_pair(L, active)[0]


# ---------------------------------------------------------------------------
# Chain + low-rank tier (Woodbury shift-invert)
# ---------------------------------------------------------------------------


def chain_lowrank_precompute(chain_w: jax.Array,
                             lr_i: jax.Array, lr_j: jax.Array,
                             active: jax.Array, sigma: jax.Array):
    """Weight-independent factor setup for the Woodbury solver.

    Args:
        chain_w: ``[P-1]`` weights of the consecutive-node (odometry) edges,
            0 where no chain edge exists (robot boundaries, padding).
        lr_i, lr_j: ``[M]`` endpoints of the non-chain (loop-closure) edges;
            padding entries should point at node 0.
        active: ``[P]`` 0/1 mask of real nodes.
        sigma: spectral shift (> lambda_max) used for padding and deflation.

    Returns:
        dict of precomputed tensors: the DENSE inverse ``Tinv = T~^-1``
        ``[P, P]``, the expanded column block U ``[P, M+1]``, Y = T~^-1 U,
        and G = U^T Y. These stay fixed while candidate edge weights change
        (the Frank-Wolfe inner loop only refreshes the small Woodbury core).

    Why a dense inverse: each LOBPCG iteration inside the Frank-Wolfe loop
    applies ``T~^-1`` to a thin block. A per-apply ``tridiagonal_solve`` is
    a P-step *sequential* recurrence — the worst shape for a TPU — and was
    measured as the dominant term of every MAC solve (~60 ms per FW
    iteration at P=2048; 131 s of the round-4 lidar-e2e steady wall). T~ is
    weight-INdependent across the whole solve, so one tridiagonal solve
    against the identity at construction turns every subsequent apply into
    an MXU matmul (~20 us at P=2048). Memory: P^2 f32 = 16 MB at the e2e
    tier, 268 MB at the largest bench tier — cheap next to a 16 GB HBM.
    """
    P = active.shape[0]
    chain_w = chain_w.astype(jnp.float32)
    # T~ = chain Laplacian + eps*I + sigma*(1-active) diag  (tridiagonal, PD)
    diag = jnp.zeros(P, jnp.float32)
    diag = diag.at[:-1].add(chain_w)
    diag = diag.at[1:].add(chain_w)
    diag = diag + _EPS_SHIFT + sigma * (1.0 - active)
    lower = jnp.concatenate([jnp.zeros(1, jnp.float32), -chain_w])
    upper = jnp.concatenate([-chain_w, jnp.zeros(1, jnp.float32)])

    p = jnp.maximum(jnp.sum(active), 1.0)
    u = active / jnp.sqrt(p)

    M = lr_i.shape[0]
    cols = jnp.arange(M)
    U = jnp.zeros((P, M + 1), jnp.float32)
    U = U.at[lr_i, cols].add(1.0)
    U = U.at[lr_j, cols].add(-1.0)
    U = U.at[:, M].set(u)

    # One sequential solve per construction (P rhs), every apply after
    # this is a matmul. Symmetrize: T~ is symmetric, but the one-sided
    # solve leaves O(cond * eps_f32) asymmetry that LOBPCG's Rayleigh-Ritz
    # is sensitive to.
    Tinv = jax.lax.linalg.tridiagonal_solve(lower, diag, upper,
                                            jnp.eye(P, dtype=jnp.float32))
    Tinv = 0.5 * (Tinv + Tinv.T)
    Y = Tinv @ U
    G = U.T @ Y
    return {"Tinv": Tinv, "U": U, "Y": Y, "G": G, "sigma": sigma}


@highest_precision
def fiedler_pair_chain_lowrank(pre: dict, lr_w: jax.Array, active: jax.Array,
                               lobpcg_iters: int = 48,
                               block: int = 4,
                               short_iters: int = 14,
                               resid_tol: float = 1e-4,
                               X0: jax.Array | None = None,
                               return_block: bool = False):
    """(lambda_2, Fiedler vector) via LOBPCG on the Woodbury-inverted operator.

    Two-stage early exit: LOBPCG on the exact shift-inverted operator has
    well-separated leading eigenvalues and typically converges in ~10
    iterations, so a fixed 48-iteration budget mostly burns tridiagonal
    solves. A ``short_iters`` run is followed by ONE extra operator apply
    to measure the leading Ritz pair's relative residual; only when it
    exceeds ``resid_tol`` does a ``lax.cond`` branch continue (warm-started
    from the converged-so-far block) for the remaining budget. The MAC
    Frank-Wolfe loop calls this once per iteration inside its fused
    ``lax.while_loop`` — the early exit cuts the dominant per-iteration
    term at the large selection tiers without changing the budget contract.

    Args:
        pre: output of :func:`chain_lowrank_precompute`.
        lr_w: ``[M]`` current weights of the low-rank edges (0 = absent).
        active: ``[P]`` 0/1 node mask.
        lobpcg_iters: total LOBPCG iteration budget (each costs one batched
            tridiagonal solve + small dense ops).
        block: LOBPCG block size.
        short_iters: first-stage budget (``>= lobpcg_iters`` disables the
            two-stage split).
        resid_tol: relative residual ``||B^-1 v - theta v|| / theta`` above
            which the second stage runs.
        X0: optional ``[P, block]`` warm-start block (e.g. the Ritz block
            from the previous Frank-Wolfe iteration's solve, whose operator
            differs only by the small ``alpha * (s - w)`` weight step). The
            residual gate makes the warm start safe: a stale block that no
            longer converges within ``short_iters`` routes through the
            full-budget continuation.
        return_block: also return the full Ritz block ``V`` (for threading
            through an outer ``lax.while_loop`` carry).
    """
    P = active.shape[0]
    M = lr_w.shape[0]
    lr_w = lr_w.astype(jnp.float32)

    cinv = jnp.where(lr_w > 0, 1.0 / jnp.maximum(lr_w, 1e-30), _BIG_CINV)
    cinv = jnp.concatenate([cinv, jnp.array([1.0]) / pre["sigma"][None]])
    S = pre["G"] + jnp.diag(cinv)
    chol = jax.scipy.linalg.cho_factor(S, lower=True)

    def b_inverse(x):
        # Tinv is precomputed (see chain_lowrank_precompute): two MXU
        # matmuls + a small Cholesky solve per apply, no sequential pass.
        t = pre["Tinv"] @ x
        z = jax.scipy.linalg.cho_solve(chol, pre["U"].T @ t)
        return t - pre["Y"] @ z

    if X0 is None:
        # Deterministic start block, orthogonal-ish to the deflated direction.
        key = jax.random.PRNGKey(7)
        X0 = jax.random.normal(key, (P, block), jnp.float32) * active[:, None]
    if short_iters >= lobpcg_iters:
        theta, V, _ = lobpcg_standard(b_inverse, X0, m=lobpcg_iters)
    else:
        theta, V, _ = lobpcg_standard(b_inverse, X0, m=short_iters)
        applied = b_inverse(V[:, :1])
        resid = jnp.linalg.norm(applied - theta[0] * V[:, :1])
        rel = resid / jnp.maximum(theta[0], 1e-30)

        def continue_path(_):
            th2, V2, _ = lobpcg_standard(
                b_inverse, V, m=lobpcg_iters - short_iters)
            return th2, V2

        theta, V = jax.lax.cond(rel > resid_tol, continue_path,
                                lambda _: (theta, V), None)
    v = V[:, 0] * active
    v = v / jnp.maximum(jnp.linalg.norm(v), 1e-30)
    # theta = 1/(lambda_2 + eps); recover lambda_2 without cancellation by a
    # Rayleigh quotient over the actual edges downstream (MAC does this);
    # here return the shift-corrected estimate as a fallback.
    lam2 = 1.0 / jnp.maximum(theta[0], 1e-30) - _EPS_SHIFT
    if return_block:
        return jnp.maximum(lam2, 0.0), v, V
    return jnp.maximum(lam2, 0.0), v
