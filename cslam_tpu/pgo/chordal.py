"""Chordal initialization for pose graphs (rotation averaging + linear t).

TPU-native equivalent of GTSAM's ``InitializePose3`` (the standard cure for
dead-reckoned initializations whose accumulated rotation drift strands
Gauss-Newton in local minima):

1. **Rotation averaging, chordally relaxed**: solve the linear least squares
   ``min sum_e || M_j - M_i R_ij ||_F^2`` over unconstrained 3x3 matrices.
   Each of the three matrix rows decouples into an independent ``[3N]``
   system sharing one normal matrix — built densely and factorized once on
   the MXU (graphs here are <= a few hundred poses per optimization).
   Solutions are projected back to SO(3) by SVD.
2. **Translations**: with rotations fixed, ``t_j - t_i = R_i t_ij`` is
   linear; one more dense solve.

Anchored at node 0's current estimate. Works straight on the padded
``PoseGraphArrays`` (masks keep inactive nodes inert), so it composes with
``gnc_optimize`` as a drop-in initializer.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from cslam_tpu.ops import highest_precision
from cslam_tpu.pgo.factor_graph import PoseGraphArrays


@jax.jit
@highest_precision
def chordal_initialize(g: PoseGraphArrays) -> jax.Array:
    """Chordally-initialized poses ``[Np, 4, 4]`` for the given graph."""
    Np = g.num_nodes
    R_meas = g.meas[:, :3, :3]
    t_meas = g.meas[:, :3, 3]
    w = g.edge_valid
    anchor = g.prior_idx[0]
    anchor_pose = g.prior_pose[0]

    # ---- rotation block: unknowns X [Np, 3] per matrix row r, constraints
    #      X_j - R_ij^T X_i = 0 (since M_j = M_i R_ij  =>  row_j = R_ij^T row_i
    #      ... rows transform by R_ij^T acting on the left of column vectors)
    # Normal matrix N = sum_e w (S_j - R^T S_i)^T (S_j - R^T S_i), shared by
    # all three row systems; only the anchor right-hand side differs.
    eye3 = jnp.eye(3, dtype=jnp.float32)

    # accumulate the dense [Np,3,Np,3] normal matrix via block scatters
    RtR = jnp.einsum("eki,ekj->eij", R_meas, R_meas)  # = R^T R = I, keep general
    N = jnp.zeros((Np, 3, Np, 3), jnp.float32)
    w3 = w[:, None, None]
    N = N.at[g.edge_j, :, g.edge_j, :].add(w3 * eye3[None])
    N = N.at[g.edge_i, :, g.edge_i, :].add(w3 * RtR)
    # cross terms: -(R^T)^T = -R acting j->i side:  -S_j^T R^T S_i and sym.
    N = N.at[g.edge_j, :, g.edge_i, :].add(-w3 * jnp.swapaxes(R_meas, 1, 2))
    N = N.at[g.edge_i, :, g.edge_j, :].add(-w3 * R_meas)
    # anchor + inert padding
    idx = jnp.arange(Np)
    big = 1e4
    N = N.at[anchor, :, anchor, :].add(big * eye3)
    N = N.at[idx, :, idx, :].add(
        (1.0 - g.node_valid)[:, None, None] * eye3[None]
        + 1e-6 * eye3[None])
    Nm = N.reshape(Np * 3, Np * 3)
    chol = jax.scipy.linalg.cho_factor(Nm, lower=True)

    # three row systems: rhs only from the anchor term
    anchor_R = anchor_pose[:3, :3]
    rhs = jnp.zeros((Np, 3, 3), jnp.float32)  # [node, 3comp, which_row]
    rhs = rhs.at[anchor].set(big * anchor_R.T)  # row r of M_anchor = R[r,:]
    X = jax.scipy.linalg.cho_solve(chol, rhs.reshape(Np * 3, 3))
    M = jnp.swapaxes(X.reshape(Np, 3, 3), 1, 2)  # [node, row, col]

    # project to SO(3)
    U, _, Vt = jnp.linalg.svd(M)
    det = jnp.linalg.det(U @ Vt)
    D = jnp.zeros((Np, 3, 3), jnp.float32)
    D = D.at[:, 0, 0].set(1.0).at[:, 1, 1].set(1.0).at[:, 2, 2].set(det)
    R = U @ D @ Vt

    # ---- translation block: t_j - t_i = R_i t_ij, one [3N] dense solve
    b_e = jnp.einsum("eij,ej->ei", R[g.edge_i], t_meas) * w[:, None]
    Nt = jnp.zeros((Np, 3, Np, 3), jnp.float32)
    Nt = Nt.at[g.edge_j, :, g.edge_j, :].add(w3 * eye3[None])
    Nt = Nt.at[g.edge_i, :, g.edge_i, :].add(w3 * eye3[None])
    Nt = Nt.at[g.edge_j, :, g.edge_i, :].add(-w3 * eye3[None])
    Nt = Nt.at[g.edge_i, :, g.edge_j, :].add(-w3 * eye3[None])
    Nt = Nt.at[anchor, :, anchor, :].add(big * eye3)
    Nt = Nt.at[idx, :, idx, :].add(
        (1.0 - g.node_valid)[:, None, None] * eye3[None]
        + 1e-6 * eye3[None])
    bt = jnp.zeros((Np, 3), jnp.float32)
    bt = bt.at[g.edge_j].add(b_e)
    bt = bt.at[g.edge_i].add(-b_e)
    bt = bt.at[anchor].add(big * anchor_pose[:3, 3])
    cholt = jax.scipy.linalg.cho_factor(Nt.reshape(Np * 3, Np * 3),
                                        lower=True)
    t = jax.scipy.linalg.cho_solve(cholt, bt.reshape(Np * 3)).reshape(Np, 3)

    poses = jnp.tile(jnp.eye(4, dtype=jnp.float32), (Np, 1, 1))
    poses = poses.at[:, :3, :3].set(R).at[:, :3, 3].set(t)
    # keep padded nodes at identity
    return jnp.where(g.node_valid[:, None, None] > 0, poses,
                     jnp.eye(4, dtype=jnp.float32)[None])
