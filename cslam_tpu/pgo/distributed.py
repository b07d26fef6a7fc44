"""Mesh-sharded distributed pose-graph optimization (block Gauss-Seidel).

The TPU-native scaling mode the reference never had: the reference always
centralizes PGO at one elected robot (``decentralized_pgo.cpp:884-905``).
Here per-robot subgraphs are *sharded over a TPU mesh* — one robot's poses,
odometry chain and intra-robot loop closures per device — and each
Gauss-Seidel sweep exchanges only the separator poses (endpoints of
inter-robot loop closures) through an ICI ``all_gather``:

    repeat:
        all_gather current pose blocks            (ICI collective)
        turn incident inter-robot edges into absolute pose priors
            edge (r0,k0)-(r1,k1) with Z = X0^-1 X1:
                on r0:  prior  X0(k0) <- X1(k1) Z^-1
                on r1:  prior  X1(k1) <- X0(k0) Z
        each device runs its local LM solve (cslam_tpu.pgo.solver) with
            those priors fixed

This is the pose-graph analogue of sequence/context parallelism: local
blocks iterate independently, only boundary state crosses devices. Gauge:
robot 0 keeps a strong anchor on its first pose; every other robot gets a
weak self-anchor so isolated robots stay well-posed while connected ones
defer to their separators.

All shapes are uniform across devices (max-padded tiers) so the whole sweep
is a single ``shard_map``-ped jitted program over ``Mesh(('robots',))``.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cslam_tpu.ops import se3
from cslam_tpu.pgo.factor_graph import FactorGraph, PoseGraphArrays, _tier
from cslam_tpu.pgo.solver import lm_optimize
from cslam_tpu.types import PoseGraphEdge

AXIS = "robots"


def _stack_tree(trees):
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)


class ShardedPoseGraph:
    """Host-side builder for the mesh-sharded multi-robot problem.

    Inputs are per-robot FactorGraphs (local chains + intra-robot loop
    closures, keys local keyframe ids) plus the inter-robot separator edges.
    """

    def __init__(self, nb_robots: int):
        self.nb_robots = nb_robots
        self.local_graphs: List[FactorGraph] = [FactorGraph()
                                                for _ in range(nb_robots)]
        self.separators: List[PoseGraphEdge] = []

    def add_variable(self, robot_id: int, keyframe_id: int,
                     pose: np.ndarray) -> None:
        self.local_graphs[robot_id].add_variable((robot_id, keyframe_id),
                                                 pose)

    def add_local_between(self, robot_id: int, kf0: int, kf1: int,
                          measurement: np.ndarray,
                          sigmas: np.ndarray) -> None:
        self.local_graphs[robot_id].add_between(
            (robot_id, kf0), (robot_id, kf1), measurement, sigmas)

    def add_separator(self, edge: PoseGraphEdge) -> None:
        assert edge.key_from.robot_id != edge.key_to.robot_id
        self.separators.append(edge)

    # ------------------------------------------------------------------

    def to_device_arrays(self, mesh: Mesh, separator_sigma_scale: float = 1.0,
                         weak_anchor_scale: float = 1000.0):
        """Build the sharded pytree: local PoseGraphArrays stacked on a
        leading robots axis + replicated separator arrays."""
        R = self.nb_robots
        assert mesh.shape[AXIS] == R, (
            f"mesh has {mesh.shape[AXIS]} devices on '{AXIS}', "
            f"need {R} (one per robot)")

        # Uniform tiers across robots
        np_tier = _tier(max(max(len(g), 1) for g in self.local_graphs))
        ne_tier = _tier(max(max(len(g._edges), 1) for g in self.local_graphs))
        nb_sep = _tier(max(len(self.separators), 1), minimum=8)
        # priors tier: every separator can contribute one prior per side
        # + 1 self-anchor
        prior_tier = _tier(nb_sep + 1, minimum=2)

        local_arrays = []
        for rid, graph in enumerate(self.local_graphs):
            # weak/strong self-anchor on the first pose
            first = graph.keys()[0] if len(graph) else (rid, 0)
            scale = 1.0 if rid == 0 else weak_anchor_scale
            if len(graph):
                graph._priors = []
                graph.add_prior(first, graph.get_pose(first),
                                np.full(6, 0.1) * scale)
            arrays = graph.to_arrays()
            arrays = _repad(arrays, np_tier, ne_tier, prior_tier)
            local_arrays.append(arrays)
        stacked = _stack_tree(local_arrays)

        # separator edge arrays (replicated on every device)
        sep_r0 = np.zeros(nb_sep, np.int32)
        sep_k0 = np.zeros(nb_sep, np.int32)
        sep_r1 = np.zeros(nb_sep, np.int32)
        sep_k1 = np.zeros(nb_sep, np.int32)
        sep_meas = np.tile(np.eye(4, dtype=np.float32), (nb_sep, 1, 1))
        sep_info = np.ones((nb_sep, 6), np.float32)
        sep_valid = np.zeros(nb_sep, np.float32)
        for i, e in enumerate(self.separators):
            r0, k0 = e.key_from.robot_id, e.key_from.keyframe_id
            r1, k1 = e.key_to.robot_id, e.key_to.keyframe_id
            sep_r0[i], sep_r1[i] = r0, r1
            sep_k0[i] = self.local_graphs[r0].index_of((r0, k0))
            sep_k1[i] = self.local_graphs[r1].index_of((r1, k1))
            sep_meas[i] = e.measurement.astype(np.float32)
            sep_info[i] = 1.0 / np.maximum(
                np.asarray(e.noise_sigmas) * separator_sigma_scale, 1e-9)
            sep_valid[i] = 1.0

        separators = {
            "r0": jnp.asarray(sep_r0), "k0": jnp.asarray(sep_k0),
            "r1": jnp.asarray(sep_r1), "k1": jnp.asarray(sep_k1),
            "meas": jnp.asarray(sep_meas), "sqrt_info": jnp.asarray(sep_info),
            "valid": jnp.asarray(sep_valid),
        }
        return stacked, separators

    def values_from_arrays(self, poses_stacked: np.ndarray
                           ) -> Dict[Tuple[int, int], np.ndarray]:
        out: Dict[Tuple[int, int], np.ndarray] = {}
        poses_stacked = np.asarray(poses_stacked)
        for rid, graph in enumerate(self.local_graphs):
            for key, idx in graph._index.items():
                out[key] = poses_stacked[rid, idx].astype(np.float64)
        return out


def _repad(g: PoseGraphArrays, np_tier: int, ne_tier: int,
           nb_tier: int) -> PoseGraphArrays:
    """Pad one robot's arrays up to the shared tiers."""

    def pad_to(x, n, axis=0, identity=False):
        cur = x.shape[axis]
        if cur >= n:
            return x
        pad_shape = list(x.shape)
        pad_shape[axis] = n - cur
        if identity:
            filler = jnp.tile(jnp.eye(4, dtype=x.dtype),
                              (n - cur,) + (1,) * 0).reshape(pad_shape)
        else:
            filler = jnp.zeros(pad_shape, x.dtype)
        return jnp.concatenate([x, filler], axis=axis)

    return PoseGraphArrays(
        poses=pad_to(g.poses, np_tier, identity=True),
        node_valid=pad_to(g.node_valid, np_tier),
        edge_i=pad_to(g.edge_i, ne_tier),
        edge_j=pad_to(g.edge_j, ne_tier),
        meas=pad_to(g.meas, ne_tier, identity=True),
        sqrt_info=pad_to(g.sqrt_info, ne_tier),
        edge_valid=pad_to(g.edge_valid, ne_tier),
        robust=pad_to(g.robust, ne_tier),
        prior_idx=pad_to(g.prior_idx, nb_tier),
        prior_pose=pad_to(g.prior_pose, nb_tier, identity=True),
        prior_sqrt_info=pad_to(g.prior_sqrt_info, nb_tier),
        prior_valid=pad_to(g.prior_valid, nb_tier))


# ---------------------------------------------------------------------------
# The sharded Gauss-Seidel sweep
# ---------------------------------------------------------------------------


def _separator_priors(me: jax.Array, all_poses: jax.Array, sep: dict):
    """Turn inter-robot edges incident to this robot into absolute priors.

    Returns (idx [M], target [M,4,4], sqrt_info [M,6], valid [M]).
    """
    on_r0 = (sep["r0"] == me)
    on_r1 = (sep["r1"] == me)
    incident = (on_r0 | on_r1) & (sep["valid"] > 0)

    other_rid = jnp.where(on_r0, sep["r1"], sep["r0"])
    other_idx = jnp.where(on_r0, sep["k1"], sep["k0"])
    my_idx = jnp.where(on_r0, sep["k0"], sep["k1"])
    other_pose = all_poses[other_rid, other_idx]
    # Z = X0^-1 X1  ->  X0 = X1 Z^-1  /  X1 = X0 Z
    target_r0 = other_pose @ se3.inverse(sep["meas"])
    target_r1 = other_pose @ sep["meas"]
    target = jnp.where(on_r0[:, None, None], target_r0, target_r1)
    target = jnp.where(incident[:, None, None], target,
                       jnp.eye(4, dtype=target.dtype))
    return (my_idx, target, sep["sqrt_info"],
            incident.astype(jnp.float32))


def make_distributed_step(mesh: Mesh, lm_iters: int = 15,
                          cg_iters: int = 100, barc_sq: float = 16.81):
    """Build the jitted one-sweep function over the given mesh.

    The returned callable maps (stacked local arrays, separators, mu) ->
    updated stacked poses; call it in a loop for Gauss-Seidel iterations
    with a growing GNC ``mu``. Robustness is distributed too: each device
    TLS-reweights its incident separator priors and its robust local edges
    from their current chi2 — gross outlier inter-robot loop closures are
    rejected without any central aggregation.
    """
    pspec_local = P(AXIS)
    pspec_repl = P()

    def tls(chi2, mu):
        upper = (mu + 1.0) / mu * barc_sq
        lower = mu / (mu + 1.0) * barc_sq
        mid = jnp.sqrt(barc_sq * mu * (mu + 1.0)
                       / jnp.maximum(chi2, 1e-12)) - mu
        return jnp.where(chi2 >= upper, 0.0,
                         jnp.where(chi2 <= lower, 1.0,
                                   jnp.clip(mid, 0.0, 1.0)))

    def sweep(local: PoseGraphArrays, sep: dict, mu: jax.Array) -> jax.Array:
        # inside shard_map: leading axis is this device's single robot
        me = jax.lax.axis_index(AXIS)
        g = jax.tree_util.tree_map(lambda x: x[0], local)
        all_poses = jax.lax.all_gather(g.poses, AXIS)  # [R, Np, 4, 4]

        idx, target, info, valid = _separator_priors(me, all_poses, sep)
        # GNC over separators: chi2 of each prior at the current estimate
        r_sep = jax.vmap(
            lambda X, tgt, si: se3.log(se3.between(tgt, X)) * si)(
            g.poses[idx], target, info)
        chi2_sep = jnp.sum(r_sep * r_sep, axis=-1)
        w_sep = jnp.where(valid > 0, tls(chi2_sep, mu), 0.0)
        info = info * jnp.sqrt(w_sep)[:, None]

        B = g.prior_idx.shape[0]
        M = idx.shape[0]
        n_fill = min(M, B - 1)
        prior_idx = g.prior_idx.at[1:1 + n_fill].set(idx[:n_fill])
        prior_pose = g.prior_pose.at[1:1 + n_fill].set(target[:n_fill])
        prior_info = g.prior_sqrt_info.at[1:1 + n_fill].set(info[:n_fill])
        prior_valid = g.prior_valid.at[1:1 + n_fill].set(valid[:n_fill])

        g_local = PoseGraphArrays(
            g.poses, g.node_valid, g.edge_i, g.edge_j, g.meas, g.sqrt_info,
            g.edge_valid, g.robust, prior_idx, prior_pose, prior_info,
            prior_valid)
        # GNC over robust local edges (intra-robot loop closures)
        from cslam_tpu.pgo.solver import edge_residuals
        r_loc = edge_residuals(g.poses, g_local)
        chi2_loc = jnp.sum(r_loc * r_loc, axis=-1)
        weights = jnp.where(g.robust > 0, tls(chi2_loc, mu), 1.0)
        res = lm_optimize(g_local, weights,
                          max_iters=lm_iters, cg_iters=cg_iters)
        return res.poses[None]

    sharded = shard_map(
        sweep, mesh=mesh,
        in_specs=(jax.tree_util.tree_map(lambda _: pspec_local,
                                         _template_spec()),
                  {k: pspec_repl for k in
                   ("r0", "k0", "r1", "k1", "meas", "sqrt_info", "valid")},
                  pspec_repl),
        out_specs=pspec_local, check_vma=False)

    @jax.jit
    def step(local: PoseGraphArrays, sep: dict,
             mu: jax.Array) -> PoseGraphArrays:
        new_poses = sharded(local, sep, mu)
        return PoseGraphArrays(
            new_poses, local.node_valid, local.edge_i, local.edge_j,
            local.meas, local.sqrt_info, local.edge_valid, local.robust,
            local.prior_idx, local.prior_pose, local.prior_sqrt_info,
            local.prior_valid)

    return step


def _template_spec() -> PoseGraphArrays:
    """A pytree with the same structure as PoseGraphArrays, used only for
    building in_specs."""
    z = jnp.zeros(())
    return PoseGraphArrays(z, z, z, z, z, z, z, z, z, z, z, z)


def distributed_optimize(problem: ShardedPoseGraph, mesh: Mesh,
                         sweeps: int = 10, lm_iters: int = 15,
                         cg_iters: int = 100, mu0: float = 0.05,
                         mu_step: float = 1.6, barc_sq: float = 16.81
                         ) -> Dict[Tuple[int, int], np.ndarray]:
    """Run robust block Gauss-Seidel PGO over the mesh.

    GNC mu grows each sweep, so separator outliers are graduated out while
    the blocks converge; returns the optimized values.
    """
    local, sep = problem.to_device_arrays(mesh)
    sharding = NamedSharding(mesh, P(AXIS))
    local = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), local)
    step = make_distributed_step(mesh, lm_iters=lm_iters,
                                 cg_iters=cg_iters, barc_sq=barc_sq)
    mu = mu0
    for _ in range(sweeps):
        local = step(local, sep, jnp.float32(mu))
        mu = min(mu * mu_step, 1e6)
    return problem.values_from_arrays(np.asarray(local.poses))
