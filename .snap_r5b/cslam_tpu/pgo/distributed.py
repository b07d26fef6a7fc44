"""Mesh-sharded distributed pose-graph optimization (block Gauss-Seidel).

The TPU-native scaling mode the reference never had: the reference always
centralizes PGO at one elected robot (``decentralized_pgo.cpp:884-905``).
Here per-robot subgraphs are *sharded over a TPU mesh* — one robot's poses,
odometry chain and intra-robot loop closures per device — and each
Gauss-Seidel sweep exchanges only the separator poses (endpoints of
inter-robot loop closures) through an ICI ``all_gather``:

    repeat:
        all_gather current pose blocks            (ICI collective)
        coarse level: segment-rigid SE(3) corrections from the separator
            graph + segment-crossing intra edges (replicated tiny GN —
            the aggregation-multigrid accelerator for modes that would
            otherwise diffuse one hop per sweep)
        turn incident inter-robot edges into absolute pose priors,
            damped to the geodesic midpoint (parallel-update stability):
            edge (r0,k0)-(r1,k1) with Z = X0^-1 X1:
                on r0:  prior  X0(k0) <- midpoint(X0(k0), X1(k1) Z^-1)
                on r1:  prior  X1(k1) <- midpoint(X1(k1), X0(k0) Z)
        each device runs its local LM solve (cslam_tpu.pgo.solver) with
            those priors fixed

This is the pose-graph analogue of sequence/context parallelism: local
blocks iterate independently, only boundary state crosses devices. The
centralized GNC optimum is an exact fixed point of the sweep (verified in
benchmarks/distributed_pgo_bench.py); the coarse level buys the
convergence RATE (8x256: parity with the centralized solver in ~5 sweeps
vs an 0.23 m-vs-0.15 m plateau without it). Gauge: robot 0 keeps a strong
anchor on its first pose; every other robot gets a weak self-anchor so
isolated robots stay well-posed while connected ones defer to their
separators.

All shapes are uniform across devices (max-padded tiers) so the whole sweep
is a single ``shard_map``-ped jitted program over ``Mesh(('robots',))``.
"""
from __future__ import annotations

import dataclasses

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cslam_tpu.ops import highest_precision, se3
from cslam_tpu.pgo.factor_graph import FactorGraph, PoseGraphArrays, _tier
from cslam_tpu.pgo.solver import lm_optimize
from cslam_tpu.types import PoseGraphEdge

AXIS = "robots"

# warm-mode mu0: intra-robot robust chi2 above this multiple of barc_sq at
# the carried (previously converged) poses counts as a previous-round
# reject and is excluded from the adaptive-mu0 max (see the derivation in
# make_distributed_solve). 25x sits between "new genuine edge with rough
# alignment" (single-digit multiples after a converged round) and
# "persistent gross outlier" (hundreds+).
_WARM_INTRA_GROSS = 25.0


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
                          measurement: np.ndarray, sigmas: np.ndarray,
                          robust: bool = False) -> None:
        self.local_graphs[robot_id].add_between(
            (robot_id, kf0), (robot_id, kf1), measurement, sigmas,
            robust=robust)

    def add_separator(self, edge: PoseGraphEdge) -> None:
        assert edge.key_from.robot_id != edge.key_to.robot_id
        self.separators.append(edge)

    # ------------------------------------------------------------------

    def to_device_arrays(self, mesh: Mesh, separator_sigma_scale: float = 1.0,
                         weak_anchor_scale: float = 1000.0,
                         coarse_segments: int = 16):
        """Build the sharded pytree: local PoseGraphArrays stacked on a
        leading robots axis + replicated separator arrays (including the
        coarse-level metadata: segment length + the intra-robot edges that
        cross segment boundaries, see :func:`_coarse_alignment`)."""
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

        # coarse-level metadata: segment partition + boundary-crossing
        # intra-robot edges (rigid segment motions change only these)
        M = max(int(coarse_segments), 1)
        seg_len = max((np_tier + M - 1) // M, 1)
        crossing = []
        for rid, graph in enumerate(self.local_graphs):
            for (i, j, z, s, rb) in graph._edges:
                if min(i // seg_len, M - 1) != min(j // seg_len, M - 1):
                    crossing.append((rid, i, j, z, s, rb))
        nc = _tier(max(len(crossing), 1), minimum=8)
        cr_r = np.zeros(nc, np.int32)
        cr_ki = np.zeros(nc, np.int32)
        cr_kj = np.zeros(nc, np.int32)
        cr_meas = np.tile(np.eye(4, dtype=np.float32), (nc, 1, 1))
        cr_info = np.ones((nc, 6), np.float32)
        cr_valid = np.zeros(nc, np.float32)
        cr_robust = np.zeros(nc, np.float32)
        for i, (rid, ki, kj, z, s, rb) in enumerate(crossing):
            cr_r[i], cr_ki[i], cr_kj[i] = rid, ki, kj
            cr_meas[i] = z.astype(np.float32)
            cr_info[i] = (1.0 / np.maximum(s, 1e-9)).astype(np.float32)
            cr_valid[i] = 1.0
            cr_robust[i] = 1.0 if rb else 0.0

        separators = {
            "r0": jnp.asarray(sep_r0), "k0": jnp.asarray(sep_k0),
            "r1": jnp.asarray(sep_r1), "k1": jnp.asarray(sep_k1),
            "meas": jnp.asarray(sep_meas), "sqrt_info": jnp.asarray(sep_info),
            "valid": jnp.asarray(sep_valid),
            # carried-classification slots (steady-state warm solves fill
            # these from the previous round; neutral defaults otherwise)
            "w_carry": jnp.ones(nb_sep, jnp.float32),
            "carry_known": jnp.zeros(nb_sep, jnp.float32),
            "carry_on": jnp.float32(0.0),
            "coarse_segments": M, "coarse_seg_len": seg_len,
            "cross": {
                "r": jnp.asarray(cr_r), "ki": jnp.asarray(cr_ki),
                "kj": jnp.asarray(cr_kj), "meas": jnp.asarray(cr_meas),
                "sqrt_info": jnp.asarray(cr_info),
                "valid": jnp.asarray(cr_valid),
                "robust": jnp.asarray(cr_robust),
            },
        }
        return stacked, separators

    def separator_keys(self) -> List[Tuple[Tuple[int, int],
                                           Tuple[int, int]]]:
        """Stable identity of each separator (array slot i <-> key i):
        ((robot_from, kf_from), (robot_to, kf_to)). Used to carry TLS
        classification across rounds as the graph grows."""
        return [((e.key_from.robot_id, e.key_from.keyframe_id),
                 (e.key_to.robot_id, e.key_to.keyframe_id))
                for e in self.separators]

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
            # tile over a leading axis: (k, 1, 1) reps — tiling with a
            # bare (k,) rep spreads eye(4) along the LAST axis and the
            # reshape scrambles it into rank-deficient non-SE(3) filler
            # (caught in review; the garbage only survived because every
            # downstream op happened to be masked)
            filler = jnp.tile(jnp.eye(4, dtype=x.dtype),
                              (n - cur, 1, 1))
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


def _tls(chi2, mu, barc_sq):
    """GNC-TLS weights — single implementation shared with the centralized
    solver so the two modes can never silently diverge."""
    from cslam_tpu.pgo.solver import _tls_weights
    return _tls_weights(chi2, mu, barc_sq)


def _sep_residuals(all_poses, sep):
    """Whitened separator residuals from the global pose blocks:
    e_s = Log(Z^-1 X0^-1 X1) * sqrt_info. Returns ([S, 6], chi2 [S])."""

    def one(r0, k0, r1, k1, Z, si):
        X0 = all_poses[r0, k0]
        X1 = all_poses[r1, k1]
        e = se3.log(se3.inverse(Z) @ se3.inverse(X0) @ X1)
        return e * si

    r = jax.vmap(one)(sep["r0"], sep["k0"], sep["r1"], sep["k1"],
                      sep["meas"], sep["sqrt_info"])
    return r, jnp.sum(r * r, axis=-1)


def _coarse_alignment(all_poses, sep, w_sep, cross, nb_robots: int,
                      segments: int, seg_len: int, mu=None,
                      barc_sq: float = 16.81, iters: int = 3):
    """Aggregation-multigrid coarse level: one rigid SE(3) correction per
    CHAIN SEGMENT (``segments`` per robot), solved as a replicated tiny
    Gauss-Newton problem and applied to the gathered pose blocks.

    The coarse objective is the full objective restricted to the coarse
    space: rigid segment motions leave within-segment odometry invariant,
    so only (a) the weighted separators and (b) the intra-robot edges that
    CROSS a segment boundary (precomputed in ``cross``) appear — making
    the joint optimum a stationary point of the coarse problem (H = I),
    i.e. the accelerator is bias-free and can run every sweep. Rigid
    per-robot gauge modes (segments=1) diffuse one hop per sweep through
    local solves alone; chain-flexing modes that span robots need
    segments > 1 (measured: 8x256 asymptote 0.23 m vs the centralized
    0.15 m with rigid-only coarse; the segment level closes the gap).

    Dimensions: 6 * R * segments unknowns (<= a few hundred), dense
    normal-equation solve, negligible next to one local LM sweep.
    """
    R = nb_robots
    M = segments
    V = R * M
    dtype = all_poses.dtype
    if cross is None:  # problems built before the coarse metadata existed
        cross = {"r": jnp.zeros(1, jnp.int32),
                 "ki": jnp.zeros(1, jnp.int32),
                 "kj": jnp.zeros(1, jnp.int32),
                 "meas": jnp.eye(4, dtype=dtype)[None],
                 "sqrt_info": jnp.ones((1, 6), dtype),
                 "valid": jnp.zeros(1, dtype)}

    # TLS-reweight robust crossing edges (intra-robot loop closures that
    # cross segment boundaries) from their current chi2 at the same mu the
    # fine level uses. Without this, an outlier intra loop closure that the
    # local solve has TLS-cut (weight 0) would still enter the coarse GN
    # at full weight every sweep — dragging the segments toward it while
    # the local solves pull back, which breaks the "joint optimum is a
    # stationary point of the coarse problem" property. Non-robust
    # odometry crossing edges keep weight 1.
    w_cross = cross["valid"]
    if mu is not None and "robust" in cross:
        def cr_res(r, ki, kj, Z, si_e):
            e = se3.log(se3.inverse(Z) @ se3.inverse(all_poses[r, ki])
                        @ all_poses[r, kj])
            return e * si_e
        r_cr = jax.vmap(cr_res)(cross["r"], cross["ki"], cross["kj"],
                                cross["meas"], cross["sqrt_info"])
        chi2_cr = jnp.sum(r_cr * r_cr, axis=-1)
        w_cross = jnp.where(cross["robust"] > 0,
                            _tls(chi2_cr, mu, barc_sq),
                            1.0) * cross["valid"]

    # unified coarse edge list: separators + crossing intra edges
    # endpoints as (robot, local pose index); separator weights dynamic
    r0 = jnp.concatenate([sep["r0"], cross["r"]])
    k0 = jnp.concatenate([sep["k0"], cross["ki"]])
    r1 = jnp.concatenate([sep["r1"], cross["r"]])
    k1 = jnp.concatenate([sep["k1"], cross["kj"]])
    meas = jnp.concatenate([sep["meas"], cross["meas"]])
    si = jnp.concatenate([sep["sqrt_info"], cross["sqrt_info"]])
    w = jnp.concatenate([w_sep, w_cross])
    v0 = r0 * M + jnp.minimum(k0 // seg_len, M - 1)
    v1 = r1 * M + jnp.minimum(k1 // seg_len, M - 1)
    E = int(v0.shape[0])

    oh1 = jax.nn.one_hot(v1, V, dtype=dtype)
    oh0 = jax.nn.one_hot(v0, V, dtype=dtype)
    sqrt_w = jnp.sqrt(w)

    def gn_step(H, _):
        # current corrected endpoint poses: pose k of robot r moves by
        # H[r, k // seg_len]
        def corr(r, k):
            return H[r, jnp.minimum(k // seg_len, M - 1)] @ all_poses[r, k]

        X0 = jax.vmap(corr)(r0, k0)
        X1 = jax.vmap(corr)(r1, k1)
        e_raw = jax.vmap(lambda Z, a, b: se3.log(
            se3.inverse(Z) @ se3.inverse(a) @ b))(meas, X0, X1)
        # J1 = Jr_inv(e) Ad(B^-1); J0 = -J1
        J1 = jax.vmap(lambda er, B: se3.se3_jr_inv(er)
                      @ se3.adjoint(se3.inverse(B)))(e_raw, X1)
        si_w = si * sqrt_w[:, None]
        J1w = si_w[:, :, None] * J1  # [E, 6, 6]
        ew = e_raw * si_w
        # [E, 6, V, 6] -> [E, 6, 6V]
        Jfull = (oh1[:, None, :, None] * J1w[:, :, None, :]
                 - oh0[:, None, :, None] * J1w[:, :, None, :]
                 ).reshape(E, 6, 6 * V)
        Hmat = jnp.einsum("eai,eaj->ij", Jfull, Jfull)
        b = jnp.einsum("eai,ea->i", Jfull, ew)
        # gauge prior: pin robot 0 segment 0 hard, weak pull to I elsewhere.
        # The weak jitter must scale with the Hessian magnitude: crossing-
        # edge rows contribute O(1e8) diagonal entries (sqrt_info^2 * |J|^2)
        # and a FIXED 1e-3 sits below f32 epsilon relative to that, so when
        # every separator is TLS-cut (hard-mu sweeps mid-recovery) the
        # inter-robot blocks are exactly singular and the f32 LU returns
        # NaN — which then poisons the pose state through the masked
        # (weight-0) residual products.
        weak = jnp.maximum(1e-3, 1e-6 * jnp.max(jnp.abs(jnp.diag(Hmat))))
        prior = jnp.concatenate(
            [jnp.full(6, 1e6, dtype),
             jnp.full(6 * (V - 1), 1.0, dtype) * weak.astype(dtype)])
        Hmat = Hmat + jnp.diag(prior)
        delta = -jnp.linalg.solve(Hmat, b).reshape(V, 6)
        # the coarse level is a bias-free accelerator: a numerically failed
        # solve must degrade to "no correction", never poison the state
        delta = jnp.where(jnp.all(jnp.isfinite(delta)), delta,
                          jnp.zeros_like(delta))
        H_new = jax.vmap(lambda d, Hv: se3.exp(d) @ Hv)(
            delta, H.reshape(V, 4, 4)).reshape(R, M, 4, 4)
        return H_new, None

    H0 = jnp.broadcast_to(jnp.eye(4, dtype=dtype), (R, M, 4, 4))
    H, _ = jax.lax.scan(gn_step, H0, None, length=iters)

    Np = all_poses.shape[1]
    seg_of = jnp.minimum(jnp.arange(Np) // seg_len, M - 1)

    def apply_robot(Hr, Pr):
        return jax.vmap(lambda k, P: Hr[seg_of[k]] @ P)(jnp.arange(Np), Pr)

    return jax.vmap(apply_robot)(H, all_poses)


def _make_sharded_sweep(mesh: Mesh, lm_iters: int, cg_iters: int,
                        barc_sq: float, coarse_iters: int = 3,
                        segments: int = 1, seg_len: int = 1 << 30):
    """shard_mapped one-sweep: (local, sep, mu, coarse_on) -> (new stacked
    poses, replicated separator TLS weights [nb_sep]).

    Each sweep = coarse segment-rigid alignment (replicated tiny GN over
    the separator graph + segment-crossing intra edges, see
    :func:`_coarse_alignment`) + local robust LM block solve per device.
    ``segments``/``seg_len`` are static (one compile per coarse partition).
    """
    pspec_local = P(AXIS)
    pspec_repl = P()
    nb_robots = mesh.shape[AXIS]

    def sweep(local: PoseGraphArrays, sep: dict, mu: jax.Array,
              coarse_on: jax.Array):
        # inside shard_map: leading axis is this device's single robot
        me = jax.lax.axis_index(AXIS)
        g = jax.tree_util.tree_map(lambda x: x[0], local)
        all_poses = jax.lax.all_gather(g.poses, AXIS)  # [R, Np, 4, 4]

        # GNC weights at the current estimate (for the coarse stage).
        # NOTE: the TLS surrogate's mid-zone weight goes to ~0 as mu -> 0,
        # NOT to 1 — it cannot express "unweighted"; any phase needing
        # weight 1 must run at mu where lower = mu/(mu+1)*barc_sq covers
        # the expected chi2 (the init sweeps use mu = 1).
        def _sep_weights(chi2):
            """TLS weights at the current mu, optionally overridden by a
            previous round's carried classification (steady-state warm
            solves: ``carry_on`` is 1 only during the init gating sweep,
            and only separators present last round — ``carry_known`` —
            are overridden; new edges get the normal mu-gate)."""
            w = _tls(chi2, mu, barc_sq)
            if "w_carry" in sep:
                carried = jnp.where(sep["carry_known"] > 0,
                                    sep["w_carry"], w)
                w = jnp.where(sep["carry_on"] > 0, carried, w)
            return jnp.where(sep["valid"] > 0, w, 0.0)

        _, chi2_pre = _sep_residuals(all_poses, sep)
        w_pre = _sep_weights(chi2_pre)
        # coarse two-level accelerator (identical replicated computation
        # on every device); bias-free, so it can run every sweep —
        # ``coarse_on`` exists to disable it for A/B measurements
        if coarse_iters > 0:
            aligned = _coarse_alignment(
                all_poses, sep, w_pre, sep.get("cross"), nb_robots,
                segments, seg_len, mu=mu, barc_sq=barc_sq,
                iters=coarse_iters)
            all_poses = jnp.where(coarse_on, aligned, all_poses)
        my_poses = all_poses[me]

        idx, target, info, valid = _separator_priors(me, all_poses, sep)
        # re-derive TLS weights post-alignment (rigid modes removed, so
        # genuine separators recover weight before the local solve).
        # chi2 is the CANONICAL whitened residual computed from the global
        # pose blocks — identical on both endpoint devices. (The two
        # per-endpoint prior residuals are Ad(Z)-conjugate, not equal, so
        # weighting each endpoint by its own chi2 can cut an edge on one
        # device and keep it on the other near the TLS boundary.)
        _, chi2_canon = _sep_residuals(all_poses, sep)
        w_canon = _sep_weights(chi2_canon)
        w_sep = jnp.where(valid > 0, w_canon, 0.0)
        info = info * jnp.sqrt(w_sep)[:, None]
        # damped consensus: pull each endpoint only to the geodesic
        # midpoint between its current pose and the neighbor-implied pose.
        # Both endpoints of a separator update simultaneously (Jacobi, not
        # true Gauss-Seidel), so undamped targets overshoot the consensus
        # point and the sweep enters a two-cycle (measured: ATE alternating
        # 0.097/0.101 with delta stuck at 0.04). The half-step makes the
        # symmetric pair exchange exact in one sweep. The midpoint target
        # halves the residual, which would bias the FIXED POINT toward
        # half-weighted separators — the sqrt(2) info scaling restores the
        # exact force balance (2 * Sigma^-1 * r/2 = Sigma^-1 * r) so the
        # converged solution matches the undamped joint optimum.
        mine = my_poses[idx]
        target = jax.vmap(
            lambda A, T: A @ se3.exp(0.5 * se3.log(se3.between(A, T))))(
            mine, target)
        info = info * jnp.sqrt(2.0)
        # the canonical weights are computed from the replicated global
        # arrays, so they are already identical on every device
        w_sep_global = w_canon
        g = dataclasses.replace(g, poses=my_poses)

        B = g.prior_idx.shape[0]
        M = idx.shape[0]
        n_fill = min(M, B - 1)
        prior_idx = g.prior_idx.at[1:1 + n_fill].set(idx[:n_fill])
        prior_pose = g.prior_pose.at[1:1 + n_fill].set(target[:n_fill])
        prior_info = g.prior_sqrt_info.at[1:1 + n_fill].set(info[:n_fill])
        prior_valid = g.prior_valid.at[1:1 + n_fill].set(valid[:n_fill])

        g_local = dataclasses.replace(
            g, prior_idx=prior_idx, prior_pose=prior_pose,
            prior_sqrt_info=prior_info, prior_valid=prior_valid)
        # GNC over robust local edges (intra-robot loop closures)
        from cslam_tpu.pgo.solver import edge_residuals
        r_loc = edge_residuals(g.poses, g_local)
        chi2_loc = jnp.sum(r_loc * r_loc, axis=-1)
        weights = jnp.where(g.robust > 0, _tls(chi2_loc, mu, barc_sq), 1.0)
        res = lm_optimize(g_local, weights,
                          max_iters=lm_iters, cg_iters=cg_iters)
        return res.poses[None], w_sep_global

    return shard_map(
        sweep, mesh=mesh,
        in_specs=(jax.tree_util.tree_map(lambda _: pspec_local,
                                         _template_spec()),
                  pspec_repl,  # pytree prefix: whole sep dict replicated
                  pspec_repl, pspec_repl),
        out_specs=(pspec_local, pspec_repl), check_vma=False)


def make_distributed_step(mesh: Mesh, lm_iters: int = 15,
                          cg_iters: int = 100, barc_sq: float = 16.81):
    """Build the jitted one-sweep function over the given mesh.

    The returned callable maps (stacked local arrays, separators, mu) ->
    updated stacked poses; call it in a loop for Gauss-Seidel iterations
    with a growing GNC ``mu``. Robustness is distributed too: each device
    TLS-reweights its incident separator priors and its robust local edges
    from their current chi2 — gross outlier inter-robot loop closures are
    rejected without any central aggregation.

    Prefer :func:`make_distributed_solve` (whole robust solve in ONE
    dispatch with a convergence criterion); this per-sweep form remains for
    diagnostics like the sweeps-to-parity curve.
    """
    cache: Dict[Tuple[int, int], object] = {}

    def _compiled(segments: int, seg_len: int):
        key = (segments, seg_len)
        if key not in cache:
            sharded = _make_sharded_sweep(mesh, lm_iters, cg_iters,
                                          barc_sq, segments=segments,
                                          seg_len=seg_len)

            @jax.jit
            @highest_precision
            def _step(local, sep, mu, coarse):
                new_poses, _ = sharded(local, sep, mu, coarse)
                return dataclasses.replace(local, poses=new_poses)

            cache[key] = _step
        return cache[key]

    def step(local: PoseGraphArrays, sep: dict, mu: jax.Array,
             coarse: bool = True) -> PoseGraphArrays:
        segments, seg_len, sep_arrays = _split_coarse_meta(sep)
        return _compiled(segments, seg_len)(local, sep_arrays, mu,
                                            jnp.bool_(coarse))

    return step


def _split_coarse_meta(sep: dict) -> Tuple[int, int, dict]:
    """Pop the static coarse-partition ints out of the separator dict
    (the remaining pure-array dict is what crosses the jit boundary)."""
    segments = int(sep.get("coarse_segments", 1))
    seg_len = int(sep.get("coarse_seg_len", 1 << 30))
    sep_arrays = {k: v for k, v in sep.items()
                  if k not in ("coarse_segments", "coarse_seg_len")}
    return segments, seg_len, sep_arrays


def make_distributed_solve(mesh: Mesh, max_sweeps: int = 30,
                           lm_iters: int = 15, cg_iters: int = 100,
                           barc_sq: float = 16.81,
                           mu0: Optional[float] = None,
                           mu_step: float = 1.6, tol: float = 1e-3,
                           final_lm_iters: int = 25, init_sweeps: int = 2,
                           mu0_chi2_cap: float = 500.0,
                           coarse_sweeps: int = 1 << 30):
    """Build the jitted FULL robust distributed solve: one device dispatch.

    Runs Gauss-Seidel sweeps in a ``lax.while_loop`` until converged
    (bounded by ``max_sweeps``), mirroring the centralized
    ``gnc_optimize``'s stopping semantics plus the block-coordinate one:

    - separator TLS weights are binary (all 0/1 within 1e-3) or stable
      (max change < 1e-3 from the previous sweep), AND
    - the pose blocks have stopped moving (max |entry change| < ``tol``).

    A final full-budget sweep polishes the blocks at the converged weights
    (the analogue of gnc_optimize's final LM polish). Returns
    ``(poses [R,Np,4,4], sweeps_used, final_delta, sep_weights)``.
    """
    cache: Dict[Tuple[int, int], object] = {}

    def solve(local: PoseGraphArrays, sep: dict):
        segments, seg_len, sep_arrays = _split_coarse_meta(sep)
        key = (segments, seg_len)
        if key not in cache:
            cache[key] = _build_solve(
                _make_sharded_sweep(mesh, lm_iters, cg_iters, barc_sq,
                                    segments=segments, seg_len=seg_len),
                _make_sharded_sweep(mesh, final_lm_iters, cg_iters,
                                    barc_sq, segments=segments,
                                    seg_len=seg_len))
        return cache[key](local, sep_arrays)

    def _build_solve(sharded, final_sharded):
        return _make_jitted_solve(
            sharded, final_sharded, max_sweeps=max_sweeps, mu0=mu0,
            mu_step=mu_step, barc_sq=barc_sq, tol=tol,
            init_sweeps=init_sweeps, mu0_chi2_cap=mu0_chi2_cap,
            coarse_sweeps=coarse_sweeps)

    return solve


def _make_jitted_solve(sharded, final_sharded, *, max_sweeps, mu0, mu_step,
                       barc_sq, tol, init_sweeps, mu0_chi2_cap,
                       coarse_sweeps):
    @jax.jit
    @highest_precision
    def solve(local: PoseGraphArrays, sep: dict):
        # highest_precision: ALL device math traced here (coarse GN normal
        # equations, canonical separator chi2, geodesic midpoints, adaptive
        # mu0) must run at full f32 on TPU — bf16 matmul passes degrade
        # chi2 enough to flip TLS weights near the inlier boundary
        # (CLAUDE.md hard-won fact; CPU tests cannot catch this).
        def with_poses(poses):
            return dataclasses.replace(local, poses=poses)

        nb_sep = sep["valid"].shape[0]

        def _with_carry(on):
            """Enable the carried-classification override (warm steady
            state) only during the init gating sweep(s)."""
            if "w_carry" not in sep:
                return sep
            return {**sep, "carry_on": jnp.asarray(on, jnp.float32)}

        sep_init, sep_run = _with_carry(1.0), _with_carry(0.0)

        # phase 0: ROBUST init sweeps at mu = 1 — TLS weight 1 for edges
        # with chi2 below barc_sq/2, smoothly to 0 beyond 2*barc_sq, i.e.
        # plausible edges count fully while gross outliers are excluded.
        # This is deliberately NOT the centralized solver's unweighted
        # initial LM: forcing weight 1 on everything lets a 15 m outlier
        # separator yank two blocks together during init, and the sweep
        # recovers far slower than a centralized LM does (measured on
        # 8x256 + 2 outliers: final ATE 1.76 vs 0.17 with robust init).
        # A genuine edge cut here re-enters later: mu0 below is derived
        # from its post-init chi2 with a wide cap (mu0_chi2_cap), so
        # graduation starts permissive enough for everything short of
        # outlier-magnitude drift.
        def init_body(_, poses):
            new_poses, _w = sharded(with_poses(poses), sep_init,
                                    jnp.float32(1.0), jnp.bool_(True))
            return new_poses
        poses0 = jax.lax.fori_loop(0, init_sweeps, init_body, local.poses)

        # adaptive mu0 from the initialized estimate, GTSAM-style
        # (GncOptimizer::initializeMu with the chi2 cap of gnc_optimize).
        # The max runs over EVERY robust residual — separators AND robust
        # intra-robot loop closures — since the same mu drives TLS on
        # both; separator-only mu0 would hard-threshold genuine intra
        # loop closures from sweep 1 when the separators happen to be
        # clean.
        if mu0 is None:
            from cslam_tpu.pgo.solver import edge_residuals
            _, chi2_sep = _sep_residuals(poses0, sep)
            sep_keep = sep["valid"] > 0
            if "w_carry" in sep:
                # warm steady state: separators the previous round already
                # classified as outliers must not drive mu0 down — their
                # (huge, expected) chi2 would force a full re-graduation
                # every round. Excluding them, a clean carried state gives
                # max chi2 <= barc_sq and mu_init collapses to 1e6 (hard
                # TLS, the fast path); a falsely-carried classification
                # that yanked the gating sweep leaves genuine separators
                # with large chi2, so graduation re-runs and the state
                # self-corrects instead of hard-cutting everything.
                known_out = (sep["carry_known"] > 0) & (sep["w_carry"] < 0.5)
                sep_keep = sep_keep & jnp.logical_not(known_out)
            sep_max = jnp.max(jnp.where(sep_keep, chi2_sep, 0.0))
            local0 = with_poses(poses0)
            r_loc = jax.vmap(lambda g: edge_residuals(g.poses, g))(local0)
            chi2_loc = jnp.sum(r_loc * r_loc, axis=-1)  # [R, Ne]
            rob_mask = local0.robust * local0.edge_valid
            loc_keep = rob_mask > 0
            if "w_carry" in sep:
                # warm steady state: intra-robot loop closures that are
                # GROSS at the warm poses (= the previous round's converged
                # solution) were hard-TLS-cut by that round — letting
                # their huge chi2 drive mu0 down would force a full
                # re-graduation every round (the separator analogue is
                # known_out above). Moderate chi2 stays in the max so a
                # NEW genuine edge with imperfect alignment still
                # graduates instead of being hard-cut on arrival.
                loc_keep = loc_keep & (
                    chi2_loc <= _WARM_INTRA_GROSS * barc_sq)
            loc_max = jnp.max(jnp.where(loc_keep, chi2_loc, 0.0))
            max_chi2 = jnp.minimum(jnp.maximum(sep_max, loc_max),
                                   mu0_chi2_cap * barc_sq)
            mu_init = jnp.where(max_chi2 > barc_sq,
                                barc_sq / (2.0 * max_chi2 - barc_sq), 1e6)
            mu_init = jnp.maximum(mu_init, 1e-6).astype(jnp.float32)
        else:
            mu_init = jnp.float32(mu0)

        def cond(state):
            _, _, it, _, done, _ = state
            return jnp.logical_and(it < max_sweeps, jnp.logical_not(done))

        def body(state):
            poses, mu, it, w_prev, _, _ = state
            new_poses, w = sharded(with_poses(poses), sep_run, mu,
                                   it < coarse_sweeps)
            delta = jnp.max(jnp.abs(new_poses - poses))
            binary = jnp.all(jnp.logical_or(w < 1e-3, w > 1.0 - 1e-3))
            stable = jnp.max(jnp.abs(w - w_prev)) < 1e-3
            done = jnp.logical_and(jnp.logical_or(binary, stable),
                                   delta < tol)
            return (new_poses, jnp.minimum(mu * mu_step, 1e6),
                    it + 1, w, done, delta)

        init = (poses0, mu_init, jnp.int32(0),
                jnp.zeros(nb_sep, jnp.float32), jnp.bool_(False),
                jnp.float32(jnp.inf))
        poses, mu, sweeps, w, _, delta = jax.lax.while_loop(cond, body, init)
        # final polish sweep at full LM budget and the converged mu
        poses, w = final_sharded(with_poses(poses), sep_run, mu,
                                 jnp.bool_(False))
        return poses, sweeps, delta, w

    return solve


def _template_spec() -> PoseGraphArrays:
    """A pytree with the same structure as PoseGraphArrays, used only for
    building in_specs."""
    z = jnp.zeros(())
    return PoseGraphArrays(z, z, z, z, z, z, z, z, z, z, z, z)


_SOLVER_CACHE: Dict[Tuple, object] = {}


class DistributedInfo:
    """Convergence diagnostics of one distributed solve."""

    def __init__(self, sweeps_used: int, final_delta: float,
                 sep_weights: np.ndarray,
                 sep_weight_by_key: Optional[Dict] = None):
        self.sweeps_used = sweeps_used
        self.final_delta = final_delta
        self.sep_weights = sep_weights
        #: {((r0, kf0), (r1, kf1)): weight} — feed back into the next
        #: round's ``distributed_optimize(carried_weights=...)``
        self.sep_weight_by_key = sep_weight_by_key or {}

    def __repr__(self):
        return (f"DistributedInfo(sweeps_used={self.sweeps_used}, "
                f"final_delta={self.final_delta:.2e})")


def distributed_optimize(problem: ShardedPoseGraph, mesh: Mesh,
                         sweeps: int = 30, lm_iters: int = 15,
                         cg_iters: int = 100, mu0: Optional[float] = None,
                         mu_step: float = 1.6, barc_sq: float = 16.81,
                         tol: float = 1e-3, return_info: bool = False,
                         warm: bool = False,
                         carried_weights: Optional[Dict] = None):
    """Run robust block Gauss-Seidel PGO over the mesh — one dispatch.

    The whole robust solve (GNC mu schedule, separator reweighting,
    Gauss-Seidel sweeps, convergence check, final polish) runs inside a
    single jitted ``lax.while_loop`` program; ``sweeps`` is the upper
    bound, the separator-residual criterion (see
    :func:`make_distributed_solve`) usually stops well short of it.

    ``warm=True`` is the incremental steady-state mode: the problem's
    variable poses are a previous round's solution, so the robust init
    sweeps are skipped and graduation starts at saturated mu (hard TLS —
    chi2 at the warm poses classifies in/outliers correctly from sweep 1).
    This carries the GNC state through the poses, the distributed
    analogue of the centralized ``gnc_reoptimize`` (round-1 fact: the
    information worth carrying is the classification, not the schedule).

    ``carried_weights`` (warm mode) maps separator identity
    ``((r0, kf0), (r1, kf1))`` — see :meth:`ShardedPoseGraph.separator_keys`
    — to the previous round's TLS weight. During the warm init gating
    sweep those separators use the carried classification directly (a
    previously-rejected outlier stays rejected with NO re-graduation, a
    previously-accepted edge pulls at full weight even if drift moved its
    instantaneous chi2); separators not in the map (new loop closures) get
    the normal mu = 1 gate. After the gating sweep every weight is
    re-derived hard-TLS from the current estimate, so a falsely-carried
    classification self-corrects rather than persisting forever.

    Returns the optimized values dict, or ``(values, DistributedInfo)``
    when ``return_info`` is set.
    """
    local, sep = problem.to_device_arrays(mesh)
    sep_keys = problem.separator_keys()
    if carried_weights:
        nb_sep = sep["valid"].shape[0]
        w_carry = np.ones(nb_sep, np.float32)
        known = np.zeros(nb_sep, np.float32)
        for i, k in enumerate(sep_keys):
            if k in carried_weights:
                w_carry[i] = carried_weights[k]
                known[i] = 1.0
        sep = {**sep, "w_carry": jnp.asarray(w_carry),
               "carry_known": jnp.asarray(known)}
    sharding = NamedSharding(mesh, P(AXIS))
    local = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), local)
    if warm:
        # one mu = 1 gating sweep first (new genuine loop closures with
        # accumulated drift get a nonzero mid-zone weight and pull the
        # blocks before the hard refresh — mirroring gnc_reoptimize's
        # init-gated weighted LM + hard-TLS refresh), then saturated mu.
        # With carried_weights the saturation is adaptive: mu0 is derived
        # from the post-gating chi2 EXCLUDING known outliers, so a clean
        # steady state still jumps straight to hard TLS (mu = 1e6) while
        # a falsely-carried classification triggers re-graduation and
        # self-corrects (see _make_jitted_solve's sep_keep masking).
        assert mu0 is None, "warm=True derives mu0 itself; don't mix"
        init_sweeps = 1
        if not carried_weights:
            mu0 = 1e6
    else:
        init_sweeps = 2
    # reuse the built solver across calls (steady-state rounds must not
    # rebuild the jit closure and retrace the most expensive program in
    # the repo every optimization)
    key = (tuple(d.id for d in mesh.devices.flat), sweeps, lm_iters,
           cg_iters, barc_sq, mu0, mu_step, tol, init_sweeps)
    solve = _SOLVER_CACHE.get(key)
    if solve is None:
        solve = make_distributed_solve(
            mesh, max_sweeps=sweeps, lm_iters=lm_iters, cg_iters=cg_iters,
            barc_sq=barc_sq, mu0=mu0, mu_step=mu_step, tol=tol,
            init_sweeps=init_sweeps)
        _SOLVER_CACHE[key] = solve
    poses, sweeps_used, delta, w = solve(local, sep)
    values = problem.values_from_arrays(np.asarray(poses))
    if return_info:
        w_np = np.asarray(w)
        info = DistributedInfo(
            int(sweeps_used), float(delta), w_np,
            {k: float(w_np[i]) for i, k in enumerate(sep_keys)})
        return values, info
    return values
