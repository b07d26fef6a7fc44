"""Pose-graph optimizer tests: convergence, gauge handling, outlier rejection.

The fidelity contract mirrors what the reference gets from GTSAM GNC(LM)
(``src/back_end/decentralized_pgo.cpp:796-856``): noisy odometry + loop
closures converge near ground truth; gross outlier loop closures are
rejected by GNC instead of corrupting the estimate.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from cslam_tpu.ops import se3
from cslam_tpu.pgo import FactorGraph, gnc_optimize, lm_optimize

ROT_STD, TRANS_STD = 0.01, 0.1  # reference default noise (dpgo.cpp:64-70)
SIGMAS = np.array([ROT_STD] * 3 + [TRANS_STD] * 3)


def circle_trajectory(n, radius=10.0, robot=0):
    """Ground-truth poses around a circle (a loop, so closures exist)."""
    poses = {}
    for k in range(n):
        a = 2 * np.pi * k / n
        xi = np.array([0, 0, a, radius * np.cos(a), radius * np.sin(a), 0.0])
        # build pose directly: z-rotation by a, translation on circle
        T = np.eye(4)
        T[:3, :3] = np.array([[np.cos(a), -np.sin(a), 0],
                              [np.sin(a), np.cos(a), 0],
                              [0, 0, 1.0]])
        T[:3, 3] = [radius * np.cos(a), radius * np.sin(a), 0.0]
        poses[(robot, k)] = T
    return poses


def noisy_between(Ta, Tb, rng, rot_std=ROT_STD, trans_std=TRANS_STD):
    z = np.asarray(se3.between(jnp.asarray(Ta), jnp.asarray(Tb)))
    noise = np.concatenate([rng.normal(scale=rot_std, size=3),
                            rng.normal(scale=trans_std, size=3)])
    return np.asarray(se3.compose(jnp.asarray(z), se3.exp(jnp.asarray(noise))))


def ate(estimates, ground_truth, keys):
    errs = [np.linalg.norm(estimates[k][:3, 3] - ground_truth[k][:3, 3])
            for k in keys]
    return float(np.sqrt(np.mean(np.square(errs))))


def build_graph(gt, rng, odom_noise=True, loops=(), outliers=(),
                drift_init=True, rot_std=ROT_STD, trans_std=TRANS_STD):
    """Factor graph with noisy odometry chain initialization (dead-reckoned)."""
    graph = FactorGraph()
    keys = sorted(gt.keys())
    by_robot = {}
    for r, k in keys:
        by_robot.setdefault(r, []).append((r, k))

    odometry = {}
    for r, ks in by_robot.items():
        for a, b in zip(ks[:-1], ks[1:]):
            z = (noisy_between(gt[a], gt[b], rng, rot_std, trans_std)
                 if odom_noise
                 else np.asarray(se3.between(jnp.asarray(gt[a]),
                                             jnp.asarray(gt[b]))))
            odometry[(a, b)] = z

    # dead-reckoned initial values (what odometry_pose_estimates_ holds)
    for r, ks in by_robot.items():
        current = gt[ks[0]]
        graph.add_variable(ks[0], current)
        for a, b in zip(ks[:-1], ks[1:]):
            if drift_init:
                current = np.asarray(se3.compose(jnp.asarray(current),
                                                 jnp.asarray(odometry[(a, b)])))
            else:
                current = gt[b]
            graph.add_variable(b, current)

    for (a, b), z in odometry.items():
        graph.add_between(a, b, z, SIGMAS, robust=False)

    for a, b in loops:
        z = (noisy_between(gt[a], gt[b], rng, rot_std, trans_std)
             if odom_noise
             else np.asarray(se3.between(jnp.asarray(gt[a]),
                                         jnp.asarray(gt[b]))))
        graph.add_between(a, b, z, SIGMAS, robust=True)
    for a, b in outliers:
        bad = np.asarray(se3.exp(jnp.asarray(
            np.concatenate([rng.uniform(-2, 2, 3), rng.uniform(-20, 20, 3)]))))
        graph.add_between(a, b, bad, SIGMAS, robust=True)

    anchor = keys[0]
    graph.add_prior(anchor, graph.get_pose(anchor), SIGMAS)
    return graph


def extract(graph, poses):
    return {tuple(v.key.as_tuple()): v.pose
            for v in graph.values_from_arrays(poses)}


class TestLM:

    def test_perfect_graph_stays_put(self):
        gt = circle_trajectory(20)
        rng = np.random.default_rng(0)
        graph = build_graph(gt, rng, odom_noise=False, drift_init=False,
                            loops=[((0, 0), (0, 10))])
        arrays = graph.to_arrays()
        res = lm_optimize(arrays, jnp.ones(arrays.num_edges))
        assert ate(extract(graph, res.poses), gt, list(gt)) < 1e-3

    def test_noisy_loop_graph_converges(self):
        gt = circle_trajectory(40)
        rng = np.random.default_rng(1)
        loops = [((0, 0), (0, 20)), ((0, 5), (0, 35)), ((0, 10), (0, 30)),
                 ((0, 0), (0, 39))]
        graph = build_graph(gt, rng, loops=loops)
        arrays = graph.to_arrays()
        init_ate = ate(extract(graph, arrays.poses), gt, list(gt))
        res = lm_optimize(arrays, jnp.ones(arrays.num_edges))
        final_ate = ate(extract(graph, res.poses), gt, list(gt))
        assert res.final_cost < 1e3
        assert final_ate < init_ate * 0.8
        assert final_ate < 0.5

    def test_anchor_holds_gauge(self):
        gt = circle_trajectory(15)
        rng = np.random.default_rng(2)
        graph = build_graph(gt, rng, loops=[((0, 0), (0, 7))])
        arrays = graph.to_arrays()
        res = lm_optimize(arrays, jnp.ones(arrays.num_edges))
        est = extract(graph, res.poses)
        # anchored first pose must stay at its prior
        assert np.linalg.norm(est[(0, 0)][:3, 3] - gt[(0, 0)][:3, 3]) < 0.2


class TestMultiRobot:

    def test_two_robot_graph(self):
        gt = {}
        gt.update(circle_trajectory(25, radius=10.0, robot=0))
        # robot 1 drives the same circle shifted slightly
        for (r, k), T in circle_trajectory(25, radius=10.5, robot=1).items():
            gt[(r, k)] = T
        rng = np.random.default_rng(3)
        loops = [((0, k), (1, k)) for k in range(0, 25, 5)]
        graph = build_graph(gt, rng, loops=loops)
        arrays = graph.to_arrays()
        res = lm_optimize(arrays, jnp.ones(arrays.num_edges))
        final_ate = ate(extract(graph, res.poses), gt, list(gt))
        assert final_ate < 0.6


class TestGNC:

    def test_all_inliers_matches_lm(self):
        gt = circle_trajectory(30)
        rng = np.random.default_rng(4)
        loops = [((0, 0), (0, 15)), ((0, 5), (0, 25))]
        graph = build_graph(gt, rng, loops=loops)
        arrays = graph.to_arrays()
        res_lm = lm_optimize(arrays, jnp.ones(arrays.num_edges))
        res_gnc = gnc_optimize(arrays)
        ate_lm = ate(extract(graph, res_lm.poses), gt, list(gt))
        ate_gnc = ate(extract(graph, res_gnc.poses), gt, list(gt))
        assert ate_gnc < ate_lm + 0.1

    def test_outliers_rejected(self):
        gt = circle_trajectory(40)
        rng = np.random.default_rng(5)
        loops = [((0, 0), (0, 20)), ((0, 5), (0, 35)), ((0, 10), (0, 30))]
        outliers = [((0, 3), (0, 22)), ((0, 8), (0, 33))]
        graph = build_graph(gt, rng, loops=loops, outliers=outliers)
        arrays = graph.to_arrays()

        res_plain = lm_optimize(arrays, jnp.ones(arrays.num_edges))
        res_gnc = gnc_optimize(arrays)
        ate_plain = ate(extract(graph, res_plain.poses), gt, list(gt))
        ate_gnc = ate(extract(graph, res_gnc.poses), gt, list(gt))

        # GNC must beat plain LS in the presence of gross outliers...
        assert ate_gnc < ate_plain
        assert ate_gnc < 0.5
        # ...by driving the outlier weights to ~0 while keeping inliers
        w = np.asarray(res_gnc.weights)
        edge_lookup = {}
        valid = np.asarray(arrays.edge_valid) > 0
        robust = np.asarray(arrays.robust) > 0
        # the two outlier edges are the last two robust edges inserted
        robust_idx = np.nonzero(valid & robust)[0]
        outlier_w = w[robust_idx[-2:]]
        inlier_w = w[robust_idx[:-2]]
        assert np.all(outlier_w < 0.1)
        assert np.all(inlier_w > 0.5)


class TestTierFloors:

    def test_floored_solve_matches_unfloored(self):
        """backend.pgo_np_floor/pgo_ne_floor pad the arrays to a bigger
        tier; the masked solver must produce the same poses (padding
        invariance is what makes mission-bound tier pinning free)."""
        gt = circle_trajectory(30)
        rng = np.random.default_rng(21)
        loops = [((0, 0), (0, 15)), ((0, 5), (0, 25))]
        graph = build_graph(gt, rng, loops=loops,
                            outliers=[((0, 2), (0, 20))])
        res = gnc_optimize(graph.to_arrays())
        res_f = gnc_optimize(graph.to_arrays(np_floor=64, ne_floor=128))
        n = len(gt)
        np.testing.assert_allclose(np.asarray(res.poses)[:n],
                                   np.asarray(res_f.poses)[:n],
                                   atol=1e-5)

    def test_floors_collapse_warmup_grid(self):
        """Pinned floors reduce the warmup grid to the reachable tiers
        only (tiers below a floor never occur — graphs pad up to it)."""
        from cslam_tpu.runtime.backend_node import DecentralizedPGO
        from cslam_tpu.runtime.bus import MessageBus, RobotContext
        from cslam_tpu.runtime.clock import VirtualClock
        bus, clock = MessageBus(), VirtualClock()
        be = DecentralizedPGO(RobotContext(
            bus, clock, 0, {"robot_id": 0, "max_nb_robots": 3}))
        assert len(be.warmup_tier_grid(1050, 2100)) > 4
        be_pinned = DecentralizedPGO(RobotContext(
            bus, clock, 0, {"robot_id": 0, "max_nb_robots": 3,
                            "backend.pgo_np_floor": 2048,
                            "backend.pgo_ne_floor": 2048}))
        grid = be_pinned.warmup_tier_grid(1050, 2100)
        assert grid == [(2048, 2048), (2048, 4096)] \
            or sorted(grid) == [(2048, 2048), (2048, 4096)]
        # floor covers the edge bound too -> exactly one program
        grid1 = be_pinned.warmup_tier_grid(1050, 1500)
        assert sorted(set(grid1)) == [(2048, 2048)]


class TestAnalyticJacobians:

    def test_matches_jacfwd_oracle(self):
        """The analytic linearization must reproduce the jacfwd-based one
        on a realistic graph (drifted inits, loops, outliers)."""
        from cslam_tpu.pgo.solver import _linearize, _linearize_jacfwd
        gt = circle_trajectory(25)
        rng = np.random.default_rng(12)
        graph = build_graph(gt, rng,
                            loops=[((0, 0), (0, 12)), ((0, 4), (0, 20))],
                            outliers=[((0, 2), (0, 15))])
        arrays = graph.to_arrays()
        out_a = _linearize(arrays.poses, arrays)
        out_f = _linearize_jacfwd(arrays.poses, arrays)
        names = ("r", "Ji", "Jj", "rp", "Jp")
        for name, a, f in zip(names, out_a, out_f):
            np.testing.assert_allclose(np.asarray(a), np.asarray(f),
                                       atol=2e-4, rtol=2e-4, err_msg=name)


class TestWarmStart:

    def test_reoptimize_carries_weights(self):
        """Incremental re-solve (previous solution + previous TLS weights)
        must match full-GNC quality and keep the outlier rejected."""
        import dataclasses
        from cslam_tpu.pgo.solver import gnc_reoptimize
        gt = circle_trajectory(50)
        rng = np.random.default_rng(9)
        loops = [((0, 0), (0, 25)), ((0, 5), (0, 45)), ((0, 12), (0, 38))]
        outliers = [((0, 4), (0, 30))]
        graph = build_graph(gt, rng, loops=loops, outliers=outliers)
        arrays = graph.to_arrays()

        res_cold = gnc_optimize(arrays)
        cold_ate = ate(extract(graph, res_cold.poses), gt, list(gt))

        warm_arrays = dataclasses.replace(arrays, poses=res_cold.poses)
        res_warm = gnc_reoptimize(warm_arrays, res_cold.weights)
        warm_ate = ate(extract(graph, res_warm.poses), gt, list(gt))

        assert warm_ate < cold_ate + 0.05
        robust_idx = np.nonzero(np.asarray(arrays.edge_valid)
                                * np.asarray(arrays.robust))[0]
        assert np.asarray(res_warm.weights)[robust_idx[-1]] < 0.1
        inlier_w = np.asarray(res_warm.weights)[robust_idx[:-1]]
        assert np.all(inlier_w > 0.5)

    def test_reoptimize_handles_new_edges(self):
        """Edges added since the previous round (warm weight = 1) must be
        used if consistent and rejected if gross outliers."""
        import dataclasses
        from cslam_tpu.pgo.solver import gnc_reoptimize
        gt = circle_trajectory(50)
        rng = np.random.default_rng(10)
        loops = [((0, 0), (0, 25)), ((0, 5), (0, 45))]
        graph = build_graph(gt, rng, loops=loops)
        res_cold = gnc_optimize(graph.to_arrays())

        # next round: same trajectory, one new true loop + one new outlier
        graph2 = build_graph(gt, rng, loops=loops + [((0, 12), (0, 38))],
                             outliers=[((0, 4), (0, 30))])
        arrays2 = graph2.to_arrays()
        # initialize at previous solution (keys are identical here)
        sol = {tuple(v.key.as_tuple()): v.pose
               for v in graph.values_from_arrays(res_cold.poses)}
        init = np.asarray(arrays2.poses).copy()
        for k, pose in sol.items():
            init[graph2.index_of(k)] = pose
        arrays2 = dataclasses.replace(arrays2, poses=jnp.asarray(init))
        # previous weights for carried-over edges; new edges start at 1
        w = np.ones(arrays2.num_edges)
        res_warm = gnc_reoptimize(arrays2, jnp.asarray(w))

        warm_ate = ate(extract(graph2, res_warm.poses), gt, list(gt))
        assert warm_ate < 0.5
        robust_idx = np.nonzero(np.asarray(arrays2.edge_valid)
                                * np.asarray(arrays2.robust))[0]
        weights = np.asarray(res_warm.weights)
        assert weights[robust_idx[-1]] < 0.1       # new outlier rejected
        assert np.all(weights[robust_idx[:-1]] > 0.5)  # true loops kept


class TestChordalInit:

    def test_recovers_from_large_rotation_drift(self):
        """Dead-reckoned inits with big accumulated yaw drift strand plain
        LM; chordal initialization recovers the basin."""
        from cslam_tpu.pgo.chordal import chordal_initialize
        gt = circle_trajectory(60, radius=15.0)
        rng = np.random.default_rng(11)

        graph = FactorGraph()
        keys = sorted(gt.keys())
        cur = gt[keys[0]]
        graph.add_variable(keys[0], cur)
        for a, b in zip(keys[:-1], keys[1:]):
            z = noisy_between(gt[a], gt[b], rng, rot_std=0.03, trans_std=0.05)
            cur = np.asarray(se3.compose(jnp.asarray(cur), jnp.asarray(z)))
            graph.add_variable(b, cur)
            graph.add_between(a, b, z, SIGMAS)
        for a, b in [((0, 0), (0, 30)), ((0, 10), (0, 50)),
                     ((0, 20), (0, 40)), ((0, 0), (0, 59))]:
            z = np.asarray(se3.between(jnp.asarray(gt[a]), jnp.asarray(gt[b])))
            graph.add_between(a, b, z, SIGMAS, robust=True)
        graph.add_prior(keys[0], gt[keys[0]], SIGMAS)
        arrays = graph.to_arrays()

        init_chordal = chordal_initialize(arrays)
        ate_dead = ate(extract(graph, arrays.poses), gt, list(gt))
        ate_chordal = ate(extract(graph, init_chordal), gt, list(gt))
        # chordal init alone already beats integrating noisy odometry
        assert ate_chordal < ate_dead

        # and LM from the chordal init lands close to ground truth
        arrays_c = arrays.__class__(
            init_chordal, arrays.node_valid, arrays.edge_i, arrays.edge_j,
            arrays.meas, arrays.sqrt_info, arrays.edge_valid, arrays.robust,
            arrays.prior_idx, arrays.prior_pose, arrays.prior_sqrt_info,
            arrays.prior_valid)
        res = lm_optimize(arrays_c, jnp.ones(arrays.num_edges))
        ate_final = ate(extract(graph, res.poses), gt, list(gt))
        res_dead = lm_optimize(arrays, jnp.ones(arrays.num_edges))
        ate_dead_lm = ate(extract(graph, res_dead.poses), gt, list(gt))
        assert ate_final < 0.6                 # noise-floor territory
        assert ate_final <= ate_dead_lm + 0.05  # never worse than dead init

    def test_exact_measurements_give_exact_poses(self):
        from cslam_tpu.pgo.chordal import chordal_initialize
        gt = circle_trajectory(12, radius=5.0)
        graph = FactorGraph()
        keys = sorted(gt.keys())
        for k in keys:
            graph.add_variable(k, np.eye(4))  # garbage init, unused
        for a, b in zip(keys[:-1], keys[1:]):
            z = np.asarray(se3.between(jnp.asarray(gt[a]), jnp.asarray(gt[b])))
            graph.add_between(a, b, z, SIGMAS)
        graph.add_prior(keys[0], gt[keys[0]], SIGMAS)
        arrays = graph.to_arrays()
        poses = np.asarray(chordal_initialize(arrays))
        est = extract(graph, poses)
        for k in keys:
            np.testing.assert_allclose(est[k][:3, 3], gt[k][:3, 3], atol=0.02)
            np.testing.assert_allclose(est[k][:3, :3], gt[k][:3, :3],
                                       atol=0.02)


class TestCoarsePCG:
    """Two-level (segment-rigid) coarse correction for the PCG tier.

    Graphs above ``_DENSE_SOLVE_MAX_NODES`` solve their LM steps with
    block-Jacobi PCG, whose smoothing moves long-wavelength error one hop
    per iteration (O(diameter) iterations on pose chains). The coarse
    space of per-segment SE(3) rigid motions (``solver._coarse_correction``)
    removes that diffusion limit. These tests pin the Galerkin correctness
    of the coarse operator and the acceleration it buys.
    """

    def _linear_system(self, n=128):
        from cslam_tpu.pgo import solver as S
        rng = np.random.default_rng(3)
        gt = {}
        gt.update(circle_trajectory(n, robot=0))
        gt.update(circle_trajectory(n, radius=11.0, robot=1))
        loops = [((0, k), (1, k)) for k in range(0, n, 8)]
        graph = build_graph(gt, rng, loops=loops)
        arrays = graph.to_arrays()
        poses = arrays.poses
        w = jnp.ones(arrays.num_edges, poses.dtype)
        r, Ji, Jj, rp, Jp = S._linearize(poses, arrays)
        one_hots = S._one_hots(arrays, poses.dtype)
        D = S._hessian_blocks(arrays, Ji, Jj, Jp, w, one_hots)
        diag_h = jnp.maximum(jnp.einsum("nii->ni", D), 1e-8)
        lam = jnp.asarray(1e-4, poses.dtype)
        matvec = S._make_matvec(arrays, Ji, Jj, Jp, w, lam, diag_h, one_hots)
        grad = S._assemble_grad(arrays, Ji, Jj, Jp, r * w[:, None], rp,
                                one_hots)
        M_inv = jnp.linalg.inv(
            D + lam * diag_h[:, None] * jnp.eye(6, dtype=poses.dtype)[None])
        coarse = S._coarse_correction(arrays, poses, Ji, Jj, Jp, w, lam,
                                      diag_h)
        dense = S._dense_normal_solve(arrays, Ji, Jj, Jp, w, lam, diag_h,
                                      grad, one_hots)
        return S, arrays, poses, matvec, grad, M_inv, coarse, dense

    def test_galerkin_identity(self):
        """apply((H + lam diag H) P y) == P y for any coarse vector y.

        This is the Galerkin property P^T A P = H_c exercised end-to-end
        through the factored coarse solve: feeding A (P y) through the
        correction must reproduce P y (up to the stabilizing ridge).
        """
        from cslam_tpu.pgo import solver as S
        _, arrays, poses, matvec, _, _, coarse, _ = self._linear_system()
        Np = arrays.num_nodes
        nseg = max(1, Np // S._COARSE_SEG)
        seg = np.minimum(np.arange(Np) // S._COARSE_SEG, nseg - 1)
        A = np.asarray(se3.adjoint(se3.inverse(poses))) * np.asarray(
            arrays.node_valid)[:, None, None]
        y = np.random.default_rng(0).normal(size=(nseg, 6)).astype(np.float32)
        Py = jnp.asarray(np.einsum("nab,nb->na", A, y[seg]))
        lhs = coarse(matvec(Py))
        rel = (float(jnp.max(jnp.abs(lhs - Py)))
               / float(jnp.max(jnp.abs(Py))))
        assert rel < 5e-3

    def test_accelerates_and_matches_dense_solution(self):
        """Coarse-corrected PCG converges where block-Jacobi is still far
        off, and both head to the dense-Cholesky reference solution."""
        S, arrays, poses, matvec, grad, M_inv, coarse, dense = (
            self._linear_system())
        b = -grad

        def res_norm(x):
            return float(jnp.linalg.norm(b - matvec(x)))

        bn = float(jnp.linalg.norm(b))
        x_bj = S._pcg(matvec, b, M_inv, 150, 1e-6)
        x_c = S._pcg(matvec, b, M_inv, 150, 1e-6, coarse)
        assert res_norm(x_c) < 1e-5 * bn          # converged
        assert res_norm(x_bj) > 10 * res_norm(x_c)  # jacobi still far off
        err = float(jnp.max(jnp.abs(x_c - dense)))
        scale = float(jnp.max(jnp.abs(dense)))
        assert err < 1e-3 * max(scale, 1.0)

    def test_lm_optimize_pcg_tier_converges(self):
        """End-to-end wiring: a >512-node graph goes down the PCG branch
        (with the coarse correction) and converges like the dense tier."""
        rng = np.random.default_rng(7)
        n = 288  # 2 robots x 288 = 576 nodes > _DENSE_SOLVE_MAX_NODES
        gt = {}
        gt.update(circle_trajectory(n, robot=0))
        gt.update(circle_trajectory(n, radius=11.0, robot=1))
        loops = [((0, k), (1, k)) for k in range(0, n, 16)]
        # ground-truth init + low rotation noise: this test pins the
        # PCG-branch WIRING (coarse correction traced into lm_optimize),
        # not basin escape or noise-floor physics — at the default noise
        # (0.01 rad/step over 288 steps) the MAP estimate itself sits
        # meters from ground truth, and dead-reckoned drift additionally
        # strands plain LM in a local minimum (see BENCH.md's
        # chordal-restart A/B; gnc_optimize owns that regime)
        graph = build_graph(gt, rng, loops=loops, drift_init=False,
                            rot_std=0.002, trans_std=0.02)
        arrays = graph.to_arrays()
        assert arrays.num_nodes > 512
        from cslam_tpu.pgo.solver import cost as graph_cost
        ones = jnp.ones(arrays.num_edges)
        res = lm_optimize(arrays, ones, max_iters=15)
        cost0 = float(graph_cost(arrays.poses, arrays, ones))
        ate1 = ate(extract(graph, res.poses), gt, list(gt))
        assert float(res.final_cost) < cost0
        assert ate1 < 0.8  # noise floor ~0.5; stranded optimum is 2.4+
