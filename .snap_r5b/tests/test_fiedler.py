"""On-device Fiedler eigensolver vs. ground truth."""
import jax.numpy as jnp
import numpy as np
import pytest

from cslam_tpu.ops.fiedler import (algebraic_connectivity, fiedler_pair,
                                   laplacian_from_edges)


def dense_lambda2(L, p):
    """Ground truth second-smallest eigenvalue via numpy on the active block."""
    vals = np.linalg.eigvalsh(np.asarray(L)[:p, :p])
    return vals[1]


def make_graph(edges, p, pad_to):
    idx_i = np.array([e[0] for e in edges], np.int32)
    idx_j = np.array([e[1] for e in edges], np.int32)
    w = np.array([e[2] for e in edges], np.float32)
    active = np.zeros(pad_to, np.float32)
    active[:p] = 1.0
    L = laplacian_from_edges(jnp.asarray(idx_i), jnp.asarray(idx_j),
                             jnp.asarray(w), pad_to)
    return L, jnp.asarray(active)


def test_path_graph():
    # path on 4 nodes: lambda_2 = 2 - sqrt(2)
    edges = [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0)]
    L, active = make_graph(edges, 4, 8)
    lam2, v = fiedler_pair(L, active)
    assert float(lam2) == pytest.approx(2 - np.sqrt(2), abs=1e-5)
    # eigenvector supported on active nodes only
    np.testing.assert_allclose(np.asarray(v)[4:], 0.0, atol=1e-5)


def test_complete_graph():
    # K4: lambda_2 = 4
    edges = [(i, j, 1.0) for i in range(4) for j in range(i + 1, 4)]
    L, active = make_graph(edges, 4, 16)
    lam2, _ = fiedler_pair(L, active)
    assert float(lam2) == pytest.approx(4.0, abs=1e-4)


def test_disconnected_graph_gives_zero():
    edges = [(0, 1, 1.0), (2, 3, 1.0)]
    L, active = make_graph(edges, 4, 8)
    lam2, _ = fiedler_pair(L, active)
    assert float(lam2) == pytest.approx(0.0, abs=1e-5)


def test_random_weighted_graph_matches_numpy():
    rng = np.random.default_rng(0)
    p = 30
    edges = []
    for i in range(p - 1):
        edges.append((i, i + 1, float(rng.random()) + 0.1))
    for _ in range(40):
        i, j = rng.integers(0, p, 2)
        if i != j:
            edges.append((int(i), int(j), float(rng.random())))
    L, active = make_graph(edges, p, 64)
    lam2 = algebraic_connectivity(
        jnp.asarray(np.array([e[0] for e in edges], np.int32)),
        jnp.asarray(np.array([e[1] for e in edges], np.int32)),
        jnp.asarray(np.array([e[2] for e in edges], np.float32)),
        active)
    assert float(lam2) == pytest.approx(dense_lambda2(L, p), abs=1e-4)


def test_fiedler_vector_orthogonal_to_ones():
    edges = [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0), (3, 0, 1.0)]
    L, active = make_graph(edges, 4, 8)
    lam2, v = fiedler_pair(L, active)
    v = np.asarray(v)
    assert abs(v[:4].sum()) < 1e-4
    assert np.linalg.norm(v) == pytest.approx(1.0, abs=1e-4)


def test_woodbury_path_matches_scipy_at_scale():
    """The chain+low-rank shift-invert solver (the large-graph MAC tier)
    must match scipy's sparse eigensolver on a SLAM-shaped graph: one long
    odometry chain + sparse loop closures."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla
    from cslam_tpu.ops.fiedler import (chain_lowrank_precompute,
                                       fiedler_pair_chain_lowrank)

    rng = np.random.default_rng(0)
    p, P = 1500, 2048
    chain_w = np.zeros(P - 1, np.float32)
    chain_w[:p - 1] = 1.0
    m = 64
    lr_i = rng.integers(0, p, m).astype(np.int32)
    lr_j = ((lr_i + rng.integers(5, p // 2, m)) % p).astype(np.int32)
    lr_w = rng.uniform(0.2, 1.0, m).astype(np.float32)

    active = np.zeros(P, np.float32)
    active[:p] = 1.0
    sigma = jnp.float32(2.0 * (2.0 + 2 * lr_w.sum()) + 1.0)
    pre = chain_lowrank_precompute(jnp.asarray(chain_w), jnp.asarray(lr_i),
                                   jnp.asarray(lr_j), jnp.asarray(active),
                                   sigma)
    lam2, v = fiedler_pair_chain_lowrank(pre, jnp.asarray(lr_w),
                                         jnp.asarray(active))

    # scipy ground truth on the active block
    rows = list(range(p - 1)) + lr_i.tolist()
    cols = list(range(1, p)) + lr_j.tolist()
    w = [1.0] * (p - 1) + lr_w.tolist()
    A = sp.coo_matrix((w + w, (rows + cols, cols + rows)), shape=(p, p))
    L = sp.diags(np.asarray(A.sum(1)).ravel()) - A
    vals = spla.eigsh(L.tocsc(), k=2, sigma=-1e-4, which="LM",
                      return_eigenvectors=False)
    lam2_true = float(np.sort(vals)[1])

    # the exact objective is the Rayleigh quotient of the returned vector
    v_np = np.asarray(v)[:p]
    rq = float(v_np @ (L @ v_np))
    assert rq == pytest.approx(lam2_true, rel=0.02)
    assert float(lam2) == pytest.approx(lam2_true, rel=0.05)


class TestFusedFrankWolfe:
    """The one-dispatch lax.while_loop FW solve must match the host-driven
    loop (kept as ``fw_subset_host``) on both eigensolver tiers."""

    def _random_mac(self, rng, num_poses, n_fixed, n_cand):
        from cslam_tpu.selection.mac import MAC
        from cslam_tpu.types import Edge
        fixed = [Edge(i, i + 1, 1.0) for i in range(num_poses - 1)]
        for _ in range(n_fixed):
            i, j = rng.integers(0, num_poses, 2)
            if i != j:
                fixed.append(Edge(int(i), int(j),
                                  float(rng.uniform(0.5, 1.0))))
        cand = []
        seen = set()
        while len(cand) < n_cand:
            i, j = rng.integers(0, num_poses, 2)
            if i == j or (i, j) in seen:
                continue
            seen.add((i, j))
            cand.append(Edge(int(i), int(j), float(rng.uniform(0.1, 1.0))))
        return MAC(fixed, cand, num_poses)

    @pytest.mark.parametrize("num_poses,tier", [(60, "dense"),
                                                (700, "woodbury")])
    def test_fused_matches_host_loop(self, num_poses, tier):
        rng = np.random.default_rng(17)
        mac = self._random_mac(rng, num_poses, n_fixed=5, n_cand=30)
        assert mac._dense == (tier == "dense")
        w_init = np.full(30, 5 / 30.0)
        sel_f, w_f, dual_f = mac.fw_subset(w_init, 5, max_iters=12)
        sel_h, w_h, dual_h = mac.fw_subset_host(w_init, 5, max_iters=12)
        np.testing.assert_array_equal(sel_f, sel_h)
        np.testing.assert_allclose(w_f, w_h, atol=1e-5)
        # dual accumulates in f32 inside the fused loop vs float64 on the
        # host — identical decisions, last-ulp different bound
        np.testing.assert_allclose(dual_f, dual_h, rtol=1e-3, atol=1e-6)

    def test_warm_ritz_matches_default_selection(self):
        """Carrying the LOBPCG Ritz block across FW iterations (opt-in
        ``frontend.mac_fw_warm_ritz``) must land on the same rounded
        selection and objective as the cold-start path: the eigensolver's
        residual gate keeps every iterate converged, so only last-ulp
        eigenvector noise can differ."""
        from cslam_tpu.selection.mac import MAC
        rng = np.random.default_rng(17)
        mac_cold = self._random_mac(rng, 700, n_fixed=5, n_cand=30)
        rng = np.random.default_rng(17)
        mac_warm = self._random_mac(rng, 700, n_fixed=5, n_cand=30)
        mac_warm._fw_warm_ritz = True
        assert not mac_cold._dense
        w_init = np.full(30, 5 / 30.0)
        sel_c, w_c, dual_c = mac_cold.fw_subset(w_init, 5, max_iters=12)
        sel_w, w_w, dual_w = mac_warm.fw_subset(w_init, 5, max_iters=12)
        np.testing.assert_array_equal(sel_c, sel_w)
        lam_c = mac_cold.evaluate_objective(sel_c)
        lam_w = mac_warm.evaluate_objective(sel_w)
        assert lam_w == pytest.approx(lam_c, rel=1e-4)

    @pytest.mark.parametrize("num_poses,tier", [(60, "dense"),
                                                (700, "woodbury")])
    def test_best_rounding_fused_matches_host(self, num_poses, tier):
        """Best-rounded-iterate tracking (frontend.mac_best_rounding, the
        production default) must agree between the fused loop and the host
        oracle, and must never select a WORSE-objective set than the
        reference's round-the-final-iterate."""
        rng = np.random.default_rng(23)
        mac = self._random_mac(rng, num_poses, n_fixed=5, n_cand=30)
        mac._best_rounding = True
        assert mac._dense == (tier == "dense")
        w_init = np.full(30, 5 / 30.0)
        sel_f, w_f, _ = mac.fw_subset(w_init, 5, max_iters=12)
        sel_h, w_h, _ = mac.fw_subset_host(w_init, 5, max_iters=12)
        np.testing.assert_array_equal(sel_f, sel_h)
        np.testing.assert_allclose(w_f, w_h, atol=1e-5)
        # quality: >= the final-iterate rounding (legacy behavior)
        mac._best_rounding = False
        sel_legacy, _, _ = mac.fw_subset(w_init, 5, max_iters=12)
        lam_best = mac.evaluate_objective(sel_f)
        lam_legacy = mac.evaluate_objective(sel_legacy)
        assert lam_best >= lam_legacy * (1 - 1e-3)

    def test_fused_early_stop_and_budget(self):
        rng = np.random.default_rng(3)
        mac = self._random_mac(rng, 50, n_fixed=3, n_cand=12)
        sel, w, dual = mac.fw_subset(np.full(12, 0.5), 4, max_iters=20)
        assert sel.sum() == 4
        assert np.isfinite(dual)
        assert np.all((w >= -1e-6) & (w <= 1 + 1e-6))


class TestLobpcgEarlyExit:
    """Two-stage early exit in the Woodbury-tier eigensolver: results must
    match the full 48-iteration budget (the shift-inverted operator
    converges well inside the 14-iteration first stage), and a
    pathologically small first stage must trigger the continuation branch
    rather than return an unconverged pair."""

    def _problem(self, seed, P=700, n_lr=40):
        import jax.numpy as jnp
        from cslam_tpu.ops import fiedler as fd
        rng = np.random.default_rng(seed)
        chain_w = jnp.asarray(rng.uniform(0.5, 1.5, P - 1).astype(np.float32))
        lr_i = rng.integers(0, P, n_lr).astype(np.int32)
        lr_j = ((lr_i + rng.integers(1, P - 1, n_lr)) % P).astype(np.int32)
        lr_w = jnp.asarray(rng.uniform(0.1, 1.0, n_lr).astype(np.float32))
        active = jnp.ones(P, jnp.float32)
        sigma = jnp.float32(2.0 * 4.0 * P / P * 4 + 50.0)
        pre = fd.chain_lowrank_precompute(chain_w, jnp.asarray(lr_i),
                                          jnp.asarray(lr_j), active, sigma)
        return pre, lr_w, active

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_early_exit_matches_full_budget(self, seed):
        from cslam_tpu.ops import fiedler as fd
        pre, lr_w, active = self._problem(seed)
        lam_fast, v_fast = fd.fiedler_pair_chain_lowrank(pre, lr_w, active)
        lam_full, v_full = fd.fiedler_pair_chain_lowrank(pre, lr_w, active,
                                                         short_iters=48)
        assert float(lam_fast) == pytest.approx(float(lam_full), rel=1e-3)
        align = abs(float(np.asarray(v_fast) @ np.asarray(v_full)))
        assert align > 0.999

    def test_warm_start_block_converges_in_short_stage(self):
        """Restarting from a converged Ritz block (the FW warm-start path)
        must reproduce the answer even with a tiny first stage, and return
        the block for the next carry."""
        from cslam_tpu.ops import fiedler as fd
        pre, lr_w, active = self._problem(4)
        lam_ref, v_ref, V = fd.fiedler_pair_chain_lowrank(
            pre, lr_w, active, short_iters=48, return_block=True)
        lam_w, v_w, V2 = fd.fiedler_pair_chain_lowrank(
            pre, lr_w, active, short_iters=2, X0=V, return_block=True)
        assert float(lam_w) == pytest.approx(float(lam_ref), rel=1e-3)
        align = abs(float(np.asarray(v_w) @ np.asarray(v_ref)))
        assert align > 0.999
        assert V2.shape == V.shape

    def test_tiny_first_stage_continues(self):
        """short_iters=1 cannot converge; the residual check must route
        through the continuation branch and still land on the answer."""
        from cslam_tpu.ops import fiedler as fd
        pre, lr_w, active = self._problem(5)
        lam_ref, v_ref = fd.fiedler_pair_chain_lowrank(pre, lr_w, active,
                                                       short_iters=48)
        lam_t, v_t = fd.fiedler_pair_chain_lowrank(pre, lr_w, active,
                                                   short_iters=1)
        assert float(lam_t) == pytest.approx(float(lam_ref), rel=1e-3)
        align = abs(float(np.asarray(v_t) @ np.asarray(v_ref)))
        assert align > 0.999
