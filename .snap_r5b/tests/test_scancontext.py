"""Scan Context ops + bank: differential tests against a straightforward
numpy re-derivation of the published algorithm, plus retrieval behavior.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from cslam_tpu.matching.scancontext_bank import ScanContextBank
from cslam_tpu.ops import scancontext as sc_ops


# -- independent numpy model of the published Scan Context semantics --

def np_scancontext(points, num_ring=20, num_sector=60, max_length=80.0):
    grid = np.zeros((num_ring, num_sector))
    for p in points:
        if not np.all(np.isfinite(p)):
            continue
        x, y, z = p
        r = np.hypot(x, y)
        theta = np.degrees(np.arctan2(y, x)) % 360.0
        ring = min(int(r / (max_length / num_ring)), num_ring - 1)
        sector = min(int(theta / (360.0 / num_sector)), num_sector - 1)
        grid[ring, sector] = max(grid[ring, sector], z + 2.0)
    return grid


def np_distance(candidate, query):
    S = candidate.shape[1]
    sims = np.zeros(S)
    cand = candidate.copy()
    for i in range(S):
        cand = np.roll(cand, 1, axis=1)
        total, engaged = 0.0, 0
        for j in range(S):
            c1, c2 = cand[:, j], query[:, j]
            if not np.any(c1) or not np.any(c2):
                continue
            total += c1 @ c2 / (np.linalg.norm(c1) * np.linalg.norm(c2))
            engaged += 1
        sims[i] = total / engaged if engaged else 0.0
    return 1.0 - sims.max(), int(np.argmax(sims)) + 1


def random_cloud(rng, n=500, radius=60.0):
    r = rng.uniform(0, radius, n)
    theta = rng.uniform(0, 2 * np.pi, n)
    z = rng.uniform(-1.5, 3.0, n)
    return np.stack([r * np.cos(theta), r * np.sin(theta), z], axis=1)


class TestDescriptor:

    def test_matches_numpy_model(self):
        rng = np.random.default_rng(0)
        pts = random_cloud(rng)
        ours = np.asarray(sc_ops.points_to_scancontext(jnp.asarray(pts)))
        theirs = np_scancontext(pts)
        np.testing.assert_allclose(ours, theirs, atol=1e-5)

    def test_host_binning_matches_device_op(self):
        """The host (numpy) twin used by the per-keyframe embedding path
        must reproduce the device op exactly — padding NaNs included."""
        rng = np.random.default_rng(7)
        for n in (1, 37, 500, 2000):
            pts = random_cloud(rng, n).astype(np.float32)
            padded = np.full((2048, 3), np.nan, np.float32)
            padded[:n] = pts
            dev = np.asarray(
                sc_ops.points_to_scancontext(jnp.asarray(padded)))
            host = sc_ops.points_to_scancontext_np(padded)
            np.testing.assert_array_equal(dev, host)

    def test_model_host_binning_default_and_parity(self):
        from cslam_tpu.models.scancontext import ScanContext
        rng = np.random.default_rng(8)
        pts = random_cloud(rng, 700).astype(np.float32)
        host_model = ScanContext({})
        dev_model = ScanContext({"frontend.scancontext_host_binning": False})
        assert host_model.host_binning
        np.testing.assert_allclose(host_model.compute_embedding(pts),
                                   dev_model.compute_embedding(pts),
                                   atol=1e-6)

    def test_nan_points_ignored(self):
        rng = np.random.default_rng(1)
        pts = random_cloud(rng, 100)
        with_nans = np.concatenate(
            [pts, np.full((20, 3), np.nan)], axis=0)
        a = np.asarray(sc_ops.points_to_scancontext(jnp.asarray(pts)))
        b = np.asarray(sc_ops.points_to_scancontext(jnp.asarray(with_nans)))
        np.testing.assert_allclose(a, b, atol=1e-6)

    def test_far_points_clamped_to_outer_ring(self):
        pts = np.array([[500.0, 0.0, 1.0]])
        sc = np.asarray(sc_ops.points_to_scancontext(jnp.asarray(pts)))
        assert sc[19, 0] == pytest.approx(3.0)

    def test_ring_key(self):
        rng = np.random.default_rng(2)
        sc = rng.random((20, 60)).astype(np.float32)
        np.testing.assert_allclose(np.asarray(sc_ops.ring_key(sc)),
                                   sc.mean(axis=1), rtol=1e-6)


class TestDistance:

    def test_matches_numpy_model(self):
        rng = np.random.default_rng(3)
        a = rng.random((20, 60)).astype(np.float32)
        b = rng.random((20, 60)).astype(np.float32)
        # sprinkle zero columns to exercise the engaged-column mask
        a[:, 5] = 0.0
        b[:, 17] = 0.0
        d_ours, y_ours = sc_ops.scancontext_distance(jnp.asarray(a),
                                                     jnp.asarray(b))
        d_np, y_np = np_distance(a, b)
        assert float(d_ours) == pytest.approx(d_np, abs=1e-5)
        assert int(y_ours) == y_np

    def test_rotation_invariance(self):
        """A rotated copy of the same scene must have ~zero distance and the
        right yaw shift."""
        rng = np.random.default_rng(4)
        pts = random_cloud(rng)
        sc = np.asarray(sc_ops.points_to_scancontext(jnp.asarray(pts)))
        shift = 13
        rotated = np.roll(sc, shift, axis=1)
        d, yaw = sc_ops.scancontext_distance(jnp.asarray(rotated),
                                             jnp.asarray(sc))
        assert float(d) == pytest.approx(0.0, abs=1e-5)
        # rolling the candidate by (60 - shift) more aligns it back
        assert int(yaw) % 60 == (60 - shift) % 60

    def test_batch_agrees_with_single(self):
        rng = np.random.default_rng(5)
        cands = rng.random((7, 20, 60)).astype(np.float32)
        q = rng.random((20, 60)).astype(np.float32)
        d_b, y_b = sc_ops.scancontext_distances_batch(jnp.asarray(cands),
                                                      jnp.asarray(q))
        for i in range(7):
            d, y = sc_ops.scancontext_distance(jnp.asarray(cands[i]),
                                               jnp.asarray(q))
            assert float(d_b[i]) == pytest.approx(float(d), abs=1e-6)
            assert int(y_b[i]) == int(y)


class TestBank:

    def test_empty(self):
        bank = ScanContextBank()
        assert bank.search_best(np.zeros(1200)) == (None, None)

    def test_self_retrieval(self):
        rng = np.random.default_rng(6)
        bank = ScanContextBank()
        clouds = [random_cloud(rng) for _ in range(30)]
        scs = [np.asarray(sc_ops.points_to_scancontext(jnp.asarray(c)))
               for c in clouds]
        for i, s in enumerate(scs):
            bank.add_item(s.reshape(-1), i)
        for probe in (0, 13, 29):
            item, sim = bank.search_best(scs[probe].reshape(-1))
            assert item == probe
            assert sim == pytest.approx(1.0, abs=1e-4)

    def test_rotated_retrieval(self):
        """Same place seen at a different heading is still retrieved."""
        rng = np.random.default_rng(7)
        bank = ScanContextBank()
        scs = []
        for i in range(20):
            sc = np.asarray(sc_ops.points_to_scancontext(
                jnp.asarray(random_cloud(rng))))
            scs.append(sc)
            bank.add_item(sc.reshape(-1), i)
        probe = np.roll(scs[7], 21, axis=1)
        item, sim = bank.search_best(probe.reshape(-1))
        assert item == 7
        assert sim > 0.99

    def test_batched_best_agrees_with_single(self):
        """search_best_batch (one fused dispatch) must equal per-query
        search_best, including the >=1.0-distance fallback case."""
        rng = np.random.default_rng(9)
        bank = ScanContextBank()
        scs = []
        for i in range(15):
            sc = np.asarray(sc_ops.points_to_scancontext(
                jnp.asarray(random_cloud(rng))))
            scs.append(sc)
            bank.add_item(sc.reshape(-1), i)
        probes = np.stack([scs[2].reshape(-1),
                           np.roll(scs[9], 13, axis=1).reshape(-1),
                           rng.random(1200).astype(np.float32)])
        batched = bank.search_best_batch(probes)
        singles = [bank.search_best(p) for p in probes]
        for (bi, bs), (si, ss) in zip(batched, singles):
            assert bi == si
            assert bs == pytest.approx(ss, abs=1e-5)
        assert batched[0][0] == 2 and batched[1][0] == 9

    def test_growth(self):
        rng = np.random.default_rng(8)
        bank = ScanContextBank(capacity=4)
        for i in range(20):
            bank.add_item(rng.random(1200).astype(np.float32), i)
        assert bank.nb_items == 20
        probe = bank.scancontexts[15].reshape(-1)
        item, _ = bank.search_best(probe)
        assert item == 15


class TestLidarSparseMatching:

    def test_lidar_sensor_type_uses_scancontext_banks(self):
        import sys, os
        sys.path.insert(0, os.path.dirname(__file__))
        from helpers import matching_params
        from cslam_tpu.matching.sparse_matching import LoopClosureSparseMatching
        params = matching_params(max_nb_robots=2, sensor_type="lidar",
                                 similarity_threshold=0.5)
        lcsm = LoopClosureSparseMatching(params)
        assert isinstance(lcsm.local_nnsm, ScanContextBank)

        rng = np.random.default_rng(9)
        clouds = [random_cloud(rng) for _ in range(10)]
        scs = [np.asarray(sc_ops.points_to_scancontext(jnp.asarray(c)))
               for c in clouds]
        for i, s in enumerate(scs):
            lcsm.add_local_global_descriptor(s.reshape(-1), i)

        class GD:
            def __init__(s, kf, rid, d):
                s.keyframe_id, s.robot_id, s.descriptor = kf, rid, d

        # robot 1 revisits place 4 (rotated)
        probe = np.roll(scs[4], 30, axis=1).reshape(-1)
        match = lcsm.add_other_robot_global_descriptor(GD(0, 1, probe))
        assert match is not None
        assert match.robot0_keyframe_id == 4
        assert match.weight > 0.99


class TestFusedRingKeyStage1:
    """Streaming-kernel ring-key shortlist (``_two_stage_best_fused``):
    the euclidean-via-augmented-dot-product trick must reproduce the XLA
    ``euclidean_topk`` stage exactly (ordering equivalence), and the full
    fused two-stage search must match the unfused path."""

    def test_augmented_dot_orders_like_euclidean(self):
        import jax.numpy as jnp
        from cslam_tpu.matching.scancontext_bank import (_RK_AUG_DIM,
                                                         _augment_ring_keys)
        from cslam_tpu.ops import topk as topk_ops
        from cslam_tpu.ops.nns_pallas import TILE_N, cosine_topk_fused2_pre

        rng = np.random.default_rng(21)
        N, R, B, k = TILE_N, 20, 6, 10
        rk = (rng.uniform(0, 5, (N, R))).astype(np.float32)
        q = (rng.uniform(0, 5, (B, R))).astype(np.float32)
        n = jnp.int32(N - 37)

        sq = jnp.sum(jnp.asarray(rk) ** 2, axis=-1)
        _, ref_idx = topk_ops.euclidean_topk(jnp.asarray(rk), sq, n,
                                             jnp.asarray(q), k)

        aug = _augment_ring_keys(jnp.asarray(rk))
        assert aug.shape == (N, _RK_AUG_DIM)
        q_aug = np.zeros((B, _RK_AUG_DIM), np.float32)
        q_aug[:, :R] = 2.0 * q
        q_aug[:, R] = -1.0
        _, idx = cosine_topk_fused2_pre(aug, n, jnp.asarray(q_aug), k,
                                        interpret=True)
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))

    def test_fused_two_stage_matches_unfused(self):
        import jax
        import jax.numpy as jnp
        from cslam_tpu.matching.scancontext_bank import (
            _augment_ring_keys, _two_stage_best, _two_stage_best_fused)
        from cslam_tpu.ops import scancontext as sc_ops
        from cslam_tpu.ops.nns_pallas import TILE_N

        rng = np.random.default_rng(22)
        N, B = TILE_N, 4
        shape = (20, 60)
        sc_bank = rng.uniform(0, 5, (N,) + shape).astype(np.float32)
        queries = sc_bank[rng.integers(0, 200, B)] \
            + rng.normal(0, 0.05, (B,) + shape).astype(np.float32)
        rk = np.asarray(jax.vmap(sc_ops.ring_key)(jnp.asarray(sc_bank)))
        n = jnp.int32(N - 11)

        ref_idx, ref_d = _two_stage_best(
            jnp.asarray(rk), jnp.sum(jnp.asarray(rk) ** 2, -1),
            jnp.asarray(sc_bank), n, jnp.asarray(queries), 10)
        f_idx, f_d = _two_stage_best_fused(
            _augment_ring_keys(jnp.asarray(rk)), jnp.asarray(sc_bank), n,
            jnp.asarray(queries), 10, interpret=True)
        np.testing.assert_array_equal(np.asarray(f_idx), np.asarray(ref_idx))
        np.testing.assert_allclose(np.asarray(f_d), np.asarray(ref_d),
                                   rtol=1e-5, atol=1e-6)

    def test_bank_gate_requires_opt_in(self):
        import jax
        from cslam_tpu.matching.scancontext_bank import ScanContextBank
        assert not ScanContextBank(capacity=4096)._fused_stage1_ok()
        fused = ScanContextBank(capacity=4096, fused_stage1=True)
        on_tpu = jax.devices()[0].platform == "tpu"
        assert fused._fused_stage1_ok() == on_tpu
        # capacity off the kernel tile boundary never qualifies
        assert not ScanContextBank(capacity=1024,
                                   fused_stage1=True)._fused_stage1_ok()


class TestMultiBankSearch:
    """multi_search_best (one dispatch over several banks) must be
    result-identical to per-bank search_best round-trips."""

    def test_matches_per_bank_search(self):
        from cslam_tpu.matching.scancontext_bank import (ScanContextBank,
                                                         multi_search_best)
        rng = np.random.default_rng(11)
        banks = []
        for r in range(3):
            b = ScanContextBank(capacity=32)
            for k in range(5 + 3 * r):
                sc = (rng.random((20, 60)) * (rng.random((20, 60)) > 0.7)
                      ).astype(np.float32) * 6.0
                b.add_item(sc, ("item", r, k))
            banks.append(b)
        banks.append(ScanContextBank(capacity=32))  # empty bank
        query = banks[1]._sc_host[2]
        multi = multi_search_best(banks, query)
        single = [b.search_best(query) for b in banks]
        assert multi == single
        assert multi[1][0] == ("item", 1, 2)
        assert multi[3] == (None, None)

    def test_query_batch_tier_padding_invariant(self):
        """search_best_batch results must not depend on the power-of-two
        padding tier the batch lands in."""
        from cslam_tpu.matching.scancontext_bank import ScanContextBank
        rng = np.random.default_rng(13)
        b = ScanContextBank(capacity=32)
        scans = [(rng.random((20, 60)) * (rng.random((20, 60)) > 0.7)
                  ).astype(np.float32) * 6.0 for _ in range(8)]
        for k, sc in enumerate(scans):
            b.add_item(sc, k)
        q = np.stack(scans[:3])  # tier 4: one padding row
        got = b.search_best_batch(q)
        assert [item for item, _ in got] == [0, 1, 2]
        one_by_one = [b.search_best(s) for s in scans[:3]]
        assert got == one_by_one
