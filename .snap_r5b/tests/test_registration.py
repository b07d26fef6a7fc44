"""Robust registration (lidar geometric verification) tests."""
import numpy as np
import jax.numpy as jnp
import pytest

from cslam_tpu.ops.registration import (compute_transform, pad_cloud,
                                        robust_registration, voxel_downsample)


def structured_cloud(rng, n=600):
    """A cloud with structure (walls + scatter) so registration is well
    posed, unlike a uniform blob."""
    wall1 = np.stack([rng.uniform(0, 20, n // 3), np.full(n // 3, 5.0),
                      rng.uniform(0, 3, n // 3)], 1)
    wall2 = np.stack([np.full(n // 3, -4.0), rng.uniform(-10, 10, n // 3),
                      rng.uniform(0, 3, n // 3)], 1)
    scatter = rng.uniform(-15, 15, (n - 2 * (n // 3), 3)) * [1, 1, 0.1]
    return np.concatenate([wall1, wall2, scatter]).astype(np.float32)


def transform_cloud(points, yaw_deg, t):
    a = np.radians(yaw_deg)
    R = np.array([[np.cos(a), -np.sin(a), 0],
                  [np.sin(a), np.cos(a), 0], [0, 0, 1.0]])
    return points @ R.T + np.asarray(t)


class TestSmallestEigvec3:
    """Closed-form 3x3 smallest-eigenvector (replaces batched eigh in
    `_normals` — the QR while-loop eigh measured ~25 ms of the global-
    registration program on chip, benchmarks/global_reg_probe.py)."""

    def test_matches_eigh_on_neighborhood_covariances(self):
        from cslam_tpu.ops.registration import _smallest_eigvec3
        rng = np.random.default_rng(0)
        X = rng.standard_normal((512, 16, 3)).astype(np.float32)
        X[:, :, 2] *= 0.3  # anisotropic: distinct smallest direction
        C = X - X.mean(1, keepdims=True)
        cov = (np.einsum("nki,nkj->nij", C, C)
               + 1e-9 * np.eye(3, dtype=np.float32))
        v = np.asarray(_smallest_eigvec3(jnp.asarray(cov)))
        _, vecs = np.linalg.eigh(cov)
        dots = np.abs(np.sum(v * vecs[:, :, 0], axis=1))
        assert dots.min() > 0.999

    def test_degenerate_neighborhoods_stay_finite_unit(self):
        from cslam_tpu.ops.registration import _smallest_eigvec3
        iso = np.tile(np.eye(3, dtype=np.float32)[None], (4, 1, 1))
        line = np.zeros((4, 3, 3), np.float32)
        line[:, 0, 0] = 5.0  # collinear: two equal small eigenvalues
        v = np.asarray(_smallest_eigvec3(
            jnp.asarray(np.concatenate([iso, line]))))
        assert np.all(np.isfinite(v))
        np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0,
                                   rtol=1e-5)


class TestVoxelDownsample:

    def test_reduces_and_preserves_extent(self):
        rng = np.random.default_rng(0)
        pts = rng.uniform(-10, 10, (5000, 3))
        down = voxel_downsample(pts, 1.0)
        assert 100 < len(down) < len(pts)
        np.testing.assert_allclose(down.min(0), pts.min(0), atol=1.5)
        np.testing.assert_allclose(down.max(0), pts.max(0), atol=1.5)

    def test_filters_non_finite(self):
        pts = np.array([[0, 0, 0], [np.nan, 1, 1], [np.inf, 0, 0],
                        [5, 5, 5]], np.float64)
        down = voxel_downsample(pts, 0.5)
        assert len(down) == 2

    def test_empty(self):
        assert len(voxel_downsample(np.zeros((0, 3)), 0.5)) == 0


class TestRegistration:

    @pytest.mark.parametrize("yaw,t", [(0, [0.5, -0.3, 0.1]),
                                       (95, [2.0, 1.0, 0.0]),
                                       (180, [-1.0, 3.0, 0.2])])
    def test_recovers_known_transform(self, yaw, t):
        rng = np.random.default_rng(1)
        src = structured_cloud(rng)
        dst = transform_cloud(src, yaw, t) \
            + rng.normal(scale=0.02, size=src.shape)
        Z, success = compute_transform(src, dst, voxel_size=0.3,
                                       min_inliers=60, pad_size=1024)
        assert success
        # Z is the pose-convention transform (X_src^-1 X_dst); the point map
        # src->dst coordinates is its inverse
        P = np.linalg.inv(Z)
        moved = src @ P[:3, :3].T + P[:3, 3]
        err = np.linalg.norm(moved - transform_cloud(src, yaw, t), axis=1)
        assert np.median(err) < 0.1

    def test_rejects_unrelated_clouds(self):
        rng = np.random.default_rng(2)
        src = structured_cloud(rng)[:150]
        # sparse unrelated scatter far away: few inlier-range matches
        dst = rng.uniform(300, 400, (150, 3)).astype(np.float32) * [1, 1, 0.05]
        T, success = compute_transform(src, dst, voxel_size=0.1,
                                       min_inliers=140, pad_size=256)
        assert not success

    def test_partial_overlap(self):
        rng = np.random.default_rng(3)
        src = structured_cloud(rng, 900)
        dst_full = transform_cloud(src, 40, [1.0, 0.0, 0.0])
        dst = dst_full[:600]  # only 2/3 of the scene seen again
        T, success = compute_transform(src[:600], dst, voxel_size=0.3,
                                       min_inliers=60, pad_size=1024)
        assert success


class TestGlobalRegistration:
    """Prior-free registration: pairs whose viewpoints differ by large
    translation + arbitrary yaw (the regime TEASER++ covers in the
    reference, icp_utils.py:103-139). The yaw-sweep multi-start's
    center-of-mass init is biased by partial overlap here."""

    @staticmethod
    def _world(rng, n=2600):
        """A 40 m urban-ish block: randomized walls at several angles +
        clutter, distinctive enough for feature correspondences (and
        different per rng, so cross-scene pairs share no layout)."""
        pieces = []
        ends = rng.uniform(-20, 18, (5, 4))
        ends[:, 2:] = ends[:, :2] + rng.uniform(8, 30, (5, 2)) * \
            rng.choice([-1.0, 1.0], (5, 2))
        for (x0, y0, x1, y1) in ends:
            m = n // 8
            s = rng.uniform(0, 1, m)[:, None]
            base = (np.array([[x0, y0]]) * (1 - s) + np.array([[x1, y1]]) * s)
            pieces.append(np.concatenate(
                [base + rng.normal(scale=0.05, size=(m, 2)),
                 rng.uniform(0, 4, (m, 1))], axis=1))
        m = n - sum(len(p) for p in pieces)
        clutter = np.stack([rng.uniform(-18, 14, m), rng.uniform(-13, 16, m),
                            rng.uniform(0, 0.6, m)], 1)
        return np.concatenate(pieces + [clutter]).astype(np.float32)

    @staticmethod
    def _view(world, t, yaw_deg, radius, rng):
        """Points visible from a sensor at ``t`` (world frame), expressed
        in the sensor frame (z-up yaw orientation)."""
        a = np.radians(yaw_deg)
        R = np.array([[np.cos(a), -np.sin(a), 0],
                      [np.sin(a), np.cos(a), 0], [0, 0, 1.0]])
        vis = world[np.linalg.norm(world[:, :2] - np.asarray(t)[:2],
                                   axis=1) < radius]
        local = (vis - np.asarray(t)) @ R  # R^T applied to rows
        return (local + rng.normal(scale=0.02, size=local.shape)
                ).astype(np.float32)

    @pytest.mark.parametrize("offset,yaw_b", [([6.0, 3.0, 0.0], 137.0),
                                              ([-5.5, 4.0, 0.0], 265.0)])
    def test_large_offset_arbitrary_yaw_verifies(self, offset, yaw_b):
        rng = np.random.default_rng(11)
        world = self._world(rng)
        t_a, yaw_a = np.zeros(3), 20.0
        src = self._view(world, t_a, yaw_a, 17.0, rng)
        dst = self._view(world, np.asarray(offset), yaw_b, 17.0, rng)
        assert np.linalg.norm(offset) >= 5.0
        Z, success = compute_transform(src, dst, voxel_size=0.4,
                                       min_inliers=60, pad_size=1024,
                                       min_inlier_ratio=0.45)
        assert success
        # ground-truth point map src->dst: p_B = R_B^T (R_A p_A + tA - tB)

        def rotz(deg):
            a = np.radians(deg)
            return np.array([[np.cos(a), -np.sin(a), 0],
                             [np.sin(a), np.cos(a), 0], [0, 0, 1.0]])

        Ra, Rb = rotz(yaw_a), rotz(yaw_b)
        P = np.linalg.inv(Z)
        R_gt = Rb.T @ Ra
        t_gt = Rb.T @ (t_a - np.asarray(offset))
        assert np.linalg.norm(P[:3, 3] - t_gt) < 0.5
        assert np.abs(P[:3, :3] - R_gt).max() < 0.05

    def test_fpfh_branch_is_alive_and_aligns(self):
        """Regression: ``_knn`` once poisoned all off-diagonal distances
        with NaN (``d2 + eye*inf``; 0*inf = NaN), silently zeroing every
        FPFH feature — tests stayed green because the yaw-correlation
        candidate carried them. Pin (a) finite non-zero features and (b)
        the FPFH hypothesis ALONE (no occupancy correlation, no ICP
        refine) recovering a large-offset arbitrary-yaw transform."""
        import jax.numpy as jnp
        from cslam_tpu.ops.registration import (_fpfh, _fpfh_alignment,
                                                pad_cloud)
        rng = np.random.default_rng(13)
        world = self._world(rng)
        t_a, yaw_a = np.zeros(3), 20.0
        offset, yaw_b = np.array([6.0, 3.0, 0.0]), 137.0
        src_pts = self._view(world, t_a, yaw_a, 17.0, rng)
        dst_pts = self._view(world, offset, yaw_b, 17.0, rng)
        src, src_mask = pad_cloud(src_pts, 1024)
        dst, dst_mask = pad_cloud(dst_pts, 1024)

        f = _fpfh(jnp.asarray(src), jnp.asarray(src_mask), 16)
        f = np.asarray(f)
        assert np.isfinite(f).all()
        assert np.abs(f).max() > 1e-3

        T0 = np.asarray(_fpfh_alignment(
            jnp.asarray(src), jnp.asarray(src_mask), jnp.asarray(dst),
            jnp.asarray(dst_mask), jnp.float32(0.6), 16))

        def rotz(deg):
            a = np.radians(deg)
            return np.array([[np.cos(a), -np.sin(a), 0],
                             [np.sin(a), np.cos(a), 0], [0, 0, 1.0]])

        R_gt = rotz(yaw_b).T @ rotz(yaw_a)
        t_gt = rotz(yaw_b).T @ (t_a - offset)
        # correspondence-only hypothesis: coarse is fine (ICP refines it),
        # but it must be in the right basin
        assert np.linalg.norm(T0[:3, 3] - t_gt) < 1.5
        assert np.abs(T0[:3, :3] - R_gt).max() < 0.15

    def test_cross_scene_large_offset_rejects(self):
        rng = np.random.default_rng(12)
        world_a = self._world(rng)
        world_b = self._world(np.random.default_rng(99))  # different scene
        src = self._view(world_a, np.zeros(3), 20.0, 17.0, rng)
        dst = self._view(world_b, np.array([6.0, 3.0, 0.0]), 137.0, 17.0,
                         rng)
        _, success = compute_transform(src, dst, voxel_size=0.4,
                                       min_inliers=60, pad_size=1024,
                                       min_inlier_ratio=0.45)
        assert not success


class TestBatchedVerification:
    """compute_transform_batch must be decision- and result-identical to a
    per-pair compute_transform loop (it exists to cut per-pair dispatch
    round-trips, not to change verification outcomes)."""

    def _pairs(self):
        rng = np.random.default_rng(7)
        pairs = []
        for yaw, t in [(0, [0.5, -0.3, 0.1]), (95, [2.0, 1.0, 0.0]),
                       (180, [-1.0, 3.0, 0.2])]:
            src = structured_cloud(rng)
            dst = transform_cloud(src, yaw, t) \
                + rng.normal(scale=0.02, size=src.shape)
            pairs.append((src.astype(np.float32), dst.astype(np.float32)))
        # one genuinely unrelated pair (exercises the global fallback +
        # a failing gate inside the batch)
        src = structured_cloud(rng)[:150]
        dst = (rng.uniform(300, 400, (150, 3)) * [1, 1, 0.05]
               ).astype(np.float32)
        pairs.append((src, dst))
        return pairs

    def test_matches_per_pair_loop(self):
        from cslam_tpu.ops.registration import compute_transform_batch
        pairs = self._pairs()
        batched = compute_transform_batch(pairs, voxel_size=0.3,
                                          min_inliers=60)
        assert len(batched) == len(pairs)
        for (src, dst), (Zb, okb) in zip(pairs, batched):
            Z, ok = compute_transform(src, dst, voxel_size=0.3,
                                      min_inliers=60)
            assert okb == ok
            if ok:
                # same hypothesis family; allow vmap-lowering numerics
                assert np.allclose(Zb, Z, atol=1e-3), (Zb, Z)

    def test_icp_gate_counters(self):
        """The fused verify plane reports the ICP-gate pass rate (the
        complement of the old global-fallback rate, VERDICT-4 #6)."""
        from cslam_tpu.ops.registration import compute_transform_batch
        from cslam_tpu.utils import profiling
        profiling.reset_spans()
        pairs = self._pairs()
        compute_transform_batch(pairs, voxel_size=0.3, min_inliers=60)
        cnts = profiling.counters()
        assert cnts.get("verify.pairs") == len(pairs)
        assert 0 <= cnts.get("verify.icp_gate_pass", -1) <= len(pairs)
        profiling.reset_spans()

    def test_empty_and_single(self):
        from cslam_tpu.ops.registration import compute_transform_batch
        assert compute_transform_batch([], 0.3, 60) == []
        pairs = self._pairs()[:1]
        (Zb, okb), = compute_transform_batch(pairs, voxel_size=0.3,
                                             min_inliers=60)
        Z, ok = compute_transform(*pairs[0], voxel_size=0.3, min_inliers=60)
        assert okb == ok and np.allclose(Zb, Z, atol=1e-3)
