"""Evaluation subsystem: g2o round trips, ATE/RPE, experiment logging."""
import os

import numpy as np
import pytest

from cslam_tpu.evaluation.ate import (absolute_trajectory_error,
                                      relative_pose_error, umeyama_alignment)
from cslam_tpu.evaluation import g2o as g2o_io
from cslam_tpu.types import PoseGraphEdge, PoseKey


def random_pose(rng):
    from scipy.spatial.transform import Rotation
    T = np.eye(4)
    T[:3, :3] = Rotation.random(random_state=int(rng.integers(1 << 30))
                                ).as_matrix()
    T[:3, 3] = rng.uniform(-10, 10, 3)
    return T


class TestG2O:

    def test_roundtrip(self, tmp_path):
        rng = np.random.default_rng(0)
        values = {(r, k): random_pose(rng) for r in range(2) for k in range(5)}
        edges = [PoseGraphEdge(key_from=PoseKey(0, 0), key_to=PoseKey(0, 1),
                               measurement=random_pose(rng),
                               noise_sigmas=np.array([0.01] * 3 + [0.1] * 3)),
                 PoseGraphEdge(key_from=PoseKey(0, 2), key_to=PoseKey(1, 3),
                               measurement=random_pose(rng),
                               noise_sigmas=np.full(6, 0.05))]
        path = str(tmp_path / "graph.g2o")
        g2o_io.write_g2o(path, values, edges)
        rv, re = g2o_io.read_g2o(path)
        assert set(rv) == set(values)
        for k in values:
            np.testing.assert_allclose(rv[k], values[k], atol=1e-6)
        assert len(re) == 2
        np.testing.assert_allclose(re[0].measurement, edges[0].measurement,
                                   atol=1e-6)
        np.testing.assert_allclose(re[1].noise_sigmas, edges[1].noise_sigmas,
                                   rtol=1e-5)


    def test_roundtrip_fuzz(self, tmp_path):
        """Randomized graphs survive two write->read cycles to 1e-7
        (catches precision / ordering / key-packing drift; byte identity is
        NOT expected — quat<->matrix conversion drifts in the 9th digit),
        with noise scales spanning 1e-4..1e2 and keys up to 2^20."""
        rng = np.random.default_rng(7)
        for trial in range(25):
            nv = int(rng.integers(1, 40))
            keys = {(int(rng.integers(0, 5)), int(rng.integers(0, 1 << 20)))
                    for _ in range(nv)}
            values = {k: random_pose(rng) for k in keys}
            key_list = sorted(keys)
            edges = []
            for _ in range(int(rng.integers(0, 3 * len(key_list)))):
                a, b = rng.integers(0, len(key_list), 2)
                sig = np.exp(rng.uniform(np.log(1e-4), np.log(1e2), 6))
                edges.append(PoseGraphEdge(
                    key_from=PoseKey(*key_list[a]),
                    key_to=PoseKey(*key_list[b]),
                    measurement=random_pose(rng), noise_sigmas=sig))
            p1 = str(tmp_path / f"f{trial}_1.g2o")
            p2 = str(tmp_path / f"f{trial}_2.g2o")
            g2o_io.write_g2o(p1, values, edges)
            rv, re = g2o_io.read_g2o(p1)
            g2o_io.write_g2o(p2, rv, re)
            rv2, re2 = g2o_io.read_g2o(p2)
            assert set(rv) == keys == set(rv2) and len(re) == len(edges)
            for k in keys:
                np.testing.assert_allclose(rv2[k], values[k], atol=1e-7)
            for e_in, e_out in zip(edges, re2):
                assert (e_out.key_from, e_out.key_to) == (e_in.key_from,
                                                          e_in.key_to)
                np.testing.assert_allclose(e_out.measurement,
                                           e_in.measurement, atol=1e-7)
                np.testing.assert_allclose(e_out.noise_sigmas,
                                           e_in.noise_sigmas, rtol=1e-4)

    def test_read_skips_foreign_lines(self, tmp_path):
        """Files from other g2o producers carry comments / FIX lines —
        the reader must skip what it doesn't own."""
        path = str(tmp_path / "foreign.g2o")
        rng = np.random.default_rng(8)
        values = {(0, 0): random_pose(rng)}
        g2o_io.write_g2o(path, values, [])
        with open(path, "a") as f:
            f.write("# a comment line\nFIX 0\n\nVERTEX_SE2 9 0 0 0\n")
        rv, re = g2o_io.read_g2o(path)
        assert set(rv) == {(0, 0)} and re == []


class TestATE:

    def test_umeyama_exact_recovery(self):
        rng = np.random.default_rng(1)
        src = rng.uniform(-5, 5, (20, 3))
        T_true = random_pose(rng)
        dst = src @ T_true[:3, :3].T + T_true[:3, 3]
        T = umeyama_alignment(src, dst)
        np.testing.assert_allclose(T, T_true, atol=1e-8)

    def test_ate_zero_for_rigidly_moved_trajectory(self):
        rng = np.random.default_rng(2)
        gt = {(0, k): random_pose(rng) for k in range(10)}
        offset = random_pose(rng)
        est = {k: offset @ v for k, v in gt.items()}
        assert absolute_trajectory_error(est, gt) == pytest.approx(0, abs=1e-8)
        # without alignment the offset shows
        assert absolute_trajectory_error(est, gt, align=False) > 0.1

    def test_rpe(self):
        rng = np.random.default_rng(3)
        gt = {(0, k): np.eye(4) for k in range(5)}
        for k in range(5):
            gt[(0, k)][0, 3] = float(k)
        est = {k: v.copy() for k, v in gt.items()}
        est[(0, 3)][0, 3] += 0.5  # one bad step
        assert relative_pose_error(est, gt) > 0.1


class TestExperimentLogger:

    def test_end_to_end_logging(self, tmp_path):
        """Run a 2-robot sim with logs enabled; experiment folder must
        contain metrics.csv and g2o dumps."""
        from cslam_tpu.runtime.simulator import (SwarmSimulator,
                                                 SyntheticWorld,
                                                 circle_trajectory)
        world = SyntheticWorld(nb_places=20, descriptor_dim=16, seed=0)
        trajs = [circle_trajectory(10, 10.0, 20),
                 circle_trajectory(10, 10.0, 20, start_angle=0.05)]
        sim = SwarmSimulator(
            2, world, trajs,
            config_overrides={
                "evaluation.enable_logs": True,
                "evaluation.log_folder": str(tmp_path),
                "frontend.inter_robot_detection_period_sec": 3.0,
                "backend.pose_graph_optimization_start_period_ms": 2000,
            }, keyframe_period=0.5)
        sim.run(25.0, dt=0.25)

        folders = sorted(os.listdir(tmp_path))
        assert len(folders) == 2  # one per robot
        r0 = os.path.join(tmp_path, [f for f in folders if f.endswith("r0")][0])
        files = os.listdir(r0)
        assert "metrics.csv" in files
        assert any(f.startswith("optimized_global") for f in files)
        assert any(f.startswith("initial_global") for f in files)
        with open(os.path.join(r0, "metrics.csv")) as f:
            content = f.read()
        assert "total_pgo_time" in content
        assert "graph_error" in content
        # comm-byte metrics flowed over the log_info bus
        logger = sim.robots[0].backend.logger
        assert logger.metrics["detection_cumulative_communication"] > 0
        assert logger.total_pgo_time > 0


class TestVisualization:

    def test_colored_pointcloud(self):
        from cslam_tpu.runtime.visualization import create_colored_pointcloud
        rng = np.random.default_rng(0)
        depth = rng.uniform(0.5, 10, (48, 64)).astype(np.float32)
        depth[0, 0] = 0.0          # invalid
        depth[1, 1] = np.inf       # invalid
        rgb = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
        cloud = create_colored_pointcloud(depth, rgb, fx=100, fy=100,
                                          cx=32, cy=24)
        assert cloud.shape == (48 * 64 - 2, 6)
        assert np.all(cloud[:, 2] > 0)
        # uint16 millimeter depths
        d16 = (depth * 1000).astype(np.uint16)
        cloud16 = create_colored_pointcloud(d16, rgb, 100, 100, 32, 24)
        assert abs(len(cloud16) - len(cloud)) < 5

    def test_pose_graph_ply(self, tmp_path):
        from cslam_tpu.runtime.visualization import pose_graph_to_ply
        from cslam_tpu.types import PoseGraphEdge, PoseKey
        values = {}
        for r in range(2):
            for k in range(3):
                T = np.eye(4)
                T[:3, 3] = [k, r, 0]
                values[(r, k)] = T
        edges = [PoseGraphEdge(key_from=PoseKey(0, 0), key_to=PoseKey(1, 2))]
        path = str(tmp_path / "g.ply")
        pose_graph_to_ply(path, values, edges)
        content = open(path).read()
        assert "element vertex 6" in content
        assert "element edge 1" in content


class TestSparsificationComparison:

    def test_spectral_matches_csv_written(self, tmp_path):
        from cslam_tpu.runtime.simulator import (SwarmSimulator,
                                                 SyntheticWorld,
                                                 circle_trajectory)
        world = SyntheticWorld(nb_places=20, descriptor_dim=16, seed=0)
        trajs = [circle_trajectory(12, 10.0, 20),
                 circle_trajectory(12, 10.0, 20, start_angle=0.05)]
        sim = SwarmSimulator(
            2, world, trajs,
            config_overrides={
                "evaluation.enable_logs": True,
                "evaluation.enable_sparsification_comparison": True,
                "evaluation.log_folder": str(tmp_path),
                "frontend.inter_robot_detection_period_sec": 3.0,
                "backend.pose_graph_optimization_start_period_ms": 2000,
            }, keyframe_period=0.5)
        sim.run(25.0, dt=0.25)
        # side-by-side greedy vs MAC selections were recorded
        sel = sim.robots[0].detection.lcm.candidate_selector
        assert len(sel.log_mac_edges) > 0
        assert len(sel.log_greedy_edges) > 0
        folders = [f for f in os.listdir(tmp_path) if f.endswith("r0")]
        files = os.listdir(os.path.join(tmp_path, folders[0]))
        assert "spectral_matches.csv" in files
