"""Snapshot/restore and profiling-hook tests."""
import numpy as np
import pytest

from cslam_tpu.utils import profiling
from cslam_tpu.utils.snapshot import restore_robot, snapshot_robot


class TestProfiling:

    def test_span_registry(self):
        profiling.reset_spans()
        with profiling.span("pgo/solve"):
            pass
        with profiling.span("pgo/solve"):
            pass
        with profiling.span("detect_inter"):
            pass
        s = profiling.spans()
        assert s["pgo/solve"]["count"] == 2
        assert s["detect_inter"]["count"] == 1
        text = profiling.report(reset=True)
        assert "pgo/solve" in text
        assert profiling.spans() == {}


class TestSnapshot:

    def test_roundtrip_mid_run(self, tmp_path):
        """Snapshot a robot mid-simulation; a freshly constructed robot
        restored from it continues with identical state and keeps working."""
        from cslam_tpu.runtime.simulator import (SwarmSimulator,
                                                 SyntheticWorld,
                                                 circle_trajectory)
        world = SyntheticWorld(nb_places=30, descriptor_dim=16, seed=0)
        trajs = [circle_trajectory(16, 10.0, 30),
                 circle_trajectory(16, 10.0, 30, start_angle=0.05)]
        cfg = {"frontend.inter_robot_detection_period_sec": 3.0,
               "backend.pose_graph_optimization_start_period_ms": 2000}
        sim = SwarmSimulator(2, world, trajs, config_overrides=cfg,
                             keyframe_period=0.5)
        sim.run(20.0, dt=0.25)
        r0 = sim.robots[0]
        path = str(tmp_path / "r0.ckpt")
        snapshot_robot(r0.detection, r0.backend, path)

        # fresh nodes (a "restarted" robot process)
        sim2 = SwarmSimulator(2, world, trajs, config_overrides=cfg,
                              keyframe_period=0.5)
        d2, b2 = sim2.robots[0].detection, sim2.robots[0].backend
        restore_robot(d2, b2, path)

        # bank contents identical
        assert d2.lcm.local_nnsm.n == r0.detection.lcm.local_nnsm.n
        np.testing.assert_array_equal(
            d2.lcm.local_nnsm.data[:d2.lcm.local_nnsm.n],
            r0.detection.lcm.local_nnsm.data[:r0.detection.lcm.local_nnsm.n])
        # selector bookkeeping identical
        assert (d2.lcm.candidate_selector.candidate_edges
                == r0.detection.lcm.candidate_selector.candidate_edges)
        assert (len(d2.lcm.candidate_selector.fixed_edges)
                == len(r0.detection.lcm.candidate_selector.fixed_edges))
        # back-end graph identical
        assert (set(b2.odometry_pose_estimates)
                == set(r0.backend.odometry_pose_estimates))
        assert len(b2.local_factors) == len(r0.backend.local_factors)
        assert b2.optimization_count == r0.backend.optimization_count

        # the restored robot still functions: search its bank
        probe = r0.detection.lcm.local_nnsm.data[3]
        item, sim_val = d2.lcm.local_nnsm.search_best(probe)
        assert item == 3
        assert sim_val == pytest.approx(1.0, abs=1e-5)

    def test_wrong_robot_snapshot_rejected(self, tmp_path):
        from cslam_tpu.runtime.simulator import (SwarmSimulator,
                                                 SyntheticWorld,
                                                 circle_trajectory)
        world = SyntheticWorld(nb_places=10, descriptor_dim=8, seed=0)
        trajs = [circle_trajectory(4, 10.0, 10)] * 2
        sim = SwarmSimulator(2, world, trajs, keyframe_period=0.5)
        sim.run(3.0, dt=0.5)
        path = str(tmp_path / "r0.ckpt")
        snapshot_robot(sim.robots[0].detection, sim.robots[0].backend, path)
        with pytest.raises(AssertionError):
            restore_robot(sim.robots[1].detection, sim.robots[1].backend,
                          path)
