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


class TestCompression:
    """Local-descriptor payload compression (utils/compression.py) —
    reference ships rtabmap-compressed features, rgbd_handler.cpp:404-431."""

    def test_roundtrip_exact_all_dtypes(self):
        from cslam_tpu.utils import compression as C
        rng = np.random.default_rng(0)
        for a in (rng.integers(0, 256, (300, 32), dtype=np.uint8),
                  rng.standard_normal((200, 3)).astype(np.float32),
                  rng.integers(-5, 5, (7,), dtype=np.int32),
                  np.zeros((0, 3), np.float32)):
            b = C.compress_array(a)
            out = C.decompress_array(b)
            assert out.dtype == a.dtype and out.shape == a.shape
            np.testing.assert_array_equal(out, a)

    def test_f16_quantization_bounded_error(self):
        from cslam_tpu.utils import compression as C
        rng = np.random.default_rng(1)
        pts = (rng.standard_normal((500, 3)) * 20).astype(np.float32)
        out = C.decompress_array(C.compress_array(pts, quantize_f16=True))
        assert out.dtype == np.float32
        # f16 mantissa: ~0.1% relative error
        np.testing.assert_allclose(out, pts, rtol=2e-3, atol=1e-4)

    def test_compresses_realistic_payloads(self):
        from cslam_tpu.utils import compression as C
        rng = np.random.default_rng(2)
        # voxel-grid cloud coords share exponent bits; BRIEF bits are
        # near-random (poor ratio but never bigger than raw + header slack)
        cloud = np.round(rng.standard_normal((2048, 3)) * 10, 2).astype(
            np.float32)
        blob = C.compress_array(cloud, quantize_f16=True)
        assert C.payload_nbytes(blob) < cloud.nbytes * 0.55
        brief = rng.integers(0, 256, (512, 32), dtype=np.uint8)
        assert C.payload_nbytes(C.compress_array(brief)) < (
            brief.nbytes + 1024)

    def test_maybe_decompress_passthrough(self):
        from cslam_tpu.utils import compression as C
        raw = np.arange(6, dtype=np.float32).reshape(2, 3)
        np.testing.assert_array_equal(C.maybe_decompress(raw), raw)
        assert C.maybe_decompress(None) is None
        np.testing.assert_array_equal(
            C.maybe_decompress(C.compress_array(raw)), raw)

    def test_payload_nbytes(self):
        from cslam_tpu.utils import compression as C
        raw = np.zeros((4, 4), np.float32)
        assert C.payload_nbytes(raw) == 64
        assert C.payload_nbytes(None) == 0
        assert C.payload_nbytes(C.compress_array(raw)) > 0


class TestDeviceReadReady:

    def test_ready_consults_is_ready(self):
        from cslam_tpu.utils import device_read

        class Pending:
            def is_ready(self):
                return False

        class Done:
            def is_ready(self):
                return True

        assert device_read.ready([Done(), Done()])
        assert not device_read.ready([Done(), Pending()])
        # arrays without the method (numpy, exotic backends) count ready
        assert device_read.ready([np.zeros(3)])
        assert device_read.ready([])

    def test_jax_array_ready_after_block(self):
        import jax.numpy as jnp
        from cslam_tpu.utils import device_read
        a = jnp.arange(8.0) * 2.0
        a.block_until_ready()
        assert device_read.ready([a])
