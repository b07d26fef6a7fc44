"""Binary PointCloud2 serde (``cslam_tpu.utils.point_cloud2``).

Mirrors the behavior contract of the reference's vendored ROS utility
(``/root/reference/cslam/utils/point_cloud2.py``): round-trip fidelity,
padded strides, endian conversion, NaN filtering, uvs selection,
organized reshape — all on synthetic data, no ROS runtime.
"""
import numpy as np
import pytest

from cslam_tpu.utils import point_cloud2 as pc2
from cslam_tpu.utils.point_cloud2 import PointCloud2, PointField


def _xyz_struct(n, seed=0, nan_rows=()):
    rng = np.random.default_rng(seed)
    rec = np.zeros(n, dtype=[("x", "<f4"), ("y", "<f4"), ("z", "<f4")])
    for name in ("x", "y", "z"):
        rec[name] = rng.standard_normal(n).astype(np.float32)
    for i in nan_rows:
        rec["x"][i] = np.nan
    return rec


class TestRoundTrip:
    def test_xyz32_round_trip(self):
        pts = np.random.default_rng(1).standard_normal((100, 3))
        cloud = pc2.make_cloud_xyz32(pts, frame_id="r0/lidar")
        assert cloud.point_step == 12 and cloud.width == 100
        assert cloud.row_step == 1200 and cloud.is_dense
        out = pc2.xyz_array(cloud)
        np.testing.assert_allclose(out, pts.astype(np.float32))

    def test_structured_round_trip_preserves_every_field(self):
        rec = np.zeros(16, dtype=[("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
                                  ("intensity", "<f4"), ("ring", "<u2")])
        rng = np.random.default_rng(2)
        for n in ("x", "y", "z", "intensity"):
            rec[n] = rng.standard_normal(16).astype(np.float32)
        rec["ring"] = rng.integers(0, 64, 16).astype(np.uint16)
        cloud = pc2.make_cloud(rec)
        got = pc2.read_points(cloud)
        for n in rec.dtype.names:
            np.testing.assert_array_equal(got[n], rec[n])

    def test_field_subset_and_order(self):
        rec = _xyz_struct(8)
        cloud = pc2.make_cloud(rec)
        zy = pc2.read_points(cloud, field_names=["z", "y"])
        assert zy.dtype.names == ("z", "y")
        np.testing.assert_array_equal(zy["z"], rec["z"])

    def test_missing_field_raises(self):
        cloud = pc2.make_cloud(_xyz_struct(4))
        with pytest.raises(KeyError):
            pc2.read_points(cloud, field_names=["x", "rgb"])


class TestWireLayout:
    def test_padded_point_step(self):
        """Velodyne-style layout: xyz at 0/4/8, intensity at 16, stride 32
        — the padding bytes between and after fields must be skipped."""
        n = 10
        fields = [PointField("x", 0, PointField.FLOAT32),
                  PointField("y", 4, PointField.FLOAT32),
                  PointField("z", 8, PointField.FLOAT32),
                  PointField("intensity", 16, PointField.FLOAT32)]
        raw = np.zeros((n, 32), np.uint8)
        rng = np.random.default_rng(3)
        vals = rng.standard_normal((n, 4)).astype(np.float32)
        raw[:, 0:12] = vals[:, :3].copy().view(np.uint8).reshape(n, 12)
        raw[:, 16:20] = vals[:, 3:].copy().view(np.uint8).reshape(n, 4)
        cloud = PointCloud2(height=1, width=n, fields=fields, point_step=32,
                            row_step=32 * n, data=raw.tobytes())
        got = pc2.read_points(cloud)
        np.testing.assert_allclose(
            np.stack([got["x"], got["y"], got["z"]], 1), vals[:, :3])
        np.testing.assert_allclose(got["intensity"], vals[:, 3])

    def test_bigendian_cloud_decodes_to_native_values(self):
        rec = _xyz_struct(6, seed=4)
        be = np.zeros(6, dtype=[("x", ">f4"), ("y", ">f4"), ("z", ">f4")])
        for n in ("x", "y", "z"):
            be[n] = rec[n]
        cloud = PointCloud2(height=1, width=6,
                            fields=[PointField("x", 0, PointField.FLOAT32),
                                    PointField("y", 4, PointField.FLOAT32),
                                    PointField("z", 8, PointField.FLOAT32)],
                            point_step=12, row_step=72, data=be.tobytes(),
                            is_bigendian=True)
        out = pc2.xyz_array(cloud)
        np.testing.assert_allclose(
            out, np.stack([rec["x"], rec["y"], rec["z"]], 1))

    def test_count_field_subarray(self):
        fields = [PointField("x", 0, PointField.FLOAT32),
                  PointField("hist", 4, PointField.UINT8, count=4)]
        raw = np.arange(2 * 8, dtype=np.uint8).reshape(2, 8)
        raw[:, 0:4] = np.float32(1.5).tobytes()[0]  # ignore x value
        cloud = PointCloud2(height=1, width=2, fields=fields, point_step=8,
                            row_step=16, data=raw.tobytes())
        got = pc2.read_points(cloud)
        assert got["hist"].shape == (2, 4)
        np.testing.assert_array_equal(got["hist"][1], raw[1, 4:8])

    def test_unnamed_field_gets_placeholder(self):
        fields = [PointField("", 0, PointField.FLOAT32)]
        cloud = PointCloud2(height=1, width=3, fields=fields, point_step=4,
                            row_step=12,
                            data=np.arange(3, dtype=np.float32).tobytes())
        got = pc2.read_points(cloud)
        assert got.dtype.names == ("unnamed_field_0",)


class TestFilters:
    def test_skip_nans_drops_rows(self):
        rec = _xyz_struct(10, seed=5, nan_rows=(2, 7))
        cloud = pc2.make_cloud(rec)
        assert not cloud.is_dense
        got = pc2.read_points(cloud, skip_nans=True)
        assert len(got) == 8
        assert not np.isnan(got["x"]).any()
        # dense flag short-circuits the scan
        dense = pc2.make_cloud(_xyz_struct(5, seed=6))
        assert len(pc2.read_points(dense, skip_nans=True)) == 5

    def test_uvs_selection(self):
        rec = _xyz_struct(10, seed=7)
        cloud = pc2.make_cloud(rec)
        got = pc2.read_points(cloud, uvs=[8, 1, 3])
        np.testing.assert_array_equal(got["y"], rec["y"][[8, 1, 3]])

    def test_organized_reshape(self):
        rec = _xyz_struct(12, seed=8)
        cloud = pc2.make_cloud(rec, height=3)
        assert (cloud.height, cloud.width) == (3, 4)
        got = pc2.read_points(cloud, reshape_organized_cloud=True)
        assert got.shape == (3, 4)
        np.testing.assert_array_equal(got.reshape(-1)["z"], rec["z"])
        # skip_nans on a DENSE organized cloud is a no-op filter: the 2D
        # shape must survive (reference reshapes whenever height > 1)
        got2 = pc2.read_points(cloud, skip_nans=True,
                               reshape_organized_cloud=True)
        assert got2.shape == (3, 4)
        # but when rows are actually dropped the grid is gone -> flat
        holey = _xyz_struct(12, seed=8, nan_rows=(5,))
        c2 = pc2.make_cloud(holey, height=3)
        got3 = pc2.read_points(c2, skip_nans=True,
                               reshape_organized_cloud=True)
        assert got3.ndim == 1 and len(got3) == 11
        # sensors often mark clouds non-dense conservatively: a NaN-free
        # cloud with is_dense=False must still reshape (filter = no-op)
        c4 = pc2.make_cloud(_xyz_struct(12, seed=8), height=3)
        c4.is_dense = False
        got4 = pc2.read_points(c4, skip_nans=True,
                               reshape_organized_cloud=True)
        assert got4.shape == (3, 4)

    def test_read_points_numpy_rejects_mixed_dtypes(self):
        rec = np.zeros(4, dtype=[("x", "<f4"), ("ring", "<u2")])
        cloud = pc2.make_cloud(rec)
        with pytest.raises(TypeError):
            pc2.read_points_numpy(cloud)
        ok = pc2.read_points_numpy(cloud, field_names=["x"])
        assert ok.shape == (4, 1)


class TestFrontEndIntegration:
    def test_lidar_callback_accepts_pointcloud2(self):
        from cslam_tpu.config import CslamConfig
        from cslam_tpu.runtime.bus import MessageBus, RobotContext
        from cslam_tpu.runtime.clock import VirtualClock
        from cslam_tpu.runtime.lidar_frontend import LidarFrontEnd
        from cslam_tpu.types import Odometry

        cfg = CslamConfig(robot_id=0, max_nb_robots=2)
        cfg.frontend.sensor_type = "lidar"
        ctx = RobotContext(MessageBus(), VirtualClock(), 0, cfg.flatten())
        fe = LidarFrontEnd(ctx)
        pts = np.random.default_rng(9).uniform(-5, 5, (256, 3))
        fe.lidar_callback(pc2.make_cloud_xyz32(pts), Odometry(pose=np.eye(4)))
        assert len(fe.received_data) == 1
        got = fe.received_data[0][0]
        assert got.shape == (256, 3) and got.dtype == np.float32
        np.testing.assert_allclose(got, pts.astype(np.float32), atol=0)


class TestColoredCloudBridge:
    def test_packed_rgb_round_trip(self):
        from cslam_tpu.runtime.visualization import (
            colored_cloud_to_pointcloud2, pointcloud2_to_colored_cloud)
        rng = np.random.default_rng(12)
        cloud = np.concatenate(
            [rng.standard_normal((50, 3)).astype(np.float32),
             rng.integers(0, 256, (50, 3)).astype(np.float32)], axis=1)
        msg = colored_cloud_to_pointcloud2(cloud, frame_id="map")
        assert msg.point_step == 16 and msg.frame_id == "map"
        back = pointcloud2_to_colored_cloud(msg)
        np.testing.assert_allclose(back[:, :3], cloud[:, :3])
        np.testing.assert_array_equal(back[:, 3:], cloud[:, 3:])

    def test_depth_backprojection_to_wire(self):
        from cslam_tpu.runtime.visualization import (
            colored_cloud_to_pointcloud2, create_colored_pointcloud)
        depth = np.full((8, 8), 2.0, np.float32)
        rgb = np.zeros((8, 8, 3), np.uint8)
        rgb[..., 0] = 200
        cloud = create_colored_pointcloud(depth, rgb, 10, 10, 4, 4)
        msg = colored_cloud_to_pointcloud2(cloud)
        assert msg.nb_points == 64
