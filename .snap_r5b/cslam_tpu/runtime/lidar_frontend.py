"""Lidar sensor front end (per-robot node).

Behavior parity with reference ``cslam/lidar_handler_node.py``: synchronized
(point cloud, odometry) intake with an odometry-failure gate
(covariance > 1000, l.79), fixed-rate processing, keyframe gating by
traveled odometry distance (ll.144-166), voxel-downsampled clouds stored as
the keyframe's local descriptors (l.180), descriptor-request service that
ships the whole cloud (ll.91-104), and intra/inter loop-closure transform
computation — TEASER++/Open3D replaced by the jitted robust multi-start ICP
(``cslam_tpu.ops.registration``).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from cslam_tpu.ops import registration
from cslam_tpu.utils import compression, point_cloud2, profiling
from cslam_tpu.types import (InterRobotLoopClosure, IntraRobotLoopClosure,
                             KeyframeOdom, KeyframePointCloud, KeyValue,
                             LocalDescriptorsRequest,
                             LocalPointCloudDescriptors, Odometry,
                             VizPointCloud)


class LidarFrontEnd:
    """Front-end data handler for lidar data."""

    def __init__(self, ctx):
        self.ctx = ctx
        self.params = ctx.params
        self.robot_id = self.params["robot_id"]

        self.keyframe_odom_publisher = ctx.create_publisher(
            "cslam/keyframe_odom")
        self.keyframe_pointcloud_publisher = ctx.create_publisher(
            "cslam/keyframe_data")
        ctx.create_subscription("cslam/local_descriptors_request",
                                self.send_local_descriptors_request)
        ctx.create_subscription("cslam/local_keyframe_match",
                                self.receive_local_keyframe_match)
        self.pointcloud_descriptors_publisher = ctx.create_publisher(
            "/cslam/local_descriptors")
        ctx.create_subscription("/cslam/local_descriptors",
                                self.receive_local_descriptors)
        self.intra_robot_loop_closure_publisher = ctx.create_publisher(
            "cslam/intra_robot_loop_closure")
        self.inter_robot_loop_closure_publisher = ctx.create_publisher(
            "/cslam/inter_robot_loop_closure")
        self.viz_publisher = ctx.create_publisher(
            "/cslam/viz/keyframe_pointcloud")
        self.log_publisher = ctx.create_publisher("cslam/log_info")

        ctx.create_timer(
            self.params.get("frontend.map_manager_process_period_ms", 100)
            / 1000.0, self.process_new_sensor_data)

        self.received_data: List[Tuple[np.ndarray, Odometry]] = []
        self._pending_verifications: List[tuple] = []
        self.local_descriptors_map: Dict[int, np.ndarray] = {}
        self.nb_local_keyframes = 0
        self.previous_odom: Optional[Odometry] = None
        self.log_comm_bytes = 0

        # GPS recording (reference lidar_handler_node.py:67-89): keep the
        # latest fix and attach it to each keyframe's odom message so the
        # evaluation logger can write gps.csv
        self.latest_gps = None
        if self.params.get("evaluation.enable_gps_recording", False):
            ctx.create_subscription(
                self.params.get("evaluation.gps_topic", "gps/fix"),
                self.gps_callback)

    def gps_callback(self, msg) -> None:
        self.latest_gps = msg

    def warmup(self, pair_tiers=(1, 2, 4, 8), pad_size: int = 1024,
               include_global: bool = True) -> None:
        """Precompile the fused geometric-verification program
        (``registration._verify_pair_batch``: multi-start ICP + prior-free
        global registration + on-device gating, one dispatch per chunk)
        for the given pair-batch tiers so live verification never pays JIT
        latency mid-run. Use with jax's persistent compilation cache, like
        ``DecentralizedPGO.warmup``. ``include_global`` is kept for API
        compatibility (the fused program always contains both solvers).

        CRITICAL (tests/test_no_retrace.py): this must go through the SAME
        call chokepoint as production — ``compute_transform_batch_begin``
        — so the jit cache key (incl. which kwargs are passed) matches."""
        del include_global
        voxel = float(self.params.get("frontend.voxel_size", 0.5))
        min_inl = self.params.get("frontend.registration_min_inliers", 60)
        rng = np.random.default_rng(0)
        # twice with distinct operand values: the relay-attached chip
        # sometimes recompiles on the call after a single warmup
        for _ in range(2):
            cloud = rng.uniform(-5, 5, (64, 3)).astype(np.float32)
            for p in pair_tiers:
                handles = registration.compute_transform_batch_begin(
                    [(cloud, cloud)] * p, voxel, min_inl,
                    pad_size=pad_size)
                for h in handles:
                    registration.compute_transform_batch_step(h)

    # ------------------------------------------------------------------

    def lidar_callback(self, points, odom: Odometry) -> None:
        """Synchronized sensor intake (reference ll.72-84).

        ``points`` is an ``[N, 3]`` array, or a binary-layout
        ``PointCloud2`` message (the form arriving from replayed ROS data
        — decoded via ``cslam_tpu.utils.point_cloud2.xyz_array``, the
        reference's ``read_points_numpy_filtered`` path, l.173).
        """
        if odom.covariance0 > 1000:
            return  # odom tracking failed, skip frame
        if isinstance(points, point_cloud2.PointCloud2):
            points = point_cloud2.xyz_array(points)
        self.received_data.append((points, odom))

    def _generate_new_keyframe(self, odom: Odometry) -> bool:
        if self.previous_odom is None:
            self.previous_odom = odom
            return True
        d = odom.pose[:3, 3] - self.previous_odom.pose[:3, 3]
        thresh = self.params.get(
            "frontend.keyframe_generation_ratio_distance", 0.5)
        if float(d @ d) > thresh * thresh:
            self.previous_odom = odom
            return True
        return False

    def process_new_sensor_data(self) -> None:
        self._advance_verifications()
        if not self.received_data:
            return
        points, odom = self.received_data.pop(0)
        if not self._generate_new_keyframe(odom):
            return
        kf_id = self.nb_local_keyframes
        with profiling.span("lidar.voxel_downsample"):
            cloud = registration.voxel_downsample(
                points, self.params.get("frontend.voxel_size", 0.5))
        self.local_descriptors_map[kf_id] = cloud
        self.keyframe_pointcloud_publisher.publish(
            KeyframePointCloud(id=kf_id, points=cloud))
        self.keyframe_odom_publisher.publish(KeyframeOdom(
            id=kf_id, odom=odom, gps=self.latest_gps))
        if self.params.get("visualization.enable", False):
            self.viz_publisher.publish(VizPointCloud(
                robot_id=self.robot_id, keyframe_id=kf_id, points=cloud))
        self.nb_local_keyframes += 1

    # ------------------------------------------------------------------
    # Descriptor exchange + geometric verification (reference ll.91-142)
    # ------------------------------------------------------------------

    def send_local_descriptors_request(self,
                                       request: LocalDescriptorsRequest) -> None:
        cloud = self.local_descriptors_map.get(request.keyframe_id)
        if cloud is None:
            return
        # compressed cloud payload (reference ships rtabmap-compressed
        # feature data, rgbd_handler.cpp:404-431; the lidar path's cloud
        # is its 'local descriptors' so it gets the same treatment)
        payload = cloud
        if self.params.get("frontend.compress_payloads", True):
            payload = compression.compress_array(
                cloud, quantize_f16=bool(self.params.get(
                    "frontend.compress_quantize_f16", False)))
        msg = LocalPointCloudDescriptors(
            keyframe_id=request.keyframe_id, robot_id=self.robot_id,
            points=payload,
            matches_robot_id=list(request.matches_robot_id),
            matches_keyframe_id=list(request.matches_keyframe_id))
        self.pointcloud_descriptors_publisher.publish(msg)
        if self.params.get("evaluation.enable_logs", False):
            self.log_comm_bytes += compression.payload_nbytes(payload)
            self.log_publisher.publish(KeyValue(
                key="local_descriptors_cumulative_communication",
                value=str(self.log_comm_bytes)))

    def _registration(self, src: np.ndarray, dst: np.ndarray
                      ) -> Tuple[np.ndarray, bool]:
        return registration.compute_transform(
            src, dst, self.params.get("frontend.voxel_size", 0.5),
            self.params.get("frontend.registration_min_inliers", 60))

    def receive_local_descriptors(self,
                                  msg: LocalPointCloudDescriptors) -> None:
        msg = LocalPointCloudDescriptors(
            keyframe_id=msg.keyframe_id, robot_id=msg.robot_id,
            points=compression.maybe_decompress(msg.points),
            matches_robot_id=msg.matches_robot_id,
            matches_keyframe_id=msg.matches_keyframe_id)
        jobs = []  # all pairs addressed to me verify as ONE batched dispatch
        for rid, kf_id in zip(msg.matches_robot_id, msg.matches_keyframe_id):
            if rid != self.robot_id:
                continue
            local = self.local_descriptors_map.get(kf_id)
            if local is None:
                continue
            jobs.append((kf_id, local))
        if not jobs:
            return
        # dispatch the staged verification now; results are harvested one
        # stage per sensor-processing cycle so several robots'/bursts'
        # registration programs crunch on-device concurrently instead of
        # serializing behind blocking reads (frontend.async_verification)
        with profiling.span("lidar.verify_batch"):
            handles = registration.compute_transform_batch_begin(
                [(local, msg.points) for _, local in jobs],
                self.params.get("frontend.voxel_size", 0.5),
                self.params.get("frontend.registration_min_inliers", 60))
        self._pending_verifications.append(
            ([kf for kf, _ in jobs], msg.robot_id, msg.keyframe_id, handles))
        if not self.params.get("frontend.async_verification", True):
            self._advance_verifications(block=True)

    def _advance_verifications(self, block: bool = False) -> None:
        """Advance every pending verification burst by one harvest stage
        (``block=True`` drives them to completion) and publish finished
        loop-closure outcomes. Device reads across bursts are overlapped
        via ``device_read.prefetch``."""
        if not self._pending_verifications:
            return
        from cslam_tpu.utils import device_read
        while True:
            device_read.prefetch(
                a for _, _, _, handles in self._pending_verifications
                for h in handles for a in h.arrays)
            still_pending = []
            for kf_ids, rid, rkf, handles in self._pending_verifications:
                all_done = True
                for h in handles:
                    if not h.done and not \
                            registration.compute_transform_batch_step(h):
                        all_done = False
                if not all_done:
                    still_pending.append((kf_ids, rid, rkf, handles))
                    continue
                results = [r for h in handles for r in h.results]
                for kf_id, (transform, success) in zip(kf_ids, results):
                    self.inter_robot_loop_closure_publisher.publish(
                        InterRobotLoopClosure(
                            robot0_id=self.robot_id, robot0_keyframe_id=kf_id,
                            robot1_id=rid, robot1_keyframe_id=rkf,
                            success=success,
                            transform=transform if success else None))
            self._pending_verifications = still_pending
            if not block or not still_pending:
                return

    def receive_local_keyframe_match(self, msg) -> None:
        pc0 = self.local_descriptors_map.get(msg.keyframe0_id)
        pc1 = self.local_descriptors_map.get(msg.keyframe1_id)
        if pc0 is None or pc1 is None:
            return
        with profiling.span("lidar.verify_intra"):
            transform, success = self._registration(pc0, pc1)
        self.intra_robot_loop_closure_publisher.publish(
            IntraRobotLoopClosure(
                keyframe0_id=msg.keyframe0_id, keyframe1_id=msg.keyframe1_id,
                success=success,
                transform=transform if success else None))
