"""KITTI-format replay driver tests (SURVEY.md §7 minimum-slice dataset
replay, round-1 VERDICT item 10).

No real dataset ships in this offline environment, so the tests render a
synthetic stereo sequence with the pinhole world from
tests/test_visual_frontend.py, serialize it in the exact KITTI odometry
layout (calib.txt / poses.txt / image_0 / image_1 PNGs), and drive the
FULL visual product path from disk: loader -> StereoFrontEnd ->
DetectionFrontEnd -> DecentralizedPGO -> ATE vs the on-disk ground truth.
A real KITTI sequence directory drops in unchanged.
"""
import numpy as np
import pytest

from cslam_tpu.runtime.replay import (KittiCalib, KittiSequence,
                                      LidarReplayDriver, ReplayDriver,
                                      TinyImageDescriptor,
                                      write_kitti_sequence)
from test_visual_frontend import CAM, make_world, render, pose_xyz_yaw


def make_sequence_dir(tmp_path, n_frames=14, two_passes=True, seed=2):
    """Render a lawnmower sweep that (optionally) revisits itself."""
    rng = np.random.default_rng(seed)
    pts, tex = make_world(rng, n=140)
    poses = []
    n_unique = n_frames // 2 if two_passes else n_frames
    for k in range(n_frames):
        i = k % n_unique  # second pass revisits the same poses
        jitter = 0.03 * (k >= n_unique)
        poses.append(pose_xyz_yaw(0.25 * i + jitter, 0.02 * i, 0.0))
    lefts, rights = [], []
    shift = np.eye(4)
    shift[0, 3] = CAM.baseline
    for T in poses:
        lefts.append(render(pts, tex, T, depth_too=False))
        rights.append(render(pts, tex, T @ shift, depth_too=False))
    seq_dir = tmp_path / "seq00"
    write_kitti_sequence(str(seq_dir), lefts, rights, poses,
                         CAM.fx, CAM.fy, CAM.cx, CAM.cy, CAM.baseline,
                         times=[0.1 * k for k in range(n_frames)])
    return seq_dir, poses


class TestKittiLoader:

    def test_roundtrip(self, tmp_path):
        seq_dir, poses = make_sequence_dir(tmp_path, n_frames=6,
                                           two_passes=False)
        seq = KittiSequence(str(seq_dir))
        assert len(seq) == 6
        left, right, gt, t = seq.frame(2)
        assert left.shape == (240, 320) and right.shape == (240, 320)
        np.testing.assert_allclose(gt, poses[2], atol=1e-9)
        assert t == pytest.approx(0.2)
        model = seq.calib.stereo_model()
        assert model.baseline == pytest.approx(CAM.baseline)
        assert model.left.fx == pytest.approx(CAM.fx)

    def test_calib_without_right_camera(self, tmp_path):
        (tmp_path / "calib.txt").write_text(
            "P0: 300 0 160 0 0 300 120 0 0 0 1 0\n")
        calib = KittiCalib.load(str(tmp_path / "calib.txt"))
        left, right = calib.camera_infos()
        assert right is None and left.fx == 300.0


class TestReplayDriver:

    def test_two_robot_replay_end_to_end(self, tmp_path):
        """Two robots replay overlapping halves of one on-disk sequence:
        keyframes form, inter-robot loop closures verify geometrically,
        PGO produces finite estimates with ATE near the odometry's."""
        seq_dir, _ = make_sequence_dir(tmp_path, n_frames=14,
                                       two_passes=True)
        seq = KittiSequence(str(seq_dir))
        driver = ReplayDriver(
            [seq, seq], frame_ranges=[range(0, 7), range(7, 14)],
            odom_noise=0.01, model=TinyImageDescriptor(),
            config_overrides={
                "frontend.similarity_threshold": 0.95,
                "frontend.inter_robot_detection_period_sec": 1.0,
                "frontend.detection_publication_period_sec": 0.5,
                "backend.pose_graph_optimization_start_period_ms": 1500,
            })
        driver.run(extra_steps=40, dt=0.25)

        r0, r1 = driver.robots
        assert r0.frontend.nb_local_keyframes >= 5
        assert r1.frontend.nb_local_keyframes >= 5
        inter0 = sum(len(v) for v in
                     r0.backend.inter_robot_loop_closures.values())
        inter1 = sum(len(v) for v in
                     r1.backend.inter_robot_loop_closures.values())
        assert inter0 + inter1 > 0, "no inter-robot loop closure verified"
        assert (r0.backend.optimization_count
                + r1.backend.optimization_count) > 0
        ate_odo, ate_opt = driver.ate(0)
        assert np.isfinite(ate_opt)
        # the optimized estimate must not be wildly worse than odometry
        assert ate_opt < max(2.0 * ate_odo, 0.2)


def make_lidar_sequence_dirs(tmp_path, nb_robots=2, n_steps=10, n_scenes=5,
                             seed=11):
    """Robots traverse a shared loop of structured scenes; each sequence
    is written as KITTI ``velodyne/*.bin`` + ``poses.txt``."""
    from test_lidar_e2e import scene_cloud

    rng = np.random.default_rng(seed)
    scenes = [scene_cloud(500 + s, n=700) for s in range(n_scenes)]

    def pose_at(x, y):
        T = np.eye(4)
        T[:3, 3] = [x, y, 0.0]
        return T

    scene_pose = [pose_at(6.0 * s, 0.0) for s in range(n_scenes)]
    dirs = []
    for rid in range(nb_robots):
        poses, scans = [], []
        for i in range(n_steps):
            s = (i + 2 * rid) % n_scenes
            p = scene_pose[s] @ pose_at(0.2 * rid, 0.15 * rid)
            world = scenes[s] @ scene_pose[s][:3, :3].T \
                + scene_pose[s][:3, 3]
            inv = np.linalg.inv(p)
            local = world @ inv[:3, :3].T + inv[:3, 3]
            scans.append((local + rng.normal(scale=0.02, size=local.shape)
                          ).astype(np.float32))
            poses.append(p)
        d = tmp_path / f"lidar_seq{rid}"
        write_kitti_sequence(str(d), None, None, poses, scans=scans,
                             times=[0.1 * i for i in range(n_steps)])
        dirs.append(d)
    return dirs


class TestLidarReplay:

    def test_velodyne_loader_roundtrip(self, tmp_path):
        dirs = make_lidar_sequence_dirs(tmp_path, nb_robots=1, n_steps=3)
        seq = KittiSequence(str(dirs[0]))
        assert seq.nb_scans == 3 and len(seq) == 3
        raw = seq.scan(1)
        assert raw.shape[1] == 4 and raw.dtype == np.float32
        cloud = seq.scan_cloud(1)
        assert cloud.point_step == 16
        from cslam_tpu.utils.point_cloud2 import xyz_array
        np.testing.assert_allclose(xyz_array(cloud), raw[:, :3])

    def test_two_robot_lidar_replay_end_to_end(self, tmp_path):
        """Full lidar product path from on-disk KITTI velodyne data:
        PointCloud2 decode -> voxel/keyframe gate -> scan-context match ->
        robust ICP verification -> PGO estimates."""
        dirs = make_lidar_sequence_dirs(tmp_path, nb_robots=2, n_steps=10)
        driver = LidarReplayDriver(
            [KittiSequence(str(d)) for d in dirs],
            odom_noise=0.01,
            config_overrides={
                "frontend.similarity_threshold": 0.7,
                "frontend.keyframe_generation_ratio_distance": 0.5,
                "frontend.voxel_size": 0.4,
                "frontend.registration_min_inliers": 30,
                "frontend.inter_robot_detection_period_sec": 1.0,
                "frontend.detection_publication_period_sec": 0.5,
                "backend.pose_graph_optimization_start_period_ms": 1500,
            })
        driver.run(extra_steps=40, dt=0.25)

        r0, r1 = driver.robots
        assert r0.frontend.nb_local_keyframes >= 5
        assert r1.frontend.nb_local_keyframes >= 5
        inter = sum(len(v) for v in
                    r0.backend.inter_robot_loop_closures.values()) + \
            sum(len(v) for v in
                r1.backend.inter_robot_loop_closures.values())
        assert inter > 0, "no inter-robot loop closure verified"
        ate_odo, ate_opt = driver.ate(0)
        assert np.isfinite(ate_opt)
        assert ate_opt < max(2.0 * ate_odo, 0.2)
