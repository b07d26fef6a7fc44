"""Lidar end-to-end slice (BASELINE config 3): point clouds -> ScanContext
descriptors -> cross-robot matching -> robust ICP verification -> PGO intake.

Two robots traverse a shared world of structured scenes; the full lidar
stack (LidarFrontEnd voxel downsampling + keyframe gating, ScanContext
detection front end, multi-start robust ICP geometric verification, back-end
loop-closure intake) runs over the in-process bus.
"""
import numpy as np
import pytest

from cslam_tpu.config import CslamConfig
from cslam_tpu.runtime.backend_node import DecentralizedPGO
from cslam_tpu.runtime.bus import MessageBus, RobotContext
from cslam_tpu.runtime.clock import VirtualClock
from cslam_tpu.runtime.lcd_node import DetectionFrontEnd
from cslam_tpu.runtime.lidar_frontend import LidarFrontEnd
from cslam_tpu.types import Odometry


def scene_cloud(seed, n=700):
    """A structured scene: two walls + ground scatter, distinctive layout."""
    rng = np.random.default_rng(seed)
    a1, a2 = rng.uniform(0, 2 * np.pi, 2)
    d1, d2 = rng.uniform(6, 18, 2)
    wall1 = np.stack([np.cos(a1) * d1 + rng.uniform(-6, 6, n // 3),
                      np.sin(a1) * d1 + rng.normal(0, 0.1, n // 3),
                      rng.uniform(0, 3, n // 3)], 1)
    wall2 = np.stack([np.cos(a2) * d2 + rng.normal(0, 0.1, n // 3),
                      np.sin(a2) * d2 + rng.uniform(-6, 6, n // 3),
                      rng.uniform(0, 2, n // 3)], 1)
    rest = n - 2 * (n // 3)
    ground = np.stack([rng.uniform(-20, 20, rest // 2),
                       rng.uniform(-20, 20, rest // 2),
                       rng.uniform(-0.2, 0.2, rest // 2)], 1)
    # pillars pin the registration (walls + ground alone slide freely)
    centers = rng.uniform(-15, 15, (4, 2))
    m = rest - rest // 2
    which = rng.integers(0, 4, m)
    pillars = np.stack([centers[which, 0] + rng.normal(0, 0.08, m),
                        centers[which, 1] + rng.normal(0, 0.08, m),
                        rng.uniform(0, 4, m)], 1)
    return np.concatenate([wall1, wall2, ground, pillars]).astype(np.float32)


def make_robot(bus, clock, rid, nb_robots=2):
    cfg = CslamConfig(robot_id=rid, max_nb_robots=nb_robots)
    cfg.frontend.sensor_type = "lidar"
    cfg.frontend.global_descriptor_technique = "scancontext"
    cfg.frontend.similarity_threshold = 0.7
    cfg.frontend.keyframe_generation_ratio_distance = 0.5
    cfg.frontend.voxel_size = 0.4
    cfg.frontend.registration_min_inliers = 40
    cfg.frontend.inter_robot_detection_period_sec = 3.0
    cfg.frontend.detection_publication_period_sec = 1.0
    cfg.backend.pose_graph_optimization_start_period_ms = 4000
    cfg.neighbor_management.enable_neighbor_monitoring = False
    cfg.evaluation.enable_gps_recording = True
    ctx = RobotContext(bus, clock, rid, cfg.flatten())
    frontend = LidarFrontEnd(ctx)
    detection = DetectionFrontEnd(ctx)  # ScanContext model via factory
    backend = DecentralizedPGO(ctx, synchronous_optimization=True)
    return ctx, frontend, detection, backend


@pytest.mark.slow
def test_two_robot_lidar_pipeline():
    bus = MessageBus()
    clock = VirtualClock()
    robots = [make_robot(bus, clock, r) for r in range(2)]

    scenes = [scene_cloud(s) for s in range(6)]

    def pose_at(x, y, yaw=0.0):
        T = np.eye(4)
        T[:3, :3] = [[np.cos(yaw), -np.sin(yaw), 0],
                     [np.sin(yaw), np.cos(yaw), 0], [0, 0, 1.0]]
        T[:3, 3] = [x, y, 0]
        return T

    def observe(scene, pose, noise_rng):
        """Scene points expressed in the robot's sensor frame."""
        inv = np.linalg.inv(pose)
        pts = scene @ inv[:3, :3].T + inv[:3, 3]
        return pts + noise_rng.normal(scale=0.03, size=pts.shape)

    rng = np.random.default_rng(0)
    # both robots visit the same scenes from nearby poses
    for i, scene in enumerate(scenes):
        p0 = pose_at(5 * i, 0.0)
        p1 = pose_at(5 * i + 0.8, 0.6, yaw=0.4)
        bus.publish("/r0/gps/fix", (45.5 + 0.001 * i, -73.6))
        bus.publish("/r1/gps/fix", (45.5 + 0.001 * i, -73.601))
        bus.deliver()
        robots[0][1].lidar_callback(observe(scene, p0, rng),
                                    Odometry(pose=p0))
        robots[1][1].lidar_callback(observe(scene, p1, rng),
                                    Odometry(pose=p1))
        for _ in range(4):
            clock.advance(0.25)
            for ctx, *_ in robots:
                ctx.poll_timers()
            bus.deliver()

    # let gossip + detection rounds + verification complete
    for _ in range(60):
        clock.advance(0.25)
        for ctx, *_ in robots:
            ctx.poll_timers()
        bus.deliver()

    fe0, det0, be0 = robots[0][1], robots[0][2], robots[0][3]
    assert fe0.nb_local_keyframes == 6
    assert det0.lcm.local_nnsm.nb_items == 6
    assert det0.lcm.other_robots_nnsm[1].nb_items >= 5  # gossip arrived

    # at least one candidate was selected, verified by robust ICP, and fixed
    # GPS fixes attached to keyframes reached the back end
    assert len(be0.gps_data) == 6
    assert be0.gps_data[0] == (45.5, -73.6)

    fixed = det0.lcm.candidate_selector.fixed_edges
    inter = sum(len(v) for v in be0.inter_robot_loop_closures.values())
    assert len(fixed) >= 1, "no lidar loop closures verified"
    assert inter >= 1

    # verified transforms are metrically sane: compare against ground truth
    # Z = X0^-1 X1 for the matching scene index
    def gt_pose(robot_id, kf_id):
        if robot_id == 0:
            return pose_at(5 * kf_id, 0.0)
        return pose_at(5 * kf_id + 0.8, 0.6, yaw=0.4)

    for pair, edges in be0.inter_robot_loop_closures.items():
        for e in edges:
            X_from = gt_pose(e.key_from.robot_id, e.key_from.keyframe_id)
            X_to = gt_pose(e.key_to.robot_id, e.key_to.keyframe_id)
            Z_gt = np.linalg.inv(X_from) @ X_to
            err = np.linalg.norm(e.measurement[:3, 3] - Z_gt[:3, 3])
            assert err < 0.3, f"loop closure transform off by {err:.2f} m"


@pytest.mark.slow
def test_three_robot_lidar_swarm_scale():
    """Scaled lidar slice (round-2 roadmap): 3 robots x 12 scenes with
    odometry drift; scan-context detection + robust ICP verification +
    full decentralized PGO must reduce the drift."""
    bus = MessageBus()
    clock = VirtualClock()
    robots = [make_robot(bus, clock, r, nb_robots=3) for r in range(3)]

    n_scenes = 12
    scenes = [scene_cloud(100 + s) for s in range(n_scenes)]

    def pose_at(x, y, yaw=0.0):
        T = np.eye(4)
        T[:3, :3] = [[np.cos(yaw), -np.sin(yaw), 0],
                     [np.sin(yaw), np.cos(yaw), 0], [0, 0, 1.0]]
        T[:3, 3] = [x, y, 0]
        return T

    def observe(scene, pose, noise_rng):
        inv = np.linalg.inv(pose)
        pts = scene @ inv[:3, :3].T + inv[:3, 3]
        return pts + noise_rng.normal(scale=0.03, size=pts.shape)

    rng = np.random.default_rng(1)
    gt = {r: [] for r in range(3)}
    drifted = {r: [] for r in range(3)}
    for r in range(3):
        cur = None
        for i in range(n_scenes):
            p = pose_at(5 * i + 0.5 * r, 0.5 * r, yaw=0.15 * r)
            gt[r].append(p)
            if cur is None:
                cur = p.copy()
            else:
                z = np.linalg.inv(gt[r][i - 1]) @ p
                z[:3, 3] += rng.normal(scale=0.05, size=3)
                cur = cur @ z
            drifted[r].append(cur.copy())

    for i in range(n_scenes):
        for r in range(3):
            robots[r][1].lidar_callback(
                observe(scenes[i], gt[r][i], rng),
                Odometry(pose=drifted[r][i]))
        for _ in range(4):
            clock.advance(0.25)
            for ctx, *_ in robots:
                ctx.poll_timers()
            bus.deliver()

    for _ in range(80):
        clock.advance(0.25)
        for ctx, *_ in robots:
            ctx.poll_timers()
        bus.deliver()

    # every robot ingested every scene; gossip reached all banks
    for r in range(3):
        assert robots[r][1].nb_local_keyframes == n_scenes
    det0, be0 = robots[0][2], robots[0][3]
    for other in (1, 2):
        assert det0.lcm.other_robots_nnsm[other].nb_items >= n_scenes - 2

    inter = sum(len(v) for v in be0.inter_robot_loop_closures.values())
    assert inter >= 2, f"only {inter} verified lidar loop closures"
    assert be0.optimization_count > 0

    # the optimized estimate reduces odometry drift for robot 0
    est = {k[1]: p for k, p in be0.current_pose_estimates.items()
           if k[0] == 0}
    assert len(est) == n_scenes

    def rmse(poses_map, gt_list):
        errs = [np.linalg.norm(poses_map[i][:3, 3] - gt_list[i][:3, 3])
                for i in poses_map]
        return float(np.sqrt(np.mean(np.square(errs))))

    ate_odo = rmse({i: drifted[0][i] for i in range(n_scenes)}, gt[0])
    ate_opt = rmse(est, gt[0])
    assert np.isfinite(ate_opt)
    # strict: loop closures verified, so the solve must actually improve
    # on dead reckoning (a no-op optimizer returning odometry fails here)
    assert ate_opt < ate_odo, f"no improvement: {ate_opt} vs {ate_odo}" 
