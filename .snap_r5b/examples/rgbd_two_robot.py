#!/usr/bin/env python3
"""Two-robot RGB-D demo: rendered synthetic frames through the FULL visual
pipeline — native C++ FAST/BRIEF features, keyframe gating, descriptor
exchange over the bus, batched GNC geometric verification, and the
decentralized PGO back end.

This is the visual-sensor analogue of `two_robot_sim.py` (which uses the
abstract simulated front end): here the actual RGBDFrontEnd consumes
images + depth, so the loop-closure transforms come from real feature
matching + robust 3D alignment, not ground truth.

    PYTHONPATH=. python examples/rgbd_two_robot.py --cpu
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, ".")


def pose_xyz_yaw(x, y, z, yaw=0.0):
    T = np.eye(4)
    c, s = np.cos(yaw), np.sin(yaw)
    T[:3, :3] = [[c, -s, 0], [s, c, 0], [0, 0, 1]]
    T[:3, 3] = [x, y, z]
    return T


def make_world(rng, cam, n=150):
    pts = np.stack([rng.uniform(-5, 5, n), rng.uniform(-3, 3, n),
                    rng.uniform(4, 11, n)], axis=1)
    textures = rng.integers(30, 255, (n, 11, 11), dtype=np.int64)
    return pts, textures


def render(pts, textures, pose, cam, W=320, H=240):
    img = np.full((H, W), 10, np.uint8)
    depth = np.zeros((H, W), np.float32)
    inv = np.linalg.inv(pose)
    cam_pts = pts @ inv[:3, :3].T + inv[:3, 3]
    for i in np.argsort(-cam_pts[:, 2]):
        x, y, z = cam_pts[i]
        if z < 0.5:
            continue
        u = int(round(cam.fx * x / z + cam.cx))
        v = int(round(cam.fy * y / z + cam.cy))
        if not (20 <= u < W - 20 and 20 <= v < H - 20):
            continue
        img[v - 5:v + 6, u - 5:u + 6] = textures[i].astype(np.uint8)
        depth[v - 5:v + 6, u - 5:u + 6] = z
    return img, depth


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cpu", action="store_true",
                        help="force the CPU backend")
    args = parser.parse_args()
    if args.cpu:
        os.environ.pop("PALLAS_AXON_POOL_IPS", None)
        import jax
        jax.config.update("jax_platforms", "cpu")

    from cslam_tpu.runtime.bus import MessageBus, RobotContext
    from cslam_tpu.runtime.clock import VirtualClock
    from cslam_tpu.runtime.rgbd_frontend import CameraModel, RGBDFrontEnd
    from cslam_tpu.types import LocalDescriptorsRequest, Odometry

    cam = CameraModel(fx=300.0, fy=300.0, cx=160.0, cy=120.0, baseline=0.2)
    rng = np.random.default_rng(0)
    pts, tex = make_world(rng, cam)

    bus, clock = MessageBus(), VirtualClock()
    params = {"robot_id": 0, "max_nb_robots": 2,
              "frontend.map_manager_process_period_ms": 100}
    fes = [RGBDFrontEnd(RobotContext(bus, clock, rid,
                                     dict(params, robot_id=rid)), cam)
           for rid in (0, 1)]

    # each robot sweeps the same scene from offset trajectories
    gt = {0: [pose_xyz_yaw(0.2 * k, 0.05 * k, 0, yaw=0.02 * k)
              for k in range(5)],
          1: [pose_xyz_yaw(0.2 * k + 0.1, 0.05 * k - 0.15, 0,
                           yaw=0.02 * k + 0.05) for k in range(5)]}
    for k in range(5):
        for rid, fe in enumerate(fes):
            img, dep = render(pts, tex, gt[rid][k], cam)
            fe.rgbd_callback(img, dep, Odometry(pose=gt[rid][k]))
        clock.advance(0.2)
        for fe in fes:
            fe.ctx.poll_timers()
        bus.deliver()
    print(f"keyframes: r0={fes[0].nb_local_keyframes} "
          f"r1={fes[1].nb_local_keyframes}")

    closures = []
    bus.subscribe("/cslam/inter_robot_loop_closure", closures.append)
    # ask robot 1 to ship each keyframe's features to robot 0's same index
    # (in the full stack the detection front end does this via the broker)
    for k in range(5):
        bus.publish("/r1/cslam/local_descriptors_request",
                    LocalDescriptorsRequest(keyframe_id=k,
                                            matches_robot_id=[0],
                                            matches_keyframe_id=[k]))
    bus.deliver()

    ok = 0
    for lc in closures:
        Z_gt = np.linalg.inv(gt[0][lc.robot0_keyframe_id]) \
            @ gt[1][lc.robot1_keyframe_id]
        err = (np.linalg.norm(lc.transform[:3, 3] - Z_gt[:3, 3])
               if lc.success else float("nan"))
        ok += bool(lc.success and err < 0.1)
        print(f"kf{lc.robot0_keyframe_id}: success={lc.success} "
              f"trans_err={err:.3f} m")
    print(f"{ok}/{len(closures)} loop closures verified within 10 cm")


if __name__ == "__main__":
    main()
