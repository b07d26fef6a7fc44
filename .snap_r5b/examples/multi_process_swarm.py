#!/usr/bin/env python3
"""Multi-process swarm over the TCP transport.

Each robot runs as its OWN OS process (sensor front end + detection front
end + PGO back end) and communicates only through the TransportHub — the
deployment shape of the reference's DDS swarm, with unchanged node code.

    PYTHONPATH=. python examples/multi_process_swarm.py [--robots 2]
"""
import argparse
import os
import subprocess
import sys


def robot_main(rid: int, nb_robots: int, port: int, duration: float) -> None:
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    import time

    import numpy as np

    from cslam_tpu.config import CslamConfig
    from cslam_tpu.runtime.backend_node import DecentralizedPGO
    from cslam_tpu.runtime.bus import RobotContext
    from cslam_tpu.runtime.clock import WallClock
    from cslam_tpu.runtime.lcd_node import DetectionFrontEnd
    from cslam_tpu.runtime.simulator import (IdentityDescriptorModel,
                                             SimulatedSensorFrontEnd,
                                             SyntheticWorld,
                                             circle_trajectory)
    from cslam_tpu.runtime.transport import NetworkBus

    cfg = CslamConfig(robot_id=rid, max_nb_robots=nb_robots)
    cfg.frontend.similarity_threshold = 0.8
    cfg.frontend.detection_publication_period_sec = 0.3
    cfg.frontend.inter_robot_detection_period_sec = 1.5
    cfg.backend.pose_graph_optimization_start_period_ms = 3000
    cfg.neighbor_management.enable_neighbor_monitoring = True
    cfg.neighbor_management.init_delay_sec = 0.0
    cfg.neighbor_management.heartbeat_period_sec = 0.2

    # share XLA compiles across robot processes and runs
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/cslam_tpu_xla"))

    bus = NetworkBus(("127.0.0.1", port))
    ctx = RobotContext(bus, WallClock(), rid, cfg.flatten())
    world = SyntheticWorld(nb_places=30, descriptor_dim=32, seed=7)
    trajectory = circle_trajectory(20, radius=10.0 + 0.2 * rid,
                                   nb_places=30, start_angle=0.05 * rid)
    frontend = SimulatedSensorFrontEnd(ctx, world, trajectory,
                                       keyframe_period=0.4)
    detection = DetectionFrontEnd(ctx, model=IdentityDescriptorModel())
    backend = DecentralizedPGO(ctx, synchronous_optimization=False)
    # precompile the solver tier before traffic starts: a cold XLA compile
    # in the worker thread crawls once the main loop is dispatching
    backend.warmup(expected_poses=nb_robots * 20, expected_edges=64)

    start = time.time()
    while time.time() - start < duration:
        ctx.poll_timers()
        bus.deliver()
        time.sleep(0.02)

    fixed = len(detection.lcm.candidate_selector.fixed_edges)
    inter = sum(len(v) for v in backend.inter_robot_loop_closures.values())
    print(f"r{rid}: keyframes={detection.lcm.local_nnsm.n} "
          f"fixed_edges={fixed} inter_lc={inter} "
          f"optimizations={backend.optimization_count} "
          f"estimates={len(backend.current_pose_estimates)}", flush=True)
    bus.close()


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--robots", type=int, default=2)
    parser.add_argument("--duration", type=float, default=25.0)
    parser.add_argument("--robot-id", type=int, default=None,
                        help="internal: run as one robot process")
    parser.add_argument("--port", type=int, default=0)
    args = parser.parse_args()

    if args.robot_id is not None:
        robot_main(args.robot_id, args.robots, args.port, args.duration)
        return

    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    os.environ["JAX_PLATFORMS"] = "cpu"
    from cslam_tpu.runtime.transport import TransportHub
    hub = TransportHub()
    print(f"hub listening on {hub.address}")
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__),
         "--robot-id", str(r), "--robots", str(args.robots),
         "--port", str(hub.address[1]), "--duration", str(args.duration)],
        env={**os.environ, "PYTHONPATH": os.getcwd()})
        for r in range(args.robots)]
    for p in procs:
        p.wait()
    hub.close()


if __name__ == "__main__":
    main()
