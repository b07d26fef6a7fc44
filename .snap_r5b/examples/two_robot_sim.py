#!/usr/bin/env python3
"""Two robots collaboratively mapping overlapping trajectories.

The SURVEY.md minimum end-to-end slice as a runnable demo: descriptor
gossip, MAC-budgeted loop-closure selection, vertex-cover brokerage,
ground-truth-backed geometric verification, and decentralized GNC pose-graph
optimization — all on the in-process simulator.

    PYTHONPATH=. python examples/two_robot_sim.py [--robots N] [--keyframes K]
"""
import argparse
import os
import sys

if "--cpu" in sys.argv or os.environ.get("CSLAM_TPU_FORCE_CPU"):
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from cslam_tpu.runtime.simulator import (SwarmSimulator, SyntheticWorld,  # noqa: E402
                                         circle_trajectory)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--robots", type=int, default=2)
    parser.add_argument("--keyframes", type=int, default=30)
    parser.add_argument("--duration", type=float, default=40.0)
    parser.add_argument("--cpu", action="store_true",
                        help="force the CPU backend")
    args = parser.parse_args()

    world = SyntheticWorld(nb_places=40, descriptor_dim=32, seed=0)
    trajectories = [
        circle_trajectory(args.keyframes, radius=10.0 + 0.3 * r,
                          nb_places=40, start_angle=0.05 * r, z=0.2 * r)
        for r in range(args.robots)
    ]
    sim = SwarmSimulator(args.robots, world, trajectories,
                         config_overrides={
                             "frontend.inter_robot_detection_period_sec": 3.0,
                             "frontend.inter_robot_loop_closure_budget": 5,
                             "backend.pose_graph_optimization_start_period_ms": 2000,
                         },
                         keyframe_period=0.5)
    sim.run(args.duration, dt=0.25)

    print(f"bus messages delivered: {sim.bus.messages_delivered}")
    for rid, robot in enumerate(sim.robots):
        det, be = robot.detection, robot.backend
        inter = sum(len(v) for v in be.inter_robot_loop_closures.values())
        odo_ate, opt_ate = sim.ate(rid)
        print(f"r{rid}: kfs={det.lcm.local_nnsm.n} "
              f"fixed_edges={len(det.lcm.candidate_selector.fixed_edges)} "
              f"inter_lc={inter} optimizations={be.optimization_count} "
              f"estimates={len(be.current_pose_estimates)} "
              f"ATE odom={odo_ate:.3f} -> optimized={opt_ate:.3f}")


if __name__ == "__main__":
    main()
