#!/usr/bin/env python3
"""Visual (RGB-D) swarm end-to-end at scale: 5 robots, 1000+ keyframes.

The reference's *default* front end is the C++ visual one
(``/root/reference/src/front_end/rgbd_handler.cpp:173-351,493-554``); this
is its assembled-pipeline bench, the stereo/RGBD analogue of
``lidar_e2e_scale_bench.py`` (round-4 VERDICT item 4). It drives the FULL
node stack — RGBDFrontEnd (native C++ FAST-9 + steered-BRIEF features,
keyframe publication, compressed descriptor exchange), CosPlace global
descriptors through the detection front end (descriptor banks, gossip,
MAC selection, vertex-cover brokerage), batched GNC geometric
verification, decentralized GNC PGO — for ``--robots`` robots revisiting
a shared world of rendered scenes with drifting odometry, and reports
wall-clock, keyframe throughput, verified inter-robot loop closures, and
ATE before/after optimization.

The CosPlace trunk runs with RANDOM weights (real checkpoints are
environment-blocked — BENCH.md "real-checkpoint validation"); untrained
GeM features only separate scenes by global appearance, so scenes carry
distinct ambient levels / texture bands and the similarity threshold is
high. Cross-scene candidates that slip through are rejected by geometric
verification — the same role RANSAC-PnP plays for rtabmap features in
the reference (rgbd_handler.cpp:493-554).

    python benchmarks/visual_e2e_scale_bench.py --cpu       # smoke
    python benchmarks/visual_e2e_scale_bench.py             # real TPU
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")

_ap = argparse.ArgumentParser()
_ap.add_argument("--robots", type=int, default=5)
_ap.add_argument("--steps", type=int, default=210,
                 help="frames per robot (every frame becomes a keyframe)")
_ap.add_argument("--scenes", type=int, default=40,
                 help="distinct places in the shared world loop")
_ap.add_argument("--cpu", action="store_true")
_ap.add_argument("--no-warmup", action="store_true")
_ap.add_argument("--sync", action="store_true",
                 help="disable the async detection/verification planes")
_ap.add_argument("--dump-loops", default=None, metavar="PATH")
_ap.add_argument("--warmup-threads", type=int, default=6)
_args = _ap.parse_args()

if _args.cpu:
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from cslam_tpu.config import CslamConfig  # noqa: E402
from cslam_tpu.runtime.backend_node import DecentralizedPGO  # noqa: E402
from cslam_tpu.runtime.bus import MessageBus, RobotContext  # noqa: E402
from cslam_tpu.runtime.clock import VirtualClock  # noqa: E402
from cslam_tpu.runtime.lcd_node import DetectionFrontEnd  # noqa: E402
from cslam_tpu.runtime.rgbd_frontend import (CameraModel,  # noqa: E402
                                             RGBDFrontEnd)
from cslam_tpu.types import Odometry  # noqa: E402

W, H = 320, 240
CAM = CameraModel(fx=300.0, fy=300.0, cx=160.0, cy=120.0)


def make_scene(seed, n=None):
    """Textured landmark field with a scene-distinct global appearance
    (background ramp, ambient level, texture band, stamp size/count):
    untrained GeM pooling separates global statistics, not layout — see
    module docstring. Several independent appearance axes keep same-scene
    views closer than cross-scene pairs even with random trunk weights."""
    rng = np.random.default_rng(seed)
    if n is None:
        n = int(rng.integers(60, 220))
    pts = np.stack([rng.uniform(-5, 5, n), rng.uniform(-3, 3, n),
                    rng.uniform(4, 11, n)], axis=1)
    a0, a1 = rng.integers(0, 150, 2)  # vertical background ramp
    bg = (a0 + (a1 - a0) * np.linspace(0, 1, H))[:, None] * np.ones((1, W))
    lo = int(rng.integers(30, 150))
    hi = lo + int(rng.integers(40, 105))
    half = int(rng.integers(3, 8))
    tex = rng.integers(lo, hi, (n, 2 * half + 1, 2 * half + 1),
                       dtype=np.int64)
    return pts, tex, bg.astype(np.uint8), half


def render(scene, pose):
    """Painter's-algorithm stamp render in the camera at ``pose``;
    returns (grayscale image, metric depth)."""
    pts, tex, bg, half = scene
    img = bg.copy()
    dep = np.zeros((H, W), np.float32)
    inv = np.linalg.inv(pose)
    cpts = pts @ inv[:3, :3].T + inv[:3, 3]
    for i in np.argsort(-cpts[:, 2]):
        x, y, z = cpts[i]
        if z < 0.5:
            continue
        u = int(round(CAM.fx * x / z + CAM.cx))
        v = int(round(CAM.fy * y / z + CAM.cy))
        if not (20 <= u < W - 20 and 20 <= v < H - 20):
            continue
        img[v - half:v + half + 1, u - half:u + half + 1] = \
            tex[i].astype(np.uint8)
        dep[v - half:v + half + 1, u - half:u + half + 1] = z
    return img, dep


def pose_xyz_yaw(x, y, z=0.0, yaw=0.0):
    T = np.eye(4)
    c, s = np.cos(yaw), np.sin(yaw)
    T[:3, :3] = [[c, -s, 0], [s, c, 0], [0, 0, 1]]
    T[:3, 3] = [x, y, z]
    return T


def main():
    import logging
    _h = logging.StreamHandler(sys.stdout)
    _h.setFormatter(logging.Formatter("# %(message)s"))
    _lg = logging.getLogger("cslam_tpu.selection.mac")
    _lg.addHandler(_h)
    _lg.setLevel(logging.INFO)

    R, steps, S = _args.robots, _args.steps, _args.scenes
    bus, clock = MessageBus(), VirtualClock()
    robots = []
    for rid in range(R):
        cfg = CslamConfig(robot_id=rid, max_nb_robots=R)
        cfg.frontend.sensor_type = "rgbd"
        cfg.frontend.global_descriptor_technique = "cosplace"
        cfg.frontend.nn_checkpoint = "random"
        cfg.frontend.image_crop_size = 224
        cfg.frontend.similarity_threshold = 0.998
        cfg.frontend.keyframe_generation_ratio_threshold = 1.0
        cfg.frontend.pnp_min_inliers = 10
        cfg.frontend.inter_robot_detection_period_sec = 3.0
        cfg.frontend.detection_publication_period_sec = 1.0
        cfg.frontend.warmup_verification_tiers = (
            () if _args.no_warmup else (1, 2, 4, 8, 16))
        if _args.sync:
            cfg.frontend.async_detection = False
            cfg.frontend.async_verification = False
        # pin the verified-loop (mf) MAC axis to one tier (see the lidar
        # bench: mid-run mf crossings paid 90-380 s foreground compiles)
        cfg.frontend.mac_mf_floor = 2048
        cfg.frontend.mac_p_floor = 2048  # see the lidar bench note
        cfg.frontend.mac_e_floor = 2048  # one MAC tier for the mission
        cfg.frontend.max_candidate_pool = 2048  # bounded pool = bounded E
        cfg.frontend.harvest_ready_gate = True  # see the lidar bench note
        cfg.backend.pose_graph_optimization_start_period_ms = 30000
        # one aggregate-GNC program for the mission (see the lidar bench)
        cfg.backend.pgo_np_floor = 2048
        cfg.backend.pgo_ne_floor = 2048
        cfg.neighbor_management.enable_neighbor_monitoring = False
        ctx = RobotContext(bus, clock, rid, cfg.flatten())
        robots.append((ctx, RGBDFrontEnd(ctx, CAM), DetectionFrontEnd(ctx),
                       DecentralizedPGO(ctx, synchronous_optimization=True)))

    scene_pose = [pose_xyz_yaw(7.0 * (s % 8), 7.0 * (s // 8)) for s in range(S)]
    scenes = []
    for s in range(S):
        pts, tex, bg, half = make_scene(1000 + s)
        # landmarks live in the scene's world cell (the camera visits
        # scene_pose[s]; without this transform every off-origin scene
        # rendered as an empty background — zero FAST keypoints)
        pts = pts @ scene_pose[s][:3, :3].T + scene_pose[s][:3, 3]
        scenes.append((pts, tex, bg, half))

    rng = np.random.default_rng(3)
    gt = {r: [] for r in range(R)}
    drifted = {r: [] for r in range(R)}
    for r in range(R):
        cur = None
        for i in range(steps):
            s = (i + 5 * r) % S
            p = scene_pose[s] @ pose_xyz_yaw(0.25 * r, 0.15 * r,
                                             0.1 * r, yaw=0.06 * r)
            gt[r].append((s, p))
            if cur is None:
                cur = p.copy()
            else:
                z = np.linalg.inv(gt[r][i - 1][1]) @ p
                z[:3, 3] += rng.normal(scale=0.05, size=3)
                cur = cur @ z
            drifted[r].append(cur.copy())

    warm_s = 0.0
    if not _args.no_warmup:
        tw = time.perf_counter()
        from cslam_tpu.matching.nns_bank import warmup_bank_tiers
        from cslam_tpu.selection.mac import (mac_kwargs_from_params,
                                             selection_tier_grid,
                                             warmup_selection_tier)
        tasks = []

        def task(label, fn, *a, **kw):
            tasks.append((label, fn, a, kw))

        # embedding program (fixed render shape -> one program)
        dummy = render(scenes[0], scene_pose[0])[0]
        rgb = np.stack([dummy] * 3, axis=-1)

        def warm_embed():
            for _ in range(2):
                robots[0][2].model.compute_embedding(rgb)

        task("embed", warm_embed)
        # bank tiers: local + other-robot banks stay within 1024 capacity
        # at `steps` <= 1024 descriptors; gossip-flush batches can stack
        # several senders' chunks
        dim = int(robots[0][2].params.get(
            "frontend.cosplace.descriptor_dim", 64))
        kv = (1, int(robots[0][2].params["frontend.nb_best_matches"]))
        cap = 1024
        while cap < steps:
            cap *= 2
        for c in {1024, cap}:
            for b in (1, 2, 4, 8, 16, 32, 64, 128, 256):
                task(f"bank_{c}_b{b}", warmup_bank_tiers, c, dim,
                     batch_tiers=(b,), k_values=kv)
            for r in range(1, R):
                task(f"bank_{c}_m{r}", warmup_bank_tiers, c, dim,
                     batch_tiers=(), multi_bank_counts=(r,), k_values=kv)
        mac_kwargs = mac_kwargs_from_params(robots[0][2].params)
        mac_iters = robots[0][2].lcm.candidate_selector.max_iters
        for (p, e) in selection_tier_grid(
                R * steps, 2048, e_floor=mac_kwargs["e_floor"],
                p_floor=mac_kwargs["p_floor"]):
            task(f"mac_{p}x{e}", warmup_selection_tier, p, e,
                 max_iters=mac_iters, **mac_kwargs)
        for (np_t, ne_t) in robots[0][3].warmup_tier_grid(
                R * steps, 2 * R * steps):
            task(f"pgo_{np_t}x{ne_t}", robots[0][3].warmup_tier, np_t, ne_t)

        from concurrent.futures import ThreadPoolExecutor
        durations = {}

        def run_task(t):
            label, fn, a, kw = t
            t0 = time.perf_counter()
            # retry transient remote-compile-service failures; a lost
            # warmup must never kill the bench (see the lidar bench)
            for attempt in range(3):
                try:
                    fn(*a, **kw)
                    break
                except Exception as e:
                    print(f"#   warmup {label} attempt {attempt + 1} "
                          f"failed: {e}", flush=True)
                    if attempt == 2:
                        print(f"#   warmup {label} GAVE UP — steady "
                              f"state will compile it", flush=True)
                    else:
                        time.sleep(2.0)
            durations[label] = time.perf_counter() - t0

        with ThreadPoolExecutor(max_workers=_args.warmup_threads) as ex:
            list(ex.map(run_task, tasks))
        warm_s = time.perf_counter() - tw
        for label, d in sorted(durations.items(), key=lambda kv: -kv[1])[:8]:
            print(f"#   warmup long-pole: {label} {d:.1f} s", flush=True)
        print(f"# warmup (tier precompilation) {warm_s:.1f} s "
              f"({len(tasks)} tasks, {_args.warmup_threads} threads)",
              flush=True)

    from cslam_tpu.utils import profiling
    profiling.reset_spans()
    t0 = time.perf_counter()
    with profiling.CompileWatch() as cw:
        for i in range(steps):
            if i % 25 == 0:
                print(f"# step {i}/{steps} at "
                      f"{time.perf_counter() - t0:.1f} s", flush=True)
            for r in range(R):
                s, p = gt[r][i]
                with profiling.span("rgbd.render"):
                    img, dep = render(scenes[s], p)
                robots[r][1].rgbd_callback(np.stack([img] * 3, axis=-1),
                                           dep, Odometry(pose=drifted[r][i]))
            clock.advance(1.0)
            for ctx, *_ in robots:
                ctx.poll_timers()
            bus.deliver()
        for _ in range(60):
            clock.advance(1.0)
            for ctx, *_ in robots:
                ctx.poll_timers()
            bus.deliver()
    wall = time.perf_counter() - t0
    if cw.count:
        print(f"# WARNING: {cw.count} steady-state MAIN-THREAD compiles: "
              f"{sorted(set(cw.names))}", flush=True)
        for expl in cw.miss_explanations[:12]:
            print("#   miss: " + expl.replace("\n", "\n#         "),
                  flush=True)
    if cw.background_count:
        print(f"# note: {cw.background_count} background prefetch compiles: "
              f"{sorted(set(cw.background_names))}", flush=True)

    total_kf = sum(robots[r][1].nb_local_keyframes for r in range(R))
    be0 = robots[0][3]
    inter = sum(len(v) for v in be0.inter_robot_loop_closures.values())
    if _args.dump_loops:
        keys = sorted(
            f"{e.key_from.robot_id},{e.key_from.keyframe_id},"
            f"{e.key_to.robot_id},{e.key_to.keyframe_id}"
            for edges in be0.inter_robot_loop_closures.values()
            for e in edges)
        with open(_args.dump_loops, "w") as f:
            f.write("\n".join(keys) + "\n")

    est = {k[1]: p for k, p in be0.current_pose_estimates.items()
           if k[0] == 0}

    def rmse(pm, gtl):
        errs = [np.linalg.norm(pm[i][:3, 3] - gtl[i][1][:3, 3])
                for i in pm]
        return float(np.sqrt(np.mean(np.square(errs)))) if errs else -1.0

    ate_odo = rmse({i: drifted[0][i] for i in range(steps)}, gt[0])
    ate_opt = rmse(est, gt[0])

    sim_s = float(steps + 60)
    print(f"# {R} robots x {steps} steps = {total_kf} keyframes, "
          f"{S} scenes, {W}x{H} frames, "
          f"platform={'cpu' if _args.cpu else 'tpu'}")
    print(f"# steady wall {wall:.1f} s = {total_kf / wall:.1f} kf/s, "
          f"real-time factor {sim_s / wall:.2f}x "
          f"(+ warmup {warm_s:.1f} s) | verified "
          f"inter-robot loops {inter} | optimizations "
          f"{be0.optimization_count}")
    print(f"# ATE robot0: odometry {ate_odo:.3f} m -> optimized "
          f"{ate_opt:.3f} m")
    print("# where the steady-state time went (host-side spans):")
    for line in profiling.report().splitlines():
        print("#   " + line)
    print(json.dumps({
        "metric": "visual_e2e_keyframes_per_sec",
        "value": round(total_kf / wall, 2),
        "unit": "kf/s",
        "robots": R, "total_keyframes": total_kf,
        "steady_wall_clock_s": round(wall, 1),
        "warmup_s": round(warm_s, 1),
        "inter_robot_loops": inter,
        "optimizations": be0.optimization_count,
        "ate_odometry_m": round(ate_odo, 3),
        "ate_optimized_m": round(ate_opt, 3),
        "steady_state_compiles": cw.count,
        "background_prefetch_compiles": cw.background_count,
        "sim_seconds": sim_s,
        "real_time_factor": round(sim_s / wall, 3),
    }))


if __name__ == "__main__":
    main()
