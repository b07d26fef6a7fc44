#!/usr/bin/env python3
"""Lidar swarm end-to-end at scale: 5 robots, 1000+ keyframes.

The reference's lidar path is its primary multi-robot demo
(``/root/reference/cslam/lidar_handler_node.py`` + TEASER registration);
round-2 review flagged our e2e coverage as token (2-3 robots, small
clouds). This bench drives the FULL node stack — LidarFrontEnd (voxel
downsampling + odometry keyframe gating), ScanContext detection front end
(fused two-stage bank search, gossip, MAC selection, broker), multi-start
robust ICP verification, decentralized GNC PGO — for ``--robots`` robots
walking a shared world of structured scenes with drifting odometry, and
reports wall-clock, keyframe throughput, verified inter-robot loop
closures, and ATE before/after optimization.

    python benchmarks/lidar_e2e_scale_bench.py --cpu          # smoke
    python benchmarks/lidar_e2e_scale_bench.py                # real TPU
    python benchmarks/lidar_e2e_scale_bench.py --robots 5 --steps 210
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
                 help="keyframes per robot (total = robots * steps)")
_ap.add_argument("--scenes", type=int, default=40,
                 help="distinct places in the shared world loop")
_ap.add_argument("--points", type=int, default=4096,
                 help="raw points per scan before voxel downsampling")
_ap.add_argument("--cpu", action="store_true")
_ap.add_argument("--no-warmup", action="store_true",
                 help="skip tier precompilation (measures cold+steady mixed)")
_ap.add_argument("--sync", action="store_true",
                 help="disable the async detection/verification planes "
                      "(harvest-in-same-cycle; the round-3 flow) — A/B "
                      "baseline for the ATE-regression bisect")
_ap.add_argument("--dump-loops", default=None, metavar="PATH",
                 help="write the verified inter-robot loop set (sorted "
                      "edge keys) to PATH for cross-run diffing")
_ap.add_argument("--dump-g2o", default=None, metavar="BASE",
                 help="write BASE_optimized.g2o (all robots' odometry "
                      "factors + verified inter-robot loops + the final "
                      "estimates) for external (GTSAM) cross-checks — "
                      "see tools/gtsam_crosscheck.md")
_ap.add_argument("--mac-max-iters", type=int, default=None,
                 help="override the ACM Frank-Wolfe iteration budget")
_ap.add_argument("--warmup-threads", type=int, default=6,
                 help="concurrent warmup compiles (the remote compile "
                      "service accepts parallel programs; 1 = the "
                      "round-4 serial behavior)")
_args = _ap.parse_args()

if _args.cpu:
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    os.environ["JAX_PLATFORMS"] = "cpu"
    # the axon sitecustomize may have imported jax already — the env var
    # alone is too late then (this bit the first --cpu smoke run)
    import jax
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from cslam_tpu.config import CslamConfig  # noqa: E402
from cslam_tpu.runtime.backend_node import DecentralizedPGO  # noqa: E402
from cslam_tpu.runtime.bus import MessageBus, RobotContext  # noqa: E402
from cslam_tpu.runtime.clock import VirtualClock  # noqa: E402
from cslam_tpu.runtime.lcd_node import DetectionFrontEnd  # noqa: E402
from cslam_tpu.runtime.lidar_frontend import LidarFrontEnd  # noqa: E402
from cslam_tpu.types import Odometry  # noqa: E402


def scene_cloud(seed, n):
    """Structured scene: walls + ground + pillars (pillars pin ICP)."""
    rng = np.random.default_rng(seed)
    a1, a2 = rng.uniform(0, 2 * np.pi, 2)
    d1, d2 = rng.uniform(6, 18, 2)
    n3 = n // 3
    wall1 = np.stack([np.cos(a1) * d1 + rng.uniform(-6, 6, n3),
                      np.sin(a1) * d1 + rng.normal(0, 0.1, n3),
                      rng.uniform(0, 3, n3)], 1)
    wall2 = np.stack([np.cos(a2) * d2 + rng.normal(0, 0.1, n3),
                      np.sin(a2) * d2 + rng.uniform(-6, 6, n3),
                      rng.uniform(0, 2, n3)], 1)
    rest = n - 2 * n3
    ground = np.stack([rng.uniform(-20, 20, rest // 2),
                       rng.uniform(-20, 20, rest // 2),
                       rng.uniform(-0.2, 0.2, rest // 2)], 1)
    m = rest - rest // 2
    centers = rng.uniform(-15, 15, (5, 2))
    which = rng.integers(0, 5, m)
    pillars = np.stack([centers[which, 0] + rng.normal(0, 0.08, m),
                        centers[which, 1] + rng.normal(0, 0.08, m),
                        rng.uniform(0, 4, m)], 1)
    return np.concatenate([wall1, wall2, ground, pillars]).astype(np.float32)


def pose_at(x, y, yaw=0.0):
    T = np.eye(4)
    T[:3, :3] = [[np.cos(yaw), -np.sin(yaw), 0],
                 [np.sin(yaw), np.cos(yaw), 0], [0, 0, 1.0]]
    T[:3, 3] = [x, y, 0]
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
        cfg.frontend.sensor_type = "lidar"
        cfg.frontend.global_descriptor_technique = "scancontext"
        cfg.frontend.similarity_threshold = 0.7
        cfg.frontend.keyframe_generation_ratio_distance = 0.5
        cfg.frontend.voxel_size = 0.4
        cfg.frontend.registration_min_inliers = 40
        cfg.frontend.inter_robot_detection_period_sec = 3.0
        cfg.frontend.detection_publication_period_sec = 1.0
        # Pin the verified-loop (mf) axis to ONE tier for the whole
        # mission: the round-5 run verified 357+ inter-robot loops (plus
        # intra), crossed mf=512 mid-run and paid two 90-380 s foreground
        # Woodbury compiles on the serialized compile service — tier
        # crossings, not kernel speed, were the throughput ceiling.
        cfg.frontend.mac_mf_floor = 2048
        # ...and the P axis to the mission's pose bound: solve cost is
        # nearly P-independent with the dense-T~inv Woodbury stack
        # (selection bench: 411 ms at P=512 dense vs 418 ms at P=8192),
        # so one P tier = 3 total MAC programs to warm instead of 18 and
        # no P-crossing compile when total poses pass 1024 (step ~205).
        cfg.frontend.mac_p_floor = 2048
        # ...and the candidate (E) axis: the first floored run still paid
        # a ~15 min mid-run stall when the accumulated candidate pool
        # crossed 4096 at step ~140 (first-use line: E=8192, an 883 s
        # compile) — the one axis the floors left unpinned, because the
        # pool grows without bound while the per-round budget only ever
        # consumes ~350 edges. Bound the pool itself (weight-ordered,
        # non-permanent eviction) at the E floor: ONE fast MAC program
        # covers the whole mission.
        cfg.frontend.mac_e_floor = 2048
        cfg.frontend.max_candidate_pool = 2048
        # defer aged harvests until the client-side future resolves (a
        # read of a result still queued behind a MAC solve/verify batch
        # on the serialized relay blocked ~50 ms; ready results are
        # local-memory copies)
        cfg.frontend.harvest_ready_gate = True
        if _args.sync:
            cfg.frontend.async_detection = False
            cfg.frontend.async_verification = False
        if _args.mac_max_iters is not None:
            cfg.frontend.mac_max_iters = _args.mac_max_iters
        cfg.backend.pose_graph_optimization_start_period_ms = 30000
        # Pin the aggregate-PGO (pose, edge) tiers to the mission bound:
        # R*steps = 1050 poses -> 2048; ~1045 odom + <=600 verified loops
        # + priors -> 2048 edges. ONE GNC program instead of the 6 big
        # tiers that dominated warmup (330-433 s each).
        cfg.backend.pgo_np_floor = 2048
        cfg.backend.pgo_ne_floor = 2048
        cfg.neighbor_management.enable_neighbor_monitoring = False
        ctx = RobotContext(bus, clock, rid, cfg.flatten())
        robots.append((ctx, LidarFrontEnd(ctx), DetectionFrontEnd(ctx),
                       DecentralizedPGO(ctx, synchronous_optimization=True)))

    scenes = [scene_cloud(1000 + s, _args.points) for s in range(S)]
    # scene s sits at a grid position; robots walk the loop with offsets
    scene_pose = [pose_at(7.0 * (s % 8), 7.0 * (s // 8)) for s in range(S)]

    rng = np.random.default_rng(3)
    gt = {r: [] for r in range(R)}
    drifted = {r: [] for r in range(R)}
    for r in range(R):
        cur = None
        for i in range(steps):
            s = (i + 5 * r) % S
            p = scene_pose[s] @ pose_at(0.3 * r, 0.2 * r, yaw=0.1 * r)
            gt[r].append((s, p))
            if cur is None:
                cur = p.copy()
            else:
                z = np.linalg.inv(gt[r][i - 1][1]) @ p
                z[:3, 3] += rng.normal(scale=0.05, size=3)
                cur = cur @ z
            drifted[r].append(cur.copy())

    def observe(scene_idx, pose):
        scene = scenes[scene_idx]
        world = scene @ scene_pose[scene_idx][:3, :3].T \
            + scene_pose[scene_idx][:3, 3]
        inv = np.linalg.inv(pose)
        pts = world @ inv[:3, :3].T + inv[:3, 3]
        return (pts + rng.normal(scale=0.03, size=pts.shape)
                ).astype(np.float32)

    # precompile every tier the run will hit (all robots share the
    # process, hence the in-process compile cache): embedding point-count
    # tiers, bank search query-batch tiers + the multi-bank per-keyframe
    # search, registration pair tiers, PGO pose/edge tiers. Steady-state
    # throughput is reported separately from this cold cost — the real
    # deployment pays it once at startup via the persistent compile cache.
    warm_s = 0.0
    if not _args.no_warmup:
        tw = time.perf_counter()
        from cslam_tpu.matching.scancontext_bank import warmup_search_tiers
        from cslam_tpu.selection.mac import (mac_kwargs_from_params,
                                             selection_tier_grid,
                                             warmup_selection_tier)

        # Build one task per program family and spread the compiles over a
        # thread pool: the remote compile service accepts concurrent
        # programs, so a serial warmup (round 4: 1860 s) pays every
        # per-program latency end to end. During warmup there is no
        # main-loop dispatch contention to starve the workers.
        tasks = []

        def task(label, fn, *a, **kw):
            tasks.append((label, fn, a, kw))

        task("embed", robots[0][2].model.warmup, _args.points)
        cap = 1024
        while cap < steps:  # local bank holds `steps` own scans
            cap *= 2
        for c in {1024, cap}:
            # multi-bank search groups only non-empty banks, so the bank
            # count varies 1..R-1 over a run — warm every count
            for b in (1, 2, 4, 8, 16, 32):
                task(f"sc_bank_{c}_b{b}", warmup_search_tiers, c,
                     batch_tiers=(b,))
            for r in range(1, R):
                task(f"sc_bank_{c}_m{r}", warmup_search_tiers, c,
                     batch_tiers=(), multi_bank_counts=(r,))
        for p in (1, 2, 4, 8):
            task(f"verify_t{p}", robots[0][1].warmup, pair_tiers=(p,))
        # MAC selection tiers (one FW program per (pose, candidate) tier;
        # k is a traced operand so budgets don't multiply programs).
        # Candidates = accumulated unverified matches, which can exceed the
        # keyframe count (every keyframe can match several robots) — the
        # round-4 run crossed 1024 candidates mid-run and paid 80 s
        # foreground compiles; warm one tier beyond the expected count.
        mac_kwargs = mac_kwargs_from_params(robots[0][2].params)
        mac_iters = robots[0][2].lcm.candidate_selector.max_iters
        # candidates = accumulated unverified matches; the round-5 run
        # crossed E=2048, so warm one tier past that too
        for (p, e) in selection_tier_grid(
                R * steps, 2048, e_floor=mac_kwargs["e_floor"],
                p_floor=mac_kwargs["p_floor"]):
            task(f"mac_{p}x{e}", warmup_selection_tier, p, e,
                 max_iters=mac_iters, **mac_kwargs)
        # the elected optimizer aggregates ALL robots' subgraphs
        for (np_t, ne_t) in robots[0][3].warmup_tier_grid(
                R * steps, 2 * R * steps):
            task(f"pgo_{np_t}x{ne_t}", robots[0][3].warmup_tier, np_t, ne_t)

        from concurrent.futures import ThreadPoolExecutor
        durations = {}

        def run_task(t):
            label, fn, a, kw = t
            t0 = time.perf_counter()
            # the remote compile service occasionally drops a connection
            # mid-compile ("response body closed before all bytes were
            # read") — retry the task; a lost warmup must never kill the
            # bench (the worst case is the steady phase re-compiling it)
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
    # steady state must not compile: every program was warmed above. The
    # watch names any that slip through (= a tier-coverage bug to fix).
    with profiling.CompileWatch() as cw:
        for i in range(steps):
            if i % 25 == 0:
                print(f"# step {i}/{steps} at "
                      f"{time.perf_counter() - t0:.1f} s", flush=True)
            for r in range(R):
                s, p = gt[r][i]
                robots[r][1].lidar_callback(observe(s, p),
                                            Odometry(pose=drifted[r][i]))
            clock.advance(1.0)
            for ctx, *_ in robots:
                ctx.poll_timers()
            bus.deliver()
        # drain gossip + run the final optimization rounds
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

    if _args.dump_g2o:
        from cslam_tpu.evaluation.g2o import write_g2o
        factors = []
        for _, _, _, be in robots:
            factors.extend(be.local_factors)
        for edges in be0.inter_robot_loop_closures.values():
            factors.extend(edges)
        write_g2o(f"{_args.dump_g2o}_optimized.g2o",
                  dict(be0.current_pose_estimates), factors)

    est = {k[1]: p for k, p in be0.current_pose_estimates.items()
           if k[0] == 0}

    def rmse(pm, gtl):
        errs = [np.linalg.norm(pm[i][:3, 3] - gtl[i][1][:3, 3])
                for i in pm]
        return float(np.sqrt(np.mean(np.square(errs)))) if errs else -1.0

    ate_odo = rmse({i: drifted[0][i] for i in range(steps)}, gt[0])
    ate_opt = rmse(est, gt[0])

    print(f"# {R} robots x {steps} steps = {total_kf} keyframes, "
          f"{S} scenes, {_args.points} pts/scan, "
          f"platform={'cpu' if _args.cpu else 'tpu'}")
    # the mission advances 1 s of sim time per step (+ the drain): the
    # honest real-time claim is wall <= sim, i.e. the full stack — sensor
    # gating, detection, gossip, MAC selection, verification, PGO — keeps
    # up with the reference's deployment cadence at this swarm scale
    # (lidar_handler_node.py processes at sensor rate on a robot CPU)
    sim_s = float(steps + 60)
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
        "metric": "lidar_e2e_keyframes_per_sec",
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
