#!/usr/bin/env python3
"""Distributed (mesh-sharded) PGO: sweeps-to-centralized-parity curve.

The TPU-native scaling mode (``cslam_tpu.pgo.distributed``) runs block
Gauss-Seidel over a ``Mesh(('robots',))`` — per-robot subgraphs on their own
devices, separator poses exchanged via ICI all_gather. This benchmark
answers the convergence question the mode ships with (round-1 VERDICT item
3): how many sweeps until ATE parity with the centralized solver, and where
does the separator-residual criterion actually stop?

Runs on the 8-virtual-CPU-device mesh by default (multi-chip TPU hardware
is not available here; the sharded program is identical). Reference
behavior being beaten: the reference always centralizes the whole
multi-robot graph at one elected robot (decentralized_pgo.cpp:884-905).

    python benchmarks/distributed_pgo_bench.py [--robots 8] [--poses 256]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")

if "--tpu" not in sys.argv:
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        # virtual mesh sized to --robots (>= 8 keeps old runs comparable)
        _n = 8
        if "--robots" in sys.argv:
            _n = max(_n, int(sys.argv[sys.argv.index("--robots") + 1]))
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={_n}").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np  # noqa: E402
import jax  # noqa: E402

if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

from cslam_tpu.ops import se3  # noqa: E402
from cslam_tpu.pgo import FactorGraph, gnc_optimize, lm_optimize  # noqa: E402
from cslam_tpu.pgo.distributed import (AXIS, ShardedPoseGraph,  # noqa: E402
                                       distributed_optimize,
                                       make_distributed_step)
from cslam_tpu.types import PoseGraphEdge, PoseKey  # noqa: E402

SIGMAS = np.array([0.01] * 3 + [0.1] * 3)


def circle(robot, n, radius):
    out = {}
    for k in range(n):
        a = 2 * np.pi * k / n
        T = np.eye(4)
        T[:3, :3] = [[np.cos(a), -np.sin(a), 0],
                     [np.sin(a), np.cos(a), 0], [0, 0, 1.0]]
        T[:3, 3] = [radius * np.cos(a), radius * np.sin(a), 0.1 * robot]
        out[(robot, k)] = T
    return out


def build(nb_robots, nb_poses, rng, sep_every, nb_outliers=2, noise_scale=0.02):
    gt = {}
    for r in range(nb_robots):
        gt.update(circle(r, nb_poses, 10.0 + 0.3 * r))
    problem = ShardedPoseGraph(nb_robots)
    central = FactorGraph()
    for r in range(nb_robots):
        cur = gt[(r, 0)]
        problem.add_variable(r, 0, cur)
        central.add_variable((r, 0), cur)
        for k in range(nb_poses - 1):
            z = np.asarray(se3.between(jnp.asarray(gt[(r, k)]),
                                       jnp.asarray(gt[(r, k + 1)])))
            noise = np.eye(4)
            noise[:3, 3] = rng.normal(scale=noise_scale, size=3)
            z = z @ noise
            cur = cur @ z
            problem.add_variable(r, k + 1, cur)
            central.add_variable((r, k + 1), cur)
            problem.add_local_between(r, k, k + 1, z, SIGMAS)
            central.add_between((r, k), (r, k + 1), z, SIGMAS)
    n_sep = 0
    for r in range(nb_robots - 1):
        for k in range(0, nb_poses, sep_every):
            z = np.asarray(se3.between(jnp.asarray(gt[(r, k)]),
                                       jnp.asarray(gt[(r + 1, k)])))
            problem.add_separator(PoseGraphEdge(
                key_from=PoseKey(r, k), key_to=PoseKey(r + 1, k),
                measurement=z, noise_sigmas=SIGMAS))
            central.add_between((r, k), (r + 1, k), z, SIGMAS,
                                robust=True)
            n_sep += 1
    # gross outlier separators
    for i in range(nb_outliers):
        bad = np.eye(4)
        bad[:3, 3] = [12.0 + 3 * i, -9.0, 5.0]
        problem.add_separator(PoseGraphEdge(
            key_from=PoseKey(0, 3 + i), key_to=PoseKey(nb_robots - 1, 7 + i),
            measurement=bad, noise_sigmas=SIGMAS))
        central.add_between((0, 3 + i), (nb_robots - 1, 7 + i), bad, SIGMAS,
                            robust=True)
    central.add_prior((0, 0), gt[(0, 0)], SIGMAS)
    return gt, problem, central, n_sep


def ate(est, gt):
    keys = sorted(set(est) & set(gt))
    errs = [np.linalg.norm(est[k][:3, 3] - gt[k][:3, 3]) for k in keys]
    return float(np.sqrt(np.mean(np.square(errs))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--robots", type=int, default=8)
    ap.add_argument("--poses", type=int, default=256)
    ap.add_argument("--sep-every", type=int, default=16)
    ap.add_argument("--tpu", action="store_true",
                    help="run on the real TPU devices instead of the "
                         "8-virtual-CPU mesh")
    args = ap.parse_args()

    devices = jax.devices()
    assert len(devices) >= args.robots, (
        f"need {args.robots} devices, have {len(devices)}")
    mesh = Mesh(np.array(devices[:args.robots]), (AXIS,))
    rng = np.random.default_rng(0)
    # input construction uses device se3 ops: on TPU it MUST run at
    # highest matmul precision or the measurements themselves are
    # contaminated (bf16 passes), masquerading as solver bugs (CLAUDE.md:
    # ATE 20 m / 19 false rejections from exactly this).
    with jax.default_matmul_precision("highest"):
        gt, problem, central, n_sep = build(args.robots, args.poses, rng,
                                            args.sep_every)
    init_est = {k: central.get_pose(k) for k in gt}
    ate_init = ate(init_est, gt)

    # centralized GNC reference solution
    t0 = time.perf_counter()
    res = gnc_optimize(central.to_arrays())
    jax.block_until_ready(res.poses)
    t_central = time.perf_counter() - t0
    central_est = {tuple(v.key.as_tuple()): v.pose
                   for v in central.values_from_arrays(res.poses)}
    ate_central = ate(central_est, gt)

    # sweeps-to-parity curve: per-sweep stepping with the same schedule
    step = make_distributed_step(mesh, lm_iters=8, cg_iters=60)
    local, sep = problem.to_device_arrays(mesh)
    sharding = NamedSharding(mesh, P(AXIS))
    local = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), local)
    mu = 0.05
    curve = []
    parity_sweep = None
    for sweep_i in range(1, 21):
        local = step(local, sep, jnp.float32(mu))
        mu = min(mu * 1.6, 1e6)
        est = problem.values_from_arrays(np.asarray(local.poses))
        a = ate(est, gt)
        curve.append(a)
        if parity_sweep is None and a < ate_central + 0.05:
            parity_sweep = sweep_i

    # converged one-dispatch solve (timed warm)
    est, info = distributed_optimize(problem, mesh, sweeps=30, lm_iters=8,
                                     cg_iters=60, return_info=True)
    t0 = time.perf_counter()
    est, info = distributed_optimize(problem, mesh, sweeps=30, lm_iters=8,
                                     cg_iters=60, return_info=True)
    t_dist = time.perf_counter() - t0
    ate_dist = ate(est, gt)
    w = info.sep_weights
    outliers_rejected = int(np.sum(w[n_sep:n_sep + 2] < 0.01))
    false_rejects = int(np.sum(w[:n_sep] < 0.5))

    # steady-state incremental round (VERDICT r2 #7): previous solution
    # fed back as init + previous separator TLS classification carried
    # via carried_weights — mirrors what backend_node does every round
    # after the first. Measures sweeps + wall-clock vs the cold solve.
    for rid, g in enumerate(problem.local_graphs):
        for key in list(g._index):
            g._poses[g._index[key]] = est[key]
    est_w, info_w = distributed_optimize(
        problem, mesh, sweeps=30, lm_iters=8, cg_iters=60, warm=True,
        carried_weights=info.sep_weight_by_key, return_info=True)
    t0 = time.perf_counter()
    est_w, info_w = distributed_optimize(
        problem, mesh, sweeps=30, lm_iters=8, cg_iters=60, warm=True,
        carried_weights=info.sep_weight_by_key, return_info=True)
    t_warm = time.perf_counter() - t0
    ate_warm = ate(est_w, gt)
    w_w = info_w.sep_weights
    warm_outliers = int(np.sum(w_w[n_sep:n_sep + 2] < 0.01))
    warm_false = int(np.sum(w_w[:n_sep] < 0.5))

    print(f"# {args.robots} robots x {args.poses} poses "
          f"({args.robots * args.poses} total), {n_sep} separators + 2 "
          f"outliers, platform={devices[0].platform}")
    print(f"# ATE: init {ate_init:.3f} m | centralized GNC {ate_central:.3f}"
          f" m ({t_central:.2f} s) | distributed {ate_dist:.3f} m")
    print("# sweeps-to-parity curve (ATE after sweep k):")
    for i, a in enumerate(curve, 1):
        marker = "  <- parity" if parity_sweep == i else ""
        print(f"#   sweep {i:2d}: {a:.3f} m{marker}")
    print(f"# converged solve: {info.sweeps_used} sweeps, final delta "
          f"{info.final_delta:.1e}, warm wall-clock {t_dist:.2f} s, "
          f"outliers rejected {outliers_rejected}/2, false rejections "
          f"{false_rejects}/{n_sep}")
    print(f"# steady-state round (carried TLS weights): {info_w.sweeps_used}"
          f" sweeps (cold {info.sweeps_used}), wall-clock {t_warm:.2f} s "
          f"(cold {t_dist:.2f}), ATE {ate_warm:.3f} m, outliers still "
          f"rejected {warm_outliers}/2, false rejections "
          f"{warm_false}/{n_sep}")
    print(json.dumps({
        "metric": "distributed_pgo_sweeps_to_centralized_parity",
        "value": parity_sweep if parity_sweep is not None else -1,
        "unit": "sweeps",
        "ate_init_m": round(ate_init, 3),
        "ate_central_m": round(ate_central, 3),
        "ate_distributed_m": round(ate_dist, 3),
        "sweeps_used": info.sweeps_used,
        "outliers_rejected": outliers_rejected,
        "false_rejections": false_rejects,
        "warm_wall_clock_s": round(t_dist, 3),
        "steady_state_sweeps": info_w.sweeps_used,
        "steady_state_wall_clock_s": round(t_warm, 3),
        "steady_state_ate_m": round(ate_warm, 3),
        "steady_state_outliers_rejected": warm_outliers,
        "steady_state_false_rejections": warm_false,
    }))


if __name__ == "__main__":
    main()
