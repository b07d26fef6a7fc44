#!/usr/bin/env python3
"""Secondary benchmark: multi-robot robust PGO wall-clock on real hardware.

North-star #2 (BASELINE.md): sub-second 5-robot decentralized PGO to
reference-ATE parity. Builds an N-robot, K-keyframes-per-robot graph with
noisy odometry, inter-robot loop closures every 10 keyframes and 2 gross
outliers, then times one cached ``gnc_optimize`` dispatch.

    python benchmarks/pgo_bench.py                      # 5 x 100 headline
    python benchmarks/pgo_bench.py --robots 8 --poses 256   # 2048, PCG tier
    python benchmarks/pgo_bench.py --robots 8 --poses 512   # 4096, PCG tier
"""
import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax.numpy as jnp  # noqa: E402

from cslam_tpu.ops import se3  # noqa: E402
from cslam_tpu.pgo import FactorGraph, gnc_optimize  # noqa: E402

SIGMAS = np.array([0.01] * 3 + [0.1] * 3)
_ap = argparse.ArgumentParser()
_ap.add_argument("--robots", type=int, default=5)
_ap.add_argument("--poses", type=int, default=100)
_ap.add_argument("--export-g2o", default=None, metavar="BASE",
                 help="write BASE_init.g2o / BASE_gt.g2o / "
                      "BASE_optimized.g2o for external (GTSAM) cross-checks"
                      " — see tools/gtsam_crosscheck.md")
_args, _ = _ap.parse_known_args()
NB_ROBOTS, NB_POSES = _args.robots, _args.poses


def circle(robot, n, radius):
    out = {}
    for k in range(n):
        a = 2 * np.pi * k / n
        T = np.eye(4)
        T[:3, :3] = [[np.cos(a), -np.sin(a), 0],
                     [np.sin(a), np.cos(a), 0], [0, 0, 1.0]]
        T[:3, 3] = [radius * np.cos(a), radius * np.sin(a), 0.05 * robot]
        out[(robot, k)] = T
    return out


def noisy(z, rng):
    n = np.concatenate([rng.normal(scale=0.01, size=3),
                        rng.normal(scale=0.1, size=3)])
    return np.asarray(se3.compose(jnp.asarray(z), se3.exp(jnp.asarray(n))))


def main():
    rng = np.random.default_rng(0)
    gt = {}
    for r in range(NB_ROBOTS):
        gt.update(circle(r, NB_POSES, 10.0 + 0.3 * r))

    graph = FactorGraph()
    for r in range(NB_ROBOTS):
        cur = gt[(r, 0)]
        graph.add_variable((r, 0), cur)
        for k in range(NB_POSES - 1):
            z = noisy(np.linalg.inv(gt[(r, k)]) @ gt[(r, k + 1)], rng)
            cur = cur @ z
            graph.add_variable((r, k + 1), cur)
            graph.add_between((r, k), (r, k + 1), z, SIGMAS)
    for r in range(NB_ROBOTS - 1):
        for k in range(0, NB_POSES, 10):
            z = noisy(np.linalg.inv(gt[(r, k)]) @ gt[(r + 1, k)], rng)
            graph.add_between((r, k), (r + 1, k), z, SIGMAS, robust=True)
    outlier_pairs = [((0, 5), (3 % NB_ROBOTS, 70 % NB_POSES)),
                     ((1 % NB_ROBOTS, 20 % NB_POSES),
                      ((NB_ROBOTS - 1), 90 % NB_POSES))]
    for a, b in outlier_pairs:
        bad = np.asarray(se3.exp(jnp.asarray(np.concatenate(
            [rng.uniform(-2, 2, 3), rng.uniform(-20, 20, 3)]))))
        graph.add_between(a, b, bad, SIGMAS, robust=True)
    graph.add_prior((0, 0), gt[(0, 0)], SIGMAS)
    arrays = graph.to_arrays()

    def ate(poses):
        est = {tuple(v.key.as_tuple()): v.pose
               for v in graph.values_from_arrays(poses)}
        return float(np.sqrt(np.mean(
            [np.linalg.norm(est[k][:3, 3] - gt[k][:3, 3]) ** 2 for k in gt])))

    init_ate = ate(arrays.poses)
    if _args.export_g2o:
        from cslam_tpu.evaluation.g2o import write_g2o
        edges = graph.edges_as_records()
        write_g2o(f"{_args.export_g2o}_init.g2o",
                  {k: graph.get_pose(k) for k in graph.keys()}, edges)
        write_g2o(f"{_args.export_g2o}_gt.g2o", gt, [])
    res = gnc_optimize(arrays)              # compile
    _ = float(res.final_cost)               # force full materialization
    # timed region: one cached dispatch, timed to a forced scalar read (the
    # relay-backed TPU here does not reliably serialize block_until_ready);
    # relay RTT (~30 ms) is measured separately and subtracted
    import jax

    @jax.jit
    def rtt_probe(x):
        return x + 1.0

    float(rtt_probe(jnp.float32(0.0)))
    t0 = time.perf_counter()
    float(rtt_probe(jnp.float32(1.0)))
    rtt = time.perf_counter() - t0
    t0 = time.perf_counter()
    res = gnc_optimize(arrays)
    _ = float(res.final_cost)
    dt = max(time.perf_counter() - t0 - rtt, 0.0)

    # warm re-solve: the backend's steady-state incremental round (previous
    # solution as init + previous TLS weights, solver.gnc_reoptimize)
    import dataclasses
    from cslam_tpu.pgo.solver import gnc_reoptimize
    # warm the program TWICE with distinct values: the relay has been seen
    # to recompile on the call after a single warmup (see BENCH.md)
    for i in (1, 2):
        warm_arrays = dataclasses.replace(
            arrays, poses=res.poses.at[:, :3, 3].multiply(1.0 + 1e-7 * i))
        _ = float(gnc_reoptimize(warm_arrays, res.weights).final_cost)
    t0 = time.perf_counter()
    # fresh values (tiny translation scale) so the relay cache can't serve it
    jiggled = res.poses.at[:, :3, 3].multiply(1.0 + 1e-6)
    res_w = gnc_reoptimize(
        dataclasses.replace(arrays, poses=jiggled), res.weights)
    _ = float(res_w.final_cost)
    dt_warm = max(time.perf_counter() - t0 - rtt, 0.0)

    if _args.export_g2o:
        write_g2o(f"{_args.export_g2o}_optimized.g2o",
                  {tuple(v.key.as_tuple()): v.pose
                   for v in graph.values_from_arrays(res.poses)}, [])
    w = np.asarray(res.weights)
    rb = (np.asarray(arrays.robust) > 0) & (np.asarray(arrays.edge_valid) > 0)
    ridx = np.nonzero(rb)[0]
    ww = np.asarray(res_w.weights)
    print(json.dumps({
        "metric": (f"pgo_{NB_ROBOTS}robot_"
                   f"{NB_ROBOTS * NB_POSES}pose_gnc_wallclock"),
        "value": round(dt, 3), "unit": "seconds",
        "ate_init_m": round(init_ate, 3),
        "ate_final_m": round(ate(res.poses), 3),
        "outer_iterations": int(res.outer_iterations),
        "outliers_rejected": int((w[ridx[-2:]] < 0.5).sum()),
        "loops_false_rejected": int((w[ridx[:-2]] < 0.5).sum()),
        "warm_resolve_seconds": round(dt_warm, 3),
        "warm_ate_m": round(ate(res_w.poses), 3),
        "warm_outliers_rejected": int((ww[ridx[-2:]] < 0.5).sum()),
    }))


if __name__ == "__main__":
    import jax
    # the synthetic graph is built with device se3 ops: keep its inputs at
    # full precision too (solvers already force it internally)
    with jax.default_matmul_precision("highest"):
        main()
