#!/usr/bin/env python3
"""Randomized GNC robustness sweep: the guard-rail for solver/knob changes.

The round-2 lesson (CLAUDE.md): GNC changes that look identical on small
graphs can regress badly at scale — every solver or knob change must be
validated on randomized scenarios INCLUDING large (2048-pose) graphs before
it ships. This sweep generates multi-robot circle worlds across size tiers
with randomized loop-closure placement and gross outliers (inter- AND
intra-robot), runs ``gnc_optimize``, and scores:

- false rejections (genuine loop closures with final TLS weight < 0.5)
- missed outliers (gross outliers with final weight >= 0.5)
- final ATE vs ground truth (must beat the dead-reckoned init)

Runs on CPU by default (deterministic, no relay); pass ``--tpu`` to sweep
on the real chip. One JSON line per scenario plus a summary line.

    python benchmarks/gnc_scenario_sweep.py                 # full sweep
    python benchmarks/gnc_scenario_sweep.py --quick         # small tiers
"""
import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def build_scenario(rng, nb_robots, nb_poses, loop_every, n_outliers,
                   intra_loops):
    """N robots on concentric circles; inter-robot loops at randomized
    keyframe offsets; optional intra-robot loop closures; gross outliers
    between random far-apart pose pairs."""
    import jax.numpy as jnp

    from cslam_tpu.ops import se3
    from cslam_tpu.pgo import FactorGraph

    sigmas = np.array([0.01] * 3 + [0.1] * 3)

    gt = {}
    for r in range(nb_robots):
        radius = 10.0 + 0.4 * r
        for k in range(nb_poses):
            a = 2 * np.pi * k / nb_poses
            T = np.eye(4)
            T[:3, :3] = [[np.cos(a), -np.sin(a), 0],
                         [np.sin(a), np.cos(a), 0], [0, 0, 1.0]]
            T[:3, 3] = [radius * np.cos(a), radius * np.sin(a), 0.05 * r]
            gt[(r, k)] = T

    def noisy(z):
        n = np.concatenate([rng.normal(scale=0.01, size=3),
                            rng.normal(scale=0.1, size=3)])
        return np.asarray(se3.compose(jnp.asarray(z), se3.exp(jnp.asarray(n))))

    graph = FactorGraph()
    for r in range(nb_robots):
        cur = gt[(r, 0)]
        graph.add_variable((r, 0), cur)
        for k in range(nb_poses - 1):
            z = noisy(np.linalg.inv(gt[(r, k)]) @ gt[(r, k + 1)])
            cur = cur @ z
            graph.add_variable((r, k + 1), cur)
            graph.add_between((r, k), (r, k + 1), z, sigmas)

    genuine = []
    for r in range(nb_robots - 1):
        for k in range(0, nb_poses, loop_every):
            k2 = int(np.clip(k + rng.integers(-loop_every // 2,
                                              loop_every // 2 + 1),
                             0, nb_poses - 1))
            z = noisy(np.linalg.inv(gt[(r, k)]) @ gt[(r + 1, k2)])
            graph.add_between((r, k), (r + 1, k2), z, sigmas, robust=True)
            genuine.append(((r, k), (r + 1, k2)))
    for _ in range(intra_loops):
        r = int(rng.integers(nb_robots))
        k = int(rng.integers(nb_poses // 2))
        k2 = int(rng.integers(nb_poses // 2, nb_poses))
        z = noisy(np.linalg.inv(gt[(r, k)]) @ gt[(r, k2)])
        graph.add_between((r, k), (r, k2), z, sigmas, robust=True)
        genuine.append(((r, k), (r, k2)))

    outliers = []
    for _ in range(n_outliers):
        ra, rb_ = rng.choice(nb_robots, 2, replace=n_outliers > nb_robots)
        ka, kb = int(rng.integers(nb_poses)), int(rng.integers(nb_poses))
        bad = np.asarray(se3.exp(jnp.asarray(np.concatenate(
            [rng.uniform(-2, 2, 3), rng.uniform(-20, 20, 3)]))))
        graph.add_between((int(ra), ka), (int(rb_), kb), bad, sigmas,
                          robust=True)
        outliers.append(((int(ra), ka), (int(rb_), kb)))

    graph.add_prior((0, 0), gt[(0, 0)], sigmas)
    return graph, gt, len(genuine), len(outliers)


def run_scenario(graph, gt, n_genuine, n_outliers):
    import jax.numpy as jnp  # noqa: F401

    from cslam_tpu.pgo import gnc_optimize

    arrays = graph.to_arrays()

    def ate(poses):
        est = {tuple(v.key.as_tuple()): v.pose
               for v in graph.values_from_arrays(poses)}
        return float(np.sqrt(np.mean(
            [np.linalg.norm(est[k][:3, 3] - gt[k][:3, 3]) ** 2 for k in gt])))

    t0 = time.perf_counter()
    res = gnc_optimize(arrays)
    final_cost = float(res.final_cost)  # forces materialization
    dt = time.perf_counter() - t0

    w = np.asarray(res.weights)
    rb = (np.asarray(arrays.robust) > 0) & (np.asarray(arrays.edge_valid) > 0)
    ridx = np.nonzero(rb)[0]
    # robust edges were added genuine-first, outliers last (build order)
    genuine_w = w[ridx[:n_genuine]]
    outlier_w = w[ridx[n_genuine:]]
    return {
        "ate_init_m": round(ate(arrays.poses), 3),
        "ate_final_m": round(ate(res.poses), 3),
        "false_rejected": int((genuine_w < 0.5).sum()),
        "genuine_total": n_genuine,
        "outliers_rejected": int((outlier_w < 0.5).sum()),
        "outliers_total": n_outliers,
        "outer_iterations": int(res.outer_iterations),
        "final_cost": round(final_cost, 2),
        "wallclock_s": round(dt, 3),
    }


TIERS = [
    # (nb_robots, nb_poses, loop_every, outlier_counts, intra, seeds)
    (3, 80, 10, (0, 1, 2), 1, (0, 1)),
    (5, 100, 10, (0, 2), 2, (2, 3)),
    (5, 150, 12, (2, 4), 2, (4, 5)),
    (8, 256, 10, (0, 2, 4), 3, (6, 7)),
]
QUICK_TIERS = TIERS[:2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--tpu", action="store_true",
                    help="run on the real chip (default: CPU)")
    args = ap.parse_args()

    import os
    if not args.tpu:
        os.environ.pop("PALLAS_AXON_POOL_IPS", None)
        import jax
        jax.config.update("jax_platforms", "cpu")
    else:
        import jax

    totals = {"scenarios": 0, "false_rejected": 0, "missed_outliers": 0,
              "ate_regressions": 0}
    with jax.default_matmul_precision("highest"):
        for (nr, npo, le, ocounts, intra, seeds) in (
                QUICK_TIERS if args.quick else TIERS):
            for n_out in ocounts:
                for seed in seeds:
                    rng = np.random.default_rng(1000 * seed + n_out)
                    graph, gt, ng, no = build_scenario(
                        rng, nr, npo, le, n_out, intra)
                    row = run_scenario(graph, gt, ng, no)
                    row.update({"robots": nr, "poses_per_robot": npo,
                                "seed": seed})
                    print(json.dumps(row), flush=True)
                    totals["scenarios"] += 1
                    totals["false_rejected"] += row["false_rejected"]
                    totals["missed_outliers"] += (row["outliers_total"]
                                                  - row["outliers_rejected"])
                    totals["ate_regressions"] += int(
                        row["ate_final_m"] > max(row["ate_init_m"], 0.5))
    print(json.dumps({"summary": totals}), flush=True)


if __name__ == "__main__":
    main()
