#!/usr/bin/env python3
"""Probe the two dominant on-chip spans of the lidar e2e pipeline.

The instrumented 5x50 on-chip e2e run (benchmarks/results/) showed
lcd.select_candidates at 3.0 s mean (39% of steady wall) and pgo.optimize
at 19.3 s mean (21%) — yet pgo_bench solves a SAME-TIER 500-pose graph
cold in 0.42 s. This probe times the exact solver/selection calls the e2e
makes, on an e2e-shaped graph (drifting odometry chains + registration
loops), to localize the gap:

  - gnc_optimize / gnc_reoptimize with the backend's parameters
  - lm_optimize alone (per-LM-iteration dense-Cholesky cost)
  - the same solve with the PCG path forced (is dense wrong on TPU?)
  - MAC fw_subset on the dense tier (full eigh per FW iteration) and
    with the chain+low-rank (Woodbury+LOBPCG) tier forced

    python benchmarks/e2e_hotspot_probe.py            # real TPU
    python benchmarks/e2e_hotspot_probe.py --cpu      # smoke
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")

_ap = argparse.ArgumentParser()
_ap.add_argument("--cpu", action="store_true")
_ap.add_argument("--robots", type=int, default=5)
_ap.add_argument("--poses", type=int, default=50)
_args = _ap.parse_args()

if _args.cpu:
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from cslam_tpu.ops import se3  # noqa: E402
from cslam_tpu.pgo import FactorGraph, gnc_optimize  # noqa: E402
from cslam_tpu.pgo import solver  # noqa: E402
from cslam_tpu.pgo.solver import gnc_reoptimize  # noqa: E402

SIGMAS = np.array([0.01] * 3 + [0.1] * 3)  # backend default_sigmas


def rtt():
    @jax.jit
    def probe(x):
        return x + 1.0
    float(probe(jnp.float32(0.0)))
    t0 = time.perf_counter()
    float(probe(jnp.float32(np.random.rand())))
    return time.perf_counter() - t0


def timed(fn, n=1):
    """(first_s, best_of_rest_s) — first call may include compile."""
    t0 = time.perf_counter()
    fn()
    first = time.perf_counter() - t0
    rest = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        rest.append(time.perf_counter() - t0)
    return first, (min(rest) if rest else first)


def e2e_like_graph(robots, steps, rng):
    """Drifting odometry chains + inter-robot loops, like the lidar e2e
    bench's aggregate graph at the same scale."""
    gt = {}
    for r in range(robots):
        for k in range(steps):
            a = 2 * np.pi * ((k + 5 * r) % 40) / 40
            T = np.eye(4)
            T[:3, :3] = [[np.cos(a), -np.sin(a), 0],
                         [np.sin(a), np.cos(a), 0], [0, 0, 1.0]]
            T[:3, 3] = [7.0 * (((k + 5 * r) % 40) % 8),
                        7.0 * (((k + 5 * r) % 40) // 8), 0.02 * r]
            gt[(r, k)] = T
    g = FactorGraph()
    for r in range(robots):
        cur = gt[(r, 0)]
        g.add_variable((r, 0), cur)
        for k in range(steps - 1):
            z = np.linalg.inv(gt[(r, k)]) @ gt[(r, k + 1)]
            z[:3, 3] += rng.normal(scale=0.05, size=3)
            cur = cur @ z
            g.add_variable((r, k + 1), cur)
            g.add_between((r, k), (r, k + 1), z, SIGMAS)
    n_loops = 0
    for r in range(robots - 1):
        for k in range(0, steps, 5):
            z = np.linalg.inv(gt[(r, k)]) @ gt[(r + 1, k)]
            z[:3, 3] += rng.normal(scale=0.02, size=3)
            g.add_between((r, k), (r + 1, k), z, SIGMAS, robust=True)
            n_loops += 1
    g.add_prior((0, 0), gt[(0, 0)], SIGMAS)
    return g, n_loops


def main():
    out = {}
    rng = np.random.default_rng(0)
    base_rtt = rtt()
    out["relay_rtt_ms"] = round(base_rtt * 1e3, 1)

    g, n_loops = e2e_like_graph(_args.robots, _args.poses, rng)
    arrays = g.to_arrays()
    print(f"# graph: {len(g.keys())} poses (tier {arrays.num_nodes}), "
          f"{n_loops} loops (edge tier {arrays.num_edges})", flush=True)

    # --- gnc_optimize with the backend's parameters -----------------------
    def run_full():
        res = gnc_optimize(arrays, max_outer=100, lm_iters=50, cg_iters=150)
        out["gnc_outer_iterations"] = int(res.outer_iterations)
        out["_res"] = res
        _ = float(res.final_cost)

    first, steady = timed(run_full, n=2)
    out["gnc_optimize_first_s"] = round(first, 2)
    out["gnc_optimize_steady_s"] = round(max(steady - base_rtt, 0.0), 2)
    res = out.pop("_res")
    print(f"# gnc_optimize: first {first:.2f} s, steady "
          f"{steady:.2f} s, outer={out['gnc_outer_iterations']}", flush=True)

    # --- gnc_reoptimize (the steady-state backend round) ------------------
    import dataclasses

    def run_warm(i=[0]):
        i[0] += 1
        warm = dataclasses.replace(
            arrays, poses=res.poses.at[:, :3, 3].multiply(1 + 1e-7 * i[0]))
        _ = float(gnc_reoptimize(warm, res.weights, lm_iters=50,
                                 cg_iters=150).final_cost)

    first, steady = timed(run_warm, n=2)
    out["gnc_reoptimize_first_s"] = round(first, 2)
    out["gnc_reoptimize_steady_s"] = round(max(steady - base_rtt, 0.0), 2)
    print(f"# gnc_reoptimize: first {first:.2f} s, steady {steady:.2f} s",
          flush=True)

    # --- one plain LM solve: per-iteration dense-solve cost ---------------
    @jax.jit
    def lm_full(a, w):
        r = solver.lm_optimize(a, w, max_iters=50, cg_iters=150)
        return r.poses, r.iterations

    ones = jnp.ones(arrays.num_edges, arrays.poses.dtype)

    def run_lm(i=[0]):
        i[0] += 1
        a = dataclasses.replace(
            arrays, poses=arrays.poses.at[:, :3, 3].multiply(1 + 1e-7 * i[0]))
        poses, iters = lm_full(a, ones)
        out["lm_iters_used"] = int(iters)
        jax.block_until_ready(poses)

    first, steady = timed(run_lm, n=2)
    out["lm50_first_s"] = round(first, 2)
    out["lm50_steady_s"] = round(max(steady - base_rtt, 0.0), 2)
    out["lm_per_iter_ms"] = round(
        max(steady - base_rtt, 1e-9) / max(out["lm_iters_used"], 1) * 1e3, 1)
    print(f"# lm(50): first {first:.2f} s, steady {steady:.2f} s, "
          f"iters={out['lm_iters_used']}", flush=True)

    # --- same LM with the PCG path forced (dense-vs-PCG on TPU) -----------
    saved = solver._DENSE_SOLVE_MAX_NODES
    solver._DENSE_SOLVE_MAX_NODES = 0

    @jax.jit
    def lm_pcg(a, w):
        r = solver.lm_optimize(a, w, max_iters=50, cg_iters=150)
        return r.poses, r.iterations

    def run_pcg(i=[0]):
        i[0] += 1
        a = dataclasses.replace(
            arrays, poses=arrays.poses.at[:, :3, 3].multiply(1 + 1e-7 * i[0]))
        poses, iters = lm_pcg(a, ones)
        out["lm_pcg_iters_used"] = int(iters)
        jax.block_until_ready(poses)

    first, steady = timed(run_pcg, n=2)
    solver._DENSE_SOLVE_MAX_NODES = saved
    out["lm50_pcg_first_s"] = round(first, 2)
    out["lm50_pcg_steady_s"] = round(max(steady - base_rtt, 0.0), 2)
    print(f"# lm(50) PCG-forced: first {first:.2f} s, steady {steady:.2f} s, "
          f"iters={out['lm_pcg_iters_used']}", flush=True)

    # --- MAC selection at e2e scale ----------------------------------------
    from cslam_tpu.selection import mac as mac_mod
    from cslam_tpu.types import Edge

    num_poses = _args.robots * _args.poses
    fixed = [Edge(i, i + 1, 1.0) for i in range(num_poses - 1)]
    fixed += [Edge(5 * i, 5 * i + _args.poses, 1.0) for i in range(10)]
    cands = [Edge(rng.integers(0, num_poses // 2),
                  rng.integers(num_poses // 2, num_poses), float(w))
             for w in rng.uniform(0.5, 1.0, 40)]

    def run_mac_dense(i=[0]):
        i[0] += 1
        c = [Edge(e.i, e.j, e.weight * (1 + 1e-6 * i[0])) for e in cands]
        m = mac_mod.MAC(fixed, c, num_poses)
        sel, _, _ = m.fw_subset(np.zeros(len(c)), 15, max_iters=20)
        out["mac_dense_tier"] = "dense" if m._dense else "woodbury"
        out["mac_selected"] = int(sel.sum())

    first, steady = timed(run_mac_dense, n=2)
    out["mac_fw20_first_s"] = round(first, 2)
    out["mac_fw20_steady_s"] = round(max(steady - base_rtt, 0.0), 2)
    print(f"# MAC fw_subset(20) tier={out['mac_dense_tier']}: first "
          f"{first:.2f} s, steady {steady:.2f} s", flush=True)

    # forced chain+low-rank tier at the same size
    saved_dense = mac_mod._DENSE_MAX_NODES
    mac_mod._DENSE_MAX_NODES = 0

    def run_mac_wb(i=[0]):
        i[0] += 1
        c = [Edge(e.i, e.j, e.weight * (1 + 1e-6 * i[0])) for e in cands]
        m = mac_mod.MAC(fixed, c, num_poses)
        sel, _, _ = m.fw_subset(np.zeros(len(c)), 15, max_iters=20)
        out["mac_wb_selected"] = int(sel.sum())

    first, steady = timed(run_mac_wb, n=2)
    mac_mod._DENSE_MAX_NODES = saved_dense
    out["mac_wb_fw20_first_s"] = round(first, 2)
    out["mac_wb_fw20_steady_s"] = round(max(steady - base_rtt, 0.0), 2)
    print(f"# MAC fw_subset(20) woodbury-forced: first {first:.2f} s, "
          f"steady {steady:.2f} s", flush=True)

    print(json.dumps({k: v for k, v in out.items()
                      if not k.startswith("_")}))


if __name__ == "__main__":
    with jax.default_matmul_precision("highest"):
        main()
