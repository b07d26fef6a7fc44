#!/usr/bin/env python3
"""Replay aggregate pose graphs dumped from a live pipeline run.

Run any pipeline (e.g. benchmarks/lidar_e2e_scale_bench.py) with
``CSLAM_TPU_DUMP_PGO=<dir>`` to capture every graph the backend solved,
then replay them here in isolation: per-call wall-clock, LM iteration
counts and GNC outer rounds, on CPU or the real chip. This is how the
19-40 s pgo.optimize spans observed in the lidar e2e were diagnosed.

    CSLAM_TPU_DUMP_PGO=/tmp/pgo python benchmarks/lidar_e2e_scale_bench.py --cpu ...
    python benchmarks/pgo_replay_probe.py --dir /tmp/pgo --cpu
"""
import argparse
import dataclasses
import glob
import json
import os
import sys
import time

sys.path.insert(0, ".")

_ap = argparse.ArgumentParser()
_ap.add_argument("--dir", required=True)
_ap.add_argument("--cpu", action="store_true")
_ap.add_argument("--lm-iters", type=int, default=50)
_ap.add_argument("--cg-iters", type=int, default=150)
_args = _ap.parse_args()

if _args.cpu:
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from cslam_tpu.pgo.factor_graph import PoseGraphArrays  # noqa: E402
from cslam_tpu.pgo import solver  # noqa: E402


def load(path) -> PoseGraphArrays:
    z = np.load(path)
    return PoseGraphArrays(**{f.name: jnp.asarray(z[f.name])
                              for f in dataclasses.fields(PoseGraphArrays)})


@jax.jit
def _lm_probe(a, w, lm_iters, cg_iters):
    r = solver.lm_optimize(a, w, max_iters=lm_iters, cg_iters=cg_iters,
                           rel_tol=1e-5)
    return r.poses, r.iterations, r.final_cost


def main():
    paths = sorted(glob.glob(os.path.join(_args.dir, "*.npz")))
    if not paths:
        print(f"no dumps in {_args.dir}")
        return
    rows = []
    with jax.default_matmul_precision("highest"):
        for path in paths:
            a = load(path)
            valid_e = int(np.asarray(a.edge_valid).sum())
            valid_n = int(np.asarray(a.node_valid).sum())
            chi2 = np.asarray(solver._edge_chi2(a.poses, a))
            rb = (np.asarray(a.robust) * np.asarray(a.edge_valid)) > 0
            row = {"file": os.path.basename(path),
                   "nodes": valid_n, "edges": valid_e,
                   "tier": [a.num_nodes, a.num_edges],
                   "robust_edges": int(rb.sum()),
                   "chi2_med": round(float(np.median(chi2[rb])), 1)
                   if rb.any() else 0,
                   "chi2_max": round(float(chi2[rb].max()), 1)
                   if rb.any() else 0}

            ones = jnp.ones(a.num_edges, a.poses.dtype)
            # warm twice with distinct values (relay recompile quirk)
            for i in (1, 2):
                aj = dataclasses.replace(
                    a, poses=a.poses.at[:, :3, 3].multiply(1 + 1e-7 * i))
                jax.block_until_ready(_lm_probe(aj, ones, _args.lm_iters,
                                                _args.cg_iters)[0])
            t0 = time.perf_counter()
            _, it, _ = _lm_probe(
                dataclasses.replace(
                    a, poses=a.poses.at[:, :3, 3].multiply(1 + 1e-6)),
                ones, _args.lm_iters, _args.cg_iters)
            row["lm_s"] = round(time.perf_counter() - t0, 2)
            row["lm_iters"] = int(it)

            def run_gnc(i):
                aj = dataclasses.replace(
                    a, poses=a.poses.at[:, :3, 3].multiply(1 + 1e-7 * i))
                return solver.gnc_optimize(
                    aj, max_outer=100, lm_iters=_args.lm_iters,
                    cg_iters=_args.cg_iters)

            for i in (1, 2):
                jax.block_until_ready(run_gnc(i).poses)
            t0 = time.perf_counter()
            res = run_gnc(3)
            _ = float(res.final_cost)
            row["gnc_s"] = round(time.perf_counter() - t0, 2)
            row["gnc_outer"] = int(res.outer_iterations)
            w = np.asarray(res.weights)
            row["rejected"] = int(((w < 0.5) & rb).sum())

            def run_warm(i):
                aj = dataclasses.replace(
                    a, poses=res.poses.at[:, :3, 3].multiply(1 + 1e-7 * i))
                return solver.gnc_reoptimize(
                    aj, res.weights, lm_iters=_args.lm_iters,
                    cg_iters=_args.cg_iters)

            for i in (1, 2):
                jax.block_until_ready(run_warm(i).poses)
            t0 = time.perf_counter()
            _ = float(run_warm(3).final_cost)
            row["reopt_s"] = round(time.perf_counter() - t0, 2)

            rows.append(row)
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
