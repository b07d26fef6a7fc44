#!/usr/bin/env python3
"""Mesh-sharded descriptor bank search timed on the real chip.

``cslam_tpu.matching.mesh_banks`` shards one robot's bank per device and
answers a query against every bank in one dispatch (local fused top-k +
ICI all_gather of the tiny [B, k] results). Only one real chip is
available here, so this measures the sharded program on a 1-device mesh
at a realistic bank size and compares it against the direct fused-kernel
search — i.e. the per-dispatch overhead the shard_map + all_gather
wrapper adds. The cross-device claim (bank payloads never cross the
interconnect; per-device work is constant as robots are added) follows
from the program structure and is validated functionally on the 8-device
CPU mesh in tests/test_mesh_banks.py.

    python benchmarks/mesh_bank_bench.py [--rows 131072]
"""
import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

from cslam_tpu.matching.mesh_banks import AXIS, make_mesh_search  # noqa: E402
from cslam_tpu.ops import topk as topk_ops  # noqa: E402
from cslam_tpu.ops.nns_pallas import cosine_topk_fused2  # noqa: E402

DIM = 64
K = 8
BATCH = 256
SCAN_BATCHES = 16


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=131072)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    on_tpu = jax.devices()[0].platform != "cpu"
    bank_host = rng.standard_normal((args.rows, DIM)).astype(np.float32)
    bank_host /= np.linalg.norm(bank_host, axis=1, keepdims=True)

    mesh = Mesh(np.array(jax.devices()[:1]), (AXIS,))
    banks = jnp.asarray(bank_host)[None]          # [1 robot, rows, D]
    inv_norms = jnp.ones((1, args.rows), jnp.float32)  # direct XLA path only
    counts = jnp.asarray([args.rows], jnp.int32)
    mesh_search = make_mesh_search(mesh, K, capacity=args.rows)

    queries = jnp.asarray(rng.standard_normal(
        (SCAN_BATCHES, BATCH, DIM)).astype(np.float32))

    direct = cosine_topk_fused2 if on_tpu else topk_ops.cosine_topk

    # correctness: sharded result == direct result
    sims_m, idx_m = mesh_search(banks, counts, queries[0])
    sims_d, idx_d = direct(banks[0], inv_norms[0], counts[0], queries[0], K)
    assert (np.asarray(idx_m)[0] == np.asarray(idx_d)).all(), "path check"

    def make_scan(search_fn):
        @jax.jit
        def scan_bench(banks, inv_norms, counts, queries):
            def body(carry, q):
                sims, idx = search_fn(banks, inv_norms, counts, q)
                return carry + jnp.sum(sims[..., 0]) , None
            total, _ = jax.lax.scan(body, jnp.float32(0.0), queries)
            return total
        return scan_bench

    scan_mesh = make_scan(lambda b, inv, c, q: mesh_search(b, c, q))
    scan_direct = make_scan(
        lambda b, inv, c, q: direct(b[0], inv[0], c[0], q, K))

    @jax.jit
    def rtt_probe(x):
        return x + 1.0

    results = {}
    for name, fn in (("mesh_sharded", scan_mesh), ("direct", scan_direct)):
        float(fn(banks, inv_norms, counts, queries))
        float(fn(banks, inv_norms, counts, queries * 1.001))
        float(rtt_probe(jnp.float32(0.0)))
        rtt = min(_timed(lambda i=i: float(rtt_probe(jnp.float32(i + 1.0))))
                  for i in range(3))
        best = min(_timed(lambda r=r: float(fn(
            banks, inv_norms, counts, queries * (1.0 + 1e-3 * (r + 1)))))
            for r in range(3))
        net = max(best - rtt, 1e-9)
        results[name] = BATCH * SCAN_BATCHES / net

    print(json.dumps({
        "metric": f"mesh_bank_queries_per_sec_{args.rows // 1000}k_rows",
        "value": round(results["mesh_sharded"], 1),
        "unit": "queries/sec",
        "direct_qps": round(results["direct"], 1),
        "shard_wrapper_overhead_pct": round(
            100.0 * (results["direct"] / results["mesh_sharded"] - 1.0), 1),
        "platform": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()
