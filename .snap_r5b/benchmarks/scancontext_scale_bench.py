#!/usr/bin/env python3
"""Lidar scan-context search at scale on the real chip.

Times the fused two-stage search (ring-key euclidean shortlist -> gathered
full rotation-shift distance, one dispatch per query batch — replaces the
reference's KDTree + double python shift loop,
``scancontext_matching.py:59-87`` / ``scancontext_utils.py:78-114``)
against a bank of >= 10k scans, with the scan-protocol timing from
``bench.py`` (one jitted lax.scan over pre-staged query chunks reduced to
a scalar; relay RTT subtracted).

    python benchmarks/scancontext_scale_bench.py [--bank 16384]
    python benchmarks/scancontext_scale_bench.py --bank 65536 --fused-rk
        # stage 1 = streaming Pallas kernel over augmented ring keys
        # (needs bank % TILE_N == 0) instead of full-width lax.top_k
"""
import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from cslam_tpu.matching.scancontext_bank import (  # noqa: E402
    _augment_ring_keys, _two_stage_best, _two_stage_best_fused)
from cslam_tpu.ops import scancontext as sc_ops  # noqa: E402

RING, SECTOR = 20, 60
NUM_CANDIDATES = 10  # reference scancontext_matching.py:61
CHUNK = 16           # queries per fused dispatch (one gossip chunk)
SCAN_BATCHES = 32


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bank", type=int, default=16384)
    ap.add_argument("--fused-rk", action="store_true",
                    help="stage 1 via the streaming NNS kernel")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    # synthetic scan contexts: sparse nonnegative max-height bins
    sc_bank = (rng.random((args.bank, RING, SECTOR)) *
               (rng.random((args.bank, RING, SECTOR)) > 0.7)
               ).astype(np.float32) * 8.0
    sc_bank_j = jnp.asarray(sc_bank)
    rk_bank = jax.vmap(sc_ops.ring_key)(sc_bank_j)
    rk_sq = jnp.sum(rk_bank * rk_bank, axis=1)
    n = jnp.int32(args.bank)

    # IMPORTANT: the bank arrays must travel as jit ARGUMENTS, not closure
    # captures — closed-over jnp arrays are baked into the HLO program as
    # constants, and at the 65536-scan tier the ~300 MB program body is
    # rejected by the remote compile service (HTTP 413, round-3 log).
    if args.fused_rk:
        stage1_bank = _augment_ring_keys(rk_bank)

        def search(stage1, sc, q):
            return _two_stage_best_fused(stage1, sc, n, q, NUM_CANDIDATES)
    else:
        stage1_bank = rk_bank

        def search(stage1, sc, q):
            return _two_stage_best(stage1, rk_sq, sc, n, q, NUM_CANDIDATES)

    # correctness: self-retrieval of bank rows (possibly shifted)
    probe = sc_bank_j[:4]
    idx, dist = search(stage1_bank, sc_bank_j, probe)
    assert (np.asarray(idx) == np.arange(4)).all(), "self-retrieval failed"
    assert np.all(np.asarray(dist) < 1e-5)

    queries = jnp.asarray(
        (rng.random((SCAN_BATCHES, CHUNK, RING, SECTOR)) *
         (rng.random((SCAN_BATCHES, CHUNK, RING, SECTOR)) > 0.7)
         ).astype(np.float32) * 8.0)

    @jax.jit
    def scan_bench(stage1, sc, queries):
        def body(carry, q):
            idx, dist = search(stage1, sc, q)
            return carry + jnp.sum(dist) + jnp.sum(idx).astype(jnp.float32), None
        total, _ = jax.lax.scan(body, jnp.float32(0.0), queries)
        return total

    @jax.jit
    def rtt_probe(x):
        return x + 1.0

    float(scan_bench(stage1_bank, sc_bank_j, queries))  # compile
    # second warm (relay recompile quirk)
    float(scan_bench(stage1_bank, sc_bank_j, queries * 1.001))
    float(rtt_probe(jnp.float32(0.0)))
    rtt = min(_timed(lambda i=i: float(rtt_probe(jnp.float32(i + 1.0))))
              for i in range(3))
    best = min(_timed(lambda r=r: float(scan_bench(
        stage1_bank, sc_bank_j,
        queries * (1.0 + 1e-3 * (r + 1))))) for r in range(3))
    net = max(best - rtt, 1e-9)
    qps = CHUNK * SCAN_BATCHES / net

    # reference speed: KDTree shortlist + python 60x60 shift loop per
    # candidate, ~50 ms/query at 10 candidates (scancontext_utils.py:78-114)
    print(json.dumps({
        "metric": f"scancontext_queries_per_sec_{args.bank // 1000}k_bank",
        "value": round(qps, 1),
        "unit": "queries/sec",
        "bank_rows": args.bank,
        "stage1": "fused_kernel" if args.fused_rk else "xla_topk",
        "platform": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()
