#!/usr/bin/env python3
"""Bank-size scaling of the fused Pallas NN-search kernel (single chip).

Sweeps the descriptor bank from the headline 131k rows up to 1M rows
(1M x 64 x 4 B = 256 MB of HBM — far beyond the reference's design point;
``cslam/nns_matching.py:42`` notes 30 ms for ONE query at 100k on CPU).
The kernel is one HBM pass over the bank per query batch, so throughput
should fall roughly linearly with bank size (HBM-bandwidth bound).

Same relay-safe protocol as bench.py: one jitted lax.scan over pre-staged
batches to a scalar, programs warmed twice, RTT subtracted.

    python benchmarks/nns_scale_bench.py
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from cslam_tpu.ops import topk as topk_ops  # noqa: E402
from cslam_tpu.ops.nns_pallas import cosine_topk_fused2_pre  # noqa: E402

DIM = 64
BATCH = 256
K = 10
BANKS = (1 << 17, 1 << 19, 1 << 20)   # 131k, 524k, 1.05M rows
SCANS = {1 << 17: 256, 1 << 19: 64, 1 << 20: 32}


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main():
    rng = np.random.default_rng(0)
    on_tpu = jax.devices()[0].platform != "cpu"
    if on_tpu:
        # unit bank rows -> prenormalized kernel entry (no per-dispatch
        # bank rewrite; see BENCH.md round-3 notes)
        def search(bank, inv_norms, n, queries, k):
            return cosine_topk_fused2_pre(bank, n, queries, k)
    else:
        search = topk_ops.cosine_topk

    @jax.jit
    def rtt_probe(x):
        return x + 1.0

    float(rtt_probe(jnp.float32(0.0)))
    rtt = min(_timed(lambda: float(rtt_probe(jnp.float32(i + 1.0))))
              for i in range(3))

    results = {}
    for capacity in BANKS:
        bank_host = rng.standard_normal((capacity, DIM)).astype(np.float32)
        bank_host /= np.linalg.norm(bank_host, axis=1, keepdims=True)
        bank = jnp.asarray(bank_host)
        inv_norms = jnp.ones((capacity,), jnp.float32)
        n = jnp.int32(int(capacity * 0.9))
        scans = SCANS[capacity]
        queries = jnp.asarray(rng.standard_normal(
            (scans, BATCH, DIM)).astype(np.float32))

        @jax.jit
        def scan_bench(bank, inv_norms, n, queries):
            def body(carry, q):
                sims, idx = search(bank, inv_norms, n, q, K)
                return (carry + sims[0, 0]
                        + idx[0, 0].astype(jnp.float32)), None
            total, _ = jax.lax.scan(body, jnp.float32(0.0), queries)
            return total

        # warm TWICE with distinct values (relay recompile quirk, BENCH.md)
        for i in (1, 2):
            float(scan_bench(bank, inv_norms, n, queries * (1.0 + 1e-4 * i)))
        best = min(_timed(lambda r=r: float(scan_bench(
            bank, inv_norms, n, queries * (1.0 + 1e-3 * (r + 1)))))
            for r in range(3))
        net = max(best - rtt, 1e-9)
        results[capacity] = BATCH * scans / net

    print(json.dumps({
        "metric": "descriptor_nns_qps_bank_scaling",
        "unit": "queries/sec",
        "value": round(results[1 << 20], 1),
        "qps_131k": round(results[1 << 17], 1),
        "qps_524k": round(results[1 << 19], 1),
        "qps_1m": round(results[1 << 20], 1),
    }))


if __name__ == "__main__":
    main()
