#!/usr/bin/env python3
"""Headline benchmark: descriptor-NN queries/sec against a 100k-keyframe bank.

This is the reference's ranked-#1 hot loop (``cslam/nns_matching.py:42`` —
"searching from 100000 items consume 30ms" on CPU, i.e. ~33 q/s) rebuilt as
the streaming Pallas bank-scan kernel (``cslam_tpu.ops.nns_pallas``
``cosine_topk_fused2``): one MXU similarity matmul per tile, per-column
compare-select top-2 chains on the VPU (no cross-lane argmax iterations),
candidates held in VMEM scratch and merged to the exact top-k at the last
grid step. Roofline: 459 GB/s effective at batch 256 = 56% of a v5e's
~819 GB/s HBM peak (a matmul+single-max probe measures 81%; see
benchmarks/nns_kernel_probe.py and BENCH.md for the full statement).

Measurement protocol (the TPU here sits behind a relay with ~30 ms
round-trip latency, and dispatch loops do not reliably serialize through
it): the timed region is ONE jitted dispatch that ``lax.scan``s over many
pre-staged query batches and reduces the results to a scalar, which is then
read back; the relay RTT (measured with a trivial jitted probe) is
subtracted. Timings are checked to scale linearly in the number of scanned
batches.

Prints exactly one JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
vs_baseline is the speedup over the reference's measured 33.3 q/s.
"""
import json
import os
import time

# Persistent XLA compile cache: the axon remote compile service does not
# cache across processes (a re-run of this bench a day later re-paid the
# full ~8 min compile), so ask jax to keep compiled programs on disk.
# Harmless no-op if the axon plugin can't serialize executables.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

from cslam_tpu.ops import topk as topk_ops
from cslam_tpu.ops.nns_pallas import cosine_topk_fused2_pre

BANK_CAPACITY = 131072      # 2^17 rows (covers the 100k-keyframe scenario)
VALID_ROWS = 100000
DIM = 64                    # CosPlace default descriptor size
BATCH = 512                 # on-chip sweep: B=512 measured 3.8M q/s vs
                            # 2.5M at B=256 (amortizes the per-tile chain
                            # work over more queries; BENCH.md round 3)
SCAN_BATCHES = 128          # query batches folded into one dispatch
K = 10                      # frontend.nb_best_matches default
REFERENCE_QPS = 1.0 / 0.030  # 30 ms/query host loop (nns_matching.py:42)


def main():
    rng = np.random.default_rng(0)
    bank_host = rng.standard_normal((BANK_CAPACITY, DIM)).astype(np.float32)
    bank_host /= np.linalg.norm(bank_host, axis=1, keepdims=True)
    bank = jnp.asarray(bank_host)
    inv_norms = jnp.ones((BANK_CAPACITY,), jnp.float32)
    n = jnp.int32(VALID_ROWS)
    on_tpu = jax.devices()[0].platform != "cpu"
    scan_batches = SCAN_BATCHES if on_tpu else 4  # CPU run = smoke only
    if on_tpu:
        # bank rows are unit vectors; the streaming kernel takes the
        # prenormalized bank directly (no per-dispatch inv multiply)
        def search(bank, inv_norms, n, queries, k):
            return cosine_topk_fused2_pre(bank, n, queries, k)
    else:
        search = topk_ops.cosine_topk

    # correctness cross-check + top-1 self-retrieval sanity
    probe = bank[:8]
    sims_f, idx_f = search(bank, inv_norms, n, jnp.tile(probe, (32, 1)), K)
    _, idx_ref = topk_ops.cosine_topk(bank, inv_norms, n, probe, K)
    assert (np.asarray(idx_ref)[:, 0] == np.arange(8)).all(), "self-check"
    assert (np.asarray(idx_f)[:8] == np.asarray(idx_ref)).all(), "path check"

    queries = jnp.asarray(rng.standard_normal(
        (scan_batches, BATCH, DIM)).astype(np.float32))

    @jax.jit
    def scan_bench(bank, inv_norms, n, queries):
        def body(carry, q):
            sims, idx = search(bank, inv_norms, n, q, K)
            return carry + sims[0, 0] + idx[0, 0].astype(jnp.float32), None
        total, _ = jax.lax.scan(body, jnp.float32(0.0), queries)
        return total

    @jax.jit
    def rtt_probe(x):
        return x + 1.0

    float(scan_bench(bank, inv_norms, n, queries))   # compile + warm
    float(rtt_probe(jnp.float32(0.0)))
    rtt = min(_timed(lambda: float(rtt_probe(jnp.float32(i + 1.0))))
              for i in range(3))

    best = min(_timed(lambda r=r: float(scan_bench(
        bank, inv_norms, n, queries * (1.0 + 1e-3 * (r + 1)))))
        for r in range(3))
    net = max(best - rtt, 1e-9)
    qps = BATCH * scan_batches / net

    print(json.dumps({
        "metric": f"descriptor_nns_queries_per_sec_{VALID_ROWS // 1000}k_bank",
        "value": round(qps, 1),
        "unit": "queries/sec",
        "vs_baseline": round(qps / REFERENCE_QPS, 1),
    }))


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
