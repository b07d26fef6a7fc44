"""Geometric-verification throughput: per-pair dispatch vs one batched solve.

The reference verifies loop-closure candidates one RANSAC-PnP call at a time
(rgbd_handler.cpp:493-554). On the relay-attached TPU every dispatch carries
~30 ms RTT, so the per-pair path is RTT-bound; ``gnc_align_batch`` verifies a
whole candidate batch in one dispatch.

Timing protocol (see BENCH.md / memory: axon-bench-pitfall): each sequential
dispatch is followed by a forced scalar read, which serializes honestly; every
trial uses FRESH random values so the relay's identical-value cache cannot
serve results. Run: ``python benchmarks/verification_bench.py``.
"""
import json
import time

import jax.numpy as jnp
import numpy as np

from cslam_tpu.ops.visual_registration import (MAX_CORRESPONDENCES, gnc_align,
                                               gnc_align_batch)

P = 16           # candidate pairs per round (a busy detection period)
INLIER_DIST = 0.3


def make_batch(rng):
    """P random rigid problems with 20% outliers, padded to MAX_CORR."""
    src = np.zeros((P, MAX_CORRESPONDENCES, 3), np.float32)
    dst = np.zeros((P, MAX_CORRESPONDENCES, 3), np.float32)
    valid = np.zeros((P, MAX_CORRESPONDENCES), np.float32)
    n = 200
    for i in range(P):
        pts = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
        angle = rng.uniform(-0.5, 0.5)
        c, s = np.cos(angle), np.sin(angle)
        R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
        t = rng.uniform(-1, 1, 3).astype(np.float32)
        moved = pts @ R.T + t
        moved[:: 5] += rng.uniform(2, 5, (len(moved[::5]), 3))
        src[i, :n], dst[i, :n], valid[i, :n] = pts, moved, 1.0
    return src, dst, valid


def main():
    rng = np.random.default_rng(0)
    # warm both programs TWICE with fresh data — one observed relay run
    # recompiled on the call after a single warmup, so the first timed
    # dispatch must be the third execution of each program
    for _ in range(2):
        s, d, v = make_batch(rng)
        np.asarray(gnc_align_batch(jnp.asarray(s), jnp.asarray(d),
                                   jnp.asarray(v), INLIER_DIST)[1])
        np.asarray(gnc_align(jnp.asarray(s[0]), jnp.asarray(d[0]),
                             jnp.asarray(v[0]), INLIER_DIST)[1])

    s, d, v = make_batch(rng)  # fresh values: defeat the relay value-cache
    t0 = time.perf_counter()
    _, inl = gnc_align_batch(jnp.asarray(s), jnp.asarray(d), jnp.asarray(v),
                             INLIER_DIST)
    np.asarray(inl)  # forced read
    t_batch = time.perf_counter() - t0

    s, d, v = make_batch(rng)
    t0 = time.perf_counter()
    for i in range(P):
        _, inl = gnc_align(jnp.asarray(s[i]), jnp.asarray(d[i]),
                           jnp.asarray(v[i]), INLIER_DIST)
        int(inl)  # forced read per pair — the honest sequential pattern
    t_seq = time.perf_counter() - t0

    print(json.dumps({
        "metric": "verification_pairs_per_sec_batched",
        "value": round(P / t_batch, 1), "unit": "pairs/sec",
        "pairs": P,
        "batched_ms": round(t_batch * 1e3, 2),
        "sequential_ms": round(t_seq * 1e3, 2),
        "speedup": round(t_seq / t_batch, 1)}))


if __name__ == "__main__":
    main()
