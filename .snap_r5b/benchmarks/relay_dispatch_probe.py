#!/usr/bin/env python3
"""Probe the relay-attached chip's dispatch-side blocking behavior.

Round-4 lidar e2e: ``mac.fw_dispatch`` (a span wrapping only the jitted
call, no reads) blocked 1.25 s per solve. Hypotheses this probe separates:

  1. dispatch of a long-running program itself blocks until execution
     finishes (synchronous relay execute RPC),
  2. dispatch is async but a host->device transfer (device_put of fresh
     operands) queues behind the running program,
  3. dispatch is async and cheap; the cost was elsewhere.

Also measures whether a prefetch issued well before the read (one poll
cycle earlier) makes the harvest read ~free.

    python benchmarks/relay_dispatch_probe.py
"""
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from cslam_tpu.utils import device_read


@jax.jit
def _slow(x):
    # ~0.5-1 s of chained matmuls on a v5e
    def body(i, a):
        return a @ a * 1e-3 + x
    return jax.lax.fori_loop(0, 400, body, jnp.eye(2048) + x)


@jax.jit
def _tiny(x):
    return x * 2.0 + 1.0


def main():
    # warm
    np.asarray(_slow(jnp.float32(0.1)))
    np.asarray(_tiny(jnp.ones(64, jnp.float32)))

    res = {}

    # 0. how long does the slow program actually run?
    t0 = time.perf_counter()
    r = _slow(jnp.float32(np.random.rand()))
    res["slow_dispatch_ms"] = (time.perf_counter() - t0) * 1e3
    t0 = time.perf_counter()
    jax.block_until_ready(r)
    res["slow_wait_ms"] = (time.perf_counter() - t0) * 1e3

    # 1. dispatch tiny (with a FRESH host operand -> device_put) right
    # after dispatching slow: does the tiny dispatch block behind it?
    s = _slow(jnp.float32(np.random.rand()))
    t0 = time.perf_counter()
    t = _tiny(np.random.rand(64).astype(np.float32))
    res["tiny_dispatch_behind_slow_ms"] = (time.perf_counter() - t0) * 1e3
    t0 = time.perf_counter()
    v = float(np.asarray(t)[0])
    res["tiny_read_behind_slow_ms"] = (time.perf_counter() - t0) * 1e3
    jax.block_until_ready(s)

    # 2. plain device_put behind slow
    s = _slow(jnp.float32(np.random.rand()))
    t0 = time.perf_counter()
    d = jax.device_put(np.random.rand(1024).astype(np.float32))
    res["device_put_behind_slow_ms"] = (time.perf_counter() - t0) * 1e3
    jax.block_until_ready(s)

    # 3. prefetch issued EARLY (100 ms before the read): read cost?
    arrs = [_tiny(np.random.rand(64).astype(np.float32)) for _ in range(8)]
    device_read.prefetch(arrs)
    time.sleep(0.1)
    t0 = time.perf_counter()
    outs = [np.asarray(a) for a in arrs]
    res["read8_after_early_prefetch_ms"] = (time.perf_counter() - t0) * 1e3

    # 3b. prefetch issued immediately before (baseline from probe 1)
    arrs = [_tiny(np.random.rand(64).astype(np.float32)) for _ in range(8)]
    device_read.prefetch(arrs)
    t0 = time.perf_counter()
    outs = [np.asarray(a) for a in arrs]
    res["read8_after_late_prefetch_ms"] = (time.perf_counter() - t0) * 1e3

    # 4. double-prefetch: does prefetching TWICE break anything / help?
    arrs = [_tiny(np.random.rand(64).astype(np.float32)) for _ in range(8)]
    device_read.prefetch(arrs)
    time.sleep(0.1)
    device_read.prefetch(arrs)
    t0 = time.perf_counter()
    outs = [np.asarray(a) for a in arrs]
    res["read8_after_double_prefetch_ms"] = (time.perf_counter() - t0) * 1e3

    print(json.dumps({k: round(v, 2) for k, v in res.items()}))


if __name__ == "__main__":
    main()
