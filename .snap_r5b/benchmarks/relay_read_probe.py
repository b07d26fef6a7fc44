#!/usr/bin/env python3
"""Probe the relay-attached chip's device->host read behavior.

The lidar e2e steady state is dominated by host-side blocking reads
(~30 ms relay RTT each; lcd.search_harvest 133 s of the 335 s round-4
wall). This probe measures what actually collapses those round-trips:

  A. sequential np.asarray of N small result arrays (the naive harvest)
  B. device_read.prefetch (copy_to_host_async) first, then np.asarray
  C. jax.device_get of the whole list at once
  D. one PACKED device array (single jitted concat) -> one np.asarray
  E. jax.block_until_ready on the list, then reads

    python benchmarks/relay_read_probe.py
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
def _make(x, s):
    return x * s + 1.0


@jax.jit
def _pack(xs):
    return jnp.concatenate([x.ravel() for x in xs])


def dispatch(n, size=64):
    # distinct values each call: the relay serves identical-value
    # re-dispatches from a cache (BENCH.md axon-relay timing note)
    return [_make(jnp.arange(size, dtype=jnp.float32),
                  jnp.float32(np.random.rand())) for _ in range(n)]


def timeit(fn, reps=5):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts) * 1000)


def main():
    n = 8
    # warm every program
    for arrs in (dispatch(n), [_pack(dispatch(n))]):
        [np.asarray(a) for a in arrs]

    def seq():
        arrs = dispatch(n)
        jax.block_until_ready(arrs)
        return [np.asarray(a) for a in arrs]

    def pref():
        arrs = dispatch(n)
        jax.block_until_ready(arrs)
        device_read.prefetch(arrs)
        return [np.asarray(a) for a in arrs]

    def devget():
        arrs = dispatch(n)
        jax.block_until_ready(arrs)
        return jax.device_get(arrs)

    def packed():
        arrs = dispatch(n)
        out = _pack(arrs)
        return np.asarray(out)

    def single():
        (a,) = dispatch(1)
        return np.asarray(a)

    res = {
        "single_read_ms": timeit(single),
        f"seq_{n}_reads_ms": timeit(seq),
        f"prefetch_{n}_reads_ms": timeit(pref),
        f"device_get_{n}_ms": timeit(devget),
        "packed_1_read_ms": timeit(packed),
    }
    print(json.dumps(res))


if __name__ == "__main__":
    main()
