#!/bin/bash
# The two assembled-pipeline benches only (lidar + visual), for re-runs
# after frontend/selection changes. Same bounded-log discipline as
# run_tpu_benches.sh; run from a snapshot of the commit under test with
# .jax_cache symlinked to the persistent compile cache.
set -u
cd "$(dirname "$0")/.."
mkdir -p benchmarks/results .jax_cache
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
run() {
    limit=$1; name=$2; shift 2
    log="benchmarks/results/${name}.log"
    echo "=== ${name}: $* (log ${log}, timeout ${limit}s)"
    timeout "${limit}" "$@" 2>&1 | tee "${log}.tmp" | tail -3
    rc=${PIPESTATUS[0]}
    if [ "${rc}" -eq 0 ]; then mv "${log}.tmp" "${log}"; fi
    echo "=== ${name} rc=${rc}"
}
run 5400 lidar_e2e_scale   python benchmarks/lidar_e2e_scale_bench.py --dump-loops benchmarks/results/lidar_e2e_loops.txt --dump-g2o benchmarks/graphs/lidar_e2e
run 5400 visual_e2e_scale  python benchmarks/visual_e2e_scale_bench.py
