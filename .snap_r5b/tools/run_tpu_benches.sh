#!/bin/bash
# Real-chip bench backlog, one command. Each bench is bounded and logs to
# benchmarks/results/; keep running the rest if one fails (the tunnel can
# drop mid-run — rerun to fill in the gaps). Ordered: never-measured /
# A/B-decision benches first so a mid-run tunnel drop costs the least.
set -u
cd "$(dirname "$0")/.."
mkdir -p benchmarks/results .jax_cache
# persistent compile cache across bench processes (axon re-compiles are
# minutes each; no-op if the plugin can't serialize executables)
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
run() {
    limit=$1; name=$2; shift 2
    log="benchmarks/results/${name}.log"
    echo "=== ${name}: $* (log ${log}, timeout ${limit}s)"
    # Write to .tmp and only replace the committed log on rc==0 so a
    # tunnel-drop / timeout rerun can't destroy a previously good result.
    timeout "${limit}" "$@" 2>&1 | tee "${log}.tmp" | tail -3
    rc=${PIPESTATUS[0]}
    if [ "${rc}" -eq 0 ]; then mv "${log}.tmp" "${log}"; fi
    echo "=== ${name} rc=${rc}"
}
run 5400 lidar_e2e_scale       python benchmarks/lidar_e2e_scale_bench.py --dump-loops benchmarks/results/lidar_e2e_loops.txt
run 5400 visual_e2e_scale     python benchmarks/visual_e2e_scale_bench.py
run 3000 pgo_8x512             python benchmarks/pgo_bench.py --robots 8 --poses 512 --export-g2o benchmarks/graphs/pgo_8x512
run 3000 pgo_headline          python benchmarks/pgo_bench.py
run 3000 bench_headline        python bench.py
run 3000 scancontext_65k       python benchmarks/scancontext_scale_bench.py --bank 65536
run 3000 nns_kernel_probe      python benchmarks/nns_kernel_probe.py
run 3000 pgo_8x256             python benchmarks/pgo_bench.py --robots 8 --poses 256 --export-g2o benchmarks/graphs/pgo_8x256
run 3000 mesh_bank             python benchmarks/mesh_bank_bench.py
run 3000 scancontext_scale     python benchmarks/scancontext_scale_bench.py
run 3000 selection_bench       python benchmarks/selection_bench.py
run 3000 selection_bench_full  python benchmarks/selection_bench.py --full-lobpcg
