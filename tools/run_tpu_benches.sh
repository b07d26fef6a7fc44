#!/bin/bash
# Round-3 leftover benches on the real chip, one command. Each bench is
# bounded and logs to benchmarks/results/; keep running the rest if one
# fails (the tunnel can drop mid-run — rerun to fill in the gaps).
set -u
cd "$(dirname "$0")/.."
mkdir -p benchmarks/results .jax_cache
# persistent compile cache across bench processes (axon re-compiles are
# minutes each; no-op if the plugin can't serialize executables)
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
run() {
    name=$1; shift
    log="benchmarks/results/${name}.log"
    echo "=== ${name}: $* (log ${log})"
    timeout 3000 "$@" 2>&1 | tee "${log}" | tail -3
    echo "=== ${name} rc=${PIPESTATUS[0]}"
}
run bench_headline        python bench.py
run nns_kernel_probe      python benchmarks/nns_kernel_probe.py
run pgo_8x256             python benchmarks/pgo_bench.py --robots 8 --poses 256
run pgo_8x512             python benchmarks/pgo_bench.py --robots 8 --poses 512
run pgo_headline          python benchmarks/pgo_bench.py
run lidar_e2e_scale       python benchmarks/lidar_e2e_scale_bench.py
run mesh_bank             python benchmarks/mesh_bank_bench.py
run scancontext_scale     python benchmarks/scancontext_scale_bench.py
run scancontext_65k       python benchmarks/scancontext_scale_bench.py --bank 65536
run scancontext_65k_fused python benchmarks/scancontext_scale_bench.py --bank 65536 --fused-rk
run selection_bench       python benchmarks/selection_bench.py
run selection_bench_full  python benchmarks/selection_bench.py --full-lobpcg
