#!/bin/bash
# Trimmed, priority-ordered variant of hw_queue.sh for a short hardware
# window (~1h): headline first, then the filler-fix stress100k re-measure,
# the stress10k divergence A/Bs, the flagship-kernel TPU tests, and only
# then the long tail. Same per-step process-group timeout machinery.
#
# Usage: scripts/hw_queue_trim.sh [log_dir]   (default /tmp/hwq)

set -u
cd "$(dirname "$0")/.."
LOG_DIR=${1:-/tmp/hwq}
mkdir -p "$LOG_DIR"
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/.jax_cache}

. scripts/hw_queue_lib.sh

hwq_preamble

# 1. headline (also warms the scene-4 compile cache)
step 1500 01_bench python bench.py

# 2. stress100k filler-fix re-measure (roadmap 2b: old 1.18 was a
#    broken-gate brute scan; predicted footprint ~4/25 blocks)
step 1800 02_stress100k_default python benchmarks/suite.py --only stress100k
step 1500 03_stress100k_nearfirst \
  env RAYTRACER_BLOCK_NEARFIRST=1 python benchmarks/suite.py --only stress100k

# 3. stress10k divergence A/Bs (union-saturation amortization + sync cuts)
step 1500 04_stress10k_default \
  python benchmarks/suite.py --only stress10k_1000x800
step 1500 05_stress10k_srows64 \
  env RAYTRACER_SROWS=64 python benchmarks/suite.py --only stress10k_1000x800
step 1500 06_stress10k_maskpop_nort \
  env RAYTRACER_MASKPOP=1 RAYTRACER_MASKPOP_RETEST=0 \
  python benchmarks/suite.py --only stress10k_1000x800

# 4. flagship-kernel TPU tests (megakernel numerics + sharded mega)
step 2400 07_tpu_kernel_tests env RAYTRACER_TEST_TPU=1 \
  python -m pytest tests/test_megakernel.py tests/test_golden.py \
  tests/test_pallas.py tests/test_parallel.py -q

# 5. headline repeats + TRI_FIRST A/B (cache warm now)
step 900 08_bench_2 python bench.py
step 900 09_bench_trifirst env RAYTRACER_TRI_FIRST=1 python bench.py

# 6. the long tail, best-effort
step 1500 10_monkey_srows64 \
  env RAYTRACER_SROWS=64 python benchmarks/suite.py --only monkey_1920
step 1800 11_earth python benchmarks/suite.py --only earth
step 1500 12_stress10k_srows64_mp0 \
  env RAYTRACER_SROWS=64 RAYTRACER_MASKPOP=1 RAYTRACER_MASKPOP_RETEST=0 \
  python benchmarks/suite.py --only stress10k_1000x800
step 1200 13_stress100k_brows16 \
  env RAYTRACER_BLOCKED_ROWS=16 python benchmarks/suite.py --only stress100k
step 900 14_bench_3 python bench.py
step 3600 15_test_tpu_full make test-tpu
step 5400 16_full_suite python benchmarks/suite.py

echo "=== $(date -u +%FT%TZ) QUEUE DONE" | tee -a "$LOG_DIR/queue.log"
