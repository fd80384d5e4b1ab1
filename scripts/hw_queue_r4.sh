#!/bin/bash
# Round-4 hardware queue — the remaining TESTLOG "Pending" items after the
# 2026-08-19 03:57-04:34 window (which measured: headline 622/645,
# stress100k default 6.59 / nearfirst 6.86 x1, stress10k default 11.42,
# SROWS=64 refuted, retest-free mask-pop refuted, kernel tests 29P/1F ->
# contract updated). This queue:
#   1. proves the updated mega-vs-regen drift contract with a FULL
#      `make test-tpu` (TESTLOG pending #1),
#   2. repeat-measures GATE2 on/off (VERDICT weak #3: one-shot defaults),
#   3. gives BLOCK_NEARFIRST its second interleaved repeat pair
#      (promote/demote needs >=2),
#   4. runs the earth / cube / monkey(+lanesort) configs (pending #4-5).
# Full-suite refresh runs at round end on the final defaults.
#
# Usage: scripts/hw_queue_r4.sh [log_dir]   (default /tmp/hwq_r4)

set -u
cd "$(dirname "$0")/.."
LOG_DIR=${1:-/tmp/hwq_r4}
mkdir -p "$LOG_DIR"
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/.jax_cache}

. scripts/hw_queue_lib.sh

hwq_preamble

# 1. headline datapoint first (fast, warms the scene-4 cache)
step 1500 01_bench python bench.py

# 2. full TPU test suite — proves the re-attributed 0.1% drift contract
#    (tests/test_megakernel.py) on hardware on this tree.
step 7200 02_test_tpu make test-tpu

# 3. GATE2 repeat A/B (default-on rests on one +3.3% measurement)
for i in 1 2; do
  step 1200 03_bench_gate2off_$i env RAYTRACER_GATE2=0 python bench.py
  step 1200 03_bench_default_$i python bench.py
done

# 4. stress100k BLOCK_NEARFIRST second repeat pair (first pair 03:58:
#    6.59 default vs 6.86 nearfirst)
for i in 1 2; do
  step 2000 04_stress100k_default_$i \
    python benchmarks/suite.py --only stress100k
  step 2000 04_stress100k_nearfirst_$i \
    env RAYTRACER_BLOCK_NEARFIRST=1 python benchmarks/suite.py --only stress100k
done

# 5. image-texture configs incl. the HBM-paged 2048 earth (pending #4)
step 2400 05_earth python benchmarks/suite.py --only earth

# 6. cube (static has_refractive skip) + monkey default/coherent/lanesort
step 1800 06_cube python benchmarks/suite.py --only cube
step 3600 06_monkey python benchmarks/suite.py --only monkey

echo "=== $(date -u +%FT%TZ) QUEUE DONE" | tee -a "$LOG_DIR/queue.log"
