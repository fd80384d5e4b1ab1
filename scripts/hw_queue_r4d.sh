#!/bin/bash
# Round-4 queue D — the temporal-path measurement set, after the earth
# IMG_STATIC_ROWS A/B chain:
#   1. flythrough_profile with the round-4 phases (banded warp gather,
#      no-reorder pack, dispatch/alloc calibration) — decides whether the
#      accumulate path needs the lane-major rework,
#   2. production 4K fly-through A/B, interleaved x2:
#      default vs scanline order vs scanline+banded vs +pixpack,
#   3. TPU runs of the new kernels' test files (banded gather, pixpack).
#
# Usage: scripts/hw_queue_r4d.sh [log_dir]   (default /tmp/hwq_r4d)

set -u
cd "$(dirname "$0")/.."
LOG_DIR=${1:-/tmp/hwq_r4d}
mkdir -p "$LOG_DIR"
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/.jax_cache}

. scripts/hw_queue_lib.sh

hwq_preamble

step 3600 01_flythrough_profile python benchmarks/flythrough_profile.py

FLY="python benchmarks/suite.py --only flythrough"
for i in 1 2; do
  step 2400 02_fly_default_$i $FLY
  step 2400 02_fly_scanline_$i \
    env RAYTRACER_TEMPORAL_ORDER=scanline $FLY
  step 2400 02_fly_scan_banded_$i \
    env RAYTRACER_TEMPORAL_ORDER=scanline RAYTRACER_WARP_BANDED=1 $FLY
  step 2400 02_fly_scan_banded_pp4_$i \
    env RAYTRACER_TEMPORAL_ORDER=scanline RAYTRACER_WARP_BANDED=1 \
        RAYTRACER_PIXPACK=4 $FLY
done

# 4. pixel packing on the HEADLINE: mean lane activity at 20 spp is ~74%
#    (ARCHITECTURE ablations) — K=2 halves the relative retirement tail,
#    so the structural ceiling is ~+15% minus the K-select overhead.
for i in 1 2; do
  step 1500 04_bench_pp2_$i env RAYTRACER_PIXPACK=2 python bench.py
  step 1500 04_bench_default_$i python bench.py
  step 1500 04_bench_pp4_$i env RAYTRACER_PIXPACK=4 python bench.py
done

step 3600 03_tpu_warp_tests env RAYTRACER_TEST_TPU=1 \
  python -m pytest tests/test_warp.py \
  "tests/test_megakernel.py::test_pixpack_statistical_depth_deterministic" \
  "tests/test_interactive.py::test_run_interactive_temporal_scanline_banded_tpu" \
  -q

echo "=== $(date -u +%FT%TZ) QUEUE DONE" | tee -a "$LOG_DIR/queue.log"
