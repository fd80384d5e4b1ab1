#!/bin/bash
# Round-4 queue F — the fused-history-pack A/B plus the remaining
# pixel-packing frontier:
#   1. 4K fly-through on the fused-pack tree vs the session-7 12.4 fps
#      record (the pack launch, ~29 ms/move standalone, now rides inside
#      the warp frame), interleaved x2,
#   2. PIXPACK=8 on the fly-through (at 1 spp the K=4 kernel still runs
#      166 vs 602 Mrays/s at 4 spp on the same rays — the tail is not
#      fully amortised) and on the headline,
#   3. TPU temporal tests on the fused path.
#
# Usage: scripts/hw_queue_r4f.sh [log_dir]   (default /tmp/hwq_r4f)

set -u
cd "$(dirname "$0")/.."
LOG_DIR=${1:-/tmp/hwq_r4f}
mkdir -p "$LOG_DIR"
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/.jax_cache}

. scripts/hw_queue_lib.sh

hwq_preamble

FLY="python benchmarks/suite.py --only flythrough"
for i in 1 2; do
  step 2400 01_fly_fused_$i $FLY
  step 2400 02_fly_fused_pp8_$i env RAYTRACER_PIXPACK=8 $FLY
done

for i in 1 2; do
  step 1500 03_bench_pp8_$i env RAYTRACER_PIXPACK=8 python bench.py
  step 1500 03_bench_default_$i python bench.py
done

step 3600 04_tpu_temporal_tests env RAYTRACER_TEST_TPU=1 \
  python -m pytest tests/test_warp.py \
  "tests/test_megakernel.py::test_temporal_reprojection_flythrough" \
  "tests/test_interactive.py::test_run_interactive_temporal_tpu" \
  "tests/test_interactive.py::test_run_interactive_temporal_scanline_banded_tpu" \
  -q

# Full hardware suite on the fused-pack tree (the round's final-tree
# green run; compile cache makes this mostly incremental after queue E).
step 7200 05_make_test_tpu make test-tpu

# Re-queued from queue E (sys.path fix): five-scene end-to-end drive on
# hardware, PNGs -> /tmp/scene{i}.png.
step 7200 06_verify_drive python scripts/verify_drive.py

echo "=== $(date -u +%FT%TZ) QUEUE DONE" | tee -a "$LOG_DIR/queue.log"
