#!/bin/bash
# Round-4 queue E — re-prove the tree after the queue-D default flips
# (scanline temporal order, scanline-gated banded warp, auto-pixpack):
#   1. headline + 4K fly-through on the NEW defaults, interleaved x2
#      (expect ~700-715 Mrays/s and ~12.4 fps from the session-7 A/Bs),
#   2. full `make test-tpu` on the final tree (the defaults change the
#      flagship path, so the green run must be re-established),
#   3. full benchmark suite for the docs refresh,
#   4. fidelity bounce-limit ablation (H3: the reference screenshot's
#      unknown reflect_limit).
#
# Usage: scripts/hw_queue_r4e.sh [log_dir]   (default /tmp/hwq_r4e)

set -u
cd "$(dirname "$0")/.."
LOG_DIR=${1:-/tmp/hwq_r4e}
mkdir -p "$LOG_DIR"
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/.jax_cache}

. scripts/hw_queue_lib.sh

hwq_preamble

FLY="python benchmarks/suite.py --only flythrough"
for i in 1 2; do
  step 1500 01_bench_default_$i python bench.py
  step 2400 02_fly_default_$i $FLY
done

step 7200 03_make_test_tpu make test-tpu

step 7200 04_suite_full python benchmarks/suite.py

# End-to-end drive of the five reference scenes on the new defaults
# (PNGs -> /tmp/scene{i}.png). Scene-0's K=4 megakernel cold compile
# alone runs 10-20 min through the tunnel; generous timeout.
step 7200 05_verify_drive python scripts/verify_drive.py

step 5400 06_fidelity_bounces python benchmarks/fidelity.py --ablate-bounces

echo "=== $(date -u +%FT%TZ) QUEUE DONE" | tee -a "$LOG_DIR/queue.log"
