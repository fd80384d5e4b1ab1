#!/bin/bash
# Round-4 queue B — after the 09:49-11:03 window (hw_queue_r4.sh) landed
# its decisions (BLOCK_NEARFIRST promoted, GATE2 wash, lanesort-on-monkey
# and hbm-paged-2048 refuted; TESTLOG session 5). This queue:
#   1. re-runs the FULL `make test-tpu` — the 09:52 attempt was an
#      environmental abort (every failure `JaxRuntimeError: ABOR`, incl.
#      trivial vec tests) — the one outstanding VERDICT item,
#   2. A/Bs PAIRMIN (min-tree carry update for defer-mode leaf sweeps,
#      sweep.py) on the headline and on stress10k, interleaved x2,
#   3. refreshes the full suite on the new defaults (near-first blocks).
#
# Usage: scripts/hw_queue_r4b.sh [log_dir]   (default /tmp/hwq_r4b)

set -u
cd "$(dirname "$0")/.."
LOG_DIR=${1:-/tmp/hwq_r4b}
mkdir -p "$LOG_DIR"
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/.jax_cache}

. scripts/hw_queue_lib.sh

hwq_preamble

# 1. full TPU test suite first — the top outstanding item; everything
#    else in this queue is perf data.
step 7200 01_test_tpu make test-tpu

# 2. PAIRMIN headline A/B (defer mode engages on the 100-sphere scene)
for i in 1 2; do
  step 1500 02_bench_pairmin_$i env RAYTRACER_PAIRMIN=1 python bench.py
  step 1500 02_bench_default_$i python bench.py
done

# 3. PAIRMIN on the divergent mega scene (leaf sweeps dominate there too)
for i in 1 2; do
  step 2400 03_stress10k_pairmin_$i \
    env RAYTRACER_PAIRMIN=1 python benchmarks/suite.py --only stress10k_1000x800
  step 2400 03_stress10k_default_$i \
    python benchmarks/suite.py --only stress10k_1000x800
done

# 4. full suite refresh on the round-4 defaults
step 9000 04_suite python benchmarks/suite.py

echo "=== $(date -u +%FT%TZ) QUEUE DONE" | tee -a "$LOG_DIR/queue.log"
