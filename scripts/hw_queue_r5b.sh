#!/bin/bash
# Round-5 closing queue (TESTLOG session 12): regenerate the doc artifacts
# from the committed-asset tree and re-prove the final tree end-to-end.
#
#   - docs/images/scene{0..4}.png at 600 spp (same recipe as round 3's
#     e7fc6df, now from the tree a fresh clone actually gets)
#   - fidelity measurement (4000 spp, both seeds) for the FIDELITY table
#   - pure-defaults headline x2 + full benchmarks/suite.py
#   - full `make test-tpu` green on the final tree
#
# Usage: scripts/hw_queue_r5b.sh [log_dir]   (default /tmp/hwq_r5b)

set -u
cd "$(dirname "$0")/.."
LOG_DIR=${1:-/tmp/hwq_r5b}
mkdir -p "$LOG_DIR"
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/.jax_cache}

. scripts/hw_queue_lib.sh

hwq_preamble

for s in 0 1 2 3 4; do
  step 1800 20_docimg_scene$s python -m raytracer_tpu render --scene $s \
    --spp 100 --frames 6 --out docs/images/scene$s.png
done

step 3600 21_fidelity python benchmarks/fidelity.py 40

for i in 1 2; do
  step 1500 22_bench_$i python bench.py
done

step 7200 23_suite python benchmarks/suite.py

step 7200 24_make_test_tpu make test-tpu

echo "=== $(date -u +%FT%TZ) QUEUE DONE" | tee -a "$LOG_DIR/queue.log"
