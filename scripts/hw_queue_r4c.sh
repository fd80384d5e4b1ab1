#!/bin/bash
# Round-4 queue C — runs after hw_queue_r4b.sh (full test-tpu + PAIRMIN
# headline/stress10k A/B + suite refresh). This queue:
#   1. breaks the 4K temporal fly-through frame into phases
#      (benchmarks/flythrough_profile.py) — the 10+ fps roadmap item
#      needs to know whether the 173 ms goes to the spp-1 megakernel
#      retirement tail or to the warp/pack/dispatch machinery,
#   2. extends the PAIRMIN A/B to the remaining divergent scenes
#      (monkey mesh, stress100k blocked kernel — leaf sweeps dominate
#      both and sweep_tile is shared, so a headline win should carry).
#
# Usage: scripts/hw_queue_r4c.sh [log_dir]   (default /tmp/hwq_r4c)

set -u
cd "$(dirname "$0")/.."
LOG_DIR=${1:-/tmp/hwq_r4c}
mkdir -p "$LOG_DIR"
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/.jax_cache}

. scripts/hw_queue_lib.sh

hwq_preamble

# 1. fly-through phase breakdown (first: it decides the round's last
#    engineering push)
step 3600 01_flythrough_profile python benchmarks/flythrough_profile.py

# 2. PAIRMIN on the mesh scene and the HBM-blocked kernel, interleaved x2
for i in 1 2; do
  step 2400 02_monkey_pairmin_$i \
    env RAYTRACER_PAIRMIN=1 python benchmarks/suite.py --only monkey_1920
  step 2400 02_monkey_default_$i \
    python benchmarks/suite.py --only monkey_1920
done
for i in 1 2; do
  step 2400 03_stress100k_pairmin_$i \
    env RAYTRACER_PAIRMIN=1 python benchmarks/suite.py --only stress100k
  step 2400 03_stress100k_default_$i \
    python benchmarks/suite.py --only stress100k
done

echo "=== $(date -u +%FT%TZ) QUEUE DONE" | tee -a "$LOG_DIR/queue.log"
