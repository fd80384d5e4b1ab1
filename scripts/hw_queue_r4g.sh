#!/bin/bash
# Round-4 queue G — prove (or refute) the PIXPACK=8 auto-policy flip.
#
# Queue F measured the headline at PIXPACK=8 741.2/756.7 vs 711.4/x at
# the promoted K=4 default (+4-6%, interleaved), and the 4K fly-through
# 12.46/12.49 vs 12.27/12.41. This queue runs AFTER the policy flip
# (RenderSettings.pixpack=None -> K=8 at spp <= 32) and:
#   1. re-proves the flipped headline on pure defaults vs a K=4 control,
#   2. checks the OTHER low-spp suite configs the policy covers
#      (stress10k 20 spp, earth512 20 spp) for regressions,
#   3. probes the K=16 frontier once (bench + fly),
#   4. re-runs the pixpack/policy TPU tests and the full hardware suite
#      on the flipped tree.
#
# Usage: scripts/hw_queue_r4g.sh [log_dir]   (default /tmp/hwq_r4g)

set -u
cd "$(dirname "$0")/.."
LOG_DIR=${1:-/tmp/hwq_r4g}
mkdir -p "$LOG_DIR"
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/.jax_cache}

. scripts/hw_queue_lib.sh

hwq_preamble

# Five-scene end-to-end drive on the flipped tree first (the verify
# recipe): K=8 kernels cold-compile for the 250x200 scene shapes here, so
# the PNGs prove the flipped default renders every reference scene before
# the A/B arms run. PNGs -> /tmp/scene{i}.png.
step 7200 00_verify_drive python scripts/verify_drive.py

for i in 1 2; do
  step 1500 01_bench_k8_$i python bench.py
  step 1500 01_bench_k4_$i env RAYTRACER_PIXPACK=4 python bench.py
done

S10="python benchmarks/suite.py --only stress10k_1000x800_20spp"
E512="python benchmarks/suite.py --only earth512"
for i in 1 2; do
  step 2400 02_stress10k_k8_$i $S10
  step 2400 02_stress10k_k4_$i env RAYTRACER_PIXPACK=4 $S10
  step 2400 03_earth512_k8_$i $E512
  step 2400 03_earth512_k4_$i env RAYTRACER_PIXPACK=4 $E512
done

step 1500 04_bench_pp16 env RAYTRACER_PIXPACK=16 python bench.py
step 2400 04_fly_pp16 env RAYTRACER_PIXPACK=16 \
  python benchmarks/suite.py --only flythrough
step 2400 05_fly_defaults python benchmarks/suite.py --only flythrough

step 3600 06_tpu_pixpack_tests env RAYTRACER_TEST_TPU=1 \
  python -m pytest tests/test_megakernel.py tests/test_film_renderer.py \
  tests/test_interactive.py -q

# Full hardware suite on the flipped-policy tree.
step 7200 07_make_test_tpu make test-tpu

echo "=== $(date -u +%FT%TZ) QUEUE DONE" | tee -a "$LOG_DIR/queue.log"
