#!/bin/bash
# Round-5 queue — two recorded sessions in one unattended run.
#
# Part 1 (TESTLOG session 10 = round-4 queue G, VERDICT round-4 item 2):
# the K=8 auto-policy evidence on the shipped defaults — verify drive,
# pure-defaults headline vs K=4 control x2, stress10k + earth512 K=8
# regression arms x2, K=16 frontier probes, fly on defaults, pixpack TPU
# tests, and a FULL `make test-tpu` green on the final tree.
#
# Part 2 (TESTLOG session 11, VERDICT round-4 items 3/4/5/9):
#   - earth1448 crossover probe (the IMG_AUTO_MAX_ROWS=2048 cliff side)
#   - chunked per-lane traversal A/B on stress10k (forced + hybrid arms)
#   - monkey lane-pool A/B (hybrid + forced arms) vs the 133 baseline
#   - stress100k blocked-kernel cost attribution (neverenter / dmaonly /
#     nosupers ablation arms; timing-only, results discarded)
#
# Usage: scripts/hw_queue_r5.sh [log_dir]   (default /tmp/hwq_r5)

set -u
cd "$(dirname "$0")/.."
LOG_DIR=${1:-/tmp/hwq_r5}
mkdir -p "$LOG_DIR"
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/.jax_cache}

. scripts/hw_queue_lib.sh

hwq_preamble

# ---------- Part 1: session 10 (queue G verbatim) ----------

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

# Full hardware suite on the final tree.
step 7200 07_make_test_tpu make test-tpu

# ---------- Part 2: session 11 (round-5 experiments) ----------

# earth1448 (2172 packed rows, just past IMG_AUTO_MAX_ROWS=2048): forced
# in-kernel vs the auto wavefront route — pins the crossover side.
E1448="python benchmarks/suite.py --only earth1448"
for i in 1 2; do
  step 2400 10_earth1448_$i $E1448
done

# Chunked per-lane traversal (sweep.LANE_CHUNK_CL) on stress10k:
# forced arm isolates the traversal; hybrid arm measures the dispatch as
# production would run it. Interleaved with the session-10 defaults above
# plus a fresh default arm here.
for i in 1 2; do
  step 3600 11_stress10k_default_$i $S10
  step 3600 11_stress10k_laneforce_$i env RAYTRACER_LANE=1 \
    RAYTRACER_LANE_FORCE=1 $S10
  step 3600 11_stress10k_lanehybrid_$i env RAYTRACER_LANE=1 $S10
done

# Monkey lane-pool A/B (VERDICT round-4 item 5): the 736-triangle mesh
# pool fits one lane chunk; hybrid = lane on secondaries only.
MONKEY="python benchmarks/suite.py --only monkey_1920x1080"
for i in 1 2; do
  step 3600 12_monkey_default_$i $MONKEY
  step 3600 12_monkey_lanehybrid_$i env RAYTRACER_LANE=1 $MONKEY
  step 3600 12_monkey_laneforce_$i env RAYTRACER_LANE=1 \
    RAYTRACER_LANE_FORCE=1 $MONKEY
done

# stress100k attribution (VERDICT round-4 item 9): fixed bootstrap cost
# (neverenter), + DMA (dmaonly), super-level worth (nosupers vs default).
# Ablation arms render garbage by design — timing only.
S100="python benchmarks/suite.py --only stress100k"
for i in 1 2; do
  step 2400 13_stress100k_default_$i $S100
  step 2400 13_stress100k_neverenter_$i env \
    RAYTRACER_BLOCKED_ABLATE=neverenter $S100
  step 2400 13_stress100k_dmaonly_$i env \
    RAYTRACER_BLOCKED_ABLATE=dmaonly $S100
  step 2400 13_stress100k_nosupers_$i env \
    RAYTRACER_BLOCKED_ABLATE=nosupers $S100
done

echo "=== $(date -u +%FT%TZ) QUEUE DONE" | tee -a "$LOG_DIR/queue.log"
