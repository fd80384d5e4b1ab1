#!/bin/bash
# Unattended hardware-measurement queue (docs/TESTLOG.md "Pending" list).
#
# Runs the round's pending TPU measurements sequentially — ONE TPU process
# at a time, per-step timeouts so a tunnel re-outage can't wedge the queue,
# interleaved repeats for every A/B claim (tunnel throughput drifts +-10%
# when degraded). Logs one file per step under $LOG_DIR; summarise results
# into docs/TESTLOG.md afterwards.
#
# Usage: scripts/hw_queue.sh [log_dir]      (default /tmp/hwq)

set -u
cd "$(dirname "$0")/.."
LOG_DIR=${1:-/tmp/hwq}
mkdir -p "$LOG_DIR"
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/.jax_cache}

. scripts/hw_queue_lib.sh

hwq_preamble

# 1. full TPU test suite on the final tree (re-attributes the two
#    tunnel-degradation F's from 2026-08-17 19:50).
step 7200 01_test_tpu make test-tpu

# 2. headline after the scatter trims (3 repeats; expect >= 650),
#    interleaved with the TRI_FIRST candidate (floor swept before spheres:
#    floor hits bound best-t and close sphere cluster gates — never
#    headline-measured; ties resolve to first-swept so it is a knob, not
#    the golden default)
for i in 1 2 3; do
  step 1800 02_bench_$i python bench.py
  step 1800 02_bench_trifirst_$i env RAYTRACER_TRI_FIRST=1 python bench.py
done

# 3a. stress10k A/B/C: default megakernel vs mask-pop traversal vs
#     retest-free mask-pop (half the per-pop scalar syncs), interleaved
for i in 1 2 3; do
  step 1800 03_stress_default_$i \
    python benchmarks/suite.py --only stress10k_1000x800
  step 1800 03_stress_maskpop_$i \
    env RAYTRACER_MASKPOP=1 python benchmarks/suite.py --only stress10k_1000x800
  step 1800 03_stress_maskpop_nort_$i \
    env RAYTRACER_MASKPOP=1 RAYTRACER_MASKPOP_RETEST=0 \
    python benchmarks/suite.py --only stress10k_1000x800
  # benchmarks/divergence_bound.py: the tile union SATURATES (~172/313
  # clusters at rows32), so doubling the tile should cut per-ray sweep
  # cost ~1.7x if VMEM/register pressure allows
  step 1800 03_stress_srows64_$i \
    env RAYTRACER_SROWS=64 python benchmarks/suite.py --only stress10k_1000x800
  step 1800 03_stress_srows64_mp0_$i \
    env RAYTRACER_SROWS=64 RAYTRACER_MASKPOP=1 RAYTRACER_MASKPOP_RETEST=0 \
    python benchmarks/suite.py --only stress10k_1000x800
done

# 3a'. 100k blocked kernel A/B: mask-pop engages in the per-block sweeps
#      too, and _BLOCK_NEARFIRST replaces the static cell block order with
#      tile-true near-first pops (benchmarks/block_bound.py measures the
#      structural gap: the static order bootstraps far blocks at INF)
for i in 1 2; do
  step 2400 03_stress100k_default_$i \
    python benchmarks/suite.py --only stress100k
  step 2400 03_stress100k_maskpop_$i \
    env RAYTRACER_MASKPOP=1 python benchmarks/suite.py --only stress100k
  step 2400 03_stress100k_maskpop_nort_$i \
    env RAYTRACER_MASKPOP=1 RAYTRACER_MASKPOP_RETEST=0 \
    python benchmarks/suite.py --only stress100k
  step 2400 03_stress100k_nearfirst_$i \
    env RAYTRACER_BLOCK_NEARFIRST=1 python benchmarks/suite.py --only stress100k
  step 2400 03_stress100k_nf_maskpop_$i \
    env RAYTRACER_BLOCK_NEARFIRST=1 RAYTRACER_MASKPOP=1 \
    python benchmarks/suite.py --only stress100k
  # with the filler gates fixed, tile height finally matters for the
  # blocked kernel too (tighter unions vs more DMA repeats)
  step 2400 03_stress100k_brows16_$i \
    env RAYTRACER_BLOCKED_ROWS=16 python benchmarks/suite.py --only stress100k
done

# 3b. lanesort sampler configs (plain + coherent), interleaved with the
# mask-pop combination (mask-pop applies inside lanesort's sweeps too)
for i in 1 2; do
  step 1800 03_lanesort_$i \
    python benchmarks/suite.py --only stress10k_lanesort
  step 1800 03_lanesort_maskpop_$i \
    env RAYTRACER_MASKPOP=1 python benchmarks/suite.py --only stress10k_lanesort
done

# 3c. permutation cost model
step 1800 03_rebin_cost python benchmarks/rebin_cost.py

# 4. image-texture configs incl. the HBM-paged 2048 earth
step 2400 04_earth python benchmarks/suite.py --only earth

# 5. cube (static has_refractive skip) and monkey (glass — no change expected)
step 1800 05_cube python benchmarks/suite.py --only cube
# three configs: 100spp default + coherent, 20spp lanesort (wavefront)
step 3600 05_monkey python benchmarks/suite.py --only monkey
# monkey's 31-cluster triangle pool saturates its tile union too — same
# amortization question as stress10k (divergence_bound.py)
step 2400 05_monkey_srows64 \
  env RAYTRACER_SROWS=64 python benchmarks/suite.py --only monkey_1920

# 6. full suite on the final defaults (ARCHITECTURE.md round-3 column)
step 5400 06_full_suite python benchmarks/suite.py

echo "=== $(date -u +%FT%TZ) QUEUE DONE" | tee -a "$LOG_DIR/queue.log"
