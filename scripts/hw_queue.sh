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

step() {  # step <timeout_s> <logname> <cmd...>
  local t=$1 name=$2; shift 2
  echo "=== $(date -u +%FT%TZ) START $name: $*" | tee -a "$LOG_DIR/queue.log"
  # Own process group per step so the timeout reaches hung GRANDCHILDREN
  # too (plain `timeout` signals only its direct child: a wedged TPU
  # python under `make` would survive and hold the single device, starving
  # every later step). setsid may FORK when it is already a group leader,
  # so $! is not the new group — the in-session wrapper records its own
  # pid (= session/group leader) instead. Kills address exactly this
  # step's pgid — never by name/pattern.
  local pgf="$LOG_DIR/$name.pgid"
  rm -f "$pgf"
  setsid bash -c 'echo "$$" > "$1"; shift; exec "$@"' _ "$pgf" "$@" \
      >"$LOG_DIR/$name.log" 2>&1 &
  local wrapper=$!
  ( sleep "$t"; pg=$(cat "$pgf" 2>/dev/null)
    [ -n "$pg" ] && kill -TERM -- "-$pg" 2>/dev/null
    sleep 30
    [ -n "$pg" ] && kill -KILL -- "-$pg" 2>/dev/null ) &
  local wd=$!
  wait "$wrapper"; local rc=$?
  kill "$wd" 2>/dev/null; wait "$wd" 2>/dev/null
  # Reap stragglers: the leader may exit (or be TERM'd) while a grandchild
  # that ignores TERM lives on in the group — it would hold the TPU and
  # starve every later step. A pgid cannot be recycled while any member
  # survives, so this targets exactly this step's processes.
  local pg; pg=$(cat "$pgf" 2>/dev/null)
  [ -n "$pg" ] && kill -KILL -- "-$pg" 2>/dev/null
  echo "=== $(date -u +%FT%TZ) END $name rc=$rc" | tee -a "$LOG_DIR/queue.log"
  tail -3 "$LOG_DIR/$name.log" | sed 's/^/    /' >> "$LOG_DIR/queue.log"
}

git -C . log --oneline -1 >> "$LOG_DIR/queue.log" 2>/dev/null

# 0. sanity: is the TPU actually reachable? abort fast if not.
if ! timeout -k 10 300 python -c \
    "import jax; d=jax.devices(); assert d[0].platform!='cpu', d"; then
  echo "TPU unreachable — queue aborted" | tee -a "$LOG_DIR/queue.log"
  exit 1
fi

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
