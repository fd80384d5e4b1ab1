#!/bin/bash
# Probe the TPU tunnel until it answers, then hand off to the hardware
# measurement queue (the current round queue script). Run in the background at the
# start of a session while the tunnel is down; it is a no-op risk — the
# queue itself re-probes before touching the device.
#
# Usage: scripts/wait_and_queue.sh [log_dir]   (default /tmp/hwq)
set -u
cd "$(dirname "$0")/.."
LOG_DIR=${1:-/tmp/hwq}
mkdir -p "$LOG_DIR"
while true; do
  if timeout -k 10 240 python -c \
      "import jax; d=jax.devices(); assert d[0].platform!='cpu', d" \
      >>"$LOG_DIR/probe.log" 2>&1; then
    echo "$(date -u +%FT%TZ) tunnel up — starting queue" >>"$LOG_DIR/probe.log"
    exec bash scripts/hw_queue_r4b.sh "$LOG_DIR"
  fi
  echo "$(date -u +%FT%TZ) tunnel still down" >>"$LOG_DIR/probe.log"
  sleep 180
done
