# Shared helpers for the unattended hardware-measurement queues.
# Source from a queue script AFTER setting LOG_DIR (and cd'ing to the repo
# root). Provides step() and hwq_preamble().
#
# step <timeout_s> <logname> <cmd...>:
#   Runs one queue step with a per-step process-group timeout so a tunnel
#   re-outage can't wedge the queue. Own process group per step so the
#   timeout reaches hung GRANDCHILDREN too (plain `timeout` signals only
#   its direct child: a wedged TPU python under `make` would survive and
#   hold the single device, starving every later step). setsid may FORK
#   when it is already a group leader, so $! is not the new group — the
#   in-session wrapper records its own pid (= session/group leader)
#   instead. Kills address exactly this step's pgid — never by
#   name/pattern. The watchdog runs in its OWN process group too, so
#   killing it reaches its `sleep` child (otherwise every completed step
#   would orphan a sleep of up to the step timeout).
step() {
  local t=$1 name=$2; shift 2
  echo "=== $(date -u +%FT%TZ) START $name: $*" | tee -a "$LOG_DIR/queue.log"
  local pgf="$LOG_DIR/$name.pgid"
  rm -f "$pgf"
  setsid bash -c 'echo "$$" > "$1"; shift; exec "$@"' _ "$pgf" "$@" \
      >"$LOG_DIR/$name.log" 2>&1 &
  local wrapper=$!
  local wdf="$LOG_DIR/$name.wdpgid"
  rm -f "$wdf"
  setsid bash -c '
    echo "$$" > "$1"
    sleep "$2"
    pg=$(cat "$3" 2>/dev/null)
    [ -n "$pg" ] && kill -TERM -- "-$pg" 2>/dev/null
    sleep 30
    [ -n "$pg" ] && kill -KILL -- "-$pg" 2>/dev/null
  ' _ "$wdf" "$t" "$pgf" &
  wait "$wrapper"; local rc=$?
  local wd; wd=$(cat "$wdf" 2>/dev/null)
  [ -n "$wd" ] && kill -KILL -- "-$wd" 2>/dev/null
  # Reap stragglers: the leader may exit (or be TERM'd) while a grandchild
  # that ignores TERM lives on in the group — it would hold the TPU and
  # starve every later step. A pgid cannot be recycled while any member
  # survives, so this targets exactly this step's processes.
  local pg; pg=$(cat "$pgf" 2>/dev/null)
  [ -n "$pg" ] && kill -KILL -- "-$pg" 2>/dev/null
  echo "=== $(date -u +%FT%TZ) END $name rc=$rc" | tee -a "$LOG_DIR/queue.log"
  tail -3 "$LOG_DIR/$name.log" | sed 's/^/    /' >> "$LOG_DIR/queue.log"
}

# hwq_preamble: record the tree and abort fast if the TPU is unreachable.
hwq_preamble() {
  git -C . log --oneline -1 >> "$LOG_DIR/queue.log" 2>/dev/null
  if ! timeout -k 10 300 python -c \
      "import jax; d=jax.devices(); assert d[0].platform!='cpu', d"; then
    echo "TPU unreachable — queue aborted" | tee -a "$LOG_DIR/queue.log"
    exit 1
  fi
}
