#!/bin/bash
# Relaunches tools/tpu_queue.sh until every job has a .done marker.
#
# The queue itself is a single resumable pass: a job that fails (e.g. a
# transient relay error mid-train, as happened to 20_hard_train at step
# 650/1200 on 2026-08-19) is skipped for the rest of that pass and only
# retried on the NEXT queue launch. This supervisor closes that loop:
# whenever the queue process exits with jobs still pending, it relaunches
# it (lexical order means the earliest failed job retries first), up to
# MAX_PASSES total passes so a deterministic failure can't spin forever.
#
# Never kills anything; only observes and (re)launches.
# Usage: setsid nohup bash tools/queue_supervisor.sh >/dev/null 2>&1 &
set -u
cd "$(dirname "$0")/.."
ART=artifacts
mkdir -p "$ART/logs" "$ART/queue_state"
SLOG=$ART/logs/supervisor.log
MAX_PASSES=${MAX_PASSES:-8}
passes=0
echo "SUPERVISOR start $(date)" >> "$SLOG"

all_done() {
  local job name
  for job in tools/tpu_jobs/*.sh; do
    name=$(basename "$job" .sh)
    [ -f "$ART/queue_state/$name.done" ] || return 1
  done
  return 0
}
queue_alive() { ps -eo args | grep -q "[t]pu_queue\.sh"; }

while true; do
  if all_done; then
    echo "SUPERVISOR: all jobs done $(date)" >> "$SLOG"
    exit 0
  fi
  if ! queue_alive; then
    passes=$((passes + 1))
    if [ "$passes" -gt "$MAX_PASSES" ]; then
      echo "SUPERVISOR: pass budget ($MAX_PASSES) exhausted, giving up $(date)" >> "$SLOG"
      exit 1
    fi
    echo "SUPERVISOR: queue not running, relaunch pass $passes $(date)" >> "$SLOG"
    setsid nohup bash tools/tpu_queue.sh >/dev/null 2>&1 &
    sleep 60
  fi
  sleep 120
done
