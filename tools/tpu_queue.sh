#!/bin/bash
# Serialized, relay-probe-gated TPU job queue.
#
# Runs every tools/tpu_jobs/NN_name.sh in lexical order, one at a time,
# gating each on the axon relay being reachable AND passing a tiny-op probe
# (a wedged relay hangs the first dispatch; see CLAUDE.md). Jobs that exit 0
# get a .done marker in artifacts/queue_state/ and are skipped on re-runs, so
# the queue is resumable. Per-job timeout comes from a "# TIMEOUT=<seconds>"
# header line (default 3600). Job stdout/stderr go to artifacts/logs/<name>.log
# unbuffered. NEVER run two TPU processes at once: this runner is the only
# sanctioned way to launch TPU work while it is alive.
#
# The pending-job list is RE-GLOBBED before every job (round-4 gotcha: a
# single up-front glob meant files added/renamed after queue start were
# silently skipped for the whole pass, which forced nested "catch-up
# preamble" hacks inside job scripts). A job that fails is not retried
# within the same pass (the supervisor relaunches for retries).
#
# Usage: setsid nohup bash tools/tpu_queue.sh >/dev/null 2>&1 &
set -u
cd "$(dirname "$0")/.."
ART=artifacts
mkdir -p "$ART/logs" "$ART/queue_state"
QLOG=$ART/logs/queue.log
echo "QUEUE start $(date)" >> "$QLOG"

tcp_up() { timeout 3 bash -c 'echo > /dev/tcp/127.0.0.1/8103' 2>/dev/null; }
# Advisory single-TPU-client lock shared with bench.py (the driver runs
# bench.py at round end; two concurrent relay clients risk a 20-40 min
# wedge). Held around the probe and for the whole job; jobs get
# CVSD_TPU_LOCK_HELD=1 so a bench.py inside a job doesn't wait on itself.
LOCK=$ART/tpu.lock
lock_acquire() {
  while [ -f "$LOCK" ]; do
    pid=$(awk '{print $1}' "$LOCK" 2>/dev/null)
    if [ -z "$pid" ] || ! kill -0 "$pid" 2>/dev/null; then
      rm -f "$LOCK"; break   # stale (holder dead)
    fi
    echo "tpu.lock held by pid $pid, waiting $(date)" >> "$QLOG"
    sleep 30
  done
  echo "$$ tpu_queue" > "$LOCK"
}
# only remove the lock if WE hold it (never clobber bench.py's lock)
lock_release() {
  [ -f "$LOCK" ] && [ "$(awk '{print $1}' "$LOCK" 2>/dev/null)" = "$$" ] && rm -f "$LOCK"
}
trap 'lock_release' EXIT
# Probe timeout MUST exceed the documented first-op stall after relay
# recovery ("the FIRST op in a fresh process can stall minutes" — CLAUDE.md):
# killing the probe mid-dispatch re-wedges the relay for 20-40 min, so a
# short timeout here would livelock the gate by repeatedly re-wedging a
# recovering relay. 900 s probe + a long back-off after any timed-out probe.
probe() {
  timeout 900 python -u -c "
import jax, jax.numpy as jnp
print('probe', float(jnp.ones((8,8)).sum()))
" > "$ART/logs/probe.log" 2>&1
}
# On success, returns WITH the lock held (the caller runs the job then
# releases); on probe failure the lock is released before the back-off.
wait_relay() {
  while true; do
    if tcp_up; then
      lock_acquire
      echo "tcp up $(date), probing" >> "$QLOG"
      if probe; then echo "probe OK $(date)" >> "$QLOG"; return 0; fi
      lock_release
      echo "probe failed/timed out $(date); backing off 20 min" >> "$QLOG"
      sleep 1200  # if we killed a stalling probe, let the relay recover
      continue
    fi
    sleep 240
  done
}

# First pending job (re-globbed fresh) that has not been attempted this pass.
attempted=""
next_job() {
  local j name
  for j in tools/tpu_jobs/*.sh; do
    [ -f "$j" ] || continue
    name=$(basename "$j" .sh)
    [ -f "$ART/queue_state/$name.done" ] && continue
    case " $attempted " in *" $name "*) continue ;; esac
    echo "$j"
    return 0
  done
  return 1
}

while job=$(next_job); do
  name=$(basename "$job" .sh)
  attempted="$attempted $name"
  tmo=$(sed -n 's/^# TIMEOUT=//p' "$job" | head -1)
  tmo=${tmo:-3600}
  wait_relay  # returns holding the TPU lock
  echo "== $name start $(date) timeout=$tmo" >> "$QLOG"
  CVSD_TPU_LOCK_HELD=1 timeout "$tmo" bash "$job" > "$ART/logs/$name.log" 2>&1
  rc=$?
  lock_release
  echo "== $name exit $rc $(date)" >> "$QLOG"
  [ "$rc" -eq 0 ] && touch "$ART/queue_state/$name.done"
  sleep 20
done
echo "QUEUE COMPLETE $(date)" >> "$QLOG"
