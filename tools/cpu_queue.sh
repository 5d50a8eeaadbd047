#!/bin/bash
# Serialized CPU hedge queue.
#
# Executes every tools/cpu_jobs/NN_name.sh in lexical order, one at a time
# (the machine has ONE host core — parallel jobs just halve each other),
# nice -n 10 so a live TPU job's host side always wins the core.
#
# Two scheduling classes (round-4 verdict #4: the pytest jobs starved ALL
# round behind multi-hour TPU tail jobs):
#   - "# PRIORITY=1" header: correctness jobs (pytest). Run immediately in
#     lexical order, never pausing for the TPU queue — nice -n 10 keeps them
#     subordinate to a live TPU job's host side.
#   - default: hedge artifacts. While the relay is up AND the TPU queue has
#     pending jobs, these pause (real-TPU artifacts own the core).
#
# The job list is re-globbed before every pick, so files added after launch
# are seen without catch-up hacks. Resumable via
# artifacts/queue_state/cpu_<name>.done markers.
# Usage: setsid nohup bash tools/cpu_queue.sh >/dev/null 2>&1 &
set -u
cd "$(dirname "$0")/.."
ART=artifacts
mkdir -p "$ART/logs" "$ART/queue_state"
QLOG=$ART/logs/cpu_queue.log
echo "CPU QUEUE start $(date)" >> "$QLOG"

tcp_up() { timeout 3 bash -c 'echo > /dev/tcp/127.0.0.1/8103' 2>/dev/null; }
tpu_pending() {
  local total done
  total=$(ls tools/tpu_jobs/*.sh 2>/dev/null | wc -l)
  done=$(ls "$ART/queue_state/" 2>/dev/null | grep -cv '^cpu_')
  [ "$done" -lt "$total" ]
}
wait_turn() {
  while tcp_up && tpu_pending; do
    echo "relay up, TPU queue pending -- pausing $(date)" >> "$QLOG"
    sleep 600
  done
}

# First pending job not yet attempted this pass; PRIORITY=1 jobs first.
attempted=""
next_job() {
  local pass j name prio
  for pass in priority normal; do
    for j in tools/cpu_jobs/*.sh; do
      [ -f "$j" ] || continue
      name=$(basename "$j" .sh)
      [ -f "$ART/queue_state/cpu_$name.done" ] && continue
      case " $attempted " in *" $name "*) continue ;; esac
      prio=$(sed -n 's/^# PRIORITY=//p' "$j" | head -1)
      if [ "$pass" = priority ] && [ "${prio:-0}" != 1 ]; then continue; fi
      if [ "$pass" = normal ] && [ "${prio:-0}" = 1 ]; then continue; fi
      echo "$j"
      return 0
    done
  done
  return 1
}

while job=$(next_job); do
  name=$(basename "$job" .sh)
  attempted="$attempted $name"
  tmo=$(sed -n 's/^# TIMEOUT=//p' "$job" | head -1)
  tmo=${tmo:-7200}
  prio=$(sed -n 's/^# PRIORITY=//p' "$job" | head -1)
  [ "${prio:-0}" = 1 ] || wait_turn
  echo "== $name start $(date) timeout=$tmo priority=${prio:-0}" >> "$QLOG"
  JAX_PLATFORMS=cpu timeout "$tmo" nice -n 10 bash "$job" \
    > "$ART/logs/cpu_$name.log" 2>&1
  rc=$?
  echo "== $name exit $rc $(date)" >> "$QLOG"
  [ "$rc" -eq 0 ] && touch "$ART/queue_state/cpu_$name.done"
  sleep 10
done
echo "CPU QUEUE COMPLETE $(date)" >> "$QLOG"
