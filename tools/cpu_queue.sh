#!/bin/bash
# Serialized CPU hedge queue.
#
# The axon relay has now been down for most of two rounds; the TPU queue
# (tools/tpu_queue.sh) fires the real artifacts when it returns, but the
# accuracy-type numbers (AUCs, mAP deltas, int8 pricing) are platform
# independent and can be measured on the host CPU as a hedge. This runner
# executes every tools/cpu_jobs/NN_name.sh in lexical order, one at a time
# (the machine has ONE host core — parallel jobs just halve each other),
# nice -n 10 so a live TPU job's host side always wins the core.
#
# While the relay is up AND the TPU queue still has pending jobs, this
# runner pauses: the real-TPU artifacts take absolute priority for the core.
#
# Resumable via artifacts/queue_state/cpu_<name>.done markers.
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

for job in tools/cpu_jobs/*.sh; do
  name=$(basename "$job" .sh)
  [ -f "$ART/queue_state/cpu_$name.done" ] && continue
  tmo=$(sed -n 's/^# TIMEOUT=//p' "$job" | head -1)
  tmo=${tmo:-7200}
  wait_turn
  echo "== $name start $(date) timeout=$tmo" >> "$QLOG"
  JAX_PLATFORMS=cpu timeout "$tmo" nice -n 10 bash "$job" \
    > "$ART/logs/cpu_$name.log" 2>&1
  rc=$?
  echo "== $name exit $rc $(date)" >> "$QLOG"
  [ "$rc" -eq 0 ] && touch "$ART/queue_state/cpu_$name.done"
  sleep 10
done
echo "CPU QUEUE COMPLETE $(date)" >> "$QLOG"
