# TIMEOUT=9000
# Pipeline A end-to-end AUC on CPU (hedge for tpu_jobs/40). If a run started
# by the session is still alive (pid file), wait for it instead of racing it.
if [ -f /tmp/pa_cpu.pid ]; then
  pid=$(cat /tmp/pa_cpu.pid)
  while kill -0 "$pid" 2>/dev/null; do sleep 60; done
fi
test -f artifacts/pipeline_a_cpu.json && exit 0
python -u examples/end_to_end_pipeline_a.py --videos-per-class 24 \
  --test-per-class 8 --frames 64 --det-steps 400 --epochs 25 \
  --artifact artifacts/pipeline_a_cpu.json
