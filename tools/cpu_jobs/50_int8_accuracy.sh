# TIMEOUT=10800
# int8 PTQ + QAT accuracy pricing on the CPU hard-scene checkpoint (hedge
# for tpu_jobs/30). Needs 40_hard_train's checkpoint.
test -f artifacts/hard_det_cpu.msgpack || exit 1
python -u examples/eval_int8_accuracy.py \
  --checkpoint artifacts/hard_det_cpu.msgpack --eval-size 96 \
  --qat-steps 200 --qat-batch 8 \
  --out artifacts/int8_accuracy_cpu.json
