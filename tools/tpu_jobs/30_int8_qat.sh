# TIMEOUT=5400
# int8 PTQ + QAT accuracy pricing on the hard-scene checkpoint (needs 20_).
test -f artifacts/hard_det.msgpack || exit 1
python -u examples/eval_int8_accuracy.py \
  --checkpoint artifacts/hard_det.msgpack --qat-steps 300 \
  --out examples/int8_accuracy_results.json
