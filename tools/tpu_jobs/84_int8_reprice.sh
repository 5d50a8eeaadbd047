# TIMEOUT=5400
# Re-price int8 PTQ/QAT against the CONVERGED float checkpoint (needs 82_):
# round-4's "QAT beats float" claim should collapse to parity once float is
# trained to plateau — measure it rather than assume.
test -f artifacts/hard_det_converged.msgpack || exit 1
python -u examples/eval_int8_accuracy.py \
  --checkpoint artifacts/hard_det_converged.msgpack --qat-steps 300 \
  --out examples/int8_converged_results.json
cp examples/int8_converged_results.json artifacts/ 2>/dev/null || true
