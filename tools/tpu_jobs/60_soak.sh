# TIMEOUT=7200
# 30-minute streaming soak artifact.
python -u examples/soak_streaming.py --minutes 30 --artifact artifacts/soak_streaming.json
