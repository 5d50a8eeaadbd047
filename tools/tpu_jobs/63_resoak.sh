# TIMEOUT=3600
# Re-soak with the shipped malloc_trim fix (VERDICT r4 #1 "done" criterion:
# a committed re-soak showing flat steady-state RSS, <1 MB/pass after
# warmup). 12 minutes is ~90 passes at the round-4 rate — plenty of slope.
python -u examples/soak_streaming.py --minutes 12 \
  --artifact artifacts/soak_streaming_r5.json
python - <<'EOF'
import json
d = json.load(open("artifacts/soak_streaming_r5.json"))
v = d["verdict"]
per_pass = v["rss_growth_mb"] / max(v["passes"] - 1, 1)
print(json.dumps({"rss_mb_per_pass": round(per_pass, 2), **v}))
assert per_pass < 5.0, f"soak still leaking {per_pass:.1f} MB/pass"
EOF
