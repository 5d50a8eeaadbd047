# TIMEOUT=5400
# Relay-side bisect + fix validation for the round-4 soak's +83 MB/pass RSS
# growth (artifacts/soak_streaming.json). CPU bisect: tracemalloc and
# jax.live_arrays flat; malloc_trim collapses the slope 13x -> glibc arena
# retention, fixed by the trim now built into stream_videos_concurrent.
# Arm 1 disables the shipped trim (must reproduce the raw growth if the
# diagnosis is right); arm 2 is the shipped default (must be ~flat); arm 3
# isolates the native decoder on top.
set -e
CVSD_DISABLE_MALLOC_TRIM=1 python -u examples/leak_bisect.py --passes 8 --videos 32 \
  | tee /tmp/leak_relay_raw.log
python -u examples/leak_bisect.py --passes 8 --videos 32 \
  | tee /tmp/leak_relay_shipped.log
python -u examples/leak_bisect.py --passes 8 --videos 32 --native-decode off \
  | tee /tmp/leak_relay_native_off.log
python - <<'EOF'
import json
out = {}
for arm in ["raw", "shipped", "native_off"]:
    rows = [json.loads(l) for l in open(f"/tmp/leak_relay_{arm}.log")
            if l.startswith("{")]
    out[arm] = rows[-1]
with open("artifacts/leak_bisect_relay.json", "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out))
EOF
