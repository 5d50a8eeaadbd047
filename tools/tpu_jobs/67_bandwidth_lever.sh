# TIMEOUT=5400
# PROFILE.md's bandwidth lever at the PRODUCTION width (VERDICT r4 #8):
# job 48 showed Bc rises 376->585 GB/s with batch for width 0.375 at 320;
# measure whether width 0.25 (the streaming detector) gets the same ms/frame
# win at B512 vs B128 — adopt-or-decline with numbers.
python -u examples/bench_detector_scale.py --img 320 --batch 128 --iters 8 \
  --points 0.25:8,0.375:8 --out artifacts/lever_320_b128.json
python -u examples/bench_detector_scale.py --img 320 --batch 512 --iters 4 \
  --points 0.25:8,0.375:8 --out artifacts/lever_320_b512.json
python - <<'EOF'
import json
a = json.load(open("artifacts/lever_320_b128.json"))
b = json.load(open("artifacts/lever_320_b512.json"))
for ra, rb in zip(a["results"], b["results"]):
    mf128 = ra["ms_per_batch"] / a["batch"]
    mf512 = rb["ms_per_batch"] / b["batch"]
    print(json.dumps({"point": ra["point"],
                      "ms_per_frame_b128": round(mf128, 4),
                      "ms_per_frame_b512": round(mf512, 4),
                      "b512_speedup": round(mf128 / mf512, 3),
                      "hbm_gbps_b128": ra.get("hbm_gbps"),
                      "hbm_gbps_b512": rb.get("hbm_gbps")}))
EOF
