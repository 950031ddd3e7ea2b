#!/bin/bash
# Finish the matched-budget 640 head-to-head (round 4 → 5 handoff).
#
# Round 4 ran OUR arm at the full 60-epoch budget (H2H640_60ep.json) and
# launched the reference's 60-epoch arm on CPU (~5-6 h on this 1-core
# host):
#   cd /root/reference/yolo_scratch_cuda && nice -n 19 python \
#     train_yolo11_cuda.py --data /tmp/h2h640/data --device cpu \
#     --imgsz 640 --batch 8 --epochs 60 --scale n --workers 0 \
#     --save-dir /tmp/h2h640/ref_run60 --resume /tmp/h2h640/ref_run60/last.pt
#   (log: /tmp/ref60.log; the --resume flag makes relaunch-after-crash
#   continue instead of restarting)
#
# Run THIS script once that training reaches epoch 60/60. Each step is
# idempotent. One job at a time (CLAUDE.md: 1 CPU core, tunnel-multiplexed
# chip).
set -exo pipefail
cd "$(dirname "$0")/.."

export H2H_ROOT=/tmp/h2h640 H2H_IMGSZ=640 H2H_EPOCHS=60
export H2H_REF_RUN=/tmp/h2h640/ref_run60 H2H_OUT=H2H640_60ep.json

# data must exist (regenerate only if /tmp was wiped — same args as round 3)
[ -d /tmp/h2h640/data ] || python scripts/gen_crater_synth.py \
    --out /tmp/h2h640/data --n 300 --img-size 640

# 0. confirm the reference arm actually finished 60 epochs
python - <<'EOF'
import torch
ck = torch.load("/tmp/h2h640/ref_run60/last.pt", map_location="cpu", weights_only=False)
ep = int(ck.get("epoch", -1)) + 1
print(f"reference arm: {ep}/60 epochs")
assert ep >= 60, "reference arm not finished — wait or relaunch (header)"
EOF

# 1. score the 60-epoch reference weights through its own corrected
#    evaluator (writes /tmp/h2h640/ref_eval.json)
timeout 3600 python scripts/h2h.py eval-ref

# 2. transplant the same weights into our stack (evaluator-level parity
#    on trained weights; writes /tmp/h2h640/transplant.json)
timeout 3600 python scripts/h2h.py transplant

# 3. detection-set diff between the two prediction pipelines on the same
#    weights (quantifies the term cross-eval named; writes det_diff.json)
timeout 3600 python scripts/h2h.py det-diff

# 4. regenerate the matched-budget summary (overwrites H2H640_60ep.json
#    at the repo root with the 60-epoch reference row)
python scripts/h2h.py report

# 5. bring the artifacts into the repo + update the docs
cp /tmp/h2h640/ref_eval.json   docs/bench_r4/h2h640_ref60_eval.json
cp /tmp/h2h640/transplant.json docs/bench_r4/h2h640_ref60_transplant.json
cp /tmp/h2h640/det_diff.json   docs/bench_r4/det_diff.json
echo "NOW: update docs/H2H.md round-4 section (both arms at 60 epochs),"
echo "     refresh STATUS.md / README.md deltas, and commit."
