#!/bin/bash
# Runbook for the round-3 items blocked by the axon TPU tunnel outage.
# Run top to bottom once `python -c "import jax; jax.devices()"` shows a
# TPU again. Each step is independent; order is cheapest-first so a
# flaky tunnel still yields the most valuable artifacts early.
# NOTE (CLAUDE.md): one job at a time — the tunnel multiplexes the chip
# and concurrent work pollutes every timing.
set -exo pipefail  # pipefail: a timeout/crash must not be masked by tee
cd "$(dirname "$0")/.."

# 0. smoke: model graph on real hardware (~2 min first compile)
timeout 1200 python __graft_entry__.py

# 1. B=1 serving latency (device-resident scan; prints p50/p90 per image
#    + per-launch distribution) — STATUS "Known gaps" item 1
timeout 2400 python scripts/bench_latency.py --scale n --imgsz 640 | tee /tmp/latency_n.json

# 2. YOLOX hardware throughput row (same deploy contract as the YOLO11
#    scales table) — STATUS "Known gaps" item 2a
timeout 2400 python scripts/bench_scale.py --model yolox --scale s --batch 64 --nscan 8 | tee /tmp/yolox_s_bench.json
timeout 2400 python scripts/bench_scale.py --model yolox --scale n --batch 128 --nscan 8 | tee /tmp/yolox_nano_bench.json

# 3. headline bench sanity after the round's deploy-path changes
timeout 2400 python bench.py | tee /tmp/bench_check.json

# 3b. int8 PTQ hardware gates (docs/QUANT.md): conv-level A/B, then the
#     end-to-end deploy throughput comparison on the trained checkpoint.
#     (Regenerate the synthetic COCO set first if /tmp was wiped — set -e
#     would otherwise abort the whole runbook here.)
timeout 2400 python scripts/probe_int8_conv.py | tee /tmp/int8_probe.json
BENCH_INT8=1 timeout 2400 python bench.py | tee /tmp/bench_int8.json
[ -d /tmp/coco_synth600 ] || python scripts/gen_coco_synth.py --n 600 --out /tmp/coco_synth600
timeout 2400 python scripts/eval_quant.py --data /tmp/coco_synth600 \
    --ckpt runs/ab_recipe --which last --imgsz 320 --batch 32 | tee /tmp/int8_tpu_eval.json

# 4. YOLOX accuracy at recipe scale (STATUS item 2b): same 600-image
#    synthetic COCO-format set + budget as the YOLO11 recipe A/B
#    (docs/RECIPE_AB.md). Regenerate the data if /tmp was wiped.
#    STATUS end of round 3: first attempt NaN'd (init bug, fixed in
#    32daf99); relaunch reached mAP50 0.831 at epoch 22/80, still rising,
#    when the round clock forced a stop (docs/YOLOX_RECIPE.md). Round 4:
#    run the full budget (~25 min warm at ~31 img/s incl. the end phase)
#    and add the --no-augment baseline at equal budget for the A/B.
[ -d /tmp/coco_synth600 ] || python scripts/gen_coco_synth.py --n 600 --out /tmp/coco_synth600
timeout 36000 python -m yolo_scratch_tpu.train.cli \
    --data /tmp/coco_synth600 --model yolox --scale s \
    --epochs 80 --batch 16 --imgsz 320 \
    --augment --mosaic 0.5 --mixup 0.5 --multiscale --ema --final-epochs 10 \
    --patience 25 --save-dir /tmp/yolox_recipe 2>&1 | tee /tmp/yolox_recipe.log
