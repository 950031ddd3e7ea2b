#!/bin/bash
# Round-5 handoff runbook. Every round-3 blocked item this file used to
# track was completed in round 4 (see STATUS.md "Round-4 headline
# results" and git log for the artifacts):
#   step 0  graft smoke            -> runs green (driver-verified each round)
#   step 1  B=1 latency            -> 2.075 ms (c0ad3a3, docs/PERF.md)
#   step 2  YOLOX throughput rows  -> nano 3,842 / s 1,758 img/s (28059ee)
#   step 3  headline sanity        -> 5,651 img/s exact-selection (BENCH_r03/STATUS)
#   step 3b int8 end-to-end        -> 3,606 img/s + TPU accuracy neutral
#                                     (e10abdd, 6bf2a52, docs/QUANT.md)
#   step 4  YOLOX recipe A/B       -> 80 ep both arms, +0.048 mAP50-95
#                                     (58c5112, YOLOX_AB.json, docs/YOLOX_RECIPE.md)
#
# What remains is environment-blocked or open-ended (STATUS.md "Known
# gaps (round-5 candidates)"). If those unblock, the recipes are:
set -exo pipefail
cd "$(dirname "$0")/.."

# A. Real-COCO absolute accuracy (blocked: zero egress). If a COCO
#    val2017 mount appears, point the val CLI at it — the loader speaks
#    the standard instances json:
#      python -m yolo_scratch_tpu.val --data <coco_root> --ckpt <ckpt> \
#          --imgsz 640 --coco-summary --per-class
#    and compare against the reference by transplanting its weights
#    (utils/torch_import.py) through the SAME evaluator — the
#    evaluator-parity protocol of docs/H2H.md applies unchanged.

# B. CDA absolute adjudication (blocked: needs the official NASA scorer).
#    Our dGA and the reference's non-canonical variant are both
#    implemented + cross-checked (PARITY.md "dGA"); run both against the
#    official scorer's output on the same predictions to adjudicate.

# C. Fresh hardware numbers after any deploy-path change (always valid):
timeout 1200 python __graft_entry__.py
timeout 2400 python bench.py | tee /tmp/bench_check.json
