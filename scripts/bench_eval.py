"""COCO-val-scale evaluation benchmark: nc=80, 5k images, device vs host.

Measures the full eval stack at COCO-val scale (5,000 images, nc=80,
640px, B=64): jitted eval step (forward + loss + fused decode + NMS +
on-device greedy TP marking, ``ops/matching.py``) with host work reduced
to AP accumulation — vs the reference-style host path (numpy greedy
matcher per image x threshold, ``utils/metrics.evaluate_detections``,
anchored at ``/root/reference/.../utils/metrics.py:84-274``) fed the SAME
detections. Includes per-class AP (one extra device pass +
``per_class_from_marks``) vs the host's O(nc x matcher) re-runs
(``evaluate_per_class``).

Images are random u8 (the eval stack's cost is shape-driven, detections
come from the model's real NMS output either way); GT is synthetic.

Run: python scripts/bench_eval.py [--images 5000] [--batch 64]
     [--imgsz 640] [--nc 80] [--per-class-host 0]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    str(Path(__file__).resolve().parent.parent / ".jax_cache"),
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=5000)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--nc", type=int, default=80)
    ap.add_argument("--max-gt", type=int, default=24)
    ap.add_argument("--per-class-host", type=int, default=1,
                    help="also time host evaluate_per_class (80 matcher re-runs; slow)")
    args = ap.parse_args()

    from yolo_scratch_tpu.losses.v8_loss import DetectionLossConfig
    from yolo_scratch_tpu.models.builder import build_yolo11
    from yolo_scratch_tpu.ops.matching import DEFAULT_THRESHOLDS
    from yolo_scratch_tpu.train.optim import make_optimizer
    from yolo_scratch_tpu.train.state import create_train_state
    from yolo_scratch_tpu.train.steps import make_eval_step
    from yolo_scratch_tpu.utils.metrics import (
        detections_to_lists,
        evaluate_detections,
        evaluate_per_class,
        metrics_from_marks,
        per_class_from_marks,
        targets_to_lists,
    )

    S, B, nc, G = args.imgsz, args.batch, args.nc, args.max_gt
    model = build_yolo11(
        str(Path(__file__).resolve().parent.parent
            / "yolo_scratch_tpu/configs/yolo11_crater.yaml"),
        ch=3, nc=nc, scale="n")
    state = create_train_state(
        model, jax.random.PRNGKey(0), np.zeros((1, S, S, 3), np.float32),
        make_optimizer())
    loss_cfg = DetectionLossConfig(nc=nc, strides=model.strides)
    step = make_eval_step(
        model, loss_cfg, conf_threshold=0.001,  # random weights: keep dets flowing
        match_thresholds=DEFAULT_THRESHOLDS, per_class=True)

    rng = np.random.RandomState(0)
    n_batches = args.images // B

    def make_batch(seed):
        r = np.random.RandomState(seed)
        img = r.randint(0, 256, (B, S, S, 3), np.uint8).astype(np.float32) / 255.0
        c = r.rand(B, G, 2).astype(np.float32) * 0.8 + 0.1
        wh = r.rand(B, G, 2).astype(np.float32) * 0.2 + 0.02
        gt = np.clip(np.concatenate([c - wh / 2, c + wh / 2], -1), 0, 1)
        return {
            "img": img,
            "gt_bboxes": gt,
            "gt_labels": r.randint(0, nc, (B, G)).astype(np.int32),
            "gt_mask": (np.arange(G)[None] < r.randint(4, G + 1, B)[:, None]),
        }

    batches = [make_batch(s) for s in range(min(n_batches, 4))]  # cycle 4 distinct

    # compile + warm
    out = step(state, batches[0])
    _ = [np.asarray(o) for o in out[1]]

    # -- device-matching eval over the full set ---------------------------
    marks, marks_cls, det = [], [], {"scores": [], "labels": [], "valid": []}
    lists_pred, lists_tgt = [], []
    n_gt = 0
    t0 = time.perf_counter()
    outs = []
    for i in range(n_batches):
        b = batches[i % len(batches)]
        outs.append((b, step(state, b)))  # async dispatch
    # fetch everything (honest sync: bytes)
    t_dispatch = time.perf_counter() - t0
    for b, out in outs:
        metrics, (boxes, scores, labels, valid), mk, mkc = out
        marks.append(np.asarray(mk))
        marks_cls.append(np.asarray(mkc))
        det["scores"].append(np.asarray(scores))
        det["labels"].append(np.asarray(labels))
        det["valid"].append(np.asarray(valid))
        n_gt += int(b["gt_mask"].sum())
    t_device = time.perf_counter() - t0

    t1 = time.perf_counter()
    agg = metrics_from_marks(
        np.concatenate(marks), np.concatenate(det["scores"]),
        np.concatenate(det["valid"]), n_gt)
    t_host_agg = time.perf_counter() - t1

    t2 = time.perf_counter()
    per = per_class_from_marks(
        np.concatenate(marks_cls), np.concatenate(det["scores"]),
        np.concatenate(det["labels"]), np.concatenate(det["valid"]),
        np.concatenate([b["gt_labels"] for b, _ in outs]),
        np.concatenate([b["gt_mask"] for b, _ in outs]), nc)
    t_host_per_class = time.perf_counter() - t2

    # -- reference-style host matcher on the same detections --------------
    t3 = time.perf_counter()
    for b, out in outs:
        _, (boxes, scores, labels, valid), _, _ = out
        lists_pred.extend(detections_to_lists(
            np.asarray(boxes), np.asarray(scores), np.asarray(labels),
            np.asarray(valid)))
        lists_tgt.extend(targets_to_lists(b["gt_labels"], b["gt_bboxes"], b["gt_mask"]))
    host = evaluate_detections(lists_pred, lists_tgt, conf_threshold=0.001)
    t_host_match = time.perf_counter() - t3

    t_host_pc = None
    if args.per_class_host:
        # time a k-class slice of the host per-class matcher and
        # extrapolate: the full nc=80 pass is O(nc x full matcher)
        k = min(8, nc)
        sliced_preds, sliced_tgts = [], []
        for p, t in zip(lists_pred, lists_tgt):
            pm = np.asarray(p["labels"]).reshape(-1) < k
            tm = np.asarray(t["labels"]).reshape(-1) < k
            sliced_preds.append({
                "boxes": np.asarray(p["boxes"]).reshape(-1, 4)[pm],
                "scores": np.asarray(p["scores"]).reshape(-1)[pm],
                "labels": np.asarray(p["labels"]).reshape(-1)[pm]})
            sliced_tgts.append({
                "boxes": np.asarray(t["boxes"]).reshape(-1, 4)[tm],
                "labels": np.asarray(t["labels"]).reshape(-1)[tm]})
        t4 = time.perf_counter()
        evaluate_per_class(sliced_preds, sliced_tgts, k, conf_threshold=0.001)
        t_host_pc = (time.perf_counter() - t4) * (nc / k)

    images = n_batches * B
    result = {
        "images": images, "nc": nc, "imgsz": S, "batch": B,
        "device_path": {
            "dispatch_s": round(t_dispatch, 3),
            "eval_total_s": round(t_device, 3),
            "host_ap_accumulation_s": round(t_host_agg, 4),
            "host_per_class_accumulation_s": round(t_host_per_class, 4),
            "images_per_sec": round(images / (t_device + t_host_agg + t_host_per_class), 1),
            "host_fraction": round(
                (t_host_agg + t_host_per_class)
                / (t_device + t_host_agg + t_host_per_class), 4),
        },
        "host_path": {
            "greedy_match_s": round(t_host_match, 3),
            "per_class_s_extrapolated": (
                round(t_host_pc, 3) if t_host_pc is not None else None),
        },
        "agreement_mAP50_95": {
            "device": round(agg["mAP50-95"], 6), "host": round(host["mAP50-95"], 6),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
