"""Standalone evaluation CLI: checkpoint + dataset -> metrics.

The reference has no eval-only entry point (validation lives inside the
trainer); this gives users a direct way to score a model: COCO-style
P/R/mAP50/mAP50-95 plus the NASA-CDA suite (CDAquality, dGA-NMS optional).

TP/FP matching runs on device inside the jitted eval step
(``ops/matching.py``) — including per-class marks, so ``--per-class`` at
nc=80 costs one extra device pass, not 80 host matcher re-runs. The host
keeps only AP accumulation. ``--host-match`` forces the reference-style
numpy greedy matcher (``utils.metrics.evaluate_detections``); ``--cda``
always collects host-side detection lists (the CDA scorer consumes
boxes).

Run: ``python -m yolo_scratch_tpu.val --data <dir> --ckpt <dir> [--cda]``.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

import jax


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description="Evaluate a detector")
    p.add_argument("--data", type=str, default="synthetic")
    p.add_argument("--dataset", type=str, default="auto",
                   choices=["auto", "crater", "coco", "synthetic"])
    p.add_argument("--cfg", type=str,
                   default=str(Path(__file__).parent / "configs/yolo11_crater.yaml"))
    p.add_argument("--scale", type=str, default="n")
    p.add_argument("--model", type=str, default="yolo11", choices=["yolo11", "yolox"],
                   help="model family (mirrors the train CLI's --model)")
    p.add_argument("--ckpt", type=str, default=None, help="checkpoint dir")
    p.add_argument("--which", type=str, default="best", choices=["best", "last"])
    p.add_argument("--torch-ckpt", type=str, default=None)
    p.add_argument("--imgsz", type=int, default=640)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--conf", type=float, default=0.25)
    p.add_argument("--iou", type=float, default=0.45)
    p.add_argument("--max-gt", type=int, default=100)
    p.add_argument("--max-batches", type=int, default=None)
    p.add_argument("--cda", action="store_true", help="also compute the CDA scorer suite")
    p.add_argument("--per-class", action="store_true", help="per-class AP breakdown")
    p.add_argument("--coco-summary", action="store_true",
                   help="full COCO 12-metric table: AP/AP50/AP75, AP by area "
                        "band (small/medium/large, ignore semantics), AR@1/10/100")
    p.add_argument("--ema", action="store_true", help="evaluate EMA weights")
    p.add_argument("--host-match", action="store_true",
                   help="reference-style host greedy matcher instead of device marks")
    args = p.parse_args(argv)

    from yolo_scratch_tpu.data.loader import Loader
    from yolo_scratch_tpu.losses.v8_loss import DetectionLossConfig
    from yolo_scratch_tpu.models.builder import build_yolo11
    from yolo_scratch_tpu.ops.matching import DEFAULT_THRESHOLDS
    from yolo_scratch_tpu.train.cli import make_datasets
    from yolo_scratch_tpu.train.optim import make_optimizer
    from yolo_scratch_tpu.train.state import create_train_state
    from yolo_scratch_tpu.train.steps import make_eval_step
    from yolo_scratch_tpu.utils.metrics import (
        detections_to_lists,
        evaluate_cda_full,
        evaluate_detections,
        evaluate_per_class,
        metrics_from_marks,
        per_class_from_marks,
        targets_to_lists,
    )

    ds, ch, nc = make_datasets(args)
    loader = Loader(ds, args.batch, max_gt=args.max_gt, prefetch=2)

    loss_fn = decode_fn = None
    if args.model == "yolox":
        # same wiring as Trainer(model_kind='yolox'): SimOTA loss for the
        # val-loss metric, obj*cls decode into the shared postprocess
        from yolo_scratch_tpu.losses.simota import YOLOXLossConfig
        from yolo_scratch_tpu.models.yolox import YOLOXModel, yolox_eval_decode
        from yolo_scratch_tpu.train.steps import yolox_loss_adapter

        yx_scale = {"n": "nano", "x": "x"}.get(args.scale, args.scale)
        model = YOLOXModel.from_scale(yx_scale, nc=nc)
        loss_fn = yolox_loss_adapter(
            YOLOXLossConfig(nc=nc, strides=tuple(model.strides)))
        decode_fn = lambda feats: yolox_eval_decode(  # noqa: E731
            feats, nc, tuple(model.strides))
    else:
        model = build_yolo11(args.cfg, ch=ch, nc=nc, scale=args.scale)
    state = create_train_state(
        model, jax.random.PRNGKey(0),
        np.zeros((1, args.imgsz, args.imgsz, ch), np.float32), make_optimizer(),
        use_ema=args.ema,
    )
    if args.torch_ckpt:
        from yolo_scratch_tpu.utils.torch_import import load_reference_checkpoint

        params, batch_stats = load_reference_checkpoint(args.torch_ckpt)
        state = state.replace(params=params, batch_stats=batch_stats)
    elif args.ckpt:
        from yolo_scratch_tpu.train.checkpoints import CheckpointManager

        state, _, _, _ = CheckpointManager(args.ckpt).try_resume(state, name=args.which)

    device_match = not args.host_match
    need_lists = args.cda or args.host_match
    loss_cfg = DetectionLossConfig(nc=model.nc, strides=model.strides)
    step = make_eval_step(
        model, loss_cfg, conf_threshold=args.conf, iou_threshold=args.iou,
        use_ema=args.ema, loss_fn=loss_fn, decode_fn=decode_fn,
        match_thresholds=DEFAULT_THRESHOLDS if device_match else None,
        per_class=(args.per_class or args.coco_summary) and device_match,
    )

    all_preds, all_targets = [], []
    marks, marks_cls, det_scores, det_labels, det_valid = [], [], [], [], []
    gt_label_list, gt_mask_list = [], []
    det_boxes, gt_box_list = [], []  # --coco-summary: raw boxes for band marks
    n_gt = 0
    losses = []
    for i, batch in enumerate(loader):
        if args.max_batches is not None and i >= args.max_batches:
            break
        out = step(state, batch)
        metrics, (boxes, scores, labels, valid) = out[0], out[1]
        losses.append(float(metrics["loss"]))
        sv = np.asarray(batch.get("sample_valid", np.ones(batch["img"].shape[0], bool)))
        if device_match:
            marks.append(np.asarray(out[2])[sv])
            if args.per_class or args.coco_summary:
                marks_cls.append(np.asarray(out[3])[sv])
            det_scores.append(np.asarray(scores)[sv])
            det_labels.append(np.asarray(labels)[sv])
            det_valid.append(np.asarray(valid)[sv])
            gt_label_list.append(np.asarray(batch["gt_labels"])[sv])
            gt_mask_list.append(np.asarray(batch["gt_mask"])[sv])
            n_gt += int(np.asarray(batch["gt_mask"])[sv].sum())
            if args.coco_summary:
                det_boxes.append(np.asarray(boxes)[sv])
                gt_box_list.append(np.asarray(batch["gt_bboxes"])[sv])
        if need_lists:
            preds = detections_to_lists(boxes, scores, labels, valid)
            targets = targets_to_lists(
                batch["gt_labels"], batch["gt_bboxes"], batch["gt_mask"])
            all_preds.extend(pr for pr, ok in zip(preds, sv) if ok)
            all_targets.extend(t for t, ok in zip(targets, sv) if ok)

    out = {"loss": float(np.mean(losses)) if losses else float("nan")}
    class_names = getattr(ds, "class_names", None)
    if device_match:
        if marks:
            out.update(metrics_from_marks(
                np.concatenate(marks), np.concatenate(det_scores),
                np.concatenate(det_valid), n_gt))
        else:
            out.update({"precision": 0.0, "recall": 0.0, "mAP50": 0.0, "mAP50-95": 0.0})
        if args.per_class and marks_cls:
            per = per_class_from_marks(
                np.concatenate(marks_cls), np.concatenate(det_scores),
                np.concatenate(det_labels), np.concatenate(det_valid),
                np.concatenate(gt_label_list), np.concatenate(gt_mask_list),
                nc, class_names=class_names)
            out.update({f"class/{name}/{k}": v for name, d in per.items()
                        for k, v in d.items()})
        if args.coco_summary and marks:
            from yolo_scratch_tpu.ops.matching import batched_tp_marks_area
            from yolo_scratch_tpu.utils.metrics import (
                COCO_AREA_BANDS,
                coco_summary_from_marks,
            )

            # band membership is by PIXEL area at eval resolution (boxes are
            # normalized; COCO proper uses native-resolution areas)
            pb = np.concatenate(det_boxes) * float(args.imgsz)
            gbx = np.concatenate(gt_box_list) * float(args.imgsz)
            pv = np.concatenate(det_valid)
            gmk = np.concatenate(gt_mask_list)
            bands = {}
            chunk = 256  # bounds the vmapped (N, G) IoU working set
            for name, (lo, hi) in COCO_AREA_BANDS.items():
                tp_parts, ign_parts = [], []
                n_gt_b = 0
                for s in range(0, pb.shape[0], chunk):
                    tp_c, ign_c, n_c = batched_tp_marks_area(
                        pb[s:s + chunk], pv[s:s + chunk],
                        gbx[s:s + chunk], gmk[s:s + chunk], lo, hi)
                    tp_parts.append(np.asarray(tp_c))
                    ign_parts.append(np.asarray(ign_c))
                    n_gt_b += n_c
                bands[name] = (
                    np.concatenate(tp_parts), np.concatenate(ign_parts), n_gt_b)
            summary = coco_summary_from_marks(
                np.concatenate(marks), np.concatenate(det_scores), pv,
                n_gt, bands)
            if marks_cls:
                from yolo_scratch_tpu.utils.metrics import (
                    coco_strict_ap_from_marks,
                )

                # the real pycocotools headline: per-class AP averaged
                # over classes with GTs (category-aware matching)
                summary.update(coco_strict_ap_from_marks(
                    np.concatenate(marks_cls), np.concatenate(det_scores),
                    np.concatenate(det_labels), pv,
                    np.concatenate(gt_label_list), gmk, nc))
            out.update({f"coco/{k}": v for k, v in summary.items()})
    else:
        out.update(evaluate_detections(
            all_preds, all_targets, conf_threshold=args.conf))
        if args.per_class:
            per = evaluate_per_class(
                all_preds, all_targets, nc, conf_threshold=args.conf,
                class_names=class_names)
            out.update({f"class/{name}/{k}": v for name, d in per.items()
                        for k, v in d.items()})
    if args.cda:
        out.update({f"cda/{k}": v for k, v in evaluate_cda_full(all_preds, all_targets).items()})
    print(json.dumps(out))
    return out


def cli(argv=None):
    """Console-script entry: run main() and discard its return value.

    setuptools entry points pass main()'s return to sys.exit(); main()
    returns a result object for programmatic use, which would make every
    successful run exit with status 1. This wrapper keeps exit status 0.
    """
    main(argv)


if __name__ == "__main__":
    cli()
