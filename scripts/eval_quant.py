"""bf16 vs int8 deploy-path accuracy on a trained checkpoint.

Measures the accuracy cost of the int8 PTQ tier (nn/quant.py) with the
deploy pipeline itself (BN-folded weights, fused select-then-decode,
exact candidate selection): same val split as the trainer (seeded
permutation, reference train_yolo11_cuda.py:494-505 semantics), host
greedy matcher for mAP. Prints one JSON line with both variants and the
deltas.

Run (the recipe-A/B checkpoint, CPU-friendly):
    python scripts/eval_quant.py --data /tmp/coco_synth600 \
        --ckpt runs/ab_recipe --which last --imgsz 320
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
import jax.numpy as jnp


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data", type=str, required=True)
    p.add_argument("--dataset", type=str, default="auto")
    p.add_argument("--cfg", type=str, default=str(
        Path(__file__).resolve().parent.parent
        / "yolo_scratch_tpu/configs/yolo11_crater.yaml"))
    p.add_argument("--scale", type=str, default="n")
    p.add_argument("--ckpt", type=str, required=True)
    p.add_argument("--which", type=str, default="last", choices=["best", "last"])
    p.add_argument("--imgsz", type=int, default=320)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--conf", type=float, default=0.25)
    p.add_argument("--iou", type=float, default=0.45)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--val-split", type=float, default=0.2)
    p.add_argument("--calib-batches", type=int, default=4)
    p.add_argument("--max-batches", type=int, default=None)
    p.add_argument("--no-ema", action="store_true",
                   help="serve raw params even if the checkpoint has EMA")
    p.add_argument("--cpu", action="store_true", help="force the CPU backend")
    p.add_argument("--nms", type=str, default="xla", choices=["xla", "pallas"],
                   help="NMS backend (keep-set-equal; xla avoids Pallas "
                        "interpret-mode cost on CPU runs)")
    args = p.parse_args(argv)

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from yolo_scratch_tpu.data.loader import Loader
    from yolo_scratch_tpu.infer import load_deploy_model
    from yolo_scratch_tpu.nn.fuse import fuse_conv_bn
    from yolo_scratch_tpu.nn.quant import count_quantized, quantize_for_deploy
    from yolo_scratch_tpu.ops.decode import postprocess_from_feats
    from yolo_scratch_tpu.train.checkpoints import CheckpointManager
    from yolo_scratch_tpu.train.cli import make_datasets
    from yolo_scratch_tpu.utils.metrics import (
        detections_to_lists,
        evaluate_detections,
        targets_to_lists,
    )

    ds, ch, nc = make_datasets(args)
    n = len(ds)
    idx = np.random.RandomState(args.seed).permutation(n)
    n_val = int(n * args.val_split)
    train_idx, val_idx = idx[: n - n_val], idx[n - n_val:]

    model, variables = load_deploy_model(
        args.cfg, scale=args.scale, imgsz=args.imgsz, ckpt=args.ckpt,
        which=args.which)
    if not args.no_ema:
        raw = CheckpointManager(args.ckpt).peek_raw(args.which)
        if raw is not None and raw.get("ema_params"):
            variables = {**variables, "params": raw["ema_params"]}
            print("using EMA params", file=sys.stderr)

    # variables are a jit ARGUMENT, never a closure: captured weights become
    # compile-payload constants and blow the tunnel's remote_compile size
    # limit (CLAUDE.md environment gotchas)
    @jax.jit
    def infer(v, x):
        feats = model.apply(v, x.astype(jnp.bfloat16), train=False)
        return postprocess_from_feats(
            feats, nc=model.nc,
            strides=tuple(float(s) for s in model.strides),
            reg_max=model.reg_max, img_size=args.imgsz,
            conf_threshold=args.conf, iou_threshold=args.iou,
            max_det=300, pre_nms_topk=512, class_aware=True,
            nms_impl=args.nms,
        )

    def deploy_vars(v):
        v = fuse_conv_bn(v)
        return {**v, "params": jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16), v["params"])}

    # calibration batches come from the TRAIN split (deploy-realistic:
    # no peeking at val data)
    calib_loader = Loader(ds, args.batch, indices=train_idx[: args.calib_batches * args.batch],
                          prefetch=0)
    calib = [b["img"] for b in calib_loader][: args.calib_batches]
    t0 = time.time()
    v_int8 = quantize_for_deploy(model, variables, calib)
    print(f"quantized {count_quantized(v_int8['quant'])} blocks "
          f"in {time.time() - t0:.1f}s", file=sys.stderr)

    variants = {"bf16": deploy_vars(variables), "int8": deploy_vars(v_int8)}
    results = {}
    for name, v in variants.items():
        loader = Loader(ds, args.batch, indices=val_idx, prefetch=2)
        all_preds, all_targets = [], []
        # the two variants' trees differ structurally (int8 mounts a
        # "quant" collection), so each variant's FIRST batch pays its own
        # jit compile — report it separately from the warm rate so a
        # compile-time difference can't masquerade as a throughput one
        # (round-3 QUANT_AB.json's unexplained 94.7s vs 13.0s)
        t0 = time.time()
        first_batch_s = None
        for i, batch in enumerate(loader):
            if args.max_batches is not None and i >= args.max_batches:
                break
            boxes, scores, labels, valid = infer(v, batch["img"])
            sv = np.asarray(batch["sample_valid"])
            preds = detections_to_lists(boxes, scores, labels, valid)
            if first_batch_s is None:  # detections_to_lists synced the fetch
                first_batch_s = time.time() - t0
            targets = targets_to_lists(
                batch["gt_labels"], batch["gt_bboxes"], batch["gt_mask"])
            all_preds.extend(pr for pr, ok in zip(preds, sv) if ok)
            all_targets.extend(t for t, ok in zip(targets, sv) if ok)
        total_s = time.time() - t0
        m = evaluate_detections(all_preds, all_targets, conf_threshold=args.conf)
        m["eval_s"] = round(total_s, 1)
        m["first_batch_s"] = round(first_batch_s or 0.0, 1)
        m["warm_eval_s"] = round(total_s - (first_batch_s or 0.0), 1)
        m["images"] = len(all_preds)
        results[name] = m
        print(f"{name}: {json.dumps(m)}", file=sys.stderr)

    out = {
        "which": args.which,
        "bf16": results["bf16"],
        "int8": results["int8"],
        "delta_mAP50": results["int8"]["mAP50"] - results["bf16"]["mAP50"],
        "delta_mAP50_95": results["int8"]["mAP50-95"] - results["bf16"]["mAP50-95"],
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
