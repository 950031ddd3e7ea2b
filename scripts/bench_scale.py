"""End-to-end inference throughput for any YOLO11 or YOLOX scale on the real chip.

Same deploy contract as bench.py (u8 input, bf16, BN folded, exact top-k),
parameterized by scale. YOLO11 uses the fused select-then-decode path;
YOLOX uses the generic decode + shared postprocess (the Predictor's exact
dispatch, infer.py). YOLOX defaults to the paper config (ch=3, nc=80).

Usage: python scripts/bench_scale.py [--scale s] [--batch 64] [--model yolox]
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

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parent.parent / ".jax_cache"))
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", default="s")
    ap.add_argument("--model", default="yolo11", choices=["yolo11", "yolox"])
    ap.add_argument("--cfg", default=None,
                    help="YOLO11 config yaml (default: crater ch=1 nc=5; "
                         "pass yolo11_coco.yaml with --ch 3 --nc 80 for the "
                         "north-star COCO shape)")
    ap.add_argument("--ch", type=int, default=None)
    ap.add_argument("--nc", type=int, default=None)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--nscan", type=int, default=4)
    args = ap.parse_args()

    from yolo_scratch_tpu.models.builder import build_yolo11
    from yolo_scratch_tpu.nn.fuse import fuse_conv_bn
    from yolo_scratch_tpu.ops.decode import postprocess, postprocess_from_feats

    img = args.imgsz
    B, S = args.batch, args.nscan
    if args.model == "yolox":
        from yolo_scratch_tpu.models.yolox import SCALES, YOLOXModel, yolox_eval_decode

        ch, nc = 3, 80  # the paper deploy config
        yx_scale = {"n": "nano", "x": "x"}.get(args.scale, args.scale)
        if yx_scale not in SCALES:
            raise SystemExit(
                f"unknown YOLOX scale {args.scale!r}; choose from "
                f"{sorted(SCALES)} (or 'n' for nano)"
            )
        model = YOLOXModel.from_scale(yx_scale, nc=nc)
    else:
        cfg = args.cfg or str(
            Path(__file__).parent.parent / "yolo_scratch_tpu/configs/yolo11_crater.yaml")
        ch = args.ch if args.ch is not None else (3 if "coco" in Path(cfg).name else 1)
        nc = args.nc if args.nc is not None else (80 if "coco" in Path(cfg).name else 5)
        model = build_yolo11(cfg, ch=ch, nc=nc, scale=args.scale)
    variables = model.init(jax.random.PRNGKey(0), np.zeros((1, img, img, ch), np.float32))
    variables = fuse_conv_bn(variables)
    variables = {
        "params": jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), variables["params"]),
        "batch_stats": variables["batch_stats"],
    }

    def infer_one(v, x):
        xx = x.astype(jnp.bfloat16) / jnp.bfloat16(255.0)
        feats = model.apply(v, xx, train=False)
        if args.model == "yolox":
            decoded = yolox_eval_decode(
                [f.astype(jnp.float32) for f in feats],
                nc, tuple(float(s) for s in model.strides))
            return postprocess(
                decoded, img_size=img, conf_threshold=0.25, iou_threshold=0.45,
                max_det=300, pre_nms_topk=512, nms_impl="xla")
        return postprocess_from_feats(
            feats, nc=nc, strides=tuple(float(s) for s in model.strides),
            img_size=img, conf_threshold=0.25, iou_threshold=0.45, max_det=300,
            pre_nms_topk=512, nms_impl="xla", blocked_topk=0)

    @jax.jit
    def infer(v, xs):
        def body(_, x):
            return None, infer_one(v, x)

        _, outs = jax.lax.scan(body, None, xs)
        return outs

    xs = jnp.asarray(np.random.RandomState(0).randint(
        0, 256, (S, B, img, img, ch), dtype=np.uint8))

    def sync(out):
        return [np.asarray(o) for o in jax.tree_util.tree_leaves(out)]

    sync(infer(variables, xs))
    sync(infer(variables, xs))

    iters = 6
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = infer(variables, xs)
        sync(out)
        best = min(best, time.perf_counter() - t0)

    n_params = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(variables["params"]))
    print(json.dumps({
        "model": args.model,
        "scale": args.scale, "batch": B, "imgsz": img, "params": n_params,
        "images_per_sec_per_chip": round(B * S * iters / best, 2),
    }))


if __name__ == "__main__":
    main()
