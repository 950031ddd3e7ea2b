"""Price the deploy prefilter cap (pre_nms_topk) on hardware.

The fixed-shape postprocess needs a static candidate count K. K binds on
dense scenes (measured: 1476 above-conf candidates @640 on trained
weights — docs/H2H.md), so eval defaults to K=2048 while deploy keeps
K=512 for latency. This probe measures the throughput side of that
trade at the headline point (YOLO11n @640 B=128, bf16, exact selection),
all K variants compiled in ONE process (tunnel gotcha), each timed as a
jitted lax.scan over NSCAN batches like bench.py.

Usage: python scripts/probe_topk_cost.py [--topks 512,1024,2048]
Writes /tmp/topk_cost.json.
"""

from __future__ import annotations

import argparse
import json
import os
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
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--nscan", type=int, default=8)
    ap.add_argument("--topks", default="512,1024,2048")
    ap.add_argument("--nms", default="xla",
                    help="comma list of NMS impls to A/B (xla, tiled, pallas)")
    ap.add_argument("--conf", type=float, default=0.25,
                    help="conf threshold; 0.001 saturates the cap (dense "
                         "worst case — stresses tiled's data-dependent "
                         "fixpoint)")
    ap.add_argument("--out", default="/tmp/topk_cost.json")
    args = ap.parse_args()

    from yolo_scratch_tpu.models.builder import build_yolo11
    from yolo_scratch_tpu.nn.fuse import fuse_conv_bn
    from yolo_scratch_tpu.ops.decode import postprocess_from_feats

    img, ch, nc, B, nscan = args.imgsz, 1, 5, args.batch, args.nscan
    model = build_yolo11(
        str(Path(__file__).parent.parent / "yolo_scratch_tpu/configs/yolo11_crater.yaml"),
        ch=ch, nc=nc, scale="n")
    variables = model.init(jax.random.PRNGKey(0), np.zeros((1, img, img, ch), np.float32))
    variables = fuse_conv_bn(variables)
    variables = {
        "params": jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), variables["params"]),
        "batch_stats": variables["batch_stats"],
    }

    xs = jnp.asarray(np.random.RandomState(0).randint(
        0, 256, (nscan, B, img, img, ch), dtype=np.uint8))

    def sync(out):
        return [np.asarray(o) for o in out]

    results = {}
    for topk in (int(t) for t in args.topks.split(",")):
        for impl in args.nms.split(","):

            def infer_one(variables, x, topk=topk, impl=impl):
                xx = x.astype(jnp.bfloat16) / jnp.bfloat16(255.0)
                feats = model.apply(variables, xx, train=False)
                return postprocess_from_feats(
                    feats, nc=nc, strides=tuple(float(s) for s in model.strides),
                    img_size=img, conf_threshold=args.conf, iou_threshold=0.45,
                    max_det=300, pre_nms_topk=topk,
                    nms_impl=impl, blocked_topk=0)

            @jax.jit
            def infer(variables, xs, infer_one=infer_one):
                def body(_, x):
                    return None, infer_one(variables, x)

                return jax.lax.scan(body, None, xs)[1]

            tag = f"topk={topk} nms={impl}"
            print(f"[{tag}] compiling...", flush=True)
            sync(infer(variables, xs))
            sync(infer(variables, xs))
            iters, best_dt = 8, float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(iters):
                    out = infer(variables, xs)
                sync(out)
                best_dt = min(best_dt, time.perf_counter() - t0)
            ips = B * nscan * iters / best_dt
            results[f"{topk}/{impl}"] = {
                "img_per_s": round(ips, 1),
                "ms_per_batch": round(best_dt / (nscan * iters) * 1e3, 3)}
            print(f"[{tag}] {ips:,.0f} img/s", flush=True)

    out = {"batch": B, "imgsz": img, "nscan": nscan, "conf": args.conf,
           "results": results}
    Path(args.out).write_text(json.dumps(out, indent=2))
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
