"""Single-image (B=1) serving latency of the full deploy path.

BASELINE.json tracks "NMS p50 latency"; the NMS kernel alone was measured
at 0.95 ms (Pallas, N=512). This completes the story with the end-to-end
B=1 latency of the deploy contract (uint8 in -> bf16 folded-BN forward ->
fused select-then-decode -> Pallas NMS -> detections), the number a
latency-sensitive serving deployment cares about.

Two measurements, following docs/PERF.md's tunnel methodology:

1. **Device latency** — a jitted ``lax.scan`` over N distinct single-image
   inputs; per-iteration wall / N. On a TPU core scan iterations execute
   sequentially (one program, one core), so at B=1 per-iter time == the
   pipeline's device latency; amortizing N iterations over one launch
   removes the axon tunnel's ~5 ms RPC dispatch from the measurement
   (a real host pays ~0.1 ms).
2. **Per-launch host-visible latency** — p50/p99 across K single launches.
   Over the tunnel this is dominated by RPC dispatch and is reported only
   with that caveat; on a real v5e host, expect (1) + ~0.1 ms.

Usage: python scripts/bench_latency.py [--scale n] [--iters 100]
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
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", default="n")
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--iters", type=int, default=100,
                    help="scan length for the device-latency measurement")
    ap.add_argument("--launches", type=int, default=50,
                    help="single launches for the host-visible distribution; "
                         "0 skips part 2 (each part costs a separate ~5-10 min "
                         "tunnel compile — split across processes if needed)")
    args = ap.parse_args()

    from yolo_scratch_tpu.models.builder import build_yolo11
    from yolo_scratch_tpu.nn.fuse import fuse_conv_bn
    from yolo_scratch_tpu.ops.decode import postprocess_from_feats

    img, ch, nc = args.imgsz, 1, 5
    model = build_yolo11(
        "yolo_scratch_tpu/configs/yolo11_crater.yaml", ch=ch, nc=nc,
        scale=args.scale)
    variables = model.init(
        jax.random.PRNGKey(0), np.zeros((1, img, img, ch), np.float32))
    variables = fuse_conv_bn(variables)
    variables = {
        "params": jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16), variables["params"]),
        "batch_stats": variables["batch_stats"],
    }

    def infer_one(v, x):  # x: (1, H, W, C) uint8
        xx = x.astype(jnp.bfloat16) / jnp.bfloat16(255.0)
        feats = model.apply(v, xx, train=False)
        # B=1 sits far below the ~B=32 Pallas/XLA NMS crossover -> pallas
        return postprocess_from_feats(
            feats, nc=nc, strides=tuple(float(s) for s in model.strides),
            img_size=img, conf_threshold=0.25, iou_threshold=0.45,
            max_det=300, pre_nms_topk=512, nms_impl="pallas", blocked_topk=0)

    def sync(out):
        return [np.asarray(o) for o in jax.tree_util.tree_leaves(out)]

    # -- 1. device latency: N sequential single-image pipelines, one launch
    @jax.jit
    def infer_scan(v, xs):  # xs: (N, 1, H, W, C)
        def body(_, x):
            return None, infer_one(v, x)

        _, outs = jax.lax.scan(body, None, xs)
        return outs

    xs = jnp.asarray(np.random.RandomState(0).randint(
        0, 256, (args.iters, 1, img, img, ch), dtype=np.uint8))
    sync(infer_scan(variables, xs))  # compile
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = infer_scan(variables, xs)
        sync(out)
        best = min(best, time.perf_counter() - t0)
    device_ms = best / args.iters * 1e3

    result = {
        "scale": args.scale,
        "imgsz": img,
        "device_latency_ms": round(device_ms, 3),
    }
    print(json.dumps(result))  # part 1 lands even if part 2's compile dies

    if args.launches > 0:
        # -- 2. host-visible per-launch latency (tunnel-inflated; caveat above)
        infer_single = jax.jit(infer_one)
        x1 = xs[0]
        sync(infer_single(variables, x1))  # compile
        sync(infer_single(variables, x1))
        laps = []
        for _ in range(args.launches):
            t0 = time.perf_counter()
            sync(infer_single(variables, x1))
            laps.append((time.perf_counter() - t0) * 1e3)
        laps = np.array(laps)
        result.update({
            "launch_p50_ms": round(float(np.percentile(laps, 50)), 3),
            "launch_p99_ms": round(float(np.percentile(laps, 99)), 3),
            "launch_note": "per-launch numbers include the axon tunnel's ~5 ms "
                           "RPC dispatch + output fetch; a real host pays "
                           "~0.1 ms over device_latency_ms",
        })
        print(json.dumps(result))


if __name__ == "__main__":
    main()
