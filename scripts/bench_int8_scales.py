"""int8 vs bf16 end-to-end throughput at the wide scales (m/l/x), one process.

Round-4 found int8 is 0.65x bf16 at n-scale and the per-conv probes said
why: n/s convs are HBM-bound (15-52 effective TFLOPs), so the 2x int8 MXU
rate has nothing to accelerate (docs/QUANT.md). The same roofline argues
the tier should start paying at m/l/x channel widths, where convs run
MXU-bound. This measures that prediction end-to-end: for each scale, the
full deploy pipeline (u8 -> forward -> fused decode -> NMS, headline
protocol of bench.py/bench_scale.py) benched bf16 then int8 in the SAME
process on the same chip.

Run on a QUIET chip (docs gotcha: timings shared with another job are
polluted):
  python scripts/bench_int8_scales.py --scales m l x --out docs/bench_r5/int8_scales.json
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


def bench_one(scale: str, quant: bool, batch: int, nscan: int, img: int,
              ch: int, nc: int):
    from yolo_scratch_tpu.models.builder import build_yolo11
    from yolo_scratch_tpu.nn.fuse import fuse_conv_bn
    from yolo_scratch_tpu.ops.decode import postprocess_from_feats

    cfg = str(Path(__file__).parent.parent
              / "yolo_scratch_tpu/configs/yolo11_crater.yaml")
    model = build_yolo11(cfg, ch=ch, nc=nc, scale=scale)
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, img, img, ch), np.float32))
    variables = fuse_conv_bn(variables)
    variables = {
        "params": jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16), variables["params"]),
        "batch_stats": variables["batch_stats"],
    }
    if quant:
        from yolo_scratch_tpu.nn.quant import quantize_for_deploy

        calib = np.random.RandomState(1).randint(
            0, 256, (4, img, img, ch)).astype(np.float32) / 255.0
        variables = quantize_for_deploy(model, variables, [calib])

    def infer_one(v, x):
        xx = x.astype(jnp.bfloat16) / jnp.bfloat16(255.0)
        feats = model.apply(v, xx, train=False)
        return postprocess_from_feats(
            feats, nc=nc, strides=tuple(float(s) for s in model.strides),
            img_size=img, conf_threshold=0.25, iou_threshold=0.45,
            max_det=300, pre_nms_topk=512, nms_impl="xla", blocked_topk=0)

    @jax.jit
    def infer(v, xs):
        def body(_, x):
            return None, infer_one(v, x)

        _, outs = jax.lax.scan(body, None, xs)
        return outs

    xs = jnp.asarray(np.random.RandomState(0).randint(
        0, 256, (nscan, batch, img, img, ch), dtype=np.uint8))

    def sync(out):
        # tunnel gotcha: block_until_ready returns early; fetch bytes
        return [np.asarray(o) for o in jax.tree_util.tree_leaves(out)]

    t_c0 = time.perf_counter()
    sync(infer(variables, xs))
    compile_s = time.perf_counter() - t_c0
    sync(infer(variables, xs))

    iters = 6
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = infer(variables, xs)
        sync(out)
        best = min(best, time.perf_counter() - t0)
    return {
        "scale": scale, "dtype": "int8" if quant else "bf16",
        "batch": batch, "imgsz": img,
        "images_per_sec_per_chip": round(batch * nscan * iters / best, 2),
        "compile_s": round(compile_s, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", nargs="+", default=["m", "l", "x"])
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--nscan", type=int, default=4)
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--ch", type=int, default=1)
    ap.add_argument("--nc", type=int, default=5)
    ap.add_argument("--out", type=str, default="/tmp/int8_scales.json")
    args = ap.parse_args()

    rows = []
    for scale in args.scales:
        for quant in (False, True):
            r = bench_one(scale, quant, args.batch, args.nscan, args.imgsz,
                          args.ch, args.nc)
            print(json.dumps(r))
            rows.append(r)
    by_scale = {}
    for r in rows:
        by_scale.setdefault(r["scale"], {})[r["dtype"]] = r["images_per_sec_per_chip"]
    summary = {
        s: {**v, "int8_vs_bf16": round(v["int8"] / v["bf16"], 3)}
        for s, v in by_scale.items() if "int8" in v and "bf16" in v
    }
    out = {"rows": rows, "summary": summary,
           "protocol": f"u8->dets headline pipeline, B={args.batch} "
                       f"x{args.nscan}/launch @ {args.imgsz}, one process, "
                       "best-of-3 windows"}
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(json.dumps(out, indent=2))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
