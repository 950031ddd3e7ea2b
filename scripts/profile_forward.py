"""Capture a device trace of the deploy-path forward and print top ops.

Writes an xplane trace via jax.profiler and parses it with
jax._src.profiler.ProfileData — no TensorBoard needed. Prints the top-N
TPU ops by total self-duration so optimization aims at measured hot spots.

Usage: python scripts/profile_forward.py [--batch 128] [--top 40] [--full]
"""

from __future__ import annotations

import argparse
import glob
import sys
import time
from collections import defaultdict
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
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--full", action="store_true",
                    help="profile the full infer (incl. postprocess), not just forward")
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    from yolo_scratch_tpu.models.builder import build_yolo11
    from yolo_scratch_tpu.nn.fuse import fuse_conv_bn
    from yolo_scratch_tpu.ops.decode import postprocess_from_feats

    img, ch, nc = args.imgsz, 1, 5
    B = args.batch
    model = build_yolo11(
        str(Path(__file__).parent.parent / "yolo_scratch_tpu/configs/yolo11_crater.yaml"),
        ch=ch, nc=nc, scale="n",
    )
    variables = model.init(jax.random.PRNGKey(0), np.zeros((1, img, img, ch), np.float32))
    variables = fuse_conv_bn(variables)
    variables = {
        "params": jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), variables["params"]),
        "batch_stats": variables["batch_stats"],
    }
    x = jnp.asarray(np.random.RandomState(0).rand(B, img, img, ch), jnp.float32)

    if args.full:
        @jax.jit
        def fn(v, x):
            feats = model.apply(v, x.astype(jnp.bfloat16), train=False)
            return postprocess_from_feats(
                [f.astype(jnp.float32) for f in feats],
                nc=nc, strides=tuple(float(s) for s in model.strides), img_size=img,
                conf_threshold=0.25, iou_threshold=0.45, max_det=300,
                pre_nms_topk=512, nms_impl="xla")
    else:
        @jax.jit
        def fn(v, x):
            feats = model.apply(v, x.astype(jnp.bfloat16), train=False)
            return sum(jnp.sum(f.astype(jnp.float32)) for f in feats)

    def sync(out):
        return [np.asarray(o) for o in jax.tree_util.tree_leaves(out)]

    print("compiling...", flush=True)
    sync(fn(variables, x))  # compile + warmup
    sync(fn(variables, x))
    print("tracing...", flush=True)

    trace_dir = "/tmp/yst_trace"
    with jax.profiler.trace(trace_dir):
        out = None
        for _ in range(args.iters):
            out = fn(variables, x)
        sync(out)

    print("parsing...", flush=True)
    # parse the newest xplane file
    paths = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))
    if not paths:
        print("no xplane produced — tracing unsupported under this runtime?")
        return
    from jax._src.profiler import ProfileData

    data = ProfileData.from_file(paths[-1])
    ops = defaultdict(float)
    nlines = 0
    for plane in data.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        for line in plane.lines:
            nlines += 1
            for ev in line.events:
                dur = (ev.end_ns - ev.start_ns) / 1e6  # ms
                ops[ev.name] += dur
    total = sum(ops.values())
    print(f"plane lines: {nlines}; total op-time {total:.2f} ms over {args.iters} iters "
          f"({total / args.iters:.2f} ms/iter)", flush=True)
    for name, dur in sorted(ops.items(), key=lambda kv: -kv[1])[: args.top]:
        print(f"{dur / args.iters:9.3f} ms/iter  {name[:140]}")


if __name__ == "__main__":
    main()
