"""Postprocess micro-probe: full decode+NMS pipeline cost per nms_impl.

bench_breakdown.py showed postprocess (conf filter + top-k + NMS + gather)
is ~40% of end-to-end inference at B=128. This times the full postprocess
on the real chip for each NMS backend on a worst-case candidate set (every
anchor above conf, as with the random-weight bench). Kept deliberately
small — each jit compile costs ~30-60 s over the axon tunnel.

Usage: python scripts/probe_postprocess.py [--batch 128] [--topk 512]
       [--impls xla,tiled,pallas]
"""

from __future__ import annotations

import argparse
import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parent.parent / ".jax_cache"))
import jax.numpy as jnp


def timed(fn, *args, iters=20, warmup=2):
    def sync(out):
        return [np.asarray(o) for o in jax.tree_util.tree_leaves(out)]

    for _ in range(warmup):
        sync(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--anchors", type=int, default=8400)
    ap.add_argument("--nc", type=int, default=5)
    ap.add_argument("--topk", type=int, default=512)
    ap.add_argument("--impls", type=str, default="xla,tiled")
    args = ap.parse_args()
    B, A, nc = args.batch, args.anchors, args.nc

    from yolo_scratch_tpu.ops.decode import postprocess

    rng = np.random.RandomState(0)
    # worst case: every candidate passes conf (random-weight bench regime)
    decoded = np.zeros((B, A, 4 + nc), np.float32)
    decoded[..., 0:2] = rng.rand(B, A, 2) * 640
    decoded[..., 2:4] = rng.rand(B, A, 2) * 60 + 4
    decoded[..., 4:] = rng.rand(B, A, nc) * 0.7 + 0.28
    decoded = jnp.asarray(decoded)

    print(f"devices: {jax.devices()}  B={B} A={A} topk={args.topk}", flush=True)

    for impl in args.impls.split(","):
        f = partial(
            postprocess, img_size=640, conf_threshold=0.25, iou_threshold=0.45,
            max_det=300, pre_nms_topk=args.topk, nms_impl=impl)
        t = timed(f, decoded)
        print(f"full_{impl}: {t * 1e3:7.3f} ms  "
              f"({B / t:8.1f} img/s postprocess-only)", flush=True)


if __name__ == "__main__":
    main()
