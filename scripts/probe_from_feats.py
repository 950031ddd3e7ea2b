"""A/B the fused postprocess: native-bf16 selection vs f32-upfront cast.

Both variants compiled and timed in one process on identical (B, A)-scale
random feats, so tunnel noise hits both equally.

Usage: python scripts/probe_from_feats.py [--batch 128]
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


def timed(fn, *args, iters=30, warmup=3):
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
    ap.add_argument("--trace", action="store_true")
    args = ap.parse_args()
    B, nc, reg_max, img = args.batch, 5, 16, 640
    strides = (8.0, 16.0, 32.0)
    no = nc + 4 * reg_max

    from yolo_scratch_tpu.ops.decode import postprocess_from_feats

    rng = np.random.RandomState(0)
    feats = [
        jnp.asarray(rng.randn(B, img // int(s), img // int(s), no).astype(np.float32)
                    ).astype(jnp.bfloat16)
        for s in strides
    ]
    print(f"devices: {jax.devices()}  B={B}", flush=True)

    f_native = jax.jit(partial(
        postprocess_from_feats, nc=nc, strides=strides, img_size=img,
        conf_threshold=0.25, iou_threshold=0.45, max_det=300, pre_nms_topk=512,
        nms_impl="xla", blocked_topk=0))

    def f32_first(fs, **kw):
        return postprocess_from_feats([f.astype(jnp.float32) for f in fs], **kw)

    f_cast = jax.jit(partial(
        f32_first, nc=nc, strides=strides, img_size=img,
        conf_threshold=0.25, iou_threshold=0.45, max_det=300, pre_nms_topk=512,
        nms_impl="xla", blocked_topk=0))

    t_n = timed(f_native, feats)
    print(f"native-bf16 selection: {t_n * 1e3:7.3f} ms", flush=True)

    if "--trace" in sys.argv:
        with jax.profiler.trace("/tmp/yst_trace_post"):
            out = None
            for _ in range(5):
                out = f_native(feats)
            [np.asarray(o) for o in jax.tree_util.tree_leaves(out)]
        print("trace written to /tmp/yst_trace_post", flush=True)
        return
    t_c = timed(f_cast, feats)
    print(f"f32-upfront cast:      {t_c * 1e3:7.3f} ms", flush=True)
    # exact topk for reference
    f_exact = jax.jit(partial(
        postprocess_from_feats, nc=nc, strides=strides, img_size=img,
        conf_threshold=0.25, iou_threshold=0.45, max_det=300, pre_nms_topk=512,
        nms_impl="xla", blocked_topk=0))
    t_e = timed(f_exact, feats)
    print(f"native + exact topk:   {t_e * 1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
