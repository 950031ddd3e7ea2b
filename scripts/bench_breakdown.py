"""Stage-level breakdown of the headline inference benchmark.

Times, on the real chip, each piece of the deploy path separately:
  forward            model apply only (bf16, BN-folded)
  forward+decode     + DFL decode to (B, A, 4+nc)
  full               + confidence filter + NMS (the bench.py path)
  postprocess        decode+NMS alone on a precomputed forward output

plus per-section forward splits (backbone / neck / head) so optimization
work aims at the right stage. Prints one JSON object.

Usage: python scripts/bench_breakdown.py [--batch 128] [--imgsz 640]
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


def timed(fn, *args, iters=20, warmup=2):
    """Mean seconds/iter with honest sync (fetch output bytes — under the
    axon tunnel block_until_ready returns early; utils/profiling.time_fn)."""
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
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from yolo_scratch_tpu.models.builder import build_yolo11
    from yolo_scratch_tpu.nn.fuse import fuse_conv_bn
    from yolo_scratch_tpu.ops.decode import postprocess

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

    # Large outputs must be reduced to scalars INSIDE jit: under the axon
    # tunnel the honest sync is fetching output bytes, and fetching 100+ MB
    # of raw feature maps would time the tunnel, not the chip.
    @jax.jit
    def forward(v, x):
        feats = model.apply(v, x.astype(jnp.bfloat16), train=False)
        return sum(jnp.sum(f.astype(jnp.float32)) for f in feats)

    @jax.jit
    def forward_decode(v, x):
        feats = model.apply(v, x.astype(jnp.bfloat16), train=False)
        return jax.tree_util.tree_map(
            jnp.sum, model.decode([f.astype(jnp.float32) for f in feats]))

    @jax.jit
    def forward_decode_raw(v, x):
        feats = model.apply(v, x.astype(jnp.bfloat16), train=False)
        return model.decode([f.astype(jnp.float32) for f in feats])

    def _post(decoded):
        return postprocess(decoded, img_size=img, conf_threshold=0.25,
                           iou_threshold=0.45, max_det=300, pre_nms_topk=512,
                           nms_impl="xla")

    @jax.jit
    def full(v, x):
        return _post(forward_decode_raw.__wrapped__(v, x))

    decoded = forward_decode_raw(variables, x)
    decoded = jax.block_until_ready(decoded)

    res = {}
    res["forward_ms"] = timed(forward, variables, x, iters=args.iters) * 1e3
    res["forward_decode_ms"] = timed(forward_decode, variables, x, iters=args.iters) * 1e3
    res["full_ms"] = timed(full, variables, x, iters=args.iters) * 1e3
    res["postprocess_ms"] = timed(_post, decoded, iters=args.iters) * 1e3
    res["decode_ms_est"] = res["forward_decode_ms"] - res["forward_ms"]
    res["batch"] = B
    res["imgsz"] = img
    res["full_imgs_per_sec"] = B / (res["full_ms"] / 1e3)
    res["forward_imgs_per_sec"] = B / (res["forward_ms"] / 1e3)

    # FLOPs-based MXU utilization estimate for the forward pass
    try:
        analysis = forward.lower(variables, x).compile().cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        flops = float(analysis.get("flops", 0.0))
        res["xla_flops_per_batch"] = flops
        peak = 197e12  # v5e bf16 peak
        res["mxu_utilization_pct"] = 100.0 * flops / (res["forward_ms"] / 1e3) / peak
    except Exception as e:  # cost_analysis availability varies by backend
        res["cost_analysis_error"] = str(e)

    print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v) for k, v in res.items()}))


if __name__ == "__main__":
    main()
