"""Device-trace the jitted train step and print top ops.

Usage: python scripts/profile_train.py [--batch 64] [--imgsz 640]
Then:  python scripts/parse_trace.py --dir /tmp/yst_trace_train

NOTE: the wall-clock "train step: N ms" line is tunnel-artifacted —
passing a fresh ~300-leaf state pytree per step costs seconds of RPC
overhead under the axon tunnel (a real host does not pay this). The
honest number is the `jit_step` device span in the parsed trace
(87.9 ms at B=64 bf16 as of round 2).
"""

from __future__ import annotations

import argparse
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
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--scale", type=str, default="n")
    ap.add_argument("--bf16", action="store_true", default=True)
    ap.add_argument("--remat", action="store_true",
                    help="activation recompute (jax.checkpoint) in backward")
    ap.add_argument("--grad-accum", type=int, default=1)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--scan", type=int, default=0, metavar="K",
                    help="also time K train steps inside ONE jitted "
                         "lax.scan launch — the honest per-step wall time "
                         "under the tunnel (no per-step RPC overhead)")
    ap.add_argument("--no-trace", action="store_true")
    args = ap.parse_args()

    from yolo_scratch_tpu.losses.v8_loss import DetectionLossConfig
    from yolo_scratch_tpu.models.builder import build_yolo11
    from yolo_scratch_tpu.train.optim import make_optimizer
    from yolo_scratch_tpu.train.state import create_train_state
    from yolo_scratch_tpu.train.steps import build_train_step_custom, v8_loss_adapter

    img, ch, nc, G = args.imgsz, 1, 5, 24
    B = args.batch
    model = build_yolo11(
        str(Path(__file__).parent.parent / "yolo_scratch_tpu/configs/yolo11_crater.yaml"),
        ch=ch, nc=nc, scale=args.scale,
    )
    tx = make_optimizer(1e-3)
    state = create_train_state(
        model, jax.random.PRNGKey(0), np.zeros((1, img, img, ch), np.float32),
        tx, use_ema=True,
    )
    cfg = DetectionLossConfig(nc=nc, strides=model.strides)
    raw_step = build_train_step_custom(
        model, v8_loss_adapter(cfg),
        compute_dtype=jnp.bfloat16 if args.bf16 else None,
        remat=args.remat, grad_accum=args.grad_accum,
    )
    step = jax.jit(raw_step)

    rng = np.random.RandomState(0)
    nb = 3
    batch = {
        "img": rng.rand(B, img, img, ch).astype(np.float32),
        "gt_labels": rng.randint(0, nc, (B, G)).astype(np.int32),
        "gt_bboxes": np.abs(rng.rand(B, G, 4).astype(np.float32)) * 0.4 + 0.1,
        "gt_mask": (rng.rand(B, G) > 0.5),
    }
    # xywh-ish sane boxes in pixels
    cx = rng.rand(B, G) * img
    cy = rng.rand(B, G) * img
    w = rng.rand(B, G) * 100 + 8
    h = rng.rand(B, G) * 100 + 8
    batch["gt_bboxes"] = np.stack(
        [np.clip(cx - w / 2, 0, img), np.clip(cy - h / 2, 0, img),
         np.clip(cx + w / 2, 0, img), np.clip(cy + h / 2, 0, img)], -1
    ).astype(np.float32)

    print("compiling...", flush=True)
    s2, m = step(state, batch)
    m = {k: float(v) for k, v in m.items()}
    print("loss:", m.get("loss"), flush=True)

    def sync(st):
        np.asarray(jax.tree_util.tree_leaves(st.params)[0])

    sync(s2)
    t0 = time.perf_counter()
    s = s2
    for _ in range(args.iters):
        s, _ = step(s, batch)
    sync(s)
    dt = (time.perf_counter() - t0) / args.iters
    print(f"train step: {dt * 1e3:.1f} ms  ({B / dt:.1f} img/s)  "
          "[tunnel-artifacted; see --scan]", flush=True)

    if args.scan > 0:
        K = args.scan
        # same batch every step — timing is shape-driven, not data-driven

        @jax.jit
        def steps(st, b):
            # b as an ARGUMENT: a captured B@640 image tensor becomes a
            # compile-payload constant and blows the tunnel's
            # remote_compile size limit (CLAUDE.md environment gotchas)
            def body(st, _):
                st, m = raw_step(st, b)
                return st, m["loss"]

            return jax.lax.scan(body, st, None, length=K)

        s3, losses = steps(s2, batch)
        sync(s3)  # compile + warm
        t0 = time.perf_counter()
        s3, losses = steps(s3, batch)
        sync(s3)
        np.asarray(losses)
        dt = (time.perf_counter() - t0) / K
        # images consumed per step is B regardless of grad_accum:
        # build_train_step_custom SPLITS the given batch into k
        # microbatches (train/steps.py), it does not multiply it
        print(f"train step (in-jit scan x{K}): {dt * 1e3:.1f} ms  "
              f"({B / dt:.1f} img/s)", flush=True)

    if not args.no_trace:
        print("tracing...", flush=True)
        with jax.profiler.trace("/tmp/yst_trace_train"):
            for _ in range(args.iters):
                s, _ = step(s, batch)
            sync(s)
        print("trace written to /tmp/yst_trace_train", flush=True)


if __name__ == "__main__":
    main()
