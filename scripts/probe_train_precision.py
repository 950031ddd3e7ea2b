"""A/B the train step's matmul precision on hardware.

The 640/60-epoch H2H closed its training-side accuracy gap by switching
the f32 train step from the MXU's default bf16-pass matmuls to
``jax.default_matmul_precision("highest")`` (docs/H2H.md,
H2H640_60ep_hp.json). That experiment ran at B=8 on a host-bound loop,
so the precision setting's DEVICE cost was invisible. This probe prices
the knob at the training headline operating point (YOLO11n @640, B=128):
the same train step compiled at each precision, one process, each variant
one jitted ``lax.scan`` of K steps (tunnel dispatch divides away; sync by
fetching bytes — the axon gotcha).

Variants:
  f32-default : f32 params/activations, MXU default (one bf16 pass per
                matmul) — what the default H2H arm trained with
  f32-high    : bf16x3 passes — candidate accuracy default
  f32-highest : true f32 (bf16x6) — the arm that matched the reference
  bf16-default: mixed-precision headline (the recorded 1,225 img/s)

Usage: python scripts/probe_train_precision.py [--batch 128] [--k 8]
Writes /tmp/train_precision.json.
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
from jax import lax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--k", type=int, default=8, help="in-jit step repeats")
    ap.add_argument("--reps", type=int, default=3, help="timed launches")
    ap.add_argument("--variants",
                    default="f32-default,f32-high,f32-highest,bf16-default")
    ap.add_argument("--out", default="/tmp/train_precision.json")
    args = ap.parse_args()

    from yolo_scratch_tpu.losses.v8_loss import DetectionLossConfig
    from yolo_scratch_tpu.models.builder import build_yolo11
    from yolo_scratch_tpu.train.optim import make_optimizer
    from yolo_scratch_tpu.train.state import create_train_state
    from yolo_scratch_tpu.train.steps import build_train_step_custom, v8_loss_adapter

    img, ch, nc, G = args.imgsz, 1, 5, 24
    B, K = args.batch, args.k
    model = build_yolo11(
        str(Path(__file__).parent.parent / "yolo_scratch_tpu/configs/yolo11_crater.yaml"),
        ch=ch, nc=nc, scale="n",
    )
    cfg = DetectionLossConfig(nc=nc, strides=model.strides)
    loss_fn = v8_loss_adapter(cfg)

    rng = np.random.RandomState(0)
    cx, cy = rng.rand(B, G) * img, rng.rand(B, G) * img
    w, h = rng.rand(B, G) * 100 + 8, rng.rand(B, G) * 100 + 8
    batch = {
        "img": rng.rand(B, img, img, ch).astype(np.float32),
        "gt_labels": rng.randint(0, nc, (B, G)).astype(np.int32),
        "gt_bboxes": np.stack(
            [np.clip(cx - w / 2, 0, img), np.clip(cy - h / 2, 0, img),
             np.clip(cx + w / 2, 0, img), np.clip(cy + h / 2, 0, img)], -1
        ).astype(np.float32),
        "gt_mask": (rng.rand(B, G) > 0.5),
    }
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    state0 = create_train_state(
        model, jax.random.PRNGKey(0), np.zeros((1, img, img, ch), np.float32),
        make_optimizer(1e-3), use_ema=True,
    )

    VARIANTS = {
        "f32-default": dict(compute_dtype=None, matmul_precision=None),
        "f32-high": dict(compute_dtype=None, matmul_precision="high"),
        "f32-highest": dict(compute_dtype=None, matmul_precision="highest"),
        "bf16-default": dict(compute_dtype=jnp.bfloat16, matmul_precision=None),
    }

    results = {}
    for name in args.variants.split(","):
        kw = VARIANTS[name]
        step = build_train_step_custom(model, loss_fn, **kw)

        # batch as jit ARGUMENT (a closure-captured 419 MB image tensor
        # becomes a compile-payload constant -> tunnel HTTP 413)
        @jax.jit
        def run(state, b, step=step):
            def one(st, _):
                st, m = step(st, b)
                return st, m["loss"]

            return lax.scan(one, state, None, length=K)

        print(f"[{name}] compiling...", flush=True)
        t0 = time.perf_counter()
        st, losses = run(state0, batch)
        np.asarray(losses)
        print(f"[{name}] compile+first: {time.perf_counter() - t0:.0f}s "
              f"loss={float(losses[-1]):.3f}", flush=True)
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            st, losses = run(st, batch)
            np.asarray(losses)  # sync via bytes (block_until_ready lies)
            best = min(best, (time.perf_counter() - t0) / K)
        results[name] = {"ms_per_step": best * 1e3, "img_per_s": B / best,
                         "loss_last": float(losses[-1])}
        print(f"[{name}] {best * 1e3:8.2f} ms/step  ({B / best:,.0f} img/s)",
              flush=True)

    out = {"batch": B, "imgsz": img, "scale": "n", "k": K, "results": results}
    Path(args.out).write_text(json.dumps(out, indent=2))
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
