"""A/B the optimizer update form inside the full train step, on hardware.

Three variants of the SAME train step (YOLO11n B=64 @640 bf16), one
process, each compiled as ONE jitted program that `lax.scan`-repeats the
step K times on-device (tunnel dispatch and host overheads divide away;
sync by fetching bytes per the axon gotcha):

  grads-only : fwd + loss + bwd, grads consumed by a single flat sum —
               the floor with no parameter update at all
  per-leaf   : clip + AdamW + EMA per parameter leaf (~300 small kernels)
  flat       : TrainState.flat_opt — one raveled (N,) master update

Motivation: the round-2/3 trace classifier buckets every param-shaped op
as "optimizer", but conv-weight/bias/BN gradient reductions have param-
shaped OUTPUTS too (their inputs are full activation tensors — HBM-bound
backward work that no optimizer change can remove). The wall-clock deltas
here are the ground truth the shape-bucket table cannot give.

Usage: python scripts/probe_opt_flat.py [--batch 64] [--imgsz 640] [--k 8]
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
from jax import lax
from jax.flatten_util import ravel_pytree


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--k", type=int, default=8, help="in-jit step repeats")
    ap.add_argument("--reps", type=int, default=3, help="timed launches")
    ap.add_argument("--variants", default="grads-only,per-leaf,flat",
                    help="comma-separated subset (e.g. just 'per-leaf' for a "
                         "throughput check at another batch size)")
    ap.add_argument("--remat", action="store_true",
                    help="activation rematerialization (required past B~128 "
                         "at 640 on one v5e chip — B=256 un-remat'd is a real "
                         "HBM OOM, measured)")
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

    def make_state(flat_opt):
        return create_train_state(
            model, jax.random.PRNGKey(0),
            np.zeros((1, img, img, ch), np.float32),
            make_optimizer(1e-3), use_ema=True, flat_opt=flat_opt,
        )

    def scanned(step):
        # NOTE: the batch must be a jit ARGUMENT, not a closure capture —
        # closed-over device arrays are embedded as constants in the
        # compile payload, and at B=256 the 419 MB image tensor blows the
        # axon tunnel's remote_compile size limit (HTTP 413). As an
        # argument it rides the normal transfer path instead.
        @jax.jit
        def run(state, b):
            def one(state, _):
                state, m = step(state, b)
                return state, m["loss"]

            state, losses = lax.scan(one, state, None, length=K)
            return state, losses

        return run

    step = build_train_step_custom(
        model, loss_fn, compute_dtype=jnp.bfloat16, remat=args.remat)

    # grads-only: byte-for-byte the build_train_step_custom forward/loss/
    # backward (bf16 compute, f32 masters/BN), with apply_gradients replaced
    # by a single flat-sum consume of the grads so nothing is DCE'd
    def make_grads_only():
        def step_go(state, b):
            def wrapped(params):
                p = jax.tree_util.tree_map(
                    lambda x: x.astype(jnp.bfloat16), params)
                x = b["img"].astype(jnp.bfloat16)
                feats, mutated = model.apply(
                    {"params": p, "batch_stats": state.batch_stats}, x,
                    train=True, mutable=["batch_stats"],
                )
                feats = jax.tree_util.tree_map(
                    lambda f: f.astype(jnp.float32), feats)
                total, metrics = loss_fn(feats, b)
                return total, (metrics, mutated["batch_stats"])

            (total, (_, new_bs)), grads = jax.value_and_grad(
                wrapped, has_aux=True)(state.params)
            new_bs = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.float32), new_bs)
            gsum = ravel_pytree(grads)[0].sum()
            return state.replace(
                step=state.step + 1 + jnp.isnan(gsum).astype(jnp.int32),
                batch_stats=new_bs,
            ), {"loss": total}

        return step_go

    wanted = set(args.variants.split(","))
    variants = [
        (n, s, st) for (n, s, st) in (
            ("grads-only", make_grads_only(), make_state(True)),
            ("per-leaf", step, make_state(False)),
            ("flat", step, make_state(True)),
        ) if n in wanted
    ]

    results = {}
    for name, stp, state in variants:
        run = scanned(stp)
        t0 = time.perf_counter()
        s2, losses = run(state, batch)
        np.asarray(losses)
        print(f"{name}: compiled in {time.perf_counter() - t0:.1f}s, "
              f"loss[0]={float(losses[0]):.2f} loss[-1]={float(losses[-1]):.2f}",
              flush=True)
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            s3, losses = run(state, batch)
            np.asarray(losses)  # sync via bytes (block_until_ready lies here)
            best = min(best, (time.perf_counter() - t0) / K)
        results[name] = (best, float(losses[-1]))
        print(f"{name}: {best * 1e3:8.2f} ms/step  ({B / best:,.0f} img/s)",
              flush=True)

    if {"grads-only", "per-leaf", "flat"} <= results.keys():
        go, pl, fl = (results[k][0] for k in ("grads-only", "per-leaf", "flat"))
        print(f"\nupdate cost per-leaf: {(pl - go) * 1e3:6.2f} ms | "
              f"flat: {(fl - go) * 1e3:6.2f} ms | "
              f"flat win: {(pl - fl) * 1e3:6.2f} ms")
        if abs(results["per-leaf"][1] - results["flat"][1]) > 1e-3 * max(
                abs(results["per-leaf"][1]), 1.0):
            print("NOTE: per-leaf vs flat final losses differ "
                  f"({results['per-leaf'][1]:.1f} vs {results['flat'][1]:.1f}) "
                  "— bf16 reduction-order noise amplified over K chaotic "
                  "steps from random init; tests/test_flat_opt.py pins f32 "
                  "equivalence")


if __name__ == "__main__":
    main()
