"""TPU conv micro-probes for the inference perf push.

Answers, with measurements on the real chip:
  1. What do the individual YOLO11n conv shapes cost in bf16 (XLA conv),
     and what fraction of MXU peak is that?
  2. Does int8 conv (s8 x s8 -> s32 via lax.conv preferred_element_type)
     run at the expected ~2x bf16 rate, or does XLA fall back?
  3. Does a space-to-depth reformulation of the ch=1 stem help?

Usage: python scripts/probe_conv_perf.py [--batch 128]
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
import jax.numpy as jnp
from jax import lax

PEAK_BF16 = 197e12
PEAK_INT8 = 394e12


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


def conv_nhwc(x, w, stride=1, preferred=jnp.float32):
    return lax.conv_general_dilated(
        x, w, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=preferred,
    )


# YOLO11n-crater forward conv shapes at 640 (H, W, Cin, Cout, k, s) — the
# backbone/neck workhorses (from the builder's layer plan, n-scale ch=1).
SHAPES = [
    ("stem0", 640, 640, 1, 16, 3, 2),
    ("stem1", 320, 320, 16, 32, 3, 2),
    ("p2_c3k2_in", 160, 160, 32, 64, 3, 2),
    ("p3_conv", 80, 80, 64, 128, 3, 2),
    ("c3k2_1x1", 160, 160, 64, 64, 1, 1),
    ("bneck3x3_32", 160, 160, 32, 32, 3, 1),
    ("bneck3x3_64", 80, 80, 64, 64, 3, 1),
    ("head_p3", 80, 80, 64, 64, 3, 1),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    args = ap.parse_args()
    B = args.batch
    rng = np.random.RandomState(0)

    print(f"devices: {jax.devices()}  batch={B}")
    rows = []
    for name, H, W, ci, co, k, s in SHAPES:
        x = jnp.asarray(rng.rand(B, H, W, ci), jnp.bfloat16)
        w = jnp.asarray(rng.rand(k, k, ci, co) * 0.1, jnp.bfloat16)
        f = jax.jit(partial(conv_nhwc, stride=s, preferred=jnp.bfloat16))
        t_bf16 = timed(f, x, w)
        flops = 2 * B * (H // s) * (W // s) * ci * co * k * k
        util_bf16 = flops / t_bf16 / PEAK_BF16 * 100

        xi = jnp.asarray((rng.rand(B, H, W, ci) * 100).astype(np.int8))
        wi = jnp.asarray((rng.rand(k, k, ci, co) * 10).astype(np.int8))
        fi = jax.jit(partial(conv_nhwc, stride=s, preferred=jnp.int32))
        try:
            t_i8 = timed(fi, xi, wi)
            util_i8 = flops / t_i8 / PEAK_INT8 * 100
        except Exception as e:
            t_i8, util_i8 = float("nan"), float("nan")
            print(f"  int8 conv failed for {name}: {e}")
        rows.append((name, H, ci, co, k, s, t_bf16 * 1e3, util_bf16, t_i8 * 1e3, util_i8))

    print(f"{'layer':14s} {'H':>4s} {'ci':>4s} {'co':>4s} k s "
          f"{'bf16 ms':>8s} {'%peak':>6s} {'int8 ms':>8s} {'%peak':>6s}")
    for name, H, ci, co, k, s, tb, ub, ti, ui in rows:
        print(f"{name:14s} {H:4d} {ci:4d} {co:4d} {k} {s} {tb:8.3f} {ub:6.1f} {ti:8.3f} {ui:6.1f}")

    # space-to-depth stem: 640x640x1 k3 s2 conv == 320x320x4 k2 s1 conv
    # (each output pixel sees a 3x3 patch of the original = a 2x2 patch of
    # s2d cells with the right taps; implemented as k2 conv over 4 channels
    # with rearranged weights, here random weights — timing only)
    x1 = jnp.asarray(rng.rand(B, 640, 640, 1), jnp.bfloat16)

    def s2d_stem(x, w4):
        xs = x.reshape(B, 320, 2, 320, 2, 1).transpose(0, 1, 3, 2, 4, 5).reshape(B, 320, 320, 4)
        return conv_nhwc(xs, w4, stride=1, preferred=jnp.bfloat16)

    w4 = jnp.asarray(rng.rand(2, 2, 4, 16) * 0.1, jnp.bfloat16)
    t_s2d = timed(jax.jit(s2d_stem), x1, w4)
    print(f"\nstem space-to-depth (320x320x4 k2): {t_s2d * 1e3:8.3f} ms "
          f"(vs direct {rows[0][6]:.3f} ms)")


if __name__ == "__main__":
    main()
