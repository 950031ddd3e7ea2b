"""TPU conv micro-probes for the inference perf push.

Measures per-shape conv cost with an in-jit repeat loop (lax.scan over R
applications of the conv with varying bias, summed) so the per-dispatch
floor of the axon tunnel (~1 ms/call) divides away. A null row calibrates
that floor. int8 was probed in an earlier revision and was uniformly
SLOWER than bf16 at these small-channel shapes (XLA v5e falls off the
fast path), so it is dropped.

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

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parent.parent / ".jax_cache"))
import jax.numpy as jnp
from jax import lax

PEAK_BF16 = 197e12
HBM_BPS = 819e9
REPEAT = 16


def timed(fn, *args, iters=10, warmup=2):
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


def make_conv_loop(stride):
    """R conv applications inside one jit program; per-iteration input
    perturbation keeps XLA from hoisting the conv out of the scan."""

    @jax.jit
    def f(x, w):
        def body(acc, c):
            y = lax.conv_general_dilated(
                x + c, w, (stride, stride), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.bfloat16,
            )
            return acc + jnp.sum(y.astype(jnp.float32)), None

        acc, _ = lax.scan(body, 0.0, jnp.arange(REPEAT, dtype=x.dtype))
        return acc

    return f


# YOLO11n-crater forward conv shapes at 640 (H, W, Cin, Cout, k, s)
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

    print(f"devices: {jax.devices()}  batch={B}  repeat={REPEAT}", flush=True)

    # dispatch-floor calibration: a near-free jitted op
    null = jax.jit(lambda x: jnp.sum(x) * 1.0000001)
    t_null = timed(null, jnp.ones((8, 128), jnp.float32))
    print(f"dispatch floor (null jit call): {t_null * 1e3:.3f} ms", flush=True)

    print(f"{'layer':14s} {'H':>4s} {'ci':>4s} {'co':>4s} k s "
          f"{'ms/conv':>8s} {'%MXU':>6s} {'%HBM':>6s}", flush=True)
    for name, H, W, ci, co, k, s in SHAPES:
        x = jnp.asarray(rng.rand(B, H, W, ci), jnp.bfloat16)
        w = jnp.asarray(rng.rand(k, k, ci, co) * 0.1, jnp.bfloat16)
        f = make_conv_loop(s)
        t = timed(f, x, w) / REPEAT
        flops = 2 * B * (H // s) * (W // s) * ci * co * k * k
        bytes_moved = 2 * B * (H * W * ci + (H // s) * (W // s) * co)
        util = flops / t / PEAK_BF16 * 100
        hbm = bytes_moved / t / HBM_BPS * 100
        print(f"{name:14s} {H:4d} {ci:4d} {co:4d} {k} {s} "
              f"{t * 1e3:8.3f} {util:6.1f} {hbm:6.1f}", flush=True)

    # space-to-depth stem: 640x640x1 k3 s2 conv == 320x320x4 k2 s1 conv
    # over s2d-packed input (timing only, random weights)
    x1 = jnp.asarray(rng.rand(B, 640, 640, 1), jnp.bfloat16)
    w4 = jnp.asarray(rng.rand(2, 2, 4, 16) * 0.1, jnp.bfloat16)

    @jax.jit
    def s2d_stem(x, w):
        def body(acc, c):
            xs = (x + c).reshape(B, 320, 2, 320, 2, 1)
            xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(B, 320, 320, 4)
            y = lax.conv_general_dilated(
                xs, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.bfloat16,
            )
            return acc + jnp.sum(y.astype(jnp.float32)), None

        acc, _ = lax.scan(body, 0.0, jnp.arange(REPEAT, dtype=x.dtype))
        return acc

    t_s2d = timed(s2d_stem, x1, w4) / REPEAT
    print(f"stem space-to-depth (320x320x4 k2): {t_s2d * 1e3:8.3f} ms/conv", flush=True)


if __name__ == "__main__":
    main()
