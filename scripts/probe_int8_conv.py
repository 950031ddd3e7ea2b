"""A/B int8 vs bf16 conv throughput on the TPU at deploy-relevant shapes.

Decides whether the int8 PTQ tier (nn/quant.py) buys serving throughput:
v5e peak is 394 int8 TOPS vs 197 bf16 TFLOPS, but the win only lands if
XLA lowers s8xs8->s32 conv onto the MXU at these channel widths (and the
quantize/dequantize epilogues fuse away). Times an in-jit lax.scan repeat
loop per shape (CLAUDE.md: per-launch tunnel dispatch ~5 ms must be
amortized).

Run: python scripts/probe_int8_conv.py [--batch 128] [--reps 30]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


# (H, W, Cin, Cout, k, stride): yolo11 n- and s-scale hot conv shapes at 640
SHAPES = [
    (160, 160, 32, 64, 3, 2),    # n stem downsample
    (80, 80, 64, 128, 3, 2),
    (80, 80, 32, 32, 3, 1),      # n bottleneck 3x3
    (40, 40, 64, 64, 3, 1),
    (20, 20, 128, 128, 3, 1),
    (40, 40, 128, 128, 3, 1),    # s bottleneck 3x3 (2x channels)
    (20, 20, 256, 256, 3, 1),
]

# m/l/x-scale hot shapes (widths 1.0/1.0/1.5, max_channels 512): these
# convs are MXU-bound, not HBM-bound like the n/s set, so int8's 2x MXU
# rate has something to accelerate — the QUANT.md gating question at the
# scales where the answer could flip. (--wide)
SHAPES_WIDE = [
    (80, 80, 128, 128, 3, 1),    # m P3 bottleneck
    (40, 40, 256, 256, 3, 1),    # m P4
    (20, 20, 512, 512, 3, 1),    # m/l P5
    (80, 80, 192, 192, 3, 1),    # x P3 (width 1.5)
    (40, 40, 384, 384, 3, 1),    # x P4
    (20, 20, 768, 768, 3, 1),    # x P5
]


def time_fn(fn, x, reps):
    """In-jit scan repeat; sync by fetching bytes (axon block_until_ready lies).

    The conv output shape differs from its input (stride / channel change),
    so the scan carries a scalar accumulator instead of the activation; a
    per-iteration input perturbation stops XLA hoisting the conv out of the
    loop (same pattern as probe_conv_perf.make_conv_loop). The jnp.sum
    epilogue re-reads y once per iter — identical cost on both arms.
    """

    @jax.jit
    def loop(x):
        def body(acc, c):
            y = fn((x + c.astype(x.dtype)) if x.dtype != jnp.int8
                   else (x ^ (c & 1).astype(jnp.int8)))
            return acc + jnp.sum(y.astype(jnp.float32)), None
        acc, _ = jax.lax.scan(body, 0.0, jnp.arange(reps, dtype=jnp.int32))
        return acc

    np.asarray(loop(x))  # warm + sync
    t0 = time.perf_counter()
    acc = loop(x)
    np.asarray(acc)
    return (time.perf_counter() - t0) / reps


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--reps", type=int, default=30)
    p.add_argument("--wide", action="store_true",
                   help="probe the m/l/x-scale (MXU-bound) shape set")
    args = p.parse_args()

    print(f"backend: {jax.default_backend()}", file=sys.stderr)
    rows = []
    for (H, W, ci, co, k, s) in (SHAPES_WIDE if args.wide else SHAPES):
        B = args.batch
        rng = np.random.RandomState(0)
        x_bf = jnp.asarray(rng.randn(B, H, W, ci), jnp.bfloat16)
        w_bf = jnp.asarray(rng.randn(k, k, ci, co) * 0.1, jnp.bfloat16)
        x_i8 = jnp.asarray(rng.randint(-127, 128, (B, H, W, ci)), jnp.int8)
        w_i8 = jnp.asarray(rng.randint(-127, 128, (k, k, ci, co)), jnp.int8)
        s_w = jnp.asarray(rng.rand(co).astype(np.float32) * 0.01)

        conv = partial(
            jax.lax.conv_general_dilated,
            window_strides=(s, s), padding=[(k // 2, k // 2)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

        def f_bf16(x):
            return jax.nn.silu(conv(x, w_bf))

        def f_int8(x):
            # deploy-shaped: int8 conv -> s32 -> dequant+SiLU -> requantize
            # (the requantize stands in for the next block's x/s_act)
            y = conv(x, w_i8, preferred_element_type=jnp.int32)
            y = jax.nn.silu(y.astype(jnp.float32) * (0.01 * s_w))
            return jnp.clip(jnp.round(y * 12.7), -127, 127).astype(jnp.int8)

        t_bf = time_fn(f_bf16, x_bf, reps=args.reps)
        t_i8 = time_fn(f_int8, x_i8, reps=args.reps)
        flops = 2 * B * (H // s) * (W // s) * ci * co * k * k
        row = {
            "shape": f"{H}x{W}x{ci}->{co} k{k}s{s}",
            "bf16_ms": round(t_bf * 1e3, 3),
            "int8_ms": round(t_i8 * 1e3, 3),
            "speedup": round(t_bf / t_i8, 2),
            "bf16_tflops": round(flops / t_bf / 1e12, 1),
            "int8_tops": round(flops / t_i8 / 1e12, 1),
        }
        rows.append(row)
        print(row, file=sys.stderr)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
