"""A/B: 1x1-conv-over-concat vs split-weight sum-of-matmuls, fwd+bwd.

The round-3 train roofline (docs/PERF.md) leaves 12.5 ms/step of
layout/copy work, attributed to concat materializations in the CSP-style
blocks (C2f/C3k2/C3k/SPPF tails, neck joins) and their backward splits.
Every one of those concats feeds a 1x1 conv, and

    conv1x1(concat(p_1..p_k), W) == sum_i conv1x1(p_i, W_i)

with W split along its input-channel axis — exact contraction over the
same elements, no concatenated buffer ever materialized (forward), and
the backward produces per-part input grads directly instead of slicing
a concatenated dgrad.

This probe times both formulations (plus BN-in-train-mode + SiLU + a
residual consumer so XLA sees realistic fusion context) at the C3k2 tail
shapes of YOLO11n @640 B=64, fwd+bwd, in-jit lax.scan repeats, one
process (per the axon tunnel methodology in docs/PERF.md).

Usage: python scripts/probe_concat_conv.py [--batch 64] [--k 32] [--reps 3]
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

# (tag, H/W, per-part channels, n_parts, c_out) — the C3k2/C2f tails and
# the SPPF tail of YOLO11n @640 (builder widths, scale n), plus one
# s-scale row to read the width trend.
SHAPES = [
    ("l2_tail_n", 160, 16, 3, 64),
    ("l4_tail_n", 80, 32, 3, 128),
    ("l6_tail_n", 40, 64, 3, 128),
    ("l8_tail_n", 20, 128, 3, 256),
    ("sppf_n", 20, 128, 4, 256),
    ("l6_tail_s", 40, 128, 3, 256),
]


def run_probe(name, B, H, cs, k_parts, cout, K, reps, dtype=jnp.bfloat16):
    rng = np.random.RandomState(0)
    parts = [jnp.asarray(rng.randn(B, H, H, cs).astype(np.float32), dtype=dtype)
             for _ in range(k_parts)]
    cin = cs * k_parts
    W = jnp.asarray(rng.randn(cin, cout).astype(np.float32) / np.sqrt(cin),
                    dtype=dtype)
    scale = jnp.ones((cout,), jnp.float32)
    bias = jnp.zeros((cout,), jnp.float32)

    def bn_silu(y):
        # train-mode BN: batch stats over (B,H,W), then affine + SiLU
        m = jnp.mean(y.astype(jnp.float32), axis=(0, 1, 2))
        v = jnp.mean(jnp.square(y.astype(jnp.float32)), axis=(0, 1, 2)) - m * m
        yn = (y.astype(jnp.float32) - m) * lax.rsqrt(v + 1e-3)
        return jax.nn.silu(yn * scale + bias).astype(dtype)

    def f_concat(parts, W):
        x = jnp.concatenate(parts, axis=-1)
        y = lax.dot_general(x, W, (((3,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        return jnp.sum(bn_silu(y).astype(jnp.float32))

    def f_split(parts, W):
        y = None
        off = 0
        for p in parts:
            c = p.shape[-1]
            t = lax.dot_general(p, W[off:off + c], (((3,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
            y = t if y is None else y + t
            off += c
        return jnp.sum(bn_silu(y).astype(jnp.float32))

    out = {}
    for tag, f in (("concat", f_concat), ("split", f_split)):
        grad = jax.grad(f, argnums=(0, 1))

        @jax.jit
        def run(parts, W):
            def one(c, _):
                gp, gw = grad([p + c for p in parts], W)
                return c + gw.astype(dtype)[0, 0] * 0, sum(
                    jnp.sum(g.astype(jnp.float32)) for g in gp)

            return lax.scan(one, jnp.zeros((), dtype), None, length=K)[1]

        r = run(parts, W)
        np.asarray(r)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(run(parts, W))
            best = min(best, (time.perf_counter() - t0) / K)
        out[tag] = best
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--k", type=int, default=32)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    print(f"{'shape':<12} {'concat ms':>10} {'split ms':>10} {'split/concat':>13}")
    for name, H, cs, k_parts, cout in SHAPES:
        r = run_probe(name, args.batch, H, cs, k_parts, cout,
                      args.k, args.reps)
        print(f"{name:<12} {r['concat'] * 1e3:10.3f} {r['split'] * 1e3:10.3f} "
              f"{r['split'] / r['concat']:13.2f}", flush=True)


if __name__ == "__main__":
    main()
