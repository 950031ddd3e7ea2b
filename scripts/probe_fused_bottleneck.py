"""A/B the Pallas fused bottleneck vs XLA's unfused chain on hardware.

For each (H, C, Ch) bottleneck shape in the s/m-scale models, times
``ops.pallas_conv.fused_bottleneck`` against the XLA two-conv chain
(``bottleneck_xla``) with in-jit repeat loops (per-iteration input
perturbation so XLA cannot hoist; the ~5 ms tunnel dispatch divides
away). Reports ms, implied %MXU and %HBM for both, plus a correctness
cross-check on the first iteration.

Usage: python scripts/probe_fused_bottleneck.py [--batch 128] [--repeat 8]
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

PEAK_BF16 = 197e12
HBM_BPS = 819e9

# (name, H, C, Ch) — W == H. s-scale: 18x (3,3,128,128) bottleneck convs
# live at P3 80x80 (C3k2 c3k blocks) and P4/P5; 11x (3,3,64,64) at 80x80.
SHAPES = [
    ("p3_s_64", 80, 64, 64),
    ("p3_s_128", 80, 128, 128),
    ("p4_s_128", 40, 128, 128),
    ("p5_s_256", 20, 256, 256),
    ("p4_m_256", 40, 256, 256),
    ("p5_l_512", 20, 512, 512),  # widest bottleneck in the scales table
]


def timed(fn, *args, iters=6, warmup=2):
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
    ap.add_argument("--repeat", type=int, default=8)
    args = ap.parse_args()
    B, R = args.batch, args.repeat
    rng = np.random.RandomState(0)

    from yolo_scratch_tpu.ops.pallas_conv import bottleneck_xla, fused_bottleneck

    print(f"devices: {jax.devices()}  batch={B}  repeat={R}", flush=True)
    print(f"{'shape':12s} {'xla ms':>8s} {'fused ms':>9s} {'speedup':>8s} "
          f"{'fused %MXU':>10s} {'fused %HBM':>10s} {'max|d|':>9s}", flush=True)

    for name, H, C, Ch in SHAPES:
        x = jnp.asarray(rng.randn(B, H, H, C) * 0.5, jnp.bfloat16)
        w1 = jnp.asarray(rng.randn(3, 3, C, Ch) * (1 / np.sqrt(9 * C)), jnp.bfloat16)
        b1 = jnp.asarray(rng.randn(Ch) * 0.1, jnp.float32)
        w2 = jnp.asarray(rng.randn(3, 3, Ch, C) * (1 / np.sqrt(9 * Ch)), jnp.bfloat16)
        b2 = jnp.asarray(rng.randn(C) * 0.1, jnp.float32)

        def loop(fn):
            @jax.jit
            def f(x, w1, b1, w2, b2):
                def body(acc, c):
                    y = fn(x + c, w1, b1, w2, b2)
                    return acc + jnp.sum(y.astype(jnp.float32)), None

                acc, _ = lax.scan(body, 0.0, jnp.arange(R, dtype=x.dtype) * 1e-3)
                return acc

            return f

        # correctness cross-check at this shape
        ref = np.asarray(bottleneck_xla(x, w1, b1, w2, b2)).astype(np.float32)
        got = np.asarray(fused_bottleneck(x, w1, b1, w2, b2)).astype(np.float32)
        dmax = float(np.max(np.abs(ref - got)))

        t_xla = timed(loop(bottleneck_xla), x, w1, b1, w2, b2) / R
        t_fused = timed(loop(fused_bottleneck), x, w1, b1, w2, b2) / R

        flops = 2 * B * H * H * 9 * (C * Ch + Ch * C)
        hbm_bytes = 2 * 2 * B * H * H * C  # read X once + write Y once (bf16)
        util = flops / t_fused / PEAK_BF16 * 100
        hbm = hbm_bytes / t_fused / HBM_BPS * 100
        print(f"{name:12s} {t_xla * 1e3:8.3f} {t_fused * 1e3:9.3f} "
              f"{t_xla / t_fused:8.2f} {util:10.1f} {hbm:10.1f} {dmax:9.4f}",
              flush=True)


if __name__ == "__main__":
    main()
