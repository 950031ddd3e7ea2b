"""Split the postprocess cost: prefilter (score-max + top-k) vs NMS vs gather.

Usage: python scripts/probe_prefilter.py [--batch 128]
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


def timed(fn, *args, iters=20, warmup=2):
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
    ap.add_argument("--anchors", type=int, default=8400)
    ap.add_argument("--nc", type=int, default=5)
    ap.add_argument("--topk", type=int, default=512)
    args = ap.parse_args()
    B, A, nc, K = args.batch, args.anchors, args.nc, args.topk

    from yolo_scratch_tpu.ops.decode import _prefilter_single

    rng = np.random.RandomState(0)
    decoded = np.zeros((B, A, 4 + nc), np.float32)
    decoded[..., 0:2] = rng.rand(B, A, 2) * 640
    decoded[..., 2:4] = rng.rand(B, A, 2) * 60 + 4
    decoded[..., 4:] = rng.rand(B, A, nc) * 0.7 + 0.28
    decoded = jnp.asarray(decoded)
    print(f"devices: {jax.devices()}  B={B} A={A} K={K}", flush=True)

    # full prefilter (vmapped): max-over-classes + top_k + box gather
    pre = jax.jit(jax.vmap(partial(
        _prefilter_single, conf_threshold=0.25, pre_nms_topk=K)))
    t = timed(pre, decoded)
    print(f"prefilter(exact top_k): {t * 1e3:7.3f} ms", flush=True)

    # top_k alone on the (B, A) score matrix
    @jax.jit
    def topk_only(d):
        s = jnp.max(d[..., 4:], axis=-1)
        v, i = jax.lax.top_k(s, K)
        return jnp.sum(v), jnp.sum(i)

    t = timed(topk_only, decoded)
    print(f"top_k alone:            {t * 1e3:7.3f} ms", flush=True)

    # approx_max_k alternative
    @jax.jit
    def approx_only(d):
        s = jnp.max(d[..., 4:], axis=-1)
        v, i = jax.lax.approx_max_k(s, K)
        return jnp.sum(v), jnp.sum(i)

    t = timed(approx_only, decoded)
    print(f"approx_max_k alone:     {t * 1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
