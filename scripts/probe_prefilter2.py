"""Fine-grained prefilter split: which stage of the batched prefilter is slow.

Usage: python scripts/probe_prefilter2.py [--batch 128]
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
    args = ap.parse_args()
    B, A, nc, K = args.batch, 8400, 5, 512
    lanes, nblk = 128, 66
    a_pad = nblk * lanes

    rng = np.random.RandomState(0)
    decoded = jnp.asarray(rng.rand(B, A, 4 + nc).astype(np.float32))
    print(f"devices: {jax.devices()}  B={B}", flush=True)

    def base(d):
        scores = jnp.max(d[..., 4:], axis=-1)
        labels = jnp.argmax(d[..., 4:], axis=-1)
        ts, ti = jax.lax.top_k(jnp.where(scores > 0.25, scores, -jnp.inf), K)
        return d[..., :4], labels, ts, ti

    @jax.jit
    def upto_onehot(d):
        boxes, labels, ts, ti = base(d)
        oh_lane = ((ti % lanes)[..., None] == jnp.arange(lanes)[None, None]).astype(jnp.float32)
        oh_blk = ((ti // lanes)[..., None] == jnp.arange(nblk)[None, None]).astype(jnp.float32)
        return jnp.sum(oh_lane), jnp.sum(oh_blk), jnp.sum(ts)

    @jax.jit
    def upto_einsum1(d):
        boxes, labels, ts, ti = base(d)
        oh_lane = ((ti % lanes)[..., None] == jnp.arange(lanes)[None, None]).astype(jnp.float32)
        payload = jnp.concatenate([boxes, labels[..., None].astype(jnp.float32)], -1)
        payload = jnp.pad(payload, ((0, 0), (0, a_pad - A), (0, 0))).reshape(B, nblk, lanes, 5)
        per_blk = jnp.einsum("bkl,bmlc->bkmc", oh_lane, payload)
        return jnp.sum(per_blk), jnp.sum(ts)

    @jax.jit
    def full(d):
        boxes, labels, ts, ti = base(d)
        oh_lane = ((ti % lanes)[..., None] == jnp.arange(lanes)[None, None]).astype(jnp.float32)
        oh_blk = ((ti // lanes)[..., None] == jnp.arange(nblk)[None, None]).astype(jnp.float32)
        payload = jnp.concatenate([boxes, labels[..., None].astype(jnp.float32)], -1)
        payload = jnp.pad(payload, ((0, 0), (0, a_pad - A), (0, 0))).reshape(B, nblk, lanes, 5)
        per_blk = jnp.einsum("bkl,bmlc->bkmc", oh_lane, payload)
        sel = jnp.einsum("bkm,bkmc->bkc", oh_blk, per_blk)
        return jnp.sum(sel), jnp.sum(ts)

    for name, f in [("upto_onehot", upto_onehot), ("upto_einsum1", upto_einsum1), ("full", full)]:
        t = timed(f, decoded)
        print(f"{name:14s}: {t * 1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
