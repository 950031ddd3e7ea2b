"""Attribute the streaming pipeline's fixed per-batch cost (docs/PERF.md
"disk -> detections": ~15.5 ms/img format-independent residual at B=32).

Candidate costs per batch over the axon tunnel:
  (a) dispatch latency of an async jitted launch (should be ~5 ms),
  (b) blocking fetch round trip for a TINY output (pure RTT),
  (c) blocking fetch of the predictor's four separate outputs vs one
      packed array (4 RTTs vs 1 — the round-4 _infer_packed change),
  (d) H2D transfer of a (32, 640, 640, 1) u8 batch (13 MB).

Run on a QUIET chip. Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    out = {"device": str(dev)}

    # --- (a) async dispatch latency: launch a trivial program N times,
    # never fetching (block once at the end) -------------------------------
    @jax.jit
    def tiny(x):
        return x * 2.0 + 1.0

    x0 = jnp.zeros((8,), jnp.float32)
    tiny(x0)  # compile
    N = 50
    t0 = time.perf_counter()
    r = x0
    for _ in range(N):
        r = tiny(r)
    _ = np.asarray(r)  # one sync at the end
    out["dispatch_ms_per_launch"] = round(
        (time.perf_counter() - t0) / N * 1e3, 3)

    # --- (b) blocking fetch RTT: launch + immediately fetch a tiny array --
    t0 = time.perf_counter()
    for i in range(N):
        _ = np.asarray(tiny(x0))
    out["fetch_rtt_ms"] = round((time.perf_counter() - t0) / N * 1e3, 3)

    # --- (c) four separate fetches vs one packed fetch of the same bytes --
    @jax.jit
    def four(x):
        s = jnp.sum(x)
        return (jnp.zeros((32, 300, 4)) + s, jnp.zeros((32, 300)) + s,
                jnp.zeros((32, 300), jnp.int32), jnp.zeros((32, 300), bool))

    @jax.jit
    def packed(x):
        s = jnp.sum(x)
        return jnp.zeros((32, 300, 7)) + s

    four(x0), packed(x0)  # compile
    M = 20
    t0 = time.perf_counter()
    for _ in range(M):
        _ = [np.asarray(o) for o in four(x0)]
    out["four_fetches_ms"] = round((time.perf_counter() - t0) / M * 1e3, 2)
    t0 = time.perf_counter()
    for _ in range(M):
        _ = np.asarray(packed(x0))
    out["packed_fetch_ms"] = round((time.perf_counter() - t0) / M * 1e3, 2)

    # --- (d) H2D of a real u8 batch + trivial consume + tiny fetch --------
    @jax.jit
    def consume(img):
        return jnp.sum(img, dtype=jnp.int32)

    batch = np.random.default_rng(0).integers(
        0, 256, size=(32, 640, 640, 1), dtype=np.uint8)
    _ = np.asarray(consume(batch))  # compile
    t0 = time.perf_counter()
    for _ in range(M):
        _ = np.asarray(consume(batch))
    out["h2d_13mb_plus_fetch_ms"] = round(
        (time.perf_counter() - t0) / M * 1e3, 2)

    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
