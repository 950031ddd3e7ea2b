"""Minimal repro: the axon tunnel client retains host transfer buffers.

Round 5 found a 640px multiscale training run OOM-killed at 130 GB host
RSS after 47 epochs (~2.8 GB/epoch — almost exactly the epoch's
host->device transfer volume). This probe isolates the mechanism: RSS
grows by ~1x the bytes ever `jax.device_put`, even when the device array
is deleted immediately, `jax.live_arrays()` is empty, and
`jax.clear_caches()` has run. Measured (round 5, one v5e via axon):

    188 MB sent -> +192 MB RSS; 375 -> +379; 562 -> +567
    after clear_caches + gc: unchanged; live arrays: 0

Not a framework leak — nothing on our side holds a reference. On a real
TPU host (no tunnel) device_put buffers are freed normally. Operational
mitigation for tunnel-hosted convergence runs that push >50 GB of
batches: plan a mid-run relaunch; `--resume` (the CLI default) makes the
restart lossless (CLAUDE.md gotcha; the round-5 YOLOX@640 run finished
exactly this way).

Run: python scripts/probe_tunnel_retention.py [n_puts] [mb_per_put]
"""

import sys

import numpy as np

import jax


def rss_mb() -> int:
    with open("/proc/self/status") as fh:
        for line in fh:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) // 1024
    return 0


def main(n: int = 30, mb: float = 19.7):
    side = int((mb * 2**20 / (4 * 3 * 4)) ** 0.5)
    x = np.random.RandomState(0).rand(4, side, side, 3).astype(np.float32)
    print(f"baseline RSS {rss_mb()} MB; payload {x.nbytes / 2**20:.1f} MB/put")
    for i in range(n):
        d = jax.device_put(x)
        d.block_until_ready()
        del d  # released immediately — any retention is below our code
        if (i + 1) % 10 == 0:
            sent = (i + 1) * x.nbytes / 2**20
            print(f"after {i + 1} puts ({sent:.0f} MB sent): RSS {rss_mb()} MB")
    import gc

    jax.clear_caches()
    gc.collect()
    print(f"after clear_caches+gc: RSS {rss_mb()} MB; "
          f"live arrays: {len(jax.live_arrays())}")


if __name__ == "__main__":
    main(*(int(float(a)) for a in sys.argv[1:]))
