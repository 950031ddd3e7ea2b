"""Measure validate()'s peak memory at a COCO-val-shaped workload.

Round-4 VERDICT flagged that the deferred-fetch optimization (one stacked
device->host transfer per kind per epoch) holds every val batch's device
outputs live until the end of the loop — trivial at crater scale, but
unmeasured at COCO-val scale (5k images, nc=80, max_det=300, 10 IoU
thresholds). Round 5 added ``TrainerConfig.val_fetch_chunk`` (flush every
K batches); this probe prices both policies.

The deferred footprint scales with n_batches x B x (T x max_det marks +
max_det scores/valid) — it is INDEPENDENT of image size and model width —
so the probe runs the real 5k-image count at a small image size on CPU,
which measures the term of interest without a 5k-image @640 forward bill.
Peak RSS is sampled from /proc/self/status by a watcher thread.

Run (CPU, ~minutes):
  python scripts/probe_eval_memory.py --n 5000 --imgsz 96 --out /tmp/evalmem.json
"""

from __future__ import annotations

import argparse
import json
import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")  # env var is ignored under axon

import numpy as np  # noqa: E402


class RssWatcher:
    """Samples VmRSS from /proc/self/status every ``interval`` seconds."""

    def __init__(self, interval: float = 0.05):
        self.interval = interval
        self.peak_kb = 0
        self._stop = threading.Event()
        self._t = threading.Thread(target=self._run, daemon=True)

    @staticmethod
    def _rss_kb() -> int:
        with open("/proc/self/status") as fh:
            for line in fh:
                if line.startswith("VmRSS"):
                    return int(line.split()[1])
        return 0

    def _run(self):
        while not self._stop.is_set():
            self.peak_kb = max(self.peak_kb, self._rss_kb())
            time.sleep(self.interval)

    def __enter__(self):
        self._t.start()
        return self

    def __exit__(self, *a):
        self._stop.set()
        self._t.join()
        self.peak_kb = max(self.peak_kb, self._rss_kb())


def run_validate(n, imgsz, batch, max_det, chunk):
    from yolo_scratch_tpu.data.loader import Loader
    from yolo_scratch_tpu.data.synthetic import SyntheticDataset
    from yolo_scratch_tpu.models.builder import build_yolo11
    from yolo_scratch_tpu.train.trainer import Trainer, TrainerConfig

    ds = SyntheticDataset(n=n, img_size=imgsz, channels=3, num_classes=80)
    cfg = TrainerConfig(epochs=1, val_conf=0.001, max_det=max_det,
                        pre_nms_topk=512, val_fetch_chunk=chunk)
    loader = Loader(ds, batch_size=batch, max_gt=16, prefetch=0)
    model = build_yolo11(
        "yolo_scratch_tpu/configs/yolo11_crater.yaml", ch=3, nc=80, scale="n")
    t = Trainer(model, loader, loader, cfg)
    base_kb = RssWatcher._rss_kb()
    with RssWatcher() as w:
        t0 = time.perf_counter()
        out = t.validate()
        dt = time.perf_counter() - t0
    return {
        "chunk": chunk,
        "base_rss_mb": round(base_kb / 1024, 1),
        "peak_rss_mb": round(w.peak_kb / 1024, 1),
        "delta_mb": round((w.peak_kb - base_kb) / 1024, 1),
        "wall_s": round(dt, 1),
        "mAP50": round(float(out.get("mAP50", 0.0)), 4),
        "n_images": n,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=5000)
    ap.add_argument("--imgsz", type=int, default=96)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--max-det", type=int, default=300)
    ap.add_argument("--out", type=str, default="/tmp/evalmem.json")
    ap.add_argument("--single-chunk", type=int, default=None,
                    help="internal: measure one policy and print its JSON")
    args = ap.parse_args()

    if args.single_chunk is not None:
        print(json.dumps(run_validate(
            args.n, args.imgsz, args.batch, args.max_det, args.single_chunk)))
        return

    # one subprocess per policy: RSS is a high-water mark the allocator
    # never returns, so a second in-process run would inherit the first's
    # baseline and under-report its own increment
    import subprocess

    rows = []
    for chunk in (10**9, 128):  # round-4 behavior (unbounded) vs the default
        proc = subprocess.run(
            [sys.executable, __file__, "--single-chunk", str(chunk),
             "--n", str(args.n), "--imgsz", str(args.imgsz),
             "--batch", str(args.batch), "--max-det", str(args.max_det)],
            capture_output=True, text=True, check=True)
        r = json.loads(proc.stdout.strip().splitlines()[-1])
        print(json.dumps(r))
        rows.append(r)
    out = {
        "workload": {
            "n_images": args.n, "imgsz": args.imgsz, "batch": args.batch,
            "max_det": args.max_det, "nc": 80, "thresholds": 10,
            "note": "deferred-fetch footprint is independent of image size; "
                    "small imgsz keeps the CPU forward affordable",
        },
        "unbounded": rows[0],
        "chunk128": rows[1],
    }
    Path(args.out).write_text(json.dumps(out, indent=2))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
