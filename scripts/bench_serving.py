"""Load-test the HTTP serving daemon: latency/throughput under concurrency.

Drives N concurrent HTTP clients against an in-process daemon (real
ThreadingHTTPServer + BatchingServer + Predictor — the exact yst-serve
stack, ephemeral port), sweeping client count and the batching window,
and records per-cell:

  * achieved throughput (completed requests / wall time),
  * client-observed latency p50/p99 (full HTTP round trip),
  * batch fill rate and batch count from /healthz.

This is the measurement VERDICT r3 item 4 asked for: serve.py claims a
production loop, so its latency/throughput under load must be a number,
not a caveat. Run on a QUIET chip (CLAUDE.md: concurrent jobs pollute
timings).

Usage:
  python scripts/bench_serving.py --ckpt runs/ab_recipe --imgsz 320 \
      --batch 16 --clients 1,4,16,32 --wait-ms 0,5,20 --duration 20 \
      --out /tmp/serving_load.json
"""

from __future__ import annotations

import argparse
import io
import json
import sys
import threading
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def _encode_pngs(n: int, side: int, channels: int, seed: int = 0):
    """Pre-encode n random PNGs (the decode cost is part of the serve path)."""
    from PIL import Image

    rng = np.random.RandomState(seed)
    blobs = []
    for _ in range(n):
        if channels == 1:
            arr = (rng.rand(side, side) * 255).astype(np.uint8)
            img = Image.fromarray(arr, mode="L")
        else:
            arr = (rng.rand(side, side, 3) * 255).astype(np.uint8)
            img = Image.fromarray(arr, mode="RGB")
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        blobs.append(buf.getvalue())
    return blobs


def run_cell(predictor, blobs, n_clients: int, wait_ms: float,
             duration_s: float) -> dict:
    """One (clients, window) cell: fresh BatchingServer + HTTP server so
    stats start clean; the predictor (and its compiled program) is reused."""
    from yolo_scratch_tpu.serve import BatchingServer, make_http_server

    batching = BatchingServer(predictor, max_wait_ms=wait_ms)
    # server-side future timeout must cover a cold jit compile (~5-10 min
    # over the TPU tunnel) or the warmup request 503s and kills the sweep;
    # the warmup client below waits 1200 s for the same reason
    httpd = make_http_server(batching, port=0, timeout_s=1200.0)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{httpd.server_address[1]}"

    # warmup (ensures the jit program is compiled before the clock starts)
    req = urllib.request.Request(f"{url}/v1/detect", data=blobs[0], method="POST")
    with urllib.request.urlopen(req, timeout=1200):
        pass
    # zero the server-side stats so /healthz reflects the timed window only
    # (the warmup above may carry the one-time jit compile)
    with batching._lock:
        for k in batching.stats:
            batching.stats[k] = 0
        batching._latencies.clear()

    stop = threading.Event()
    lat_per_client = [[] for _ in range(n_clients)]
    errors = [0] * n_clients

    def client(ci: int):
        k = ci  # stagger the blob cycle so clients don't sync on one image
        while not stop.is_set():
            blob = blobs[k % len(blobs)]
            k += n_clients
            t0 = time.perf_counter()
            try:
                r = urllib.request.Request(
                    f"{url}/v1/detect", data=blob, method="POST")
                with urllib.request.urlopen(r, timeout=300):
                    pass
                lat_per_client[ci].append(time.perf_counter() - t0)
            except Exception:  # noqa: BLE001 — count, keep hammering
                errors[ci] += 1

    threads = [threading.Thread(target=client, args=(i,)) for i in range(n_clients)]
    t_start = time.perf_counter()
    for t in threads:
        t.start()
    time.sleep(duration_s)
    stop.set()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t_start

    stats = batching.snapshot()
    httpd.shutdown()
    batching.close()

    lat = np.asarray([x for l in lat_per_client for x in l], np.float64)
    done = int(lat.size)
    return {
        "clients": n_clients,
        "wait_ms": wait_ms,
        "duration_s": round(wall, 2),
        "completed": done,
        "errors": int(sum(errors)),
        "achieved_img_s": round(done / wall, 2),
        "latency_ms": {
            "p50": round(float(np.percentile(lat, 50)) * 1e3, 2) if done else None,
            "p99": round(float(np.percentile(lat, 99)) * 1e3, 2) if done else None,
            "mean": round(float(lat.mean()) * 1e3, 2) if done else None,
        },
        "batches": stats["batches"],
        "batch_fill": stats.get("batch_fill"),
        "server_latency_ms": stats.get("latency_ms"),
    }


def main(argv=None):
    from yolo_scratch_tpu.infer import Predictor, PredictorConfig, load_deploy_model

    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--cfg", type=str,
                   default=str(Path(__file__).resolve().parent.parent
                               / "yolo_scratch_tpu/configs/yolo11_crater.yaml"))
    p.add_argument("--scale", type=str, default="n")
    p.add_argument("--ckpt", type=str, default=None,
                   help="orbax run dir; omitted = fresh init (weights don't "
                        "change the serving cost)")
    p.add_argument("--which", type=str, default="best", choices=["best", "last"])
    p.add_argument("--nc", type=int, default=None)
    p.add_argument("--ch", type=int, default=None)
    p.add_argument("--imgsz", type=int, default=640)
    p.add_argument("--src-px", type=int, default=1024,
                   help="client image side before server-side letterbox")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--clients", type=str, default="1,4,16")
    p.add_argument("--wait-ms", type=str, default="0,5,20")
    p.add_argument("--duration", type=float, default=15.0)
    p.add_argument("--n-images", type=int, default=8)
    p.add_argument("--out", type=str, default=None)
    args = p.parse_args(argv)

    model, variables = load_deploy_model(
        args.cfg, scale=args.scale, imgsz=args.imgsz, ckpt=args.ckpt,
        which=args.which, ch=args.ch, nc=args.nc,
    )
    pred = Predictor(model, variables, PredictorConfig(
        img_size=args.imgsz, batch_size=args.batch, conf_threshold=0.25))
    blobs = _encode_pngs(args.n_images, args.src_px, pred.in_ch)
    print(f"payload: {args.n_images} PNGs @ {args.src_px}px, "
          f"~{len(blobs[0]) / 1024:.0f} KiB each; device batch {args.batch}")

    rows = []
    for wait_ms in [float(x) for x in args.wait_ms.split(",")]:
        for n_clients in [int(x) for x in args.clients.split(",")]:
            row = run_cell(pred, blobs, n_clients, wait_ms, args.duration)
            rows.append(row)
            print(json.dumps(row))
    result = {"imgsz": args.imgsz, "batch": args.batch,
              "src_px": args.src_px, "rows": rows}
    if args.out:
        Path(args.out).write_text(json.dumps(result, indent=1))
        print(f"wrote {args.out}")
    return result


if __name__ == "__main__":
    main()
