"""HTTP serving daemon: dynamic request batching over the Predictor.

The torch reference has no serving story (deploy = rerunning its eval
script); this closes the production loop around the existing deploy
stack: requests arriving within a small window are coalesced into ONE
fixed-shape device batch (the jit program compiles once — batches are
padded, never reshaped), run through the fused bf16 u8->detections
pipeline (``infer.Predictor``), and fanned back out per request.

Design (TPU-first):
  * one device-feeding worker thread, PIPELINED: jax dispatch is async,
    so the worker launches a batch, then decodes the next batch while the
    device runs, deferring the blocking device->host fetch until either
    ``inflight`` launches are outstanding or the request queue is empty —
    the same overlap discipline as ``Predictor.predict_paths``
    (infer.py). Under load the chip never waits for host decode; under
    sparse traffic each batch still resolves immediately (no added
    latency — the fetch happens as soon as the queue has no successor);
  * request queue -> batch former: waits up to ``max_wait_ms`` after the
    first queued request for the batch to fill, then pads the remainder
    (repeating the last row) so the device shape is static;
  * stdlib only (ThreadingHTTPServer + concurrent.futures): a serving
    process needs jax + this package, nothing else.

Endpoints:
  POST /v1/detect   body = raw image bytes (png/jpg) -> JSON
                    {"boxes": [[x1,y1,x2,y2]...] original-pixel xyxy,
                     "scores": [...], "labels": [...]}
  GET  /healthz     {"ok": true, "model": ..., "stats": {...}}

Run: ``python -m yolo_scratch_tpu.serve --ckpt runs/crater --port 8008``
(or the ``yst-serve`` console script).
"""

from __future__ import annotations

import json
import os
import queue
import tempfile
import threading
import time
from collections import deque
from concurrent.futures import Future
from concurrent.futures import TimeoutError as FutureTimeout
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from typing import Optional

import numpy as np


def parse_artifact_spec(spec: str):
    """Split an ``--artifact`` operand into ``(name, path)``.

    NAME=PATH only when the prefix is a bare name — a '=' inside the path
    itself (sweep dirs like ``runs/lr=0.01/m.jaxexp``) must not be treated
    as a separator. With no name, the file stem is the route name.
    """
    name, sep, path = spec.partition("=")
    if not sep or "/" in name or "\\" in name:
        name, path = "", spec
    return name or Path(path).stem, path


class BatchingServer:
    """Coalesces concurrent detect requests into fixed-shape device batches."""

    def __init__(self, predictor, max_wait_ms: float = 5.0,
                 inflight: Optional[int] = None):
        self.predictor = predictor
        self.max_wait_s = max_wait_ms / 1e3
        # outstanding device launches the worker may hold before blocking
        # on the oldest fetch (decode/compute overlap depth); defaults to
        # the predictor's own streaming depth
        self.inflight = max(1, inflight if inflight is not None
                            else getattr(predictor.cfg, "inflight", 2))
        self._q: "queue.Queue[Optional[tuple]]" = queue.Queue()
        # all stats mutations happen under the lock: counters are touched
        # from every HTTP handler thread AND the worker thread, and the
        # latency reservoir append/snapshot is a compound operation
        self._lock = threading.Lock()
        self.stats = {"requests": 0, "batches": 0, "batch_rows": 0, "errors": 0}
        # rolling in-server latency window (enqueue -> future resolution);
        # bounded so a long-lived daemon can't grow it unboundedly
        self._latencies: "deque[float]" = deque(maxlen=4096)
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    # -- client side ---------------------------------------------------------

    def submit(self, image_bytes: bytes) -> Future:
        """Enqueue one image; the Future resolves to the response dict."""
        fut: Future = Future()
        t0 = time.monotonic()

        def _record(f, t0=t0):
            dt = time.monotonic() - t0
            with self._lock:
                self._latencies.append(dt)
                if f.exception() is not None:
                    self.stats["errors"] += 1

        fut.add_done_callback(_record)
        self._q.put((image_bytes, fut))
        with self._lock:
            self.stats["requests"] += 1
        return fut

    def snapshot(self) -> dict:
        """Consistent stats snapshot for /healthz: counters, batch fill rate,
        and p50/p99/mean in-server latency over the rolling window."""
        B = self.predictor.cfg.batch_size
        with self._lock:
            out = dict(self.stats)
            lat = np.asarray(self._latencies, np.float64)
        out["batch_size"] = B
        if out["batches"]:
            out["batch_fill"] = round(out["batch_rows"] / (out["batches"] * B), 4)
        if lat.size:
            out["latency_ms"] = {
                "n": int(lat.size),
                "p50": round(float(np.percentile(lat, 50)) * 1e3, 3),
                "p99": round(float(np.percentile(lat, 99)) * 1e3, 3),
                "mean": round(float(lat.mean()) * 1e3, 3),
            }
        return out

    def close(self):
        self._q.put(None)
        self._worker.join(timeout=10)

    # -- device-feeding worker -------------------------------------------------

    def _form_batch(self, block: bool = True):
        """Collect up to batch_size requests. Blocks for the first request
        only when ``block`` (with in-flight work the worker polls instead,
        so an idle queue resolves outstanding batches rather than stalling
        them behind a wait for future traffic). After the first request,
        waits up to max_wait_s for the batch to fill. Returns None on the
        shutdown sentinel, [] when non-blocking and nothing is queued."""
        try:
            first = self._q.get(block=block)
        except queue.Empty:
            return []
        if first is None:
            return None
        entries = [first]
        B = self.predictor.cfg.batch_size
        deadline = time.monotonic() + self.max_wait_s
        while len(entries) < B:
            timeout = deadline - time.monotonic()
            if timeout <= 0:
                break
            try:
                nxt = self._q.get(timeout=timeout)
            except queue.Empty:
                break
            if nxt is None:  # propagate shutdown after this batch
                self._q.put(None)
                break
            entries.append(nxt)
        return entries

    def _launch(self, entries):
        """Host decode + async device dispatch for one formed batch.
        Returns (entries, meta, device_out) with the fetch NOT yet done,
        or None if the whole batch already failed."""
        pred = self.predictor
        B = pred.cfg.batch_size
        n = len(entries)
        with self._lock:
            self.stats["batches"] += 1
            self.stats["batch_rows"] += n
        # the native/cv2 decode tier reads files; spool the request
        # bodies to tmp (RAM-backed on most deploys) and reuse the
        # whole batched _prepare path, padding to the static shape
        with tempfile.TemporaryDirectory() as td:
            paths = []
            for i, (blob, _) in enumerate(entries):
                p = os.path.join(td, f"r{i}.bin")
                with open(p, "wb") as fh:
                    fh.write(blob)
                paths.append(p)
            try:
                imgs, meta = pred._prepare(paths + [paths[-1]] * (B - n))
            except Exception:  # noqa: BLE001
                # a poisoned request must not fail its batch neighbors:
                # isolate by decoding each row alone, substituting
                # zeros (and failing that future) for undecodable ones
                S, ch = pred.cfg.img_size, pred.in_ch
                imgs = np.zeros((B, S, S, ch),
                                np.uint8 if pred.cfg.u8_transfer else np.float32)
                meta = np.zeros((B, 5), np.float32)
                for i, (path, (_, fut)) in enumerate(zip(paths, entries)):
                    try:
                        im1, me1 = pred._prepare([path])
                        imgs[i], meta[i] = im1[0], me1[0]
                    except Exception as row_err:  # noqa: BLE001
                        fut.set_exception(row_err)
        try:
            # async dispatch — the device starts while the worker moves on
            # to the next batch's decode; the blocking fetch happens in
            # _resolve (packed single-array output: one device->host fetch
            # per batch instead of four, see infer.py)
            return entries, meta, pred._infer_packed(pred.variables, imgs)
        except Exception as err:  # noqa: BLE001 — dispatch-time failure
            for _, fut in entries:
                if not fut.done():
                    fut.set_exception(err)
            return None

    def _resolve(self, launched):
        """Blocking fetch of one launched batch; fan results out."""
        pred = self.predictor
        entries, meta, out = launched
        try:
            packed = np.asarray(out)  # one blocking fetch per batch
            for j, (_, fut) in enumerate(entries):
                if fut.done():  # its row failed to decode
                    continue
                row = packed[j]
                v = row[:, 6] > 0.5
                fut.set_result({
                    "boxes": pred._unmap_boxes(
                        row[v, :4], meta[j]).tolist(),
                    "scores": row[v, 4].tolist(),
                    "labels": row[v, 5].astype(np.int64).tolist(),
                })
        except Exception as err:  # noqa: BLE001 — device failure
            for _, fut in entries:
                if not fut.done():
                    fut.set_exception(err)

    def _run(self):
        pending: "deque[tuple]" = deque()
        shutting_down = False
        while True:
            batch = [] if shutting_down else self._form_batch(block=not pending)
            if batch is None:
                shutting_down = True
                batch = []
            if batch:
                launched = self._launch(batch)
                if launched is not None:
                    pending.append(launched)
                if len(pending) < self.inflight and not shutting_down:
                    continue  # decode the next batch while this one runs
            if pending:
                self._resolve(pending.popleft())
            elif shutting_down:
                return


def make_http_server(batching, host: str = "127.0.0.1",
                     port: int = 8008, model_name: str = "yolo11",
                     timeout_s: float = 60.0,
                     max_body_bytes: int = 32 << 20) -> ThreadingHTTPServer:
    """Wrap one BatchingServer — or a ``{name: BatchingServer}`` dict for
    multi-model serving — in a stdlib threaded HTTP server.

    Routing: ``POST /v1/detect`` hits the first (default) model;
    ``POST /v1/detect/<name>`` hits that model. Each model keeps its own
    batching queue/worker, so requests only coalesce with same-model
    neighbors; the models share the one device (the density case int8's
    4x-smaller weights buy, docs/QUANT.md). ``GET /healthz`` reports
    per-model stats.

    ``max_body_bytes`` caps the request body read (default 32 MiB — far
    above any real encoded image) so one oversized POST cannot OOM the
    daemon; violations get 413 and the connection is dropped unread."""

    servers = (batching if isinstance(batching, dict)
               else {model_name: batching})
    if not servers:
        raise ValueError("no models to serve")
    default_name = next(iter(servers))

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet; stats live in /healthz
            pass

        def _json(self, code: int, payload: dict):
            blob = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(blob)))
            self.end_headers()
            self.wfile.write(blob)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {
                    "ok": True, "model": default_name,
                    "models": sorted(servers),
                    "stats": {n: s.snapshot() for n, s in servers.items()},
                })
            else:
                self._json(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            if self.path == "/v1/detect":
                batching = servers[default_name]
            elif self.path.startswith("/v1/detect/"):
                name = self.path[len("/v1/detect/"):]
                if name not in servers:
                    self._json(404, {"error": f"unknown model {name!r}; "
                                              f"have {sorted(servers)}"})
                    return
                batching = servers[name]
            else:
                self._json(404, {"error": f"unknown path {self.path}"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
            except (TypeError, ValueError):
                self._json(400, {"error": "bad Content-Length"})
                return
            if length <= 0:
                self._json(400, {"error": "empty body; POST raw image bytes"})
                return
            if length > max_body_bytes:
                # reply without reading the body, then drop the connection
                # (the client may still be streaming it)
                self.close_connection = True
                self._json(413, {"error": f"body {length} bytes exceeds cap "
                                          f"{max_body_bytes}"})
                return
            blob = self.rfile.read(length)
            try:
                result = batching.submit(blob).result(timeout=timeout_s)
                self._json(200, result)
            except FutureTimeout:
                self._json(503, {"error": f"timed out after {timeout_s}s "
                                          "(server overloaded?)"})
            except Exception as err:  # noqa: BLE001
                self._json(500, {"error": str(err)})

    return ThreadingHTTPServer((host, port), Handler)


def main(argv=None):
    import argparse

    from yolo_scratch_tpu.infer import Predictor, PredictorConfig, load_deploy_model

    p = argparse.ArgumentParser(description="Batched detection serving daemon")
    p.add_argument("--cfg", type=str,
                   default=str(Path(__file__).parent / "configs/yolo11_crater.yaml"))
    p.add_argument("--scale", type=str, default="n")
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--torch-ckpt", type=str, default=None)
    p.add_argument("--which", type=str, default="best", choices=["best", "last"])
    p.add_argument("--imgsz", type=int, default=640)
    p.add_argument("--batch", type=int, default=8,
                   help="static device batch; requests coalesce up to this")
    p.add_argument("--max-wait-ms", type=float, default=5.0,
                   help="batching window after the first queued request")
    p.add_argument("--conf", type=float, default=0.25)
    p.add_argument("--iou", type=float, default=0.45)
    p.add_argument("--class-aware", action="store_true")
    p.add_argument("--topk", type=int, default=PredictorConfig.pre_nms_topk,
                   help="fixed-shape prefilter cap (pre_nms_topk); raise "
                        "toward 2048 for dense scenes (docs/PERF.md "
                        "'prefilter cap'). Ignored with --artifact (baked "
                        "at export time)")
    p.add_argument("--nc", type=int, default=None)
    p.add_argument("--ch", type=int, default=None)
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8008)
    p.add_argument("--max-body-mb", type=int, default=32,
                   help="reject request bodies larger than this (413)")
    p.add_argument("--int8-calib-dir", type=str, default=None, metavar="DIR",
                   help="serve int8 (nn/quant.py): calibrate activation "
                        "scales on the images under DIR, then quantize "
                        "every ConvBNAct to symmetric int8")
    p.add_argument("--artifact", action="append", default=None,
                   metavar="[NAME=]FILE",
                   help="serve a saved AOT artifact (.jaxexp, see "
                        "yst-export) instead of a checkpoint: no model/"
                        "builder code runs; batch/image-size/channels/"
                        "thresholds come from the artifact (--batch, "
                        "--imgsz, --conf etc. are ignored). Repeatable "
                        "for multi-model serving — each model gets its "
                        "own batching queue and routes at "
                        "/v1/detect/NAME (the first is also the "
                        "/v1/detect default)")
    args = p.parse_args(argv)

    if args.artifact:
        if args.ckpt or args.torch_ckpt or args.int8_calib_dir:
            raise SystemExit(
                "--artifact is exclusive with --ckpt/--torch-ckpt/"
                "--int8-calib-dir: the artifact already carries its "
                "weights (export int8 via yst-export --int8-calib-dir)")
        from yolo_scratch_tpu.export import (
            ArtifactPredictor,
            load_artifact,
            load_host_prep,
        )

        servers = {}
        for spec in args.artifact:
            name, path = parse_artifact_spec(spec)
            if name in servers:
                raise SystemExit(f"duplicate model name {name!r}")
            prep = load_host_prep(path)
            if prep is None:
                print(f"note: {path} has no .meta.json host-prep sidecar "
                      "(pre-sidecar export) — assuming default letterbox "
                      "prep; re-export to record it")
            pred = ArtifactPredictor(load_artifact(path), host_prep=prep)
            servers[name] = BatchingServer(pred, max_wait_ms=args.max_wait_ms)
            print(f"model {name!r}: {path} (batch {pred.cfg.batch_size}, "
                  f"imgsz {pred.cfg.img_size}, ch {pred.in_ch}, "
                  f"prep {'letterbox' if pred.cfg.letterbox else 'stretch'})")
        httpd = make_http_server(servers, host=args.host, port=args.port,
                                 max_body_bytes=args.max_body_mb << 20)
        print(f"serving {len(servers)} model(s) on "
              f"http://{args.host}:{httpd.server_address[1]} "
              f"(window {args.max_wait_ms} ms)")
        try:
            httpd.serve_forever()
        except KeyboardInterrupt:
            pass
        finally:
            httpd.shutdown()
            for s in servers.values():
                s.close()
        return httpd

    model, variables = load_deploy_model(
        args.cfg, scale=args.scale, imgsz=args.imgsz, ckpt=args.ckpt,
        torch_ckpt=args.torch_ckpt, which=args.which, ch=args.ch, nc=args.nc,
    )
    cfg = PredictorConfig(
        img_size=args.imgsz, batch_size=args.batch, conf_threshold=args.conf,
        iou_threshold=args.iou, class_aware_nms=args.class_aware,
        pre_nms_topk=args.topk,
    )
    if args.int8_calib_dir:
        from yolo_scratch_tpu.nn.quant import (
            count_quantized,
            prepare_calib_batches,
            quantize_for_deploy,
        )

        exts = {".png", ".jpg", ".jpeg", ".bmp"}
        paths = sorted(str(q) for q in Path(args.int8_calib_dir).rglob("*")
                       if q.suffix.lower() in exts)
        if not paths:
            raise SystemExit(f"--int8-calib-dir: no images under {args.int8_calib_dir}")
        prep = Predictor(model, variables, cfg)  # host _prepare only
        batches = prepare_calib_batches(
            prep, paths, max_batches=-(-len(paths) // args.batch))
        variables = quantize_for_deploy(model, variables, batches)
        print(f"int8: quantized {count_quantized(variables['quant'])} conv blocks "
              f"(calibrated on {len(paths)} images)")
    predictor = Predictor(model, variables, cfg)
    batching = BatchingServer(predictor, max_wait_ms=args.max_wait_ms)
    httpd = make_http_server(batching, host=args.host, port=args.port,
                             max_body_bytes=args.max_body_mb << 20)
    print(f"serving on http://{args.host}:{httpd.server_address[1]} "
          f"(batch {args.batch}, window {args.max_wait_ms} ms)")
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.shutdown()
        batching.close()
    return httpd


def cli(argv=None):
    """Console-script entry: run main() and discard its return value."""
    main(argv)


if __name__ == "__main__":
    cli()
