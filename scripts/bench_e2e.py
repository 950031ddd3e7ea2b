"""End-to-end streaming throughput: disk files -> detections on TPU.

The headline bench (bench.py) measures the DEVICE pipeline on pre-decoded
u8 batches; this measures what a user actually gets from a directory of
encoded images through ``Predictor.predict_paths`` (host decode+resize ->
u8 transfer -> fused forward+decode+NMS -> host fetch), i.e. the number
bounded by SURVEY §7's "host-free input pipeline" concern. Run on a quiet
chip AND a quiet host — both sides are being timed.

Sweeps format (png/jpeg) x fast_jpeg (JPEG decode-time downscale) on
smooth synthetic imagery (noise is the worst case for codecs; see
bench_ingest.py for the content-type spread).

Usage: python scripts/bench_e2e.py [--n 256] [--src 1024] [--imgsz 640]
       [--batch 32] [--scale n] [--out /tmp/e2e.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def make_images(d: Path, n: int, size: int, fmt: str):
    from PIL import Image

    paths = []
    for i in range(n):
        y, x = np.mgrid[0:size, 0:size]
        arr = ((np.sin(x / (40.0 + i % 7)) + np.cos(y / (31.0 + i % 5))) * 60
               + 128).clip(0, 255).astype(np.uint8)
        p = d / f"img_{i}.{fmt}"
        Image.fromarray(arr, "L").save(p)
        paths.append(str(p))
    return paths


def main(argv=None):
    from yolo_scratch_tpu.infer import Predictor, PredictorConfig
    from yolo_scratch_tpu.models.builder import build_yolo11

    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--src", type=int, default=1024)
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--scale", type=str, default="n")
    ap.add_argument("--ckpt", type=str, default=None)
    ap.add_argument("--inflight", type=str, default=None,
                    help="pipeline depth override (PredictorConfig.inflight);"
                         " comma list sweeps depths in one process so the"
                         " TPU compile is paid once")
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args(argv)

    import jax

    cfg_path = (Path(__file__).resolve().parent.parent
                / "yolo_scratch_tpu/configs/yolo11_crater.yaml")
    if args.ckpt:
        from yolo_scratch_tpu.infer import load_deploy_model

        model, variables = load_deploy_model(str(cfg_path), scale=args.scale,
                                             imgsz=args.imgsz, ckpt=args.ckpt)
    else:
        model = build_yolo11(str(cfg_path), ch=1, nc=5, scale=args.scale)
        variables = model.init(
            jax.random.PRNGKey(0),
            np.zeros((1, args.imgsz, args.imgsz, 1), np.float32))

    depths = ([None] if args.inflight is None else
              [int(s) for s in args.inflight.split(",")])
    rows = []
    with tempfile.TemporaryDirectory() as td:
        for fmt in ("png", "jpeg"):
            paths = make_images(Path(td), args.n, args.src, fmt)
            for fast in ((False, True) if fmt == "jpeg" else (False,)):
                for depth in depths:
                    pc_kw = {} if depth is None else {"inflight": depth}
                    pred = Predictor(model, variables, PredictorConfig(
                        img_size=args.imgsz, batch_size=args.batch,
                        conf_threshold=0.25, fast_jpeg=fast, **pc_kw))
                    # warmup: compile + pool spin-up (in-process jit cache
                    # makes sweep arms after the first nearly free)
                    for _ in pred.predict_paths(paths[: args.batch]):
                        pass
                    t0 = time.perf_counter()
                    n_out = sum(1 for _ in pred.predict_paths(paths))
                    dt = time.perf_counter() - t0
                    assert n_out == args.n
                    row = {"fmt": fmt, "fast_jpeg": fast,
                           "inflight": depth,
                           "img_per_s": round(args.n / dt, 1),
                           "wall_s": round(dt, 2)}
                    rows.append(row)
                    print(json.dumps(row))

    result = {"n": args.n, "src": args.src, "imgsz": args.imgsz,
              "batch": args.batch, "scale": args.scale,
              "note": "disk->detections via Predictor.predict_paths; "
                      "1 host core feeding 1 chip; smooth synthetic imagery",
              "rows": rows}
    if args.out:
        Path(args.out).write_text(json.dumps(result, indent=1))
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
