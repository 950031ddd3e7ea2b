"""Serving-artifact throughput: the jax.export artifact vs the live path.

Exports the headline deploy graph (YOLO11n 640, u8 -> detections, same
contract as bench.py), round-trips it through serialize/deserialize, and
times BOTH the live jitted program and the deserialized artifact in one
process on one chip — same warm cache, same tunnel conditions. The claim
under test: AOT export costs nothing (the artifact IS the same XLA
program, re-lowered from serialized StableHLO).

Prints one JSON line with both throughputs and the ratio.

Usage: python scripts/bench_export.py [--batch 128] [--nscan 8]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--nscan", type=int, default=8)
    args = ap.parse_args()

    from yolo_scratch_tpu.export import export_predictor, load_artifact, save_artifact
    from yolo_scratch_tpu.infer import Predictor, PredictorConfig
    from yolo_scratch_tpu.models.builder import build_yolo11

    img, ch, nc = 640, 1, 5
    B, nscan = args.batch, args.nscan
    model = build_yolo11("yolo_scratch_tpu/configs/yolo11_crater.yaml", ch=ch, nc=nc, scale="n")
    variables = model.init(jax.random.PRNGKey(0), np.zeros((1, img, img, ch), np.float32))
    cfg = PredictorConfig(
        img_size=img, batch_size=B, conf_threshold=0.25, iou_threshold=0.45,
        max_det=300, pre_nms_topk=512,
        # same crossover as bench.py: XLA NMS wins past B~32
        nms_impl="pallas" if B <= 32 else "xla",
    )
    pred = Predictor(model, variables, cfg)

    exported = export_predictor(pred)
    path = "/tmp/bench_export_artifact.jaxexp"
    nbytes = save_artifact(exported, path)
    art = load_artifact(path)

    variables_dev = pred.variables

    @jax.jit
    def live(v, xs):
        def body(_, x):
            return None, pred._infer(v, x)
        return jax.lax.scan(body, None, xs)[1]

    @jax.jit
    def served(xs):
        def body(_, x):
            return None, art.call(x)
        return jax.lax.scan(body, None, xs)[1]

    xs = jnp.asarray(np.random.RandomState(0).randint(
        0, 256, (nscan, B, img, img, ch), dtype=np.uint8))

    def sync(out):
        return [np.asarray(o) for o in out]  # honest sync over the tunnel

    def best_of_3(fn):
        sync(fn())
        sync(fn())
        iters, best = 8, float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn()
            sync(out)
            best = min(best, time.perf_counter() - t0)
        return B * nscan * iters / best

    live_ips = best_of_3(lambda: live(variables_dev, xs))
    served_ips = best_of_3(lambda: served(xs))

    print(json.dumps({
        "metric": "export_artifact_vs_live_images_per_sec",
        "live": round(live_ips, 2),
        "artifact": round(served_ips, 2),
        "ratio": round(served_ips / live_ips, 4),
        "artifact_mb": round(nbytes / 1e6, 2),
        "batch": B,
    }))


if __name__ == "__main__":
    main()
