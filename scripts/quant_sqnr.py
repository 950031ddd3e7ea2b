"""Per-layer SQNR diagnostic for the int8 PTQ tier (nn/quant.py).

Runs one batch through the BN-folded f32 model and its int8-quantized
variant, captures every ConvBNAct block's output, and reports per-block
signal-to-quantization-noise ratio

    SQNR = 10 log10( sum(y_f32^2) / sum((y_f32 - y_int8)^2) )  [dB]

sorted worst-first. Use it to (a) find fragile blocks worth excluding via
``quantize_for_deploy(skip=...)``, and (b) compare absmax vs percentile
calibration (``--quantile 0.999``). ~40 dB: visually lossless; <20 dB:
suspect.

Run: python scripts/quant_sqnr.py --data /tmp/coco_synth600 \
        --ckpt runs/ab_recipe --which last --imgsz 320 --cpu
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data", type=str, default="synthetic")
    p.add_argument("--dataset", type=str, default="auto")
    p.add_argument("--cfg", type=str, default=str(
        Path(__file__).resolve().parent.parent
        / "yolo_scratch_tpu/configs/yolo11_crater.yaml"))
    p.add_argument("--scale", type=str, default="n")
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--which", type=str, default="last", choices=["best", "last"])
    p.add_argument("--imgsz", type=int, default=320)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--calib-batches", type=int, default=2)
    p.add_argument("--quantile", type=float, default=None,
                   help="percentile activation calibration (e.g. 0.999); "
                        "default absmax")
    p.add_argument("--worst", type=int, default=12, help="rows to print")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from yolo_scratch_tpu.data.loader import Loader
    from yolo_scratch_tpu.infer import load_deploy_model
    from yolo_scratch_tpu.nn.fuse import fuse_conv_bn
    from yolo_scratch_tpu.nn.modules import ConvBNAct
    from yolo_scratch_tpu.nn.quant import quantize_for_deploy
    from yolo_scratch_tpu.train.cli import make_datasets

    ds, ch, nc = make_datasets(args)
    loader = Loader(ds, args.batch, prefetch=0)
    it = iter(loader)
    calib = [next(it)["img"] for _ in range(args.calib_batches)]
    probe = next(it)["img"]

    model, variables = load_deploy_model(
        args.cfg, scale=args.scale, imgsz=args.imgsz, ckpt=args.ckpt,
        which=args.which)
    v_f32 = fuse_conv_bn(variables)
    v_int8 = quantize_for_deploy(model, variables, calib, quantile=args.quantile)

    filt = lambda mdl, _: isinstance(mdl, ConvBNAct)  # noqa: E731

    @jax.jit
    def run(v, x):
        _, st = model.apply(
            v, x, train=False,
            capture_intermediates=filt, mutable=["intermediates"])
        return st["intermediates"]

    ints_f = run(v_f32, probe)
    ints_q = run(v_int8, probe)

    leaves_f = jax.tree_util.tree_flatten_with_path(
        ints_f, is_leaf=lambda t: isinstance(t, tuple))[0]
    leaves_q = jax.tree_util.tree_flatten_with_path(
        ints_q, is_leaf=lambda t: isinstance(t, tuple))[0]
    rows = []
    for (path_f, yf), (path_q, yq) in zip(leaves_f, leaves_q):
        assert path_f == path_q
        name = "/".join(getattr(k, "key", str(k)) for k in path_f
                        if getattr(k, "key", None) not in ("__call__",))
        yf = np.asarray(yf[0] if isinstance(yf, tuple) else yf, np.float32)
        yq = np.asarray(yq[0] if isinstance(yq, tuple) else yq, np.float32)
        sig = float(np.sum(yf * yf))
        err = float(np.sum((yf - yq) ** 2))
        sqnr = 10.0 * np.log10(sig / err) if err > 0 else float("inf")
        rows.append({"block": name, "sqnr_db": round(sqnr, 1)})

    rows.sort(key=lambda r: r["sqnr_db"])
    mode = f"quantile={args.quantile}" if args.quantile else "absmax"
    print(f"calibration: {mode}; {len(rows)} ConvBNAct blocks; "
          f"worst {min(args.worst, len(rows))}:", file=sys.stderr)
    for r in rows[: args.worst]:
        print(f"  {r['sqnr_db']:7.1f} dB  {r['block']}", file=sys.stderr)
    summary = {
        "mode": mode,
        "blocks": len(rows),
        "sqnr_min_db": rows[0]["sqnr_db"] if rows else None,
        "sqnr_median_db": rows[len(rows) // 2]["sqnr_db"] if rows else None,
        "worst": rows[: args.worst],
    }
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main()
