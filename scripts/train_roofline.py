"""Per-stage roofline table for the jitted train step, from an xplane trace.

Classifies every XLA-Ops event by its output-shape signature (the HLO text
in the event name) into train-step stages — model spatial compute
(fwd+bwd convs/elementwise at (B, H, W, C)), TAL/(B, A, G) assignment
tensors, per-anchor head/loss work (A=8400 dims), GT preprocessing,
optimizer/param-sized ops, layout copies, async DMA — and prints per-stage
ms/iter plus the top ops inside each stage. This is the breakdown
VERDICT r2 asked for ("fwd / bwd / TAL / loss / optimizer / BN").

Usage: python scripts/profile_train.py            # capture (TPU)
       python scripts/train_roofline.py [--iters 5] [--dir /tmp/yst_trace_train]
"""

from __future__ import annotations

import argparse
import glob
import re
from collections import defaultdict

ASYNC_BASES = ("copy-start", "copy-done", "slice-start", "slice-done",
               "async-start", "async-done", "all-reduce-start", "all-reduce-done",
               "dynamic-slice-start", "dynamic-slice-done")

SHAPE_RE = re.compile(r"=\s*(?:\(?)(?:[a-z0-9]+)\[([0-9,]*)\]")


def classify(name: str, dims: tuple) -> str:
    base = name.split(".")[0].lstrip("%")
    if any(base == a or base.startswith(a) for a in ASYNC_BASES):
        return "async-dma"
    if base in ("copy", "convert", "bitcast", "transpose", "reshape", "split"):
        return "layout/copy"
    has = set(dims)
    if 8400 in has or 6400 in has or 1600 in has or 400 in has:
        # per-anchor tensors: 8400 = cat(80²,40²,20²) grid at 640
        if 24 in has or 100 in has:
            return "TAL (B,A,G)"
        return "head/loss per-anchor"
    if len(dims) == 4 and dims[0] in (8, 16, 32, 64, 128) and dims[1] in (
            320, 160, 80, 40, 20) :
        return "model spatial (fwd+bwd)"
    if len(dims) >= 2 and dims[0] in (8, 16, 32, 64, 128) and (
            24 in dims or 100 in dims):
        return "GT preprocess"
    if "convolution" in name:
        return "model spatial (fwd+bwd)"
    if "select_and_scatter" in name:
        return "model spatial (fwd+bwd)"  # maxpool backward (SPPF)
    n = 1
    for d in dims:
        n *= d
    if n <= 1 << 22:
        # CAVEAT: output-shape classification CANNOT split backward
        # weight-gradient reductions (param-shaped outputs over
        # activation-sized inputs — HBM-bound bwd work) from true
        # optimizer/EMA kernels. scripts/probe_opt_flat.py measures the
        # split directly: at YOLO11n B=64 this whole bucket is ~40 ms of
        # which only ~5.5 ms is the optimizer (grads-only control).
        return "param-shaped (wgrad+opt)"
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--dir", default="/tmp/yst_trace_train")
    ap.add_argument("--top", type=int, default=6)
    args = ap.parse_args()

    from jax._src.profiler import ProfileData

    paths = sorted(glob.glob(f"{args.dir}/**/*.xplane.pb", recursive=True))
    data = ProfileData.from_file(paths[-1])

    stage_ms = defaultdict(float)
    stage_ops = defaultdict(lambda: defaultdict(float))
    step_ms = 0.0
    for plane in data.planes:
        if "TPU" not in plane.name:
            continue
        for line in plane.lines:
            if line.name == "XLA Modules":
                for ev in line.events:
                    step_ms += (ev.end_ns - ev.start_ns) / 1e6
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                dur = (ev.end_ns - ev.start_ns) / 1e6
                m = SHAPE_RE.search(ev.name)
                dims = tuple(int(x) for x in m.group(1).split(",") if x) if (
                    m and m.group(1)) else ()
                short = ev.name.split(" = ")[0].lstrip("%")
                stage = classify(ev.name, dims)
                stage_ms[stage] += dur
                stage_ops[stage][f"{short} {dims}"] += dur

    it = args.iters
    print(f"whole-step (XLA Modules line): {step_ms / it:8.2f} ms/iter")
    total = sum(stage_ms.values())
    print(f"{'stage':28s} {'ms/iter':>9s} {'share':>7s}")
    for k, v in sorted(stage_ms.items(), key=lambda kv: -kv[1]):
        print(f"{k:28s} {v / it:9.3f} {v / total * 100:6.1f}%")
    print()
    for k, v in sorted(stage_ms.items(), key=lambda kv: -kv[1]):
        print(f"-- {k} (top {args.top}):")
        for opn, d in sorted(stage_ops[k].items(), key=lambda kv: -kv[1])[: args.top]:
            print(f"   {d / it:8.3f}  {opn[:100]}")


if __name__ == "__main__":
    main()
