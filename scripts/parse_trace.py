"""Re-aggregate an existing /tmp/yst_trace xplane: compute ops only.

Async DMA (copy-start/slice-start etc.) overlaps compute, so summing every
event double-counts; this keeps only real compute ops (fusions, convs,
sorts, pallas calls) and buckets the rest. Pure parsing — no TPU use.

Usage: python scripts/parse_trace.py [--top 40] [--iters 5]
"""

from __future__ import annotations

import argparse
import glob
import re
from collections import defaultdict

ASYNC = ("copy-start", "copy-done", "slice-start", "slice-done", "async-start",
         "async-done", "all-reduce-start", "all-reduce-done")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--dir", default="/tmp/yst_trace")
    ap.add_argument("--asyncs", action="store_true", help="also list top async/DMA ops")
    args = ap.parse_args()

    from jax._src.profiler import ProfileData

    paths = sorted(glob.glob(f"{args.dir}/**/*.xplane.pb", recursive=True))
    data = ProfileData.from_file(paths[-1])

    ops = defaultdict(float)
    asyncs = defaultdict(float)
    cats = defaultdict(float)
    for plane in data.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        for line in plane.lines:
            # only real per-op events: the "Steps"/"XLA Modules" lines carry
            # step numbers / whole-module spans that would swamp the sums
            if line.name not in ("XLA Ops",):
                continue
            for ev in line.events:
                dur = (ev.end_ns - ev.start_ns) / 1e6
                name = ev.name
                m = re.match(r"%?([a-zA-Z0-9_.\-]+)\s*=", name)
                short = m.group(1) if m else name
                base = re.sub(r"\.\d+$", "", short)
                if any(base == a or base.startswith(a) for a in ASYNC):
                    cats["async-dma"] += dur
                    asyncs[short] = asyncs.get(short, 0.0) + dur
                    continue
                if base in ("copy", "convert_element_type", "bitcast", "transpose"):
                    cats["layout-copy"] += dur
                else:
                    cats[base] += dur
                ops[short] = ops.get(short, 0.0) + dur

    if args.asyncs:
        print("== top async/DMA ops (ms/iter; overlapping — upper bound) ==")
        shown = 0
        for name, dur in sorted(asyncs.items(), key=lambda kv: -kv[1]):
            print(f"{dur / args.iters:9.3f}  {name[:110]}")
            shown += 1
            if shown >= args.top:
                break

    print("== categories (ms/iter) ==")
    for k, v in sorted(cats.items(), key=lambda kv: -kv[1])[:20]:
        print(f"{v / args.iters:9.3f}  {k}")
    print("== top compute ops (ms/iter) ==")
    shown = 0
    for name, dur in sorted(ops.items(), key=lambda kv: -kv[1]):
        print(f"{dur / args.iters:9.3f}  {name[:110]}")
        shown += 1
        if shown >= args.top:
            break


if __name__ == "__main__":
    main()
