"""Host ingest benchmark: native decode->resize->batch throughput.

Host decode is the stated bound for >=2k img/s streaming inference
(SURVEY §7 "Hard parts"); this measures it directly: img/s/core for the
f32 and u8 batch paths over synthetic PNGs (grayscale, crater-like) and
JPEGs. Run: ``python scripts/bench_ingest.py [n_images] [src_size]``.
"""

import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, ".")

import numpy as np


def _make_images(d: Path, n: int, size: int, fmt: str = "png", content: str = "noise"):
    """``content='noise'`` is the historical worst case (PNG filters and
    JPEG entropy coding both hate it); ``'smooth'`` is a banded gradient
    closer to natural imagery (real photos sit between the two)."""
    from PIL import Image

    rng = np.random.RandomState(0)
    paths = []
    for i in range(n):
        if content == "noise":
            arr = rng.randint(0, 256, (size, size), np.uint8)
        else:
            y, x = np.mgrid[0:size, 0:size]
            arr = ((np.sin(x / (40.0 + i)) + np.cos(y / (31.0 + i))) * 60 + 128
                   ).clip(0, 255).astype(np.uint8)
        p = d / f"img_{i}.{fmt}"
        Image.fromarray(arr, "L").save(p)
        paths.append(str(p))
    return paths


def main(n: int = 64, src: int = 1024, S: int = 640, repeats: int = 3):
    from yolo_scratch_tpu.data.native import available, prepare_batch

    assert available(), "native library failed to build"
    out = {}
    with tempfile.TemporaryDirectory() as td:
        for content in ("noise", "smooth"):
            for fmt in ("png", "jpeg"):
                paths = _make_images(Path(td), n, src, fmt, content)
                variants = [("uint8", False), ("float32", False)]
                if fmt == "jpeg":  # decode-time downscale applies to JPEG only
                    variants.insert(0, ("uint8", True))
                for dtype, fast in variants:
                    prepare_batch(paths[:2], img_size=S, channels=1, dtype=dtype,
                                  fast_jpeg=fast)  # pool warmup
                    best = float("inf")
                    for _ in range(repeats):
                        t0 = time.perf_counter()
                        _, _, status = prepare_batch(
                            paths, img_size=S, channels=1, dtype=dtype, fast_jpeg=fast)
                        dt = time.perf_counter() - t0
                        best = min(best, dt)
                        assert (status == 0).all()
                    key = f"{content}_{fmt}_{dtype}" + ("_fastscale" if fast else "")
                    out[f"{key}_img_per_s"] = round(n / best, 1)
    out.update({"n": n, "src_size": src, "dst_size": S, "note": "1 host core"})
    print(json.dumps(out))
    return out


def loader_scaling(n: int = 64, src: int = 1024, S: int = 640,
                   workers=(0, 2, 4, 8), repeats: int = 3):
    """Training-Loader decode throughput vs ``workers`` (round 5).

    Measures a full `Loader` epoch (decode + resize + pad/collate) over a
    crater-layout dataset of smooth PNGs, per worker count, cache
    disabled so every epoch decodes. On a multi-core host this is the
    thread-scaling measurement VERDICT r4 item 2 named (the per-sample
    path releases the GIL); on this 1-core host expect ~1.0x — the
    protocol is what this function ships.

    Run: python -c "from scripts.bench_ingest import loader_scaling; loader_scaling()"
    """
    import csv as _csv

    import numpy as _np

    from yolo_scratch_tpu.data.crater import CraterDataset
    from yolo_scratch_tpu.data.loader import Loader

    out = {}
    with tempfile.TemporaryDirectory() as td:
        site = Path(td) / "altitude10" / "longitude5"
        (site / "truth").mkdir(parents=True)
        paths = _make_images(site, n, src, "png", "smooth")
        rows = [{"inputImage": Path(p).name,
                 "ellipseCenterX(px)": src / 2, "ellipseCenterY(px)": src / 2,
                 "ellipseSemimajor(px)": 20, "ellipseSemiminor(px)": 15,
                 "crater_classification": 1} for p in paths]
        with open(site / "truth" / "detections.csv", "w", newline="") as fh:
            w = _csv.DictWriter(fh, fieldnames=list(rows[0]))
            w.writeheader()
            w.writerows(rows)
        ds = CraterDataset(str(td), img_size=S, cache_size=0)  # decode every epoch
        for nw in workers:
            loader = Loader(ds, batch_size=8, max_gt=4, prefetch=0, workers=nw)
            list(loader)  # warm (page cache, pool spin-up)
            best = float("inf")
            for _ in range(repeats):
                t0 = time.perf_counter()
                cnt = sum(b["img"].shape[0] for b in loader)
                best = min(best, time.perf_counter() - t0)
            out[f"workers_{nw}_img_per_s"] = round(cnt / best, 1)
    out.update({"n": n, "src_size": src, "dst_size": S})
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "loader":
        loader_scaling(*(int(a) for a in sys.argv[2:]))
    else:
        main(
            int(sys.argv[1]) if len(sys.argv) > 1 else 64,
            int(sys.argv[2]) if len(sys.argv) > 2 else 1024,
        )
