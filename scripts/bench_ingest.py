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


def _make_images(d: Path, n: int, size: int, fmt: str = "png"):
    from PIL import Image

    rng = np.random.RandomState(0)
    paths = []
    for i in range(n):
        arr = rng.randint(0, 256, (size, size), np.uint8)
        p = d / f"img_{i}.{fmt}"
        Image.fromarray(arr, "L").save(p)
        paths.append(str(p))
    return paths


def main(n: int = 64, src: int = 1024, S: int = 640, repeats: int = 3):
    from yolo_scratch_tpu.data.native import available, prepare_batch

    assert available(), "native library failed to build"
    out = {}
    with tempfile.TemporaryDirectory() as td:
        for fmt in ("png", "jpeg"):
            paths = _make_images(Path(td), n, src, fmt)
            for dtype in ("float32", "uint8"):
                prepare_batch(paths[:2], img_size=S, channels=1, dtype=dtype)  # pool warmup
                best = float("inf")
                for _ in range(repeats):
                    t0 = time.perf_counter()
                    _, _, status = prepare_batch(paths, img_size=S, channels=1, dtype=dtype)
                    dt = time.perf_counter() - t0
                    best = min(best, dt)
                    assert (status == 0).all()
                out[f"{fmt}_{dtype}_img_per_s"] = round(n / best, 1)
    out.update({"n": n, "src_size": src, "dst_size": S, "note": "1 host core"})
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 64,
        int(sys.argv[2]) if len(sys.argv) > 2 else 1024,
    )
