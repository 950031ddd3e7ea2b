"""Loader(workers=N): concurrent per-sample decode, bit-exact vs serial.

The reference feeds its trainer with up to 4 DataLoader worker processes
(``train_yolo11_cuda.py:511-543``, num_workers/pin_memory/prefetch_factor).
Our analog is a per-batch thread pool (``data/loader.py``): threads work
because the decode hot path (native ctypes decode, cv2 resize) releases
the GIL. These tests pin the two contracts:

1. batches are **bit-exact** vs the serial path (identical ``dataset[i]``
   code per sample, order preserved by ``executor.map``), including under
   cache thrash and shuffle + wrap padding;
2. the pool genuinely overlaps sample fetches (measured with a
   GIL-releasing sleepy dataset — this host has 1 core, so wall-clock
   scaling of real decode is measured separately in scripts/bench_ingest).
"""

import csv
import time

import numpy as np
import pytest

from yolo_scratch_tpu.data.crater import CraterDataset
from yolo_scratch_tpu.data.loader import Loader

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def crater_root(tmp_path_factory):
    """7 images (not divisible by batch 4 -> wrap-padded final batch)."""
    root = tmp_path_factory.mktemp("crater_workers")
    rng = np.random.RandomState(7)
    site = root / "altitude10" / "longitude5"
    (site / "truth").mkdir(parents=True)
    rows = []
    for i in range(7):
        name = f"img{i}.png"
        w, h = int(rng.randint(60, 100)), int(rng.randint(60, 100))
        img = (rng.rand(h, w) * 255).astype(np.uint8)
        cv2.imwrite(str(site / name), img)
        for _ in range(int(rng.randint(1, 4))):
            a = rng.uniform(6, 14)
            rows.append({
                "inputImage": name,
                "ellipseCenterX(px)": rng.uniform(15, w - 15),
                "ellipseCenterY(px)": rng.uniform(15, h - 15),
                "ellipseSemimajor(px)": a,
                "ellipseSemiminor(px)": rng.uniform(4, a),
                "crater_classification": int(rng.randint(0, 5)),
            })
    with open(site / "truth" / "detections.csv", "w", newline="") as fh:
        wtr = csv.DictWriter(fh, fieldnames=list(rows[0]))
        wtr.writeheader()
        wtr.writerows(rows)
    return str(root)


def _all_batches(loader, epochs=2):
    out = []
    for _ in range(epochs):
        out.extend(list(loader))
    return out


def test_workers_bit_exact_vs_serial(crater_root):
    """Same pixels, boxes, masks, and wrap-padding flags — across a
    shuffled epoch boundary and with the LRU cache thrashing (size 2)."""
    mk = lambda workers: Loader(
        CraterDataset(crater_root, img_size=64, cache_size=2),
        batch_size=4, max_gt=8, shuffle=True, seed=3, prefetch=0,
        workers=workers,
    )
    serial = _all_batches(mk(0))
    pooled = _all_batches(mk(4))
    assert len(serial) == len(pooled) == 4  # ceil(7/4) * 2 epochs
    for bs, bp in zip(serial, pooled):
        assert sorted(bs) == sorted(bp)
        for k in bs:
            np.testing.assert_array_equal(bs[k], bp[k], err_msg=k)
    # final batch of each epoch carries a wrap-padding invalid row
    assert serial[1]["sample_valid"].tolist() == [True, True, True, False]


def test_workers_compose_with_prefetch_thread(crater_root):
    """workers pool inside the prefetch producer thread: same batches."""
    ds = CraterDataset(crater_root, img_size=64)
    a = _all_batches(Loader(ds, 4, max_gt=8, prefetch=2, workers=4), epochs=1)
    b = _all_batches(Loader(ds, 4, max_gt=8, prefetch=0, workers=0), epochs=1)
    for ba, bb in zip(a, b):
        for k in ba:
            np.testing.assert_array_equal(ba[k], bb[k], err_msg=k)


class _SleepyDataset:
    """GIL-releasing fetch (time.sleep drops the GIL exactly like a ctypes
    decode call) — measures pool overlap independently of core count."""

    def __init__(self, n, delay):
        self.n = n
        self.delay = delay

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        time.sleep(self.delay)
        img = np.full((16, 16, 1), i / 255.0, np.float32)
        return img, np.array([[0.5, 0.5, 0.2, 0.2]], np.float32), np.array([0], np.int32)


def test_workers_overlap_sample_fetch():
    ds = _SleepyDataset(16, delay=0.02)
    t0 = time.perf_counter()
    n_serial = len(_all_batches(Loader(ds, 8, max_gt=4, prefetch=0, workers=0), epochs=1))
    t_serial = time.perf_counter() - t0
    t0 = time.perf_counter()
    n_pool = len(_all_batches(Loader(ds, 8, max_gt=4, prefetch=0, workers=8), epochs=1))
    t_pool = time.perf_counter() - t0
    assert n_serial == n_pool == 2
    # 16 fetches x 20 ms = 320 ms serial vs ~2 x 20 ms pooled; require a
    # conservative 3x to stay robust under CI scheduling noise.
    assert t_serial > 3.0 * t_pool, (t_serial, t_pool)
