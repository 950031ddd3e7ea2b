"""Host batch loader: dataset -> fixed-shape padded batches, prefetched.

Replaces the reference's torch DataLoader stack (worker processes,
pin_memory, prefetch_factor — ``train_yolo11_cuda.py:509-543``) with a
double-buffered background-thread pipeline feeding jit-ready numpy batches.
Device placement/sharding happens in the caller (``parallel.shard_batch``),
so the loader stays framework-free and testable.

Boxes leave the loader as normalized **xyxy** (the reference collate's
convert+clamp, ``datasets/crater_dataset_cuda.py:311-324``).
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Optional, Sequence

import numpy as np

from yolo_scratch_tpu.data.batch import pad_targets


def _xywh2xyxy_np(b: np.ndarray) -> np.ndarray:
    out = np.empty_like(b)
    out[..., 0] = b[..., 0] - b[..., 2] / 2
    out[..., 1] = b[..., 1] - b[..., 3] / 2
    out[..., 2] = b[..., 0] + b[..., 2] / 2
    out[..., 3] = b[..., 1] + b[..., 3] / 2
    return np.clip(out, 0.0, 1.0)  # reference collate clamp (:319-322)


class Loader:
    """Iterates fixed-shape batches over a map-style dataset.

    Batch dict: img (B,H,W,C) f32, gt_labels (B,G) i32,
    gt_bboxes (B,G,4) f32 xyxy-normalized, gt_mask (B,G) bool.
    The final short batch is padded by wrapping (drop_last=False semantics
    with static shapes).
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        max_gt: int = 100,
        shuffle: bool = False,
        seed: int = 0,
        indices: Optional[Sequence[int]] = None,
        prefetch: int = 2,
    ):
        self.ds = dataset
        self.batch_size = batch_size
        self.max_gt = max_gt
        self.shuffle = shuffle
        self.seed = seed
        self.indices = np.asarray(indices if indices is not None else np.arange(len(dataset)))
        self.prefetch = prefetch
        self.epoch = 0

    def __len__(self) -> int:
        return int(np.ceil(len(self.indices) / self.batch_size))

    def _make_batch(self, idxs: np.ndarray) -> Dict[str, np.ndarray]:
        imgs, boxes_list, labels_list = [], [], []
        for i in idxs:
            img, boxes, labels = self.ds[int(i)]
            imgs.append(img)
            boxes_list.append(_xywh2xyxy_np(boxes) if len(boxes) else boxes.reshape(0, 4))
            labels_list.append(labels)
        gl, gb, gm = pad_targets(boxes_list, labels_list, self.max_gt)
        return {
            "img": np.stack(imgs).astype(np.float32),
            "gt_labels": gl,
            "gt_bboxes": gb,
            "gt_mask": gm,
        }

    def _epoch_indices(self) -> np.ndarray:
        idxs = self.indices.copy()
        if self.shuffle:
            np.random.RandomState(self.seed + self.epoch).shuffle(idxs)
        n = len(idxs)
        B = self.batch_size
        pad = (-n) % B
        if pad:
            idxs = np.concatenate([idxs, idxs[:pad]])
        return idxs

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        idxs = self._epoch_indices()
        self.epoch += 1
        chunks = idxs.reshape(-1, self.batch_size)

        if self.prefetch <= 0:
            for chunk in chunks:
                yield self._make_batch(chunk)
            return

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        SENTINEL = object()

        def worker():
            try:
                for chunk in chunks:
                    q.put(self._make_batch(chunk))
            finally:
                q.put(SENTINEL)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is SENTINEL:
                break
            yield item
