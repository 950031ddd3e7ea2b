"""Structured training observability.

The reference logs via print + tqdm postfix only (SURVEY.md §5.5). Here:
per-step scalar records (loss triplet, lr, imgs/sec/chip) go through a
pluggable writer stack — stdout table (reference-style), JSONL file, or
any callable — and a throughput meter tracks the BASELINE.json headline
metric (images/sec/chip).
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Callable, Dict, List, Optional


class JsonlWriter:
    def __init__(self, path: str):
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._fh = open(self.path, "a")

    def __call__(self, record: Dict):
        self._fh.write(json.dumps(record) + "\n")
        self._fh.flush()

    def close(self):
        self._fh.close()


class StdoutWriter:
    """Reference-style compact line (``train_yolo11_cuda.py:79-84``)."""

    def __init__(self, every: int = 50):
        self.every = every

    def __call__(self, record: Dict):
        step = record.get("step", 0)
        if step % self.every:
            return
        parts = [f"step {step}"]
        for k, v in record.items():
            if k == "step":
                continue
            parts.append(f"{k} {v:.4f}" if isinstance(v, float) else f"{k} {v}")
        print(" | ".join(parts))


class MetricsLogger:
    def __init__(self, writers: Optional[List[Callable[[Dict], None]]] = None):
        self.writers = writers if writers is not None else [StdoutWriter()]

    def log(self, step: int, **scalars):
        record = {"step": int(step), "time": time.time()}
        record.update({k: float(v) for k, v in scalars.items()})
        for w in self.writers:
            w(record)


class ThroughputMeter:
    """images/sec/chip over a sliding window — the headline metric."""

    def __init__(self, n_chips: int = 1, window: int = 50):
        self.n_chips = max(n_chips, 1)
        self.window = window
        self._events: List[tuple] = []

    def update(self, n_images: int):
        now = time.perf_counter()
        self._events.append((now, n_images))
        if len(self._events) > self.window:
            self._events.pop(0)

    @property
    def images_per_sec_per_chip(self) -> float:
        if len(self._events) < 2:
            return 0.0
        dt = self._events[-1][0] - self._events[0][0]
        imgs = sum(n for _, n in self._events[1:])
        return imgs / dt / self.n_chips if dt > 0 else 0.0
