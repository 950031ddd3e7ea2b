"""Profiling hooks (SURVEY.md §5.1: absent in the reference; first-class here).

``trace(logdir)`` wraps a region in a jax.profiler trace viewable in
TensorBoard/XProf; ``annotate(name)`` marks sub-regions; ``time_fn`` gives
honest wall-time for jitted callables (syncing by fetching output bytes —
required under the axon TPU tunnel where block_until_ready returns early).
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Tuple

import numpy as np

import jax


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named sub-region inside a trace (TraceAnnotation context manager)."""
    return jax.profiler.TraceAnnotation(name)


def _sync(out: Any) -> None:
    for leaf in jax.tree_util.tree_leaves(out):
        np.asarray(leaf)


def time_fn(fn: Callable, *args, iters: int = 10, warmup: int = 2) -> Tuple[float, Any]:
    """Returns (seconds_per_call, last_output). Compiles first; syncs via
    host fetch (see module docstring)."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters, out
