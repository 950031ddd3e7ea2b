"""Pallas TPU kernel for the greedy-NMS suppression sweep.

The XLA version (``ops/nms.py``) materializes the full (N, N) IoU matrix
and runs an N-step ``fori_loop`` of tiny HLO ops. This kernel keeps the
whole problem resident in VMEM — boxes stored transposed (4, N) so the
lane dimension is the box axis — and computes each pivot's IoU row on the
fly inside the loop (no N^2 HBM traffic, one kernel launch, VPU-wide
compare/accumulate). Semantics are identical to greedy NMS: a suppressed
box never suppresses others.

Layout notes (see pallas_guide): last dim N should be a multiple of 128;
masks are float32 in VMEM; scalars are read with dynamic slices.
``interpret=True`` is used automatically on CPU so tests exercise the same
code path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nms_kernel(boxes_ref, valid_ref, out_ref, *, iou_threshold: float, n: int):
    # Pivot extraction uses one-hot masked reductions instead of dynamic
    # scalar loads (which Mosaic cannot lower, especially under vmap's
    # extra batch dim) — every step is a plain lane-wide VPU op.
    x1 = boxes_ref[0:1, :]  # (1, N)
    y1 = boxes_ref[1:2, :]
    x2 = boxes_ref[2:3, :]
    y2 = boxes_ref[3:4, :]
    valid = valid_ref[0:1, :]  # (1, N) f32
    area = (x2 - x1) * (y2 - y1)
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)

    def body(i, supp):
        onehot = (idx == i)  # (1, N)

        def pick(row):
            return jnp.sum(jnp.where(onehot, row, 0.0), axis=1, keepdims=True)  # (1, 1)

        bx1, by1, bx2, by2 = pick(x1), pick(y1), pick(x2), pick(y2)
        v_i = pick(valid)
        s_i = pick(supp)
        kept = (v_i > 0.5) & (s_i < 0.5)  # (1, 1)

        ix1 = jnp.maximum(x1, bx1)
        iy1 = jnp.maximum(y1, by1)
        ix2 = jnp.minimum(x2, bx2)
        iy2 = jnp.minimum(y2, by2)
        inter = jnp.maximum(ix2 - ix1, 0.0) * jnp.maximum(iy2 - iy1, 0.0)
        b_area = (bx2 - bx1) * (by2 - by1)
        iou = inter / (area + b_area - inter + 1e-6)

        kill = kept & (iou > iou_threshold) & (idx > i)
        return jnp.where(kill, 1.0, supp)

    supp = jax.lax.fori_loop(0, n, body, jnp.zeros((1, n), jnp.float32))
    out_ref[0:1, :] = valid * (1.0 - supp)


def _pad_to(x: jnp.ndarray, n: int, axis: int, value=0.0) -> jnp.ndarray:
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


@partial(jax.jit, static_argnames=("iou_threshold", "interpret"))
def nms_sweep_pallas(
    boxes_sorted: jnp.ndarray,  # (N, 4) xyxy, SCORE-DESCENDING order
    valid_sorted: jnp.ndarray,  # (N,) bool
    iou_threshold: float = 0.45,
    interpret: bool | None = None,
):
    """Greedy suppression over score-sorted boxes -> keep (N,) bool."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n0 = boxes_sorted.shape[0]
    n = max(((n0 + 127) // 128) * 128, 128)
    boxes_t = _pad_to(boxes_sorted.T.astype(jnp.float32), n, axis=1)  # (4, N)
    valid = _pad_to(valid_sorted.astype(jnp.float32)[None, :], n, axis=1)  # (1, N)

    out = pl.pallas_call(
        partial(_nms_kernel, iou_threshold=iou_threshold, n=n),
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.VMEM),
        interpret=interpret,
    )(boxes_t, valid)
    return out[0, :n0] > 0.5


def _nms_kernel_batched(x1_ref, y1_ref, x2_ref, y2_ref, valid_ref, out_ref,
                        *, iou_threshold: float, n: int):
    """Whole-batch greedy sweep: rows are images (sublanes), lanes are boxes.

    One kernel launch for the full batch — each sequential step suppresses
    across every image at once (the vmap-of-kernel alternative serializes
    per-image grid programs)."""
    x1 = x1_ref[:, :]  # (B, N)
    y1 = y1_ref[:, :]
    x2 = x2_ref[:, :]
    y2 = y2_ref[:, :]
    valid = valid_ref[:, :]
    b = x1.shape[0]
    area = (x2 - x1) * (y2 - y1)
    idx = jax.lax.broadcasted_iota(jnp.int32, (b, n), 1)

    def body(i, supp):
        onehot = idx == i  # (B, N) — column i

        def pick(row):
            return jnp.sum(jnp.where(onehot, row, 0.0), axis=1, keepdims=True)  # (B, 1)

        bx1, by1, bx2, by2 = pick(x1), pick(y1), pick(x2), pick(y2)
        kept = (pick(valid) > 0.5) & (pick(supp) < 0.5)  # (B, 1)

        ix1 = jnp.maximum(x1, bx1)
        iy1 = jnp.maximum(y1, by1)
        ix2 = jnp.minimum(x2, bx2)
        iy2 = jnp.minimum(y2, by2)
        inter = jnp.maximum(ix2 - ix1, 0.0) * jnp.maximum(iy2 - iy1, 0.0)
        b_area = (bx2 - bx1) * (by2 - by1)
        iou = inter / (area + b_area - inter + 1e-6)

        kill = kept & (iou > iou_threshold) & (idx > i)
        return jnp.where(kill, 1.0, supp)

    supp = jax.lax.fori_loop(0, n, body, jnp.zeros_like(x1))
    out_ref[:, :] = valid * (1.0 - supp)


@partial(jax.jit, static_argnames=("iou_threshold", "interpret"))
def nms_sweep_pallas_batched(
    boxes_sorted: jnp.ndarray,  # (B, N, 4) xyxy, each row SCORE-DESCENDING
    valid_sorted: jnp.ndarray,  # (B, N) bool
    iou_threshold: float = 0.45,
    interpret: bool | None = None,
):
    """Batched greedy suppression -> keep (B, N) bool."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, n0 = boxes_sorted.shape[:2]
    n = max(((n0 + 127) // 128) * 128, 128)
    coords = [
        _pad_to(boxes_sorted[..., k].astype(jnp.float32), n, axis=1) for k in range(4)
    ]
    valid = _pad_to(valid_sorted.astype(jnp.float32), n, axis=1)

    space = pl.ANY if interpret else pltpu.VMEM
    out = pl.pallas_call(
        partial(_nms_kernel_batched, iou_threshold=iou_threshold, n=n),
        out_shape=jax.ShapeDtypeStruct((B, n), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=space)] * 5,
        out_specs=pl.BlockSpec(memory_space=space),
        interpret=interpret,
    )(*coords, valid)
    return out[:, :n0] > 0.5


def _class_offset(boxes: jnp.ndarray, class_ids: jnp.ndarray) -> jnp.ndarray:
    """Standard per-class box-offset trick (same as ``ops.nms.nms``): shift
    each class into a disjoint coordinate range so cross-class IoU is zero.
    Pure elementwise XLA — the Pallas sweep itself stays class-agnostic."""
    span = jnp.max(jnp.abs(boxes)) + 1.0
    return boxes + (class_ids.astype(boxes.dtype) * span * 2.0)[..., None]


def nms_pallas_batched(
    boxes: jnp.ndarray,  # (B, N, 4)
    scores: jnp.ndarray,  # (B, N)
    valid: jnp.ndarray,  # (B, N)
    iou_threshold: float = 0.45,
    max_det: int = 300,
    interpret: bool | None = None,
    class_ids: jnp.ndarray | None = None,
    class_aware: bool = False,
    presorted: bool = False,
):
    """Batched drop-in for vmapped ``ops.nms.nms``.

    ``presorted``: caller guarantees rows are already score-descending
    (the prefilter's top-k output is) — skips the argsort and its
    scalar-core reorder gathers.
    """
    if class_aware and class_ids is not None:
        boxes = _class_offset(boxes, class_ids)
    if presorted:
        keep = nms_sweep_pallas_batched(boxes, valid, iou_threshold, interpret=interpret)
        rank = jnp.cumsum(keep.astype(jnp.int32), axis=1) - 1
        return keep & (rank < max_det)
    order = jnp.argsort(-scores, axis=1)
    boxes_s = jnp.take_along_axis(boxes, order[..., None], axis=1)
    valid_s = jnp.take_along_axis(valid, order, axis=1)
    keep_s = nms_sweep_pallas_batched(boxes_s, valid_s, iou_threshold, interpret=interpret)
    rank = jnp.cumsum(keep_s.astype(jnp.int32), axis=1) - 1
    keep_s = keep_s & (rank < max_det)
    out = jnp.zeros_like(keep_s)
    return out.at[jnp.arange(boxes.shape[0])[:, None], order].set(keep_s)


def nms_pallas(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float = 0.45,
    max_det: int = 300,
    valid: jnp.ndarray | None = None,
    interpret: bool | None = None,
    class_ids: jnp.ndarray | None = None,
    class_aware: bool = False,
):
    """Drop-in for ``ops.nms.nms`` backed by the Pallas sweep."""
    boxes = jnp.asarray(boxes)
    scores = jnp.asarray(scores)
    n = boxes.shape[0]
    valid = jnp.ones((n,), bool) if valid is None else jnp.asarray(valid)
    if class_aware and class_ids is not None:
        boxes = _class_offset(boxes, class_ids)

    order = jnp.argsort(-scores)
    keep_s = nms_sweep_pallas(boxes[order], valid[order], iou_threshold, interpret=interpret)
    rank = jnp.cumsum(keep_s.astype(jnp.int32)) - 1
    keep_s = keep_s & (rank < max_det)
    return jnp.zeros((n,), bool).at[order].set(keep_s)
