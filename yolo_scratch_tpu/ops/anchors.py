"""Anchor-point generation for anchor-free heads.

The reference regenerates anchors from live feature shapes with a
shape-change cache (``models/yolo11_modules.py:288-300`` and
``Detect.inference:253-255``). Here shapes are static under jit, so anchors
are computed once from (h, w, stride) triples — plain arithmetic, no dummy
forward pass.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np
import jax.numpy as jnp


def make_anchors(
    hw_strides: Sequence[Tuple[int, int, float]],
    grid_cell_offset: float = 0.5,
    dtype=jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Build (anchor_points (A, 2), stride_tensor (A, 1)) from static shapes.

    ``hw_strides``: per detection scale, (feat_h, feat_w, stride).
    Anchor order matches reference ``make_anchors`` (row-major y-outer,
    x-inner; x first in the point tuple): ``losses/yolo_v8_loss.py:541-552``.
    """
    pts, strides = [], []
    for h, w, s in hw_strides:
        sx = np.arange(w, dtype=np.float32) + grid_cell_offset
        sy = np.arange(h, dtype=np.float32) + grid_cell_offset
        gy, gx = np.meshgrid(sy, sx, indexing="ij")
        pts.append(np.stack([gx, gy], axis=-1).reshape(-1, 2))
        strides.append(np.full((h * w, 1), s, dtype=np.float32))
    return jnp.asarray(np.concatenate(pts), dtype=dtype), jnp.asarray(np.concatenate(strides), dtype=dtype)


def feat_shapes_for(img_hw: Tuple[int, int], strides: Sequence[float]):
    """(img_h, img_w) + strides -> [(feat_h, feat_w, stride), ...]."""
    return [(int(img_hw[0] // s), int(img_hw[1] // s), float(s)) for s in strides]
