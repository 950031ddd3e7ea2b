"""Device-resident Gaussian-angle (dGA) NMS — the CDA-aware suppressor.

Host reference: ``utils/metrics.py`` ``cda_nms`` (``:484-620``) computes
ellipse Y-matrices and pairwise Gaussian angles with per-pair numpy calls.
Here the whole thing is jit-resident: 2x2 determinants/inverses in closed
form over (N, N) arrays, then the same greedy sweep as IoU-NMS but keyed on
dGA < threshold, capped at ``max_det`` (the CDA scorer's top-10 rule).

Semantics match the host version (verified by test): semimajor = max of
half-extents, fallback angle pi/2 when any determinant is non-positive.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _ellipse_params(boxes: jnp.ndarray, angles: jnp.ndarray | None):
    w = boxes[:, 2] - boxes[:, 0]
    h = boxes[:, 3] - boxes[:, 1]
    a = jnp.maximum(w, h) / 2.0
    b = jnp.minimum(w, h) / 2.0
    xc = (boxes[:, 0] + boxes[:, 2]) / 2.0
    yc = (boxes[:, 1] + boxes[:, 3]) / 2.0
    phi = jnp.zeros_like(a) if angles is None else angles
    return a, b, xc, yc, phi


def _y_components(a, b, phi, eps=1e-12):
    """Y = R(phi) diag(1/a^2, 1/b^2) R(-phi) as (y00, y01, y11)."""
    c, s = jnp.cos(phi), jnp.sin(phi)
    ia2 = 1.0 / jnp.maximum(a * a, eps)
    ib2 = 1.0 / jnp.maximum(b * b, eps)
    y00 = c * c * ia2 + s * s * ib2
    y01 = c * (-s) * ia2 + s * c * ib2
    y11 = s * s * ia2 + c * c * ib2
    return y00, y01, y11


def pairwise_dga(boxes: jnp.ndarray, angles: jnp.ndarray | None = None) -> jnp.ndarray:
    """All-pairs Gaussian angle between box-implied ellipses: (N, 4) -> (N, N).

    Matches the host ``_calc_dGA`` math (``utils/metrics.py:456-481``)
    including the pi/2 fallback on non-positive determinants."""
    a, b, xc, yc, phi = _ellipse_params(boxes, angles)
    y00, y01, y11 = _y_components(a, b, phi)
    det = y00 * y11 - y01 * y01  # (N,)

    s00 = y00[:, None] + y00[None, :]
    s01 = y01[:, None] + y01[None, :]
    s11 = y11[:, None] + y11[None, :]
    det_sum = s00 * s11 - s01 * s01  # (N, N)

    bad = (det_sum <= 0) | (det[:, None] <= 0) | (det[None, :] <= 0)
    safe_det_sum = jnp.where(bad, 1.0, det_sum)

    mult = 4.0 * jnp.sqrt(jnp.clip(det[:, None] * det[None, :], 0.0, None)) / safe_det_sum

    dx = xc[:, None] - xc[None, :]
    dy = yc[:, None] - yc[None, :]
    # v = inv(S) @ d  with inv(S) = adj(S)/det(S)
    vx = (s11 * dx - s01 * dy) / safe_det_sum
    vy = (-s01 * dx + s00 * dy) / safe_det_sum
    # e = -0.5 * d^T Yi (v' ) where  Yi v applied to (vx, vy) of Yj v... the
    # host computes d^T Yi inv(S) Yj d; expand Yj d first:
    jx = y00[None, :] * dx + y01[None, :] * dy
    jy = y01[None, :] * dx + y11[None, :] * dy
    ivx = (s11 * jx - s01 * jy) / safe_det_sum
    ivy = (-s01 * jx + s00 * jy) / safe_det_sum
    quad = dx * (y00[:, None] * ivx + y01[:, None] * ivy) + dy * (
        y01[:, None] * ivx + y11[:, None] * ivy
    )
    cos_term = jnp.clip(mult * jnp.exp(-0.5 * quad), -1.0, 1.0)
    dga = jnp.arccos(cos_term)
    return jnp.where(bad, jnp.pi / 2.0, dga)


@partial(jax.jit, static_argnames=("max_det", "dga_thresh"))
def dga_nms_device(
    boxes: jnp.ndarray,  # (N, 4) xyxy (normalized or pixel — scale-free)
    scores: jnp.ndarray,  # (N,)
    valid: jnp.ndarray | None = None,
    angles: jnp.ndarray | None = None,
    max_det: int = 10,
    dga_thresh: float = 0.15,
):
    """Greedy dGA suppression -> keep (N,) bool (at most max_det kept)."""
    boxes = jnp.asarray(boxes)
    scores = jnp.asarray(scores)
    n = boxes.shape[0]
    valid = jnp.ones((n,), bool) if valid is None else jnp.asarray(valid)

    order = jnp.argsort(-scores)
    boxes_s = boxes[order]
    valid_s = valid[order]
    angles_s = None if angles is None else jnp.asarray(angles)[order]

    dga = pairwise_dga(boxes_s, angles_s)
    idx = jnp.arange(n)

    def body(i, suppressed):
        is_kept = valid_s[i] & ~suppressed[i]
        kill = is_kept & (dga[i] < dga_thresh) & (idx > i)
        return suppressed | kill

    suppressed = jax.lax.fori_loop(0, n, body, jnp.zeros((n,), bool))
    keep_s = valid_s & ~suppressed
    rank = jnp.cumsum(keep_s.astype(jnp.int32)) - 1
    keep_s = keep_s & (rank < max_det)
    return jnp.zeros((n,), bool).at[order].set(keep_s)
