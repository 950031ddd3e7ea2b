"""Legacy hand-wired model family (reference ``models/backbone.py``,
``neck.py``, ``head.py``, ``yolo_scratch.py``).

The reference keeps this dormant first-generation model alongside YOLO11:
a CSP backbone with P2-P5 outputs (strides 4/8/16/32, base widths
64/128/256/384 x width_mult — ``backbone.py:94-97``), a classic FPN
(1x1 laterals to one width, nearest-upsample top-down adds, 3x3 smoothing —
``neck.py:66-76``), and an anchor-free per-scale dict head (bbox 4 +
objectness 1 + classes nc — ``head.py:76-93``). ``YOLOScratch`` wires them
with width_mult=1.15 (~10M params — ``yolo_scratch.py:30-44``).

Same capability here, NHWC flax. Note the legacy CSPBlock differs from
YOLO11's C2f: main path is conv1 -> n x (two 3x3 convs), shortcut path is a
1x1 conv (identity if channels already match), concat, 1x1 fuse, then an
EXTRA SiLU on top of the fused Conv-BN-SiLU (``backbone.py:66-71``) —
preserved.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from yolo_scratch_tpu.nn.modules import ConvBNAct, upsample2x


class CSPBlock(nn.Module):
    """Legacy CSP block (reference ``backbone.py:31-71``)."""

    c2: int
    num_blocks: int = 1
    expansion: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = int(self.c2 * self.expansion)
        main = ConvBNAct(hidden, 1, name="conv1")(x, train)
        for i in range(self.num_blocks):
            main = ConvBNAct(hidden, 3, name=f"blocks_{i}_0")(main, train)
            main = ConvBNAct(hidden, 3, name=f"blocks_{i}_1")(main, train)
        if x.shape[-1] != hidden:
            short = ConvBNAct(hidden, 1, name="conv_shortcut")(x, train)
        else:
            short = x
        out = ConvBNAct(self.c2, 1, name="conv2")(jnp.concatenate([main, short], -1), train)
        return jax.nn.silu(out)  # the reference's extra activation (:71)


class LegacyBackbone(nn.Module):
    """CSP backbone, P2-P5 at strides 4/8/16/32 (reference ``backbone.py:73-146``)."""

    width_mult: float = 1.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        wm = self.width_mult
        c2, c3, c4, c5 = int(64 * wm), int(128 * wm), int(256 * wm), int(384 * wm)

        x = ConvBNAct(c2 // 2, 3, 2, name="stem_0")(x, train)
        x = ConvBNAct(c2, 3, 2, name="stem_1")(x, train)
        p2 = CSPBlock(c2, 1, name="stage_p2")(x, train)
        x = ConvBNAct(c3, 3, 2, name="down_p2_p3")(p2, train)
        p3 = CSPBlock(c3, 2, name="stage_p3")(x, train)
        x = ConvBNAct(c4, 3, 2, name="down_p3_p4")(p3, train)
        p4 = CSPBlock(c4, 2, name="stage_p4")(x, train)
        x = ConvBNAct(c5, 3, 2, name="down_p4_p5")(p4, train)
        p5 = CSPBlock(c5, 1, name="stage_p5")(x, train)
        return [p2, p3, p4, p5]


class FPNNeck(nn.Module):
    """Classic FPN (reference ``neck.py:13-78``)."""

    out_channels: int = 160

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        p2, p3, p4, p5 = feats
        oc = self.out_channels
        l5 = ConvBNAct(oc, 1, p=0, name="lateral_p5")(p5, train)
        l4 = ConvBNAct(oc, 1, p=0, name="lateral_p4")(p4, train)
        l3 = ConvBNAct(oc, 1, p=0, name="lateral_p3")(p3, train)
        l2 = ConvBNAct(oc, 1, p=0, name="lateral_p2")(p2, train)

        n5 = ConvBNAct(oc, 3, name="smooth_p5")(l5, train)
        n4 = ConvBNAct(oc, 3, name="smooth_p4")(l4 + upsample2x(l5), train)
        n3 = ConvBNAct(oc, 3, name="smooth_p3")(l3 + upsample2x(n4), train)
        n2 = ConvBNAct(oc, 3, name="smooth_p2")(l2 + upsample2x(n3), train)
        return [n2, n3, n4, n5]


class LegacyHead(nn.Module):
    """Anchor-free dict head (reference ``head.py:14-93``). Output per scale:
    {'bbox' (B,H,W,4) raw, 'objectness' (B,H,W,1), 'classes' (B,H,W,nc)}.
    Box decode contract (legacy loss ``yolo_loss.py:111-118``):
    cx,cy = sigmoid; w,h = exp clamped >= 0.01, all normalized [0,1]."""

    num_classes: int = 5
    num_scales: int = 4

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        outs = []
        for i, f in enumerate(feats[: self.num_scales]):
            c = f.shape[-1]
            x = ConvBNAct(c, 3, name=f"shared_{i}_0")(f, train)
            x = ConvBNAct(c, 3, name=f"shared_{i}_1")(x, train)
            b = nn.Conv(c, (3, 3), padding="SAME", name=f"bbox_{i}_0")(x)
            b = jax.nn.silu(b)
            b = nn.Conv(4, (1, 1), name=f"bbox_{i}_1")(b)
            o = nn.Conv(1, (1, 1), name=f"obj_{i}")(x)
            cl = nn.Conv(self.num_classes, (1, 1), name=f"cls_{i}")(x)
            outs.append({"bbox": b, "objectness": o, "classes": cl})
        return outs


class YOLOScratchModel(nn.Module):
    """Complete legacy model (reference ``yolo_scratch.py:13-72``)."""

    num_classes: int = 5
    width_mult: float = 1.15

    @nn.compact
    def __call__(self, x, train: bool = False):
        wm = self.width_mult
        feats = LegacyBackbone(width_mult=wm, name="backbone")(x, train)
        neck_out = FPNNeck(out_channels=int(160 * wm), name="neck")(feats, train)
        return LegacyHead(num_classes=self.num_classes, name="head")(neck_out, train)


def decode_legacy_bbox(raw_bbox: jnp.ndarray) -> jnp.ndarray:
    """Legacy box decode: (B, H, W, 4) raw -> normalized xyxy.

    Contract from ``losses/yolo_loss.py:111-118``: sigmoid centers,
    exp(w/h) clamped to >= 0.01."""
    cx = jax.nn.sigmoid(raw_bbox[..., 0])
    cy = jax.nn.sigmoid(raw_bbox[..., 1])
    w = jnp.clip(jnp.exp(raw_bbox[..., 2]), 0.01, None)
    h = jnp.clip(jnp.exp(raw_bbox[..., 3]), 0.01, None)
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)
