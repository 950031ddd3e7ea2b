"""YOLOX model family — CSPDarknet backbone, PAFPN neck, decoupled head.

The reference snapshot's ``YOLOX/`` directory is EMPTY (SURVEY.md §0.6), so
this is built from the published recipe (YOLOX, arXiv 2107.08430) rather
than any reference source: Focus stem, CSP(C3) stages, SPP(5/9/13) in
dark5, PAN top-down+bottom-up neck, and the decoupled anchor-free head
(separate cls / reg+obj branches per level). Anchor-free decode:
xy = (raw + grid) * stride, wh = exp(raw) * stride.

NHWC flax, same conventions as the YOLO11 zoo. Scale presets follow the
paper: nano(0.33/0.25) tiny(0.33/0.375) s(0.33/0.50) m(0.67/0.75)
l(1.0/1.0) x(1.33/1.25).
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from yolo_scratch_tpu.nn.modules import ConvBNAct, upsample2x
from yolo_scratch_tpu.ops.anchors import make_anchors

SCALES = {
    "nano": (0.33, 0.25),
    "tiny": (0.33, 0.375),
    "s": (0.33, 0.50),
    "m": (0.67, 0.75),
    "l": (1.00, 1.00),
    "x": (1.33, 1.25),
}


class Focus(nn.Module):
    """Space-to-depth stem: (B, H, W, C) -> (B, H/2, W/2, 4C) -> conv."""

    c2: int
    k: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        tl = x[:, ::2, ::2, :]
        bl = x[:, 1::2, ::2, :]
        tr = x[:, ::2, 1::2, :]
        br = x[:, 1::2, 1::2, :]
        x = jnp.concatenate([tl, bl, tr, br], axis=-1)
        return ConvBNAct(self.c2, self.k, 1, name="conv")(x, train)


class CSPLayer(nn.Module):
    """C3 block: two 1x1 branches, n bottlenecks on one, concat, fuse."""

    c2: int
    n: int = 1
    shortcut: bool = True
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        a = ConvBNAct(c_, 1, 1, name="cv1")(x, train)
        for i in range(self.n):
            y = ConvBNAct(c_, 1, 1, name=f"m_{i}_cv1")(a, train)
            y = ConvBNAct(c_, 3, 1, name=f"m_{i}_cv2")(y, train)
            a = a + y if self.shortcut else y
        b = ConvBNAct(c_, 1, 1, name="cv2")(x, train)
        return ConvBNAct(self.c2, 1, 1, name="cv3")(jnp.concatenate([a, b], -1), train)


class SPPBottleneck(nn.Module):
    """Spatial pyramid pooling with kernel sizes (5, 9, 13)."""

    c2: int
    ks: Tuple[int, ...] = (5, 9, 13)

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = x.shape[-1] // 2
        y = ConvBNAct(c_, 1, 1, name="cv1")(x, train)
        pools = [y] + [
            nn.max_pool(y, (k, k), strides=(1, 1), padding=[(k // 2, k // 2)] * 2)
            for k in self.ks
        ]
        return ConvBNAct(self.c2, 1, 1, name="cv2")(jnp.concatenate(pools, -1), train)


class CSPDarknet(nn.Module):
    depth: float = 0.33
    width: float = 0.50

    @nn.compact
    def __call__(self, x, train: bool = False):
        base = int(64 * self.width)
        d = max(round(3 * self.depth), 1)

        x = Focus(base, 3, name="stem")(x, train)
        x = ConvBNAct(base * 2, 3, 2, name="dark2_conv")(x, train)
        x = CSPLayer(base * 2, d, name="dark2_csp")(x, train)
        x = ConvBNAct(base * 4, 3, 2, name="dark3_conv")(x, train)
        c3 = CSPLayer(base * 4, d * 3, name="dark3_csp")(x, train)
        x = ConvBNAct(base * 8, 3, 2, name="dark4_conv")(c3, train)
        c4 = CSPLayer(base * 8, d * 3, name="dark4_csp")(x, train)
        x = ConvBNAct(base * 16, 3, 2, name="dark5_conv")(c4, train)
        x = SPPBottleneck(base * 16, name="dark5_spp")(x, train)
        c5 = CSPLayer(base * 16, d, shortcut=False, name="dark5_csp")(x, train)
        return c3, c4, c5


class YOLOPAFPN(nn.Module):
    depth: float = 0.33
    width: float = 0.50

    @nn.compact
    def __call__(self, feats, train: bool = False):
        c3, c4, c5 = feats
        w = self.width
        d = max(round(3 * self.depth), 1)
        ch4, ch8, ch16 = int(256 * w), int(512 * w), int(1024 * w)

        lat0 = ConvBNAct(ch8, 1, 1, name="lateral_conv0")(c5, train)
        p4 = CSPLayer(ch8, d, shortcut=False, name="C3_p4")(
            jnp.concatenate([upsample2x(lat0), c4], -1), train
        )
        lat1 = ConvBNAct(ch4, 1, 1, name="reduce_conv1")(p4, train)
        p3_out = CSPLayer(ch4, d, shortcut=False, name="C3_p3")(
            jnp.concatenate([upsample2x(lat1), c3], -1), train
        )
        dn2 = ConvBNAct(ch4, 3, 2, name="bu_conv2")(p3_out, train)
        p4_out = CSPLayer(ch8, d, shortcut=False, name="C3_n3")(
            jnp.concatenate([dn2, lat1], -1), train
        )
        dn1 = ConvBNAct(ch8, 3, 2, name="bu_conv1")(p4_out, train)
        p5_out = CSPLayer(ch16, d, shortcut=False, name="C3_n4")(
            jnp.concatenate([dn1, lat0], -1), train
        )
        return p3_out, p4_out, p5_out


# torch nn.Conv2d default init (kaiming_uniform with a=sqrt(5), i.e.
# variance 1/(3*fan_in)) — what the official YOLOX leaves its prediction
# convs at. KAIMING_OUT (the reference trainer's blanket re-init,
# yolo11_model.py:177-192) is correct under BN but catastrophic on a
# 1x1 conv with 4 output channels: fan_out=4 gives weight std 0.71,
# init wh logits of ~±60 at s-width, and exp(60) in the decode turns the
# first gradient infinite (clip_by_global_norm then emits NaN params).
TORCH_CONV_DEFAULT = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")

# exp() guard for the anchor-free decode: |logit| <= 20 keeps the decoded
# box <= e^20*stride (~1.5e10 px) so IoU-area products stay finite in f32
# even mid-divergence; gradients beyond the clamp are zero, which is the
# standard saturation behavior (official YOLOX hits the same failure
# unguarded under fp16).
WH_LOGIT_CAP = 20.0


class YOLOXHead(nn.Module):
    """Decoupled head. Per level returns raw (B, H, W, 4+1+nc):
    [reg(4), obj(1), cls(nc)] — obj/cls as logits."""

    nc: int
    width: float = 0.50
    prior_prob: float = 0.01

    @nn.compact
    def __call__(self, feats, train: bool = False):
        ch = int(256 * self.width)
        bias_init = nn.initializers.constant(-math.log((1 - self.prior_prob) / self.prior_prob))
        outs = []
        for i, f in enumerate(feats):
            s = ConvBNAct(ch, 1, 1, name=f"stem_{i}")(f, train)
            c = ConvBNAct(ch, 3, 1, name=f"cls_conv_{i}_0")(s, train)
            c = ConvBNAct(ch, 3, 1, name=f"cls_conv_{i}_1")(c, train)
            cls = nn.Conv(self.nc, (1, 1), kernel_init=TORCH_CONV_DEFAULT,
                          bias_init=bias_init, name=f"cls_pred_{i}")(c)
            r = ConvBNAct(ch, 3, 1, name=f"reg_conv_{i}_0")(s, train)
            r = ConvBNAct(ch, 3, 1, name=f"reg_conv_{i}_1")(r, train)
            reg = nn.Conv(4, (1, 1), kernel_init=TORCH_CONV_DEFAULT,
                          name=f"reg_pred_{i}")(r)
            obj = nn.Conv(1, (1, 1), kernel_init=TORCH_CONV_DEFAULT,
                          bias_init=bias_init, name=f"obj_pred_{i}")(r)
            outs.append(jnp.concatenate([reg, obj, cls], -1))
        return outs


class YOLOXModel(nn.Module):
    """Full YOLOX detector. ``__call__`` returns raw per-level maps."""

    nc: int = 80
    depth: float = 0.33
    width: float = 0.50
    strides: Tuple[float, ...] = (8.0, 16.0, 32.0)

    @classmethod
    def from_scale(cls, scale: str = "s", nc: int = 80) -> "YOLOXModel":
        d, w = SCALES[scale]
        return cls(nc=nc, depth=d, width=w)

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = CSPDarknet(self.depth, self.width, name="backbone")(x, train)
        pan = YOLOPAFPN(self.depth, self.width, name="neck")(feats, train)
        return YOLOXHead(self.nc, self.width, name="head")(pan, train)

    def decode(self, outs: Sequence[jnp.ndarray], xywh: bool = False) -> jnp.ndarray:
        return yolox_decode(outs, self.nc, self.strides, xywh=xywh)


def yolox_eval_decode(outs: Sequence[jnp.ndarray], nc: int, strides: Sequence[float]) -> jnp.ndarray:
    """Decode to the common postprocess input format (B, A, 4+nc):
    xywh pixel boxes + per-class confidence = obj * cls (YOLOX convention)."""
    d = yolox_decode(outs, nc, strides, xywh=True)
    return jnp.concatenate([d[..., :4], d[..., 4:5] * d[..., 5:]], axis=-1)


def yolox_decode(
    outs: Sequence[jnp.ndarray], nc: int, strides: Sequence[float], xywh: bool = False
) -> jnp.ndarray:
    """Raw head maps -> (B, A, 4 + 1 + nc): decoded boxes (pixels),
    sigmoid obj, sigmoid cls. Box layout xyxy (default) or cxcywh."""
    B = outs[0].shape[0]
    no = 5 + nc
    flat = jnp.concatenate([o.reshape(B, -1, no) for o in outs], axis=1)
    anchor_points, stride_t = make_anchors(
        [(o.shape[1], o.shape[2], s) for o, s in zip(outs, strides)], 0.0, dtype=flat.dtype
    )
    xy = (flat[..., :2] + anchor_points[None]) * stride_t[None]
    wh = jnp.exp(jnp.clip(flat[..., 2:4], -WH_LOGIT_CAP, WH_LOGIT_CAP)) * stride_t[None]
    if xywh:
        box = jnp.concatenate([xy, wh], -1)
    else:
        box = jnp.concatenate([xy - wh / 2, xy + wh / 2], -1)
    return jnp.concatenate(
        [box, jax.nn.sigmoid(flat[..., 4:5]), jax.nn.sigmoid(flat[..., 5:])], -1
    )


def yolox_arch_from_params(params) -> Tuple[int, int, float, float]:
    """Read (ch, nc, depth, width) off a ``YOLOXModel`` params tree.

    The YOLOX analog of ``builder.dims_from_params`` so deploy CLIs can
    serve a checkpoint without being told the architecture:

    * ch: the Focus stem conv sees 4*ch space-to-depth channels (HWIO
      in-dim 2), * nc: the head's 1x1 cls projection out-dim,
    * width: stem out-channels / 64 (``base = int(64 * width)`` — exact
      for every SCALES entry since downstream channels are multiples of
      base), * depth: dark2 bottleneck count / 3 (``d = max(round(3 *
      depth), 1)`` — any depth with the same round reproduces the graph).
    """
    stem_k = params["backbone"]["stem"]["conv"]["conv"]["kernel"]
    ch = int(stem_k.shape[2]) // 4
    base = int(stem_k.shape[-1])
    nc = int(params["head"]["cls_pred_0"]["kernel"].shape[-1])
    n_dark2 = sum(1 for k in params["backbone"]["dark2_csp"] if k.endswith("_cv1")
                  and k.startswith("m_"))
    return ch, nc, n_dark2 / 3.0, base / 64.0
