"""YOLO11 building blocks as flax.linen modules — NHWC, shape-static.

Behavioral parity targets (reference ``models/yolo11_modules.py``):
  autopad:12, Conv:21, Bottleneck:36, C2f:50, C3k:66, C3k2:81, SPPF:92,
  Attention:108, PSA:139, C2PSA:162, DFL:180, Detect:195, Concat:277.

Design differences from the reference (deliberate, TPU-first):
  * NHWC layout (TPU-native); the reference is NCHW.
  * BatchNorm eps=1e-3, torch-momentum 0.03 (reference
    ``models/yolo11_model.py:184-185``) — flax momentum = 1 - 0.03 = 0.97.
  * DFL is a pure softmax-expectation function, not a frozen conv.
  * Detect returns raw per-scale maps; decode is a separate jittable fn with
    anchors precomputed from static shapes (no shape cache as in
    ``Detect.inference:253-255``).
  * Kaiming-normal(fan_out) conv init matches ``yolo11_model.py:181-182``;
    Detect bias priors match ``yolo11_modules.py:268-274``.
"""

from __future__ import annotations

import math
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from yolo_scratch_tpu.ops.anchors import make_anchors
from yolo_scratch_tpu.ops.boxes import dist2bbox

# torch.nn.init.kaiming_normal_(mode='fan_out', nonlinearity='relu')
KAIMING_OUT = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def autopad(k: int, p: int | None = None, d: int = 1) -> int:
    """'same' padding (reference ``yolo11_modules.py:12-18``)."""
    if d > 1:
        k = d * (k - 1) + 1
    if p is None:
        p = k // 2
    return p


class ConvBNAct(nn.Module):
    """Conv2d(bias=False) + BatchNorm + SiLU (reference Conv, ``:21-33``).

    Two optional deploy-only hooks, both inert unless their collection is
    mounted (so training and golden-parity eval are untouched):

    * calibration — under ``apply(..., mutable=["calib"])`` each block sows
      the absmax of its conv input (``nn/quant.py`` turns these into int8
      activation scales);
    * int8 inference — when a ``"quant"`` collection entry exists for this
      block (``w_q`` int8 kernel, ``s_w`` per-out-channel scale, ``s_act``
      activation scale), the conv runs as symmetric-int8 x int8 -> int32 on
      the MXU and dequantizes into the BN/SiLU epilogue. Zero-point-free
      symmetric quantization keeps conv zero-padding exact.
    """

    c2: int
    k: int = 1
    s: int = 1
    p: int | None = None
    g: int = 1
    d: int = 1
    act: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = autopad(self.k, self.p, self.d)
        if not self.is_initializing() and self.scope.is_mutable_collection("calib"):
            self.sow(
                "calib",
                "absmax",
                jnp.max(jnp.abs(x.astype(jnp.float32))),
                init_fn=lambda: jnp.zeros((), jnp.float32),
                reduce_fn=jnp.maximum,
            )
        if not self.is_initializing() and self.scope.is_mutable_collection("calib_full"):
            # full conv input, for percentile calibration (nn/quant.py) —
            # only ever mounted on small dedicated calibration batches
            self.sow("calib_full", "x", x.astype(jnp.float32))
        if not train and self.has_variable("quant", "w_q"):
            w_q = self.get_variable("quant", "w_q")  # (k, k, c1/g, c2) int8
            s_w = self.get_variable("quant", "s_w")  # (c2,) f32
            s_act = self.get_variable("quant", "s_act")  # () f32
            xq = jnp.clip(
                jnp.round(x.astype(jnp.float32) / s_act), -127, 127
            ).astype(jnp.int8)
            y = jax.lax.conv_general_dilated(
                xq,
                w_q,
                window_strides=(self.s, self.s),
                padding=[(p, p), (p, p)],
                rhs_dilation=(self.d, self.d),
                feature_group_count=self.g,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            )
            x = (y.astype(jnp.float32) * (s_act * s_w)).astype(x.dtype)
        else:
            x = nn.Conv(
                self.c2,
                (self.k, self.k),
                strides=(self.s, self.s),
                padding=[(p, p), (p, p)],
                feature_group_count=self.g,
                kernel_dilation=(self.d, self.d),
                use_bias=False,
                kernel_init=KAIMING_OUT,
                name="conv",
            )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.97, epsilon=1e-3, name="bn"
        )(x)
        return jax.nn.silu(x) if self.act else x


class Bottleneck(nn.Module):
    """Two convs with optional residual (reference ``:36-47``)."""

    c2: int
    shortcut: bool = True
    g: int = 1
    k: Tuple[int, int] = (3, 3)
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y = ConvBNAct(c_, self.k[0], 1, name="cv1")(x, train)
        y = ConvBNAct(self.c2, self.k[1], 1, g=self.g, name="cv2")(y, train)
        return x + y if self.shortcut and x.shape[-1] == self.c2 else y


class C3k(nn.Module):
    """CSP block with n sequential bottlenecks (reference ``:66-78``)."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    k: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        a = ConvBNAct(c_, 1, 1, name="cv1")(x, train)
        for i in range(self.n):
            a = Bottleneck(c_, self.shortcut, self.g, k=(self.k, self.k), e=1.0, name=f"m_{i}")(a, train)
        b = ConvBNAct(c_, 1, 1, name="cv2")(x, train)
        return ConvBNAct(self.c2, 1, name="cv3")(jnp.concatenate([a, b], axis=-1), train)


class C2f(nn.Module):
    """Split-extend-concat CSP bottleneck (reference ``:50-63``)."""

    c2: int
    n: int = 1
    shortcut: bool = False
    g: int = 1
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * self.e)
        y = ConvBNAct(2 * c, 1, 1, name="cv1")(x, train)
        ys = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            ys.append(Bottleneck(c, self.shortcut, self.g, k=(3, 3), e=1.0, name=f"m_{i}")(ys[-1], train))
        return ConvBNAct(self.c2, 1, name="cv2")(jnp.concatenate(ys, axis=-1), train)


class C3k2(nn.Module):
    """C2f whose inner blocks are C3k(n=2) when ``c3k`` (reference ``:81-89``)."""

    c2: int
    n: int = 1
    c3k: bool = False
    e: float = 0.5
    g: int = 1
    shortcut: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * self.e)
        y = ConvBNAct(2 * c, 1, 1, name="cv1")(x, train)
        ys = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            if self.c3k:
                blk = C3k(c, 2, self.shortcut, self.g, name=f"m_{i}")
            else:
                blk = Bottleneck(c, self.shortcut, self.g, k=(3, 3), e=1.0, name=f"m_{i}")
            ys.append(blk(ys[-1], train))
        return ConvBNAct(self.c2, 1, name="cv2")(jnp.concatenate(ys, axis=-1), train)


class SPPF(nn.Module):
    """Spatial pyramid pooling — fast (reference ``:92-105``)."""

    c2: int
    k: int = 5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        c_ = c1 // 2
        y = [ConvBNAct(c_, 1, 1, name="cv1")(x, train)]
        pad = self.k // 2
        for _ in range(3):
            y.append(
                nn.max_pool(
                    y[-1], (self.k, self.k), strides=(1, 1), padding=[(pad, pad), (pad, pad)]
                )
            )
        return ConvBNAct(self.c2, 1, 1, name="cv2")(jnp.concatenate(y, axis=-1), train)


class Attention(nn.Module):
    """Spatial multi-head attention over H*W tokens (reference ``:108-136``).

    Channels-per-head layout of the qkv projection matches the reference's
    per-head-contiguous ``view``: head h owns channels
    [h*(2*key_dim+head_dim), (h+1)*(2*key_dim+head_dim)).
    """

    dim: int
    num_heads: int = 8
    attn_ratio: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, C = x.shape
        N = H * W
        nh = self.num_heads
        hd = self.dim // nh
        kd = int(hd * self.attn_ratio)
        scale = kd**-0.5
        h_ch = self.dim + kd * nh * 2

        qkv = ConvBNAct(h_ch, 1, act=False, name="qkv")(x, train)  # (B, H, W, h)
        qkv = qkv.reshape(B, N, nh, kd * 2 + hd)
        q, k, v = jnp.split(qkv, [kd, 2 * kd], axis=-1)  # (B, N, nh, {kd, kd, hd})

        # attn[b, h, n, m] = sum_c q[b, n, h, c] * k[b, m, h, c] * scale
        attn = jnp.einsum("bnhc,bmhc->bhnm", q, k) * scale
        attn = jax.nn.softmax(attn, axis=-1)
        # out[b, m, h, d] = sum_n v[b, n, h, d] * attn[b, h, m, n]
        out = jnp.einsum("bnhd,bhmn->bmhd", v, attn).reshape(B, H, W, C)

        v_img = v.reshape(B, H, W, C)
        pe = ConvBNAct(self.dim, 3, 1, g=self.dim, act=False, name="pe")(v_img, train)
        return ConvBNAct(self.dim, 1, act=False, name="proj")(out + pe, train)


class PSA(nn.Module):
    """Attention + conv-FFN residual block (reference ``:139-159``)."""

    c2: int
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(x.shape[-1] * self.e)
        y = ConvBNAct(2 * c, 1, 1, name="cv1")(x, train)
        a, b = y[..., :c], y[..., c:]
        b = b + Attention(c, num_heads=max(c // 64, 1), attn_ratio=0.5, name="attn")(b, train)
        f = ConvBNAct(c * 2, 1, name="ffn_0")(b, train)
        f = ConvBNAct(c, 1, act=False, name="ffn_1")(f, train)
        b = b + f
        return ConvBNAct(x.shape[-1], 1, name="cv2")(jnp.concatenate([a, b], axis=-1), train)


class C2PSA(nn.Module):
    """CSP wrapper around n PSA blocks (reference ``:162-177``)."""

    c2: int
    n: int = 1
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(x.shape[-1] * self.e)
        y = ConvBNAct(2 * c, 1, 1, name="cv1")(x, train)
        a, b = y[..., :c], y[..., c:]
        for i in range(self.n):
            b = PSA(c, e=1.0, name=f"m_{i}")(b, train)
        return ConvBNAct(x.shape[-1], 1, name="cv2")(jnp.concatenate([a, b], axis=-1), train)


def dfl_expectation(dist: jnp.ndarray, reg_max: int = 16) -> jnp.ndarray:
    """Distribution-focal integral: (..., 4*reg_max) -> (..., 4).

    softmax over each side's ``reg_max`` bins, expectation against
    arange(reg_max). Replaces the reference's frozen 1x1 conv
    (``yolo11_modules.py:180-192``) with the equivalent pure math.
    """
    *lead, c = dist.shape
    d = dist.reshape(*lead, 4, reg_max)
    p = jax.nn.softmax(d, axis=-1)
    return jnp.einsum("...r,r->...", p, jnp.arange(reg_max, dtype=dist.dtype))


def _cls_bias_prior(nc: int, stride: float):
    """Detect cls-branch bias prior (reference ``yolo11_modules.py:268-274``)."""
    v = 5.0 / nc / max((640.0 / stride) ** 2, 1.0)
    return math.log(max(v, 1e-6))


class Detect(nn.Module):
    """Anchor-free detect head; returns raw per-scale maps (NHWC).

    Structure matches reference ``Detect.__init__`` (``:203-235``): per scale
    a box branch cv2 (Conv, Conv, plain conv -> 4*reg_max) and a cls branch
    cv3 (Conv, Conv, plain conv -> nc). ``strides`` are static (computed
    arithmetically by the graph builder) and drive the bias priors.
    """

    nc: int
    ch: Tuple[int, ...]
    strides: Tuple[float, ...]
    reg_max: int = 16

    @property
    def no(self) -> int:
        return self.nc + self.reg_max * 4

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        c2 = max(16, self.ch[0] // 4, self.reg_max * 4)
        c3 = max(self.ch[0], min(self.nc, 100))
        outs = []
        for i, x in enumerate(feats):
            b = ConvBNAct(c2, 3, name=f"cv2_{i}_0")(x, train)
            b = ConvBNAct(c2, 3, name=f"cv2_{i}_1")(b, train)
            b = nn.Conv(
                4 * self.reg_max, (1, 1), use_bias=True,
                kernel_init=KAIMING_OUT,
                bias_init=nn.initializers.constant(1.0),
                name=f"cv2_{i}_2",
            )(b)
            c = ConvBNAct(c3, 3, name=f"cv3_{i}_0")(x, train)
            c = ConvBNAct(c3, 3, name=f"cv3_{i}_1")(c, train)
            c = nn.Conv(
                self.nc, (1, 1), use_bias=True,
                kernel_init=KAIMING_OUT,
                bias_init=nn.initializers.constant(_cls_bias_prior(self.nc, self.strides[i])),
                name=f"cv3_{i}_2",
            )(c)
            outs.append(jnp.concatenate([b, c], axis=-1))  # (B, H, W, 4*reg_max+nc)
        return outs


def detect_decode(
    feats: Sequence[jnp.ndarray],
    nc: int,
    strides: Sequence[float],
    reg_max: int = 16,
    xywh: bool = True,
) -> jnp.ndarray:
    """Decode raw Detect maps -> (B, A, 4+nc); boxes in pixels, cls sigmoided.

    Equivalent to reference ``Detect.inference`` (``:248-266``) but fully
    static: DFL expectation -> dist2bbox around precomputed anchors ->
    per-anchor stride scaling; class logits -> sigmoid. Output layout is
    anchors-last-dim-channels (B, A, 4+nc) — the transpose of the reference's
    (B, 4+nc, A), which is the natural NHWC flattening.
    """
    B = feats[0].shape[0]
    no = nc + 4 * reg_max
    flat = [f.reshape(B, -1, no) for f in feats]
    x = jnp.concatenate(flat, axis=1)  # (B, A, no)
    anchor_points, stride_tensor = make_anchors(
        [(f.shape[1], f.shape[2], s) for f, s in zip(feats, strides)], 0.5, dtype=x.dtype
    )
    box, cls = x[..., : 4 * reg_max], x[..., 4 * reg_max :]
    dist = dfl_expectation(box, reg_max)  # (B, A, 4)
    dbox = dist2bbox(dist, anchor_points[None], xywh=xywh, axis=-1) * stride_tensor[None]
    return jnp.concatenate([dbox, jax.nn.sigmoid(cls)], axis=-1)


def upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor 2x upsample (reference ``nn.Upsample [None, 2, 'nearest']``)."""
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
