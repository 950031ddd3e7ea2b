"""Pallas-fused Bottleneck: conv3x3+BN+SiLU -> conv3x3+BN+SiLU -> +residual,
one kernel, intermediates never touch HBM.

The north-star "Pallas-fused conv+BN+SiLU" (BASELINE.json), aimed where
the builder's own roofline analysis said it could win (docs/PERF.md): the
s/m-scale 3x3 same-channel bottleneck convs (reference Bottleneck,
``models/yolo11_modules.py:36-47``; 18 of the s-model's convs are
(3,3,128,128)). At n-scale the same fusion was *computed* to be
counterproductive (channel widths starve the MXU) — at C=128 the shifted
matmuls are full-lane.

Formulation: BN is a folded affine at inference (``nn/fuse.py``), so each
Conv is ``silu(conv(x) + b)``. A 3x3 SAME conv is nine shifted (H*W, C) x
(C, C) matmuls accumulated in f32 — no im2col materialization; the padded
input slab, the f32 accumulator, and the SiLU intermediate all live in
VMEM scratch. Grid is (B,): one batch element per step, so Pallas
double-buffers the HBM loads of step i+1 against the compute of step i.

HBM traffic per element: read X once, write Y once — the unfused chain
additionally writes + reads the intermediate and re-reads the residual
(2.5x the traffic). Compute is identical (plus border MACs on the zero
pad, <3% at 40x40).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _silu(x):
    return x * jax.nn.sigmoid(x)


def _row_chunk(H: int) -> int:
    """Rows per compute chunk: bounds the f32 accumulator and the 3-tap
    concat buffer so the whole working set stays under ~12 MB of VMEM at
    (80, 80, 128)."""
    return min(H, 32)


def _conv3x3_chunked(xpad, w_ref, b_ref, H, W, C, Co, write, resid=None):
    """3x3 SAME conv + bias + SiLU from a padded slab, in row chunks.

    Per chunk: gather the three dx taps into one (CH+2, W, 3C) buffer
    (three sublane-shifted reads), then three dy-tap matmuls with K=3C —
    dy slices move only the untiled leading axis (free), and K=3C keeps
    the MXU fed (384 wide at C=128 vs 128 for the naive 9-tap form).
    ``write(c, rows)`` stores each finished (CH, W, Co) chunk; ``resid``
    optionally returns the residual rows to add before the store.
    """
    # (dx, dy*C, Co): the dy taps stack on the K axis (leading-dim slices
    # of the slab are layout-identical, so their concat is legal); the dx
    # taps become three sublane-shifted matmul inputs
    w_taps = jnp.transpose(w_ref[:], (1, 0, 2, 3)).reshape(3, 3 * C, Co)
    bias = b_ref[:][None, None, :]
    ch = _row_chunk(H)
    for c in range(0, H, ch):
        rows = min(ch, H - c)
        taps = jnp.concatenate(
            [xpad[c + dy : c + dy + rows, :, :] for dy in range(3)], axis=-1
        )  # (rows, W+2, 3C)
        acc = None
        for dx in range(3):
            term = jax.lax.dot_general(
                taps[:, dx : dx + W, :], w_taps[dx],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = term if acc is None else acc + term
        out = _silu(acc + bias)
        if resid is not None:
            out = out + resid(c, rows)
        write(c, rows, out)


def _bneck_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, xpad, hpad):
    H, W, C = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]
    Ch = hpad.shape[-1]

    # zero-padded input slab (SAME conv borders)
    xpad[:] = jnp.zeros_like(xpad)
    xpad[1 : H + 1, 1 : W + 1, :] = x_ref[0]

    hpad[:] = jnp.zeros_like(hpad)

    def write_h(c, rows, out):
        hpad[c + 1 : c + 1 + rows, 1 : W + 1, :] = out.astype(hpad.dtype)

    _conv3x3_chunked(xpad, w1_ref, b1_ref, H, W, C, Ch, write_h)

    def write_o(c, rows, out):
        o_ref[0, c : c + rows] = out.astype(o_ref.dtype)

    def resid(c, rows):
        return xpad[c + 1 : c + 1 + rows, 1 : W + 1, :].astype(jnp.float32)

    _conv3x3_chunked(hpad, w2_ref, b2_ref, H, W, Ch, C, write_o, resid=resid)


@partial(jax.jit, static_argnames=("interpret",))
def fused_bottleneck(x, w1, b1, w2, b2, interpret: bool | None = None):
    """y = x + silu(conv2(silu(conv1(x) + b1)) + b2); convs 3x3 SAME s1.

    x (B, H, W, C) bf16/f32, w* (3, 3, C, Ch)/(3, 3, Ch, C), b* folded-BN
    biases. Matches ``Bottleneck(shortcut=True, k=3)`` with BN folded
    (``nn/fuse.py``), bit-comparable to the XLA chain within bf16
    accumulation tolerance.
    """
    B, H, W, C = x.shape
    Ch = w1.shape[-1]
    assert w1.shape == (3, 3, C, Ch) and w2.shape == (3, 3, Ch, C)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    cdt = x.dtype

    grid = (B,)
    return pl.pallas_call(
        _bneck_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, H, W, C), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((3, 3, C, Ch), lambda i: (0, 0, 0, 0)),
            pl.BlockSpec((Ch,), lambda i: (0,)),
            pl.BlockSpec((3, 3, Ch, C), lambda i: (0, 0, 0, 0)),
            pl.BlockSpec((C,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((1, H, W, C), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), cdt),
        scratch_shapes=[
            pltpu.VMEM((H + 2, W + 2, C), cdt),
            pltpu.VMEM((H + 2, W + 2, Ch), cdt),
        ],
        interpret=interpret,
    )(x, w1, b1, w2, b2)


def bottleneck_xla(x, w1, b1, w2, b2):
    """Reference XLA chain for the same fused computation (two
    lax.conv_general_dilated + silu + residual) — the A/B baseline and
    the numerics oracle for tests."""
    dn = ("NHWC", "HWIO", "NHWC")
    h = jax.lax.conv_general_dilated(
        x, w1.astype(x.dtype), (1, 1), "SAME", dimension_numbers=dn,
        preferred_element_type=jnp.float32)
    h = _silu(h + b1[None, None, None, :]).astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        h, w2.astype(x.dtype), (1, 1), "SAME", dimension_numbers=dn,
        preferred_element_type=jnp.float32)
    y = _silu(y + b2[None, None, None, :])
    return (x.astype(jnp.float32) + y).astype(x.dtype)
