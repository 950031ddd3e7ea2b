"""Fused Pallas bottleneck (ops/pallas_conv.py) vs the XLA conv chain."""

import numpy as np
import pytest


def _case(seed, B, H, W, C, Ch, dtype):
    import jax.numpy as jnp

    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(B, H, W, C) * 0.5, dtype)
    w1 = jnp.asarray(rng.randn(3, 3, C, Ch) * (1.0 / np.sqrt(9 * C)), dtype)
    b1 = jnp.asarray(rng.randn(Ch) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.randn(3, 3, Ch, C) * (1.0 / np.sqrt(9 * Ch)), dtype)
    b2 = jnp.asarray(rng.randn(C) * 0.1, jnp.float32)
    return x, w1, b1, w2, b2


@pytest.mark.parametrize("shape", [(2, 16, 16, 128, 128), (1, 8, 24, 64, 64),
                                   (2, 12, 12, 128, 64)])
def test_fused_bottleneck_matches_xla_f32(shape):
    import jax.numpy as jnp

    from yolo_scratch_tpu.ops.pallas_conv import bottleneck_xla, fused_bottleneck

    B, H, W, C, Ch = shape
    x, w1, b1, w2, b2 = _case(0, B, H, W, C, Ch, jnp.float32)
    ref = np.asarray(bottleneck_xla(x, w1, b1, w2, b2))
    got = np.asarray(fused_bottleneck(x, w1, b1, w2, b2))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_fused_bottleneck_matches_xla_bf16():
    import jax.numpy as jnp

    from yolo_scratch_tpu.ops.pallas_conv import bottleneck_xla, fused_bottleneck

    x, w1, b1, w2, b2 = _case(1, 2, 16, 16, 128, 128, jnp.bfloat16)
    ref = np.asarray(bottleneck_xla(x, w1, b1, w2, b2)).astype(np.float32)
    got = np.asarray(fused_bottleneck(x, w1, b1, w2, b2)).astype(np.float32)
    # identical math modulo bf16 rounding of the intermediate hand-off
    np.testing.assert_allclose(got, ref, rtol=0.05, atol=0.05)
    # borders see the same zero-pad semantics (catches halo bugs)
    np.testing.assert_allclose(got[:, 0, :, :], ref[:, 0, :, :], rtol=0.05, atol=0.05)


def test_fused_bottleneck_matches_folded_module():
    """End-to-end contract: the kernel on BN-folded weights must equal the
    flax Bottleneck (shortcut, k=3) applied with fused conv+BN params."""
    import jax
    import jax.numpy as jnp

    from yolo_scratch_tpu.nn.modules import Bottleneck
    from yolo_scratch_tpu.nn.fuse import fuse_conv_bn
    from yolo_scratch_tpu.ops.pallas_conv import fused_bottleneck

    B, H, W, C = 2, 16, 16, 64
    m = Bottleneck(c2=C, shortcut=True, k=(3, 3), e=1.0)
    x = jnp.asarray(np.random.RandomState(3).rand(B, H, W, C), jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), x, False)
    # make BN stats nontrivial so folding actually matters
    variables = jax.tree_util.tree_map(lambda v: v, variables)
    ref = np.asarray(m.apply(variables, x, False))

    fused = fuse_conv_bn(variables)
    p = fused["params"]
    # folded form: kernel absorbed g; BN reduced to the shifted bias
    got = np.asarray(fused_bottleneck(
        x, p["cv1"]["conv"]["kernel"], p["cv1"]["bn"]["bias"],
        p["cv2"]["conv"]["kernel"], p["cv2"]["bn"]["bias"]))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
