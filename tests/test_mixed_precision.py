"""Mixed-precision train step: bf16 compute tracks f32 numerics."""

import numpy as np

import jax
import jax.numpy as jnp


def test_bf16_step_tracks_f32():
    from yolo_scratch_tpu.losses.v8_loss import DetectionLossConfig
    from yolo_scratch_tpu.models.builder import build_yolo11
    from yolo_scratch_tpu.train.optim import make_optimizer
    from yolo_scratch_tpu.train.state import create_train_state
    from yolo_scratch_tpu.train.steps import build_train_step_custom, v8_loss_adapter

    img, ch, nc, B, G = 64, 1, 5, 2, 4
    model = build_yolo11("yolo_scratch_tpu/configs/yolo11_crater.yaml", ch=ch, nc=nc, scale="n")
    tx = make_optimizer(1e-3)
    state = create_train_state(
        model, jax.random.PRNGKey(0), np.zeros((1, img, img, ch), np.float32), tx
    )
    cfg = DetectionLossConfig(nc=nc, strides=model.strides)
    rng = np.random.RandomState(0)
    batch = {
        "img": rng.rand(B, img, img, ch).astype(np.float32),
        "gt_labels": np.zeros((B, G), np.int32),
        "gt_bboxes": np.tile(np.asarray([0.2, 0.2, 0.6, 0.6], np.float32), (B, G, 1)),
        "gt_mask": np.tile(np.asarray([True, False, False, False]), (B, 1)),
    }

    step32 = jax.jit(build_train_step_custom(model, v8_loss_adapter(cfg)))
    step16 = jax.jit(
        build_train_step_custom(model, v8_loss_adapter(cfg), compute_dtype=jnp.bfloat16)
    )

    s32, m32 = step32(state, batch)
    s16, m16 = step16(state, batch)

    # loss within bf16 tolerance of the f32 step (random-init model: ~24
    # conv layers of bf16 rounding compound; observed ~6%)
    np.testing.assert_allclose(float(m16["loss"]), float(m32["loss"]), rtol=0.15)
    # master params stay f32 and finite
    leaves = jax.tree_util.tree_leaves(s16.params)
    assert all(l.dtype == jnp.float32 for l in leaves)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # BN stats stay f32
    assert all(
        l.dtype == jnp.float32 for l in jax.tree_util.tree_leaves(s16.batch_stats)
    )


def test_bf16_step_tracks_f32_yolox():
    """Same property for the YOLOX family: SimOTA assignment + IoU/obj/cls
    loss run in bf16 compute with f32 master params/BN stats."""
    from yolo_scratch_tpu.losses.simota import YOLOXLossConfig
    from yolo_scratch_tpu.models.yolox import YOLOXModel
    from yolo_scratch_tpu.train.optim import make_optimizer
    from yolo_scratch_tpu.train.state import create_train_state
    from yolo_scratch_tpu.train.steps import build_train_step_custom, yolox_loss_adapter

    img, ch, nc, B, G = 64, 3, 5, 2, 4
    model = YOLOXModel.from_scale("nano", nc=nc)
    tx = make_optimizer(1e-3)
    state = create_train_state(
        model, jax.random.PRNGKey(0), np.zeros((1, img, img, ch), np.float32), tx
    )
    loss_fn = yolox_loss_adapter(YOLOXLossConfig(nc=nc, strides=tuple(model.strides)))
    rng = np.random.RandomState(0)
    batch = {
        "img": rng.rand(B, img, img, ch).astype(np.float32),
        "gt_labels": np.zeros((B, G), np.int32),
        "gt_bboxes": np.tile(np.asarray([0.2, 0.2, 0.6, 0.6], np.float32), (B, G, 1)),
        "gt_mask": np.tile(np.asarray([True, False, False, False]), (B, 1)),
    }

    step32 = jax.jit(build_train_step_custom(model, loss_fn))
    step16 = jax.jit(
        build_train_step_custom(model, loss_fn, compute_dtype=jnp.bfloat16)
    )
    s32, m32 = step32(state, batch)
    s16, m16 = step16(state, batch)

    np.testing.assert_allclose(float(m16["loss"]), float(m32["loss"]), rtol=0.15)
    leaves = jax.tree_util.tree_leaves(s16.params)
    assert all(l.dtype == jnp.float32 for l in leaves)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert all(
        l.dtype == jnp.float32 for l in jax.tree_util.tree_leaves(s16.batch_stats)
    )
