"""shard_map DDP step: per-replica BN, pmean'd grads, replicated state."""

import numpy as np
import pytest

import jax


def test_ddp_step_runs_and_stays_replicated():
    from yolo_scratch_tpu.losses.v8_loss import DetectionLossConfig
    from yolo_scratch_tpu.models.builder import build_yolo11
    from yolo_scratch_tpu.parallel.mesh import make_ddp_train_step, make_mesh, replicate, shard_batch
    from yolo_scratch_tpu.train.optim import make_optimizer
    from yolo_scratch_tpu.train.state import create_train_state
    from yolo_scratch_tpu.train.steps import v8_loss_adapter

    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 devices")

    img, ch, nc, B, G = 64, 1, 5, 8, 4
    model = build_yolo11("yolo_scratch_tpu/configs/yolo11_crater.yaml", ch=ch, nc=nc, scale="n")
    tx = make_optimizer(1e-3)
    state = create_train_state(
        model, jax.random.PRNGKey(0), np.zeros((1, img, img, ch), np.float32), tx
    )
    cfg = DetectionLossConfig(nc=nc, strides=model.strides)

    mesh = make_mesh(4)
    rng = np.random.RandomState(0)
    batch = {
        "img": rng.rand(B, img, img, ch).astype(np.float32),
        "gt_labels": np.zeros((B, G), np.int32),
        "gt_bboxes": np.tile(np.asarray([0.2, 0.2, 0.6, 0.6], np.float32), (B, G, 1)),
        "gt_mask": np.tile(np.asarray([True, False, False, False]), (B, 1)),
    }

    for sync_bn in (True, False):
        step = make_ddp_train_step(
            model, v8_loss_adapter(cfg), mesh, sync_bn_stats=sync_bn, donate=False
        )
        s2, metrics = step(replicate(state, mesh), shard_batch(batch, mesh))
        assert np.isfinite(float(metrics["loss"]))
        # state stays fully replicated (stats were pmean'd / broadcast)
        for leaf in jax.tree_util.tree_leaves(s2.batch_stats):
            assert np.isfinite(np.asarray(leaf)).all()
        for leaf in jax.tree_util.tree_leaves(s2.params):
            assert np.isfinite(np.asarray(leaf)).all()


def test_mesh_train_step_yolox_matches_single_device():
    """Family coverage for the dp mesh: the jit-sharded YOLOX/SimOTA step
    (sync-BN semantics) reproduces the single-device loss, and the
    shard_map DDP variant runs finite — same properties the yolo11 tests
    pin, through the loss_fn override path the Trainer uses for yolox."""
    from yolo_scratch_tpu.losses.simota import YOLOXLossConfig
    from yolo_scratch_tpu.models.yolox import YOLOXModel
    from yolo_scratch_tpu.parallel.mesh import (
        make_ddp_train_step,
        make_mesh,
        make_sharded_train_step,
        replicate,
        shard_batch,
    )
    from yolo_scratch_tpu.train.optim import make_optimizer
    from yolo_scratch_tpu.train.state import create_train_state
    from yolo_scratch_tpu.train.steps import build_train_step_custom, yolox_loss_adapter

    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 devices")

    img, ch, nc, B, G = 64, 3, 5, 8, 4
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

    single = jax.jit(build_train_step_custom(model, loss_fn))
    _, m_ref = single(state, batch)

    mesh = make_mesh(4)
    sharded = make_sharded_train_step(model, None, mesh, donate=False, loss_fn=loss_fn)
    _, m_dp = sharded(replicate(state, mesh), shard_batch(batch, mesh))
    # jit-sharded sync-BN step is the same program semantics; rtol matches
    # the yolo11 dp==single test (f32 psum reduction-order noise ~1e-5)
    np.testing.assert_allclose(float(m_dp["loss"]), float(m_ref["loss"]), rtol=1e-4)

    ddp = make_ddp_train_step(model, loss_fn, mesh, donate=False)
    s2, m_ddp = ddp(replicate(state, mesh), shard_batch(batch, mesh))
    assert np.isfinite(float(m_ddp["loss"]))
    for leaf in jax.tree_util.tree_leaves(s2.params):
        assert np.isfinite(np.asarray(leaf)).all()
