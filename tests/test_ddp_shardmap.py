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
