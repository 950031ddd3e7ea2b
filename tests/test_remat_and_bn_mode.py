"""remat train step numerics; Trainer bn_mode='local' on a mesh."""

import numpy as np
import pytest

import jax


def test_remat_step_matches_plain():
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

    plain = jax.jit(build_train_step_custom(model, v8_loss_adapter(cfg)))
    remat = jax.jit(build_train_step_custom(model, v8_loss_adapter(cfg), remat=True))
    s1, m1 = plain(state, batch)
    s2, m2 = remat(state, batch)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params), jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)


def test_trainer_bn_mode_local(tmp_path):
    from yolo_scratch_tpu.data.loader import Loader
    from yolo_scratch_tpu.data.synthetic import SyntheticDataset
    from yolo_scratch_tpu.models.builder import build_yolo11
    from yolo_scratch_tpu.parallel.mesh import make_mesh
    from yolo_scratch_tpu.train.trainer import Trainer, TrainerConfig

    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 devices")
    ds = SyntheticDataset(n=8, img_size=64, channels=1, num_classes=5)
    loader = Loader(ds, batch_size=8, max_gt=8, prefetch=0)
    model = build_yolo11("yolo_scratch_tpu/configs/yolo11_crater.yaml", ch=1, nc=5, scale="n")
    cfg = TrainerConfig(epochs=1, lr=1e-3, bn_mode="local", pre_nms_topk=64, max_det=20,
                        val_conf=0.01)
    trainer = Trainer(model, loader, None, cfg, mesh=make_mesh(4))
    result = trainer.fit(resume=False)
    assert np.isfinite(result["history"][0]["train"]["loss"])
