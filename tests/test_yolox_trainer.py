"""YOLOX through the shared Trainer (model_kind='yolox')."""

import numpy as np


def test_yolox_trainer_fit(tmp_path):
    from yolo_scratch_tpu.data.loader import Loader
    from yolo_scratch_tpu.data.synthetic import SyntheticDataset
    from yolo_scratch_tpu.models.yolox import YOLOXModel
    from yolo_scratch_tpu.train.trainer import Trainer, TrainerConfig

    ds = SyntheticDataset(n=8, img_size=64, channels=3, num_classes=5)
    train_loader = Loader(ds, batch_size=4, max_gt=8, prefetch=0)
    val_loader = Loader(ds, batch_size=4, max_gt=8, prefetch=0, indices=[0, 1])

    model = YOLOXModel.from_scale("nano", nc=5)
    cfg = TrainerConfig(epochs=2, lr=1e-3, val_conf=0.01, pre_nms_topk=64, max_det=20,
                        save_dir=str(tmp_path / "yx"))
    trainer = Trainer(model, train_loader, val_loader, cfg, model_kind="yolox")
    result = trainer.fit(resume=False)

    hist = result["history"]
    assert len(hist) == 2
    assert np.isfinite(hist[-1]["train"]["loss"])
    assert "obj_loss" in hist[-1]["train"]  # yolox metric names flow through
    assert "mAP50" in hist[-1]["val"]
    # loss moved down across epochs
    assert hist[-1]["train"]["loss"] < hist[0]["train"]["loss"]


def test_yolox_final_phase_enables_l1_and_disables_aug():
    """Paper recipe: last N epochs train with aug off and the L1 reg loss on
    (losses/simota.py use_l1). The flag must actually flip during fit()."""
    from yolo_scratch_tpu.data.augment import AugmentConfig
    from yolo_scratch_tpu.data.loader import Loader
    from yolo_scratch_tpu.data.synthetic import SyntheticDataset
    from yolo_scratch_tpu.models.yolox import YOLOXModel
    from yolo_scratch_tpu.train.trainer import Trainer, TrainerConfig

    ds = SyntheticDataset(n=8, img_size=64, channels=3, num_classes=5)
    train_loader = Loader(ds, batch_size=4, max_gt=8, prefetch=0)

    model = YOLOXModel.from_scale("nano", nc=5)
    cfg = TrainerConfig(epochs=2, lr=1e-3, final_epochs=1,
                        augment=AugmentConfig(mosaic_p=1.0))
    trainer = Trainer(model, train_loader, None, cfg, model_kind="yolox")

    assert not trainer._in_final_phase(0)
    assert trainer._in_final_phase(1)

    result = trainer.fit(resume=False)
    hist = result["history"]
    # epoch 0: normal phase, L1 term inactive
    assert hist[0]["train"]["l1_loss"] == 0.0
    # epoch 1: final phase, L1 term live
    assert hist[1]["train"]["l1_loss"] > 0.0
    assert np.isfinite(hist[1]["train"]["loss"])
