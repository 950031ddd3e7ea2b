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
