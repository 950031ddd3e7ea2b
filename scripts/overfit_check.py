"""End-to-end learning check: overfit YOLO11n on a tiny synthetic set.

Proves the full stack learns — loss -> TAL assignment -> gradients -> decode
-> NMS -> mAP — by driving mAP50 high on data the model has memorized.
Run on TPU: ``python scripts/overfit_check.py [epochs]``.
Prints a final JSON line with the reached metrics.
"""

import json
import sys

sys.path.insert(0, ".")

import numpy as np


def main(epochs: int = 60, bf16: bool = False):
    from yolo_scratch_tpu.data.loader import Loader
    from yolo_scratch_tpu.data.synthetic import SyntheticDataset
    from yolo_scratch_tpu.models.builder import build_yolo11
    from yolo_scratch_tpu.train.trainer import Trainer, TrainerConfig

    ds = SyntheticDataset(n=16, img_size=128, channels=1, num_classes=5, max_objects=3, seed=7)
    train_loader = Loader(ds, batch_size=8, max_gt=8, shuffle=True, prefetch=0)
    val_loader = Loader(ds, batch_size=8, max_gt=8, prefetch=0)

    model = build_yolo11("yolo_scratch_tpu/configs/yolo11_crater.yaml", ch=1, nc=5, scale="n")
    cfg = TrainerConfig(
        epochs=epochs, lr=2e-3, warmup_epochs=3, val_conf=0.25, pre_nms_topk=256,
        max_det=50, mixed_precision=bf16,
    )
    trainer = Trainer(model, train_loader, val_loader, cfg)
    result = trainer.fit(resume=False)

    final = result["history"][-1]["val"]
    print(json.dumps({
        "final_mAP50": final.get("mAP50", 0.0),
        "final_precision": final.get("precision", 0.0),
        "final_recall": final.get("recall", 0.0),
        "final_loss": final.get("loss", float("nan")),
        "epochs": epochs,
        "bf16": bf16,
    }))
    return final


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 60,
        bf16="--bf16" in sys.argv,
    )
