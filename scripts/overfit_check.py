"""End-to-end learning check: overfit a detector on a tiny synthetic set.

Proves the full stack learns — loss -> assignment -> gradients -> decode
-> NMS -> mAP — by driving mAP50 high on data the model has memorized.
Supports both model families:

  python scripts/overfit_check.py [epochs] [--bf16]          # YOLO11n + TAL
  python scripts/overfit_check.py [epochs] --model yolox     # YOLOX-nano + SimOTA
                                                             # (incl. final L1 phase)

Prints a final JSON line with the reached metrics.
"""

import json
import sys

sys.path.insert(0, ".")

import numpy as np


def main(epochs: int = 60, bf16: bool = False, model_kind: str = "yolo11"):
    from yolo_scratch_tpu.data.loader import Loader
    from yolo_scratch_tpu.data.synthetic import SyntheticDataset
    from yolo_scratch_tpu.train.trainer import Trainer, TrainerConfig

    channels = 1 if model_kind == "yolo11" else 3
    ds = SyntheticDataset(
        n=16, img_size=128, channels=channels, num_classes=5, max_objects=3, seed=7
    )
    train_loader = Loader(ds, batch_size=8, max_gt=8, shuffle=True, prefetch=0)
    val_loader = Loader(ds, batch_size=8, max_gt=8, prefetch=0)

    if model_kind == "yolox":
        from yolo_scratch_tpu.models.yolox import YOLOXModel

        model = YOLOXModel.from_scale("nano", nc=5)
        # paper recipe end-phase: last ~25% of epochs aug-off + L1 on
        final_epochs = max(epochs // 4, 1)
    else:
        from yolo_scratch_tpu.models.builder import build_yolo11

        model = build_yolo11(
            "yolo_scratch_tpu/configs/yolo11_crater.yaml", ch=1, nc=5, scale="n"
        )
        final_epochs = 0

    cfg = TrainerConfig(
        epochs=epochs, lr=2e-3, warmup_epochs=3, val_conf=0.25, pre_nms_topk=256,
        max_det=50, mixed_precision=bf16, final_epochs=final_epochs,
    )
    trainer = Trainer(model, train_loader, val_loader, cfg, model_kind=model_kind)
    result = trainer.fit(resume=False)

    final = result["history"][-1]["val"]
    print(json.dumps({
        "model": model_kind,
        "final_mAP50": final.get("mAP50", 0.0),
        "final_precision": final.get("precision", 0.0),
        "final_recall": final.get("recall", 0.0),
        "final_loss": final.get("loss", float("nan")),
        "epochs": epochs,
        "bf16": bf16,
    }))
    return final


if __name__ == "__main__":
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    kind = "yolox" if "--model" in sys.argv and "yolox" in sys.argv else "yolo11"
    main(
        int(pos[0]) if pos else 60,
        bf16="--bf16" in sys.argv,
        model_kind=kind,
    )
