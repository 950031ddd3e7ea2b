"""Validation scores each image exactly once despite wrap-padded batches.

The loader pads the final short batch by wrapping to keep shapes static;
eval paths must drop those duplicates (reference evaluates every val image
once, train_yolo11_cuda.py:101-262).
"""

import numpy as np


def test_loader_sample_valid_flags_wrap_padding():
    from yolo_scratch_tpu.data.loader import Loader
    from yolo_scratch_tpu.data.synthetic import SyntheticDataset

    ds = SyntheticDataset(n=8, img_size=64, channels=1, num_classes=5)
    loader = Loader(ds, batch_size=4, max_gt=8, prefetch=0, indices=[0, 1, 2, 3, 4, 5])
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]["sample_valid"].tolist() == [True] * 4
    # last batch: 2 real + 2 wrap-padding duplicates
    assert batches[1]["sample_valid"].tolist() == [True, True, False, False]
    # the duplicates are copies of the first two epoch indices
    np.testing.assert_array_equal(batches[1]["img"][2], batches[0]["img"][0])


def test_validate_metrics_invariant_to_batch_padding(tmp_path):
    """mAP/P/R identical whether the val set divides the batch size or not."""
    from yolo_scratch_tpu.data.loader import Loader
    from yolo_scratch_tpu.data.synthetic import SyntheticDataset
    from yolo_scratch_tpu.models.builder import build_yolo11
    from yolo_scratch_tpu.train.trainer import Trainer, TrainerConfig

    ds = SyntheticDataset(n=8, img_size=64, channels=1, num_classes=5)
    cfg = TrainerConfig(epochs=1, lr=1e-3, val_conf=0.01, pre_nms_topk=64, max_det=20)

    def metrics_with_batch(bs):
        train_loader = Loader(ds, batch_size=4, max_gt=8, prefetch=0)
        val_loader = Loader(ds, batch_size=bs, max_gt=8, prefetch=0, indices=[0, 1, 2])
        model = build_yolo11(
            "yolo_scratch_tpu/configs/yolo11_crater.yaml", ch=1, nc=5, scale="n"
        )
        t = Trainer(model, train_loader, val_loader, cfg)  # same seed -> same weights
        return t.validate()

    exact = metrics_with_batch(3)   # 1 batch, no padding
    padded = metrics_with_batch(4)  # 1 batch, 1 wrap-padding duplicate
    for k in ("precision", "recall", "mAP50", "mAP50-95"):
        assert np.isclose(exact[k], padded[k], atol=0, rtol=0), (
            k, exact[k], padded[k]
        )


def test_validate_metrics_invariant_to_fetch_chunk(tmp_path):
    """Chunked deferred fetches (val_fetch_chunk) must not change any
    metric: flushing every batch == flushing once at the end, in both the
    device-matching and host-matching paths."""
    from yolo_scratch_tpu.data.loader import Loader
    from yolo_scratch_tpu.data.synthetic import SyntheticDataset
    from yolo_scratch_tpu.models.builder import build_yolo11
    from yolo_scratch_tpu.train.trainer import Trainer, TrainerConfig

    ds = SyntheticDataset(n=7, img_size=64, channels=1, num_classes=5)

    def metrics_with(chunk, device_match):
        cfg = TrainerConfig(epochs=1, lr=1e-3, val_conf=0.01, pre_nms_topk=64,
                            max_det=20, val_fetch_chunk=chunk,
                            device_matching=device_match)
        train_loader = Loader(ds, batch_size=4, max_gt=8, prefetch=0)
        val_loader = Loader(ds, batch_size=2, max_gt=8, prefetch=0)  # 4 batches
        model = build_yolo11(
            "yolo_scratch_tpu/configs/yolo11_crater.yaml", ch=1, nc=5, scale="n"
        )
        t = Trainer(model, train_loader, val_loader, cfg)
        return t.validate()

    for device_match in (True, False):
        one = metrics_with(1, device_match)
        big = metrics_with(1000, device_match)
        assert one.keys() == big.keys()
        for k in one:
            assert np.isclose(one[k], big[k], atol=0, rtol=0), (device_match, k)
