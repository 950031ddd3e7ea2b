"""On-device greedy TP/FP marking (ops.matching) vs the numpy host matcher.

The device path must reproduce ``evaluate_detections`` exactly (same greedy
semantics, same AP envelope) — it replaces the host's per-image x
per-threshold Python loops for COCO-scale eval.
"""

import numpy as np
import pytest


def _random_case(seed, B=4, N=40, G=12):
    rng = np.random.RandomState(seed)
    c = rng.rand(B, N, 2).astype(np.float32) * 0.8 + 0.1
    wh = rng.rand(B, N, 2).astype(np.float32) * 0.2 + 0.02
    pred_boxes = np.clip(np.concatenate([c - wh / 2, c + wh / 2], -1), 0, 1)
    scores = (rng.rand(B, N).astype(np.float32) * 0.9 + 0.05)
    # score-descending per image + trailing-invalid pattern (like postprocess)
    order = np.argsort(-scores, axis=1)
    pred_boxes = np.take_along_axis(pred_boxes, order[..., None], axis=1)
    scores = np.sort(scores, axis=1)[:, ::-1].copy()
    nv = rng.randint(N // 2, N + 1, B)
    valid = np.arange(N)[None, :] < nv[:, None]
    scores = np.where(valid, scores, 0.0)

    gc = rng.rand(B, G, 2).astype(np.float32) * 0.8 + 0.1
    gwh = rng.rand(B, G, 2).astype(np.float32) * 0.25 + 0.03
    gt_boxes = np.clip(np.concatenate([gc - gwh / 2, gc + gwh / 2], -1), 0, 1)
    ng = rng.randint(0, G + 1, B)
    gt_mask = np.arange(G)[None, :] < ng[:, None]
    # overlap injection: some preds sit exactly on GTs so TPs exist
    for b in range(B):
        for i in range(min(5, ng[b])):
            pred_boxes[b, i] = gt_boxes[b, i] + rng.randn(4).astype(np.float32) * 0.01
    return pred_boxes, scores, valid, gt_boxes, gt_mask


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_device_marks_match_host_evaluator(seed):
    from yolo_scratch_tpu.ops.matching import batched_tp_marks
    from yolo_scratch_tpu.utils.metrics import evaluate_detections, metrics_from_marks

    pred_boxes, scores, valid, gt_boxes, gt_mask = _random_case(seed)

    marks = np.asarray(batched_tp_marks(pred_boxes, valid, gt_boxes, gt_mask))
    n_gt = int(gt_mask.sum())
    dev = metrics_from_marks(marks, scores, valid, n_gt)

    preds = [
        {"boxes": pb[v], "scores": s[v], "labels": np.zeros(v.sum())}
        for pb, s, v in zip(pred_boxes, scores, valid)
    ]
    targets = [
        {"boxes": gb[m], "labels": np.zeros(m.sum())} for gb, m in zip(gt_boxes, gt_mask)
    ]
    host = evaluate_detections(preds, targets, conf_threshold=0.0, iou_threshold=0.5)

    for k in ("precision", "recall", "mAP50", "mAP50-95"):
        assert np.isclose(dev[k], host[k], rtol=1e-9, atol=1e-12), (k, dev[k], host[k])
    # non-degenerate case: some TPs and some FPs
    assert 0.0 < dev["mAP50"] < 1.0 or dev["precision"] > 0.0


def test_trainer_device_matching_equals_host_path():
    from yolo_scratch_tpu.data.loader import Loader
    from yolo_scratch_tpu.data.synthetic import SyntheticDataset
    from yolo_scratch_tpu.models.builder import build_yolo11
    from yolo_scratch_tpu.train.trainer import Trainer, TrainerConfig

    ds = SyntheticDataset(n=8, img_size=64, channels=1, num_classes=5)

    def run(device_matching):
        train_loader = Loader(ds, batch_size=4, max_gt=8, prefetch=0)
        val_loader = Loader(ds, batch_size=4, max_gt=8, prefetch=0, indices=[0, 1, 2, 3, 4, 5])
        model = build_yolo11(
            "yolo_scratch_tpu/configs/yolo11_crater.yaml", ch=1, nc=5, scale="n"
        )
        cfg = TrainerConfig(epochs=1, val_conf=0.01, pre_nms_topk=64, max_det=20,
                            device_matching=device_matching)
        t = Trainer(model, train_loader, val_loader, cfg)  # same seed -> same weights
        return t.validate()

    dev = run(True)
    host = run(False)
    for k in ("precision", "recall", "mAP50", "mAP50-95"):
        assert np.isclose(dev[k], host[k], rtol=1e-9, atol=1e-12), (k, dev[k], host[k])


@pytest.mark.parametrize("seed", [0, 1])
def test_per_class_device_marks_match_host(seed):
    """Class-restricted device marks + per_class_from_marks == host
    evaluate_per_class (which re-runs the greedy matcher per class)."""
    from yolo_scratch_tpu.ops.matching import batched_tp_marks
    from yolo_scratch_tpu.utils.metrics import (
        evaluate_per_class,
        per_class_from_marks,
    )

    nc = 6
    rng = np.random.RandomState(seed + 100)
    pred_boxes, scores, valid, gt_boxes, gt_mask = _random_case(seed)
    B, N = scores.shape
    G = gt_boxes.shape[1]
    gt_labels = rng.randint(0, nc, (B, G)).astype(np.int32)
    labels = rng.randint(0, nc, (B, N)).astype(np.int32)
    # make some predictions share the class of the GT they sit on
    for b in range(B):
        for i in range(min(5, int(gt_mask[b].sum()))):
            labels[b, i] = gt_labels[b, i]

    marks_cls = np.asarray(batched_tp_marks(
        pred_boxes, valid, gt_boxes, gt_mask,
        pred_labels=labels, gt_labels=gt_labels))
    dev = per_class_from_marks(
        marks_cls, scores, labels, valid, gt_labels, gt_mask, nc)

    preds = [
        {"boxes": pb[v], "scores": s[v], "labels": l[v]}
        for pb, s, l, v in zip(pred_boxes, scores, labels, valid)
    ]
    targets = [
        {"boxes": gb[m], "labels": gl[m]}
        for gb, gl, m in zip(gt_boxes, gt_labels, gt_mask)
    ]
    host = evaluate_per_class(preds, targets, nc, conf_threshold=0.0)

    assert set(dev) == set(host)
    some_nonzero = False
    for name in host:
        for k in ("AP50", "AP50-95", "precision", "recall"):
            assert np.isclose(dev[name][k], host[name][k], rtol=1e-9, atol=1e-12), (
                name, k, dev[name][k], host[name][k])
            some_nonzero = some_nonzero or dev[name][k] > 0
    assert some_nonzero
