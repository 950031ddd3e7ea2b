"""Pallas NMS kernel (interpret mode on CPU) vs the XLA reference impl."""

import numpy as np
import pytest


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("n", [40, 200])
def test_pallas_nms_matches_xla(seed, n):
    from yolo_scratch_tpu.ops.nms import nms
    from yolo_scratch_tpu.ops.pallas_nms import nms_pallas

    rng = np.random.RandomState(seed)
    c = rng.rand(n, 2).astype(np.float32) * 64
    wh = rng.rand(n, 2).astype(np.float32) * 25 + 3
    boxes = np.concatenate([c - wh / 2, c + wh / 2], -1)
    scores = rng.rand(n).astype(np.float32)
    valid = scores > 0.2

    ref = np.asarray(nms(boxes, scores, iou_threshold=0.5, max_det=50, valid=valid))
    ours = np.asarray(
        nms_pallas(boxes, scores, iou_threshold=0.5, max_det=50, valid=valid, interpret=True)
    )
    np.testing.assert_array_equal(ours, ref)


def test_pallas_nms_max_det():
    from yolo_scratch_tpu.ops.pallas_nms import nms_pallas

    n = 30
    boxes = np.zeros((n, 4), np.float32)
    boxes[:, 0] = np.arange(n) * 100.0
    boxes[:, 1] = 0
    boxes[:, 2] = boxes[:, 0] + 10
    boxes[:, 3] = 10
    scores = np.linspace(1, 0.1, n).astype(np.float32)
    keep = np.asarray(nms_pallas(boxes, scores, max_det=7, interpret=True))
    assert keep.sum() == 7
    assert keep[:7].all()
