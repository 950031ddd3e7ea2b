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


def test_pallas_batched_matches_xla():
    from yolo_scratch_tpu.ops.nms import nms
    from yolo_scratch_tpu.ops.pallas_nms import nms_pallas_batched

    import jax

    rng = np.random.RandomState(4)
    B, n = 3, 64
    c = rng.rand(B, n, 2).astype(np.float32) * 64
    wh = rng.rand(B, n, 2).astype(np.float32) * 25 + 3
    boxes = np.concatenate([c - wh / 2, c + wh / 2], -1)
    scores = rng.rand(B, n).astype(np.float32)
    valid = scores > 0.2

    ref = np.asarray(
        jax.vmap(lambda b, s, v: nms(b, s, iou_threshold=0.5, max_det=20, valid=v))(
            boxes, scores, valid
        )
    )
    ours = np.asarray(
        nms_pallas_batched(boxes, scores, valid, iou_threshold=0.5, max_det=20, interpret=True)
    )
    np.testing.assert_array_equal(ours, ref)


def test_postprocess_pallas_impl_matches_xla():
    from yolo_scratch_tpu.ops.decode import postprocess

    rng = np.random.RandomState(0)
    B, A, nc = 2, 120, 5
    pred = np.zeros((B, A, 4 + nc), np.float32)
    pred[..., 0:2] = rng.rand(B, A, 2) * 64
    pred[..., 2:4] = rng.rand(B, A, 2) * 20 + 2
    pred[..., 4:] = rng.rand(B, A, nc).astype(np.float32)

    a = postprocess(pred, img_size=64, conf_threshold=0.25, max_det=20, pre_nms_topk=64,
                    nms_impl="xla")
    b = postprocess(pred, img_size=64, conf_threshold=0.25, max_det=20, pre_nms_topk=64,
                    nms_impl="pallas")
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    # B=1 path (transposed single-image kernel)
    a1 = postprocess(pred[:1], img_size=64, conf_threshold=0.25, max_det=20,
                     pre_nms_topk=64, nms_impl="xla")
    b1 = postprocess(pred[:1], img_size=64, conf_threshold=0.25, max_det=20,
                     pre_nms_topk=64, nms_impl="pallas")
    for x, y in zip(a1, b1):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


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


@pytest.mark.parametrize("seed", [0, 3])
def test_pallas_class_aware_matches_xla(seed):
    """Class-aware agreement: per-class offset applied before the sweep."""
    import jax

    from yolo_scratch_tpu.ops.nms import nms
    from yolo_scratch_tpu.ops.pallas_nms import nms_pallas, nms_pallas_batched

    rng = np.random.RandomState(seed)
    B, n = 2, 80
    c = rng.rand(B, n, 2).astype(np.float32) * 48  # dense -> plenty of overlap
    wh = rng.rand(B, n, 2).astype(np.float32) * 30 + 5
    boxes = np.concatenate([c - wh / 2, c + wh / 2], -1)
    scores = rng.rand(B, n).astype(np.float32)
    valid = scores > 0.1
    labels = rng.randint(0, 4, (B, n)).astype(np.int32)

    ref = np.asarray(
        jax.vmap(
            lambda b, s, v, l: nms(b, s, iou_threshold=0.5, max_det=30, valid=v,
                                   class_ids=l, class_aware=True)
        )(boxes, scores, valid, labels)
    )
    ours = np.asarray(
        nms_pallas_batched(boxes, scores, valid, iou_threshold=0.5, max_det=30,
                           interpret=True, class_ids=labels, class_aware=True)
    )
    np.testing.assert_array_equal(ours, ref)
    # class-aware must differ from agnostic on overlapping cross-class boxes
    agnostic = np.asarray(
        nms_pallas_batched(boxes, scores, valid, iou_threshold=0.5, max_det=30,
                           interpret=True)
    )
    assert (ours != agnostic).any()

    # single-image wrapper
    ref1 = np.asarray(nms(boxes[0], scores[0], iou_threshold=0.5, max_det=30,
                          valid=valid[0], class_ids=labels[0], class_aware=True))
    ours1 = np.asarray(
        nms_pallas(boxes[0], scores[0], iou_threshold=0.5, max_det=30, valid=valid[0],
                   interpret=True, class_ids=labels[0], class_aware=True)
    )
    np.testing.assert_array_equal(ours1, ref1)


def test_postprocess_class_aware_pallas_matches_xla():
    from yolo_scratch_tpu.ops.decode import postprocess

    rng = np.random.RandomState(7)
    B, A, nc = 2, 120, 5
    pred = np.zeros((B, A, 4 + nc), np.float32)
    pred[..., 0:2] = rng.rand(B, A, 2) * 64
    pred[..., 2:4] = rng.rand(B, A, 2) * 20 + 2
    pred[..., 4:] = rng.rand(B, A, nc).astype(np.float32)

    for batch in (pred, pred[:1]):  # batched kernel and B=1 transposed kernel
        a = postprocess(batch, img_size=64, conf_threshold=0.25, max_det=20,
                        pre_nms_topk=64, class_aware=True, nms_impl="xla")
        b = postprocess(batch, img_size=64, conf_threshold=0.25, max_det=20,
                        pre_nms_topk=64, class_aware=True, nms_impl="pallas")
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_pallas_batched_presorted_matches():
    """nms_pallas_batched(presorted=True) on sorted rows == sorting path."""
    import numpy as np

    from yolo_scratch_tpu.ops.pallas_nms import nms_pallas_batched

    rng = np.random.RandomState(11)
    B, N = 2, 96
    centers = rng.rand(B, N, 2) * 150
    wh = rng.rand(B, N, 2) * 40 + 4
    boxes = np.concatenate([centers - wh / 2, centers + wh / 2], -1).astype(np.float32)
    scores = np.sort(rng.rand(B, N).astype(np.float32), axis=1)[:, ::-1].copy()
    valid = rng.rand(B, N) > 0.1

    ref = np.asarray(nms_pallas_batched(boxes, scores, valid,
                                        iou_threshold=0.5, max_det=30))
    got = np.asarray(nms_pallas_batched(boxes, scores, valid,
                                        iou_threshold=0.5, max_det=30,
                                        presorted=True))
    np.testing.assert_array_equal(got, ref)
