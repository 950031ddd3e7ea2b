"""Device dGA-NMS parity vs the host scorer implementation."""

import numpy as np
import pytest


def _dups(seed, n=20):
    rng = np.random.RandomState(seed)
    c = rng.rand(n, 2).astype(np.float32) * 0.8 + 0.1
    wh = rng.rand(n, 2).astype(np.float32) * 0.15 + 0.03
    boxes = np.clip(np.concatenate([c - wh / 2, c + wh / 2], -1), 0, 1)
    # near-duplicates to trigger suppression
    boxes[5] = boxes[0] + 0.002
    boxes[6] = boxes[1] + 0.001
    boxes[7] = boxes[2] + 0.0015
    scores = rng.rand(n).astype(np.float32)
    return boxes, scores


@pytest.mark.parametrize("seed", [0, 3, 9])
def test_device_dga_matches_host(seed):
    from yolo_scratch_tpu.ops.dga_nms import dga_nms_device
    from yolo_scratch_tpu.utils.metrics import cda_nms

    boxes, scores = _dups(seed)
    host = cda_nms({"boxes": boxes, "scores": scores}, max_detections=10, dga_thresh=0.15)
    keep = np.asarray(dga_nms_device(boxes, scores, max_det=10, dga_thresh=0.15))

    kept_idx = np.nonzero(keep)[0]
    # same kept set (host returns rows score-ordered; compare as sets of rows)
    host_rows = {tuple(np.round(r, 6)) for r in host["boxes"]}
    ours_rows = {tuple(np.round(r, 6)) for r in boxes[kept_idx]}
    assert ours_rows == host_rows


def test_device_dga_pairwise_matches_host_math():
    from yolo_scratch_tpu.ops.dga_nms import pairwise_dga
    from yolo_scratch_tpu.utils.metrics import _boxes_to_ellipses, _dga_pair, _ellipse_Y

    boxes, _ = _dups(1, n=8)
    a, b, xc, yc, phi = _boxes_to_ellipses(boxes, None, sort_axes=True)
    Y = _ellipse_Y(a, b, phi)
    ours = np.asarray(pairwise_dga(boxes))
    for i in range(8):
        for j in range(8):
            ref = _dga_pair(
                Y[i], Y[j], np.array([[xc[i]], [yc[i]]]), np.array([[xc[j]], [yc[j]]])
            )
            assert ours[i, j] == pytest.approx(ref, abs=2e-5), (i, j)
