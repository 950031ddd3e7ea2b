"""Crater auxiliary losses: golden parity vs reference + sanity checks."""

import numpy as np
import pytest

from tests.conftest import requires_reference


def _rand_boxes(seed, n=16):
    rng = np.random.RandomState(seed)
    c = rng.rand(n, 2) * 0.6 + 0.2
    wh = rng.rand(n, 2) * 0.2 + 0.05
    return np.concatenate([c - wh / 2, c + wh / 2], -1).astype(np.float32)


@requires_reference
@pytest.mark.parametrize("seed", [0, 1])
def test_center_weighted_ciou_parity(reference_path, seed):
    import torch
    from losses.bbox_loss import CenterWeightedCIoULoss

    from yolo_scratch_tpu.losses.crater_aux import center_weighted_ciou_loss

    pred = _rand_boxes(seed)
    tgt = _rand_boxes(seed + 100)
    ref = CenterWeightedCIoULoss()(torch.from_numpy(pred), torch.from_numpy(tgt))
    ours = center_weighted_ciou_loss(pred, tgt)
    assert float(ours) == pytest.approx(float(ref), rel=1e-5)


@requires_reference
def test_objectness_and_class_parity(reference_path):
    import torch
    from losses.objectness_loss import ObjectnessLoss
    from losses.class_loss import ClassificationLoss

    from yolo_scratch_tpu.losses.crater_aux import classification_loss, objectness_loss

    rng = np.random.RandomState(0)
    logits = rng.randn(2, 1, 8, 8).astype(np.float32)
    target = rng.choice([-1.0, 0.0, 1.0], size=(2, 1, 8, 8)).astype(np.float32)
    ref = ObjectnessLoss()(torch.from_numpy(logits), torch.from_numpy(target))
    ours = objectness_loss(logits[:, 0], target[:, 0])
    assert float(ours) == pytest.approx(float(ref), rel=1e-5)

    cl = rng.randn(2, 5, 8, 8).astype(np.float32)
    tc = rng.randint(-1, 5, (2, 8, 8)).astype(np.int64)
    ref = ClassificationLoss(5)(torch.from_numpy(cl), torch.from_numpy(tc))
    ours = classification_loss(cl.transpose(0, 2, 3, 1), tc)
    assert float(ours) == pytest.approx(float(ref), rel=1e-5)


@requires_reference
def test_rim_weighted_mask_parity(reference_path):
    import torch
    from losses.rim_weighted_mask_loss import RimWeightedMaskLoss

    from yolo_scratch_tpu.losses.crater_aux import rim_weighted_mask_loss

    rng = np.random.RandomState(1)
    B, H, W = 2, 32, 32
    mask = np.zeros((B, 1, H, W), np.float32)
    yy, xx = np.mgrid[0:H, 0:W]
    mask[0, 0][(xx - 16) ** 2 + (yy - 14) ** 2 < 81] = 1.0
    mask[1, 0][(xx - 10) ** 2 / 64 + (yy - 20) ** 2 / 25 < 1] = 1.0
    logits = rng.randn(B, 1, H, W).astype(np.float32)

    ref = RimWeightedMaskLoss()(torch.from_numpy(logits), torch.from_numpy(mask))
    ours = rim_weighted_mask_loss(logits[:, 0], mask[:, 0])
    assert float(ours) == pytest.approx(float(ref), rel=1e-4)


@requires_reference
def test_angular_coverage_parity(reference_path):
    import torch
    from losses.angular_coverage_loss import AngularCoverageLoss

    from yolo_scratch_tpu.losses.crater_aux import angular_coverage_loss

    B, H, W = 2, 24, 24
    mask = np.zeros((B, 1, H, W), np.float32)
    yy, xx = np.mgrid[0:H, 0:W]
    # center at a non-grid-aligned point so no pixel sits exactly on a bin
    # boundary (those flip bins under f32-vs-f64 atan2 rounding)
    mask[0, 0][(xx - 11.3) ** 2 + (yy - 12.4) ** 2 < 64] = 0.8  # full disk
    mask[1, 0][((xx - 11.3) ** 2 + (yy - 12.4) ** 2 < 64) & (xx > 12)] = 0.8  # partial
    centers = np.asarray([[11.3 / W, 12.4 / H], [11.3 / W, 12.4 / H]], np.float32)
    bbox = np.concatenate([centers, np.full((B, 2), 0.6, np.float32)], -1)

    ref = AngularCoverageLoss()(torch.from_numpy(mask), torch.from_numpy(bbox))
    ours = angular_coverage_loss(mask[:, 0], centers)
    assert float(ours) == pytest.approx(float(ref), abs=1e-5)


def test_ellipse_consistency_sanity():
    import jax.numpy as jnp

    from yolo_scratch_tpu.losses.crater_aux import ellipse_consistency_loss, mask_to_ellipse

    H = W = 48
    yy, xx = np.mgrid[0:H, 0:W]
    mask = (((xx - 24.0) / 12) ** 2 + ((yy - 20.0) / 6) ** 2 < 1).astype(np.float32)[None]

    cx, cy, a, b, ang, valid = mask_to_ellipse(jnp.asarray(mask))
    assert bool(valid[0])
    assert float(cx[0]) == pytest.approx(24.0, abs=0.6)
    assert float(cy[0]) == pytest.approx(20.0, abs=0.6)
    assert float(a[0]) == pytest.approx(12.0, rel=0.15)
    assert float(b[0]) == pytest.approx(6.0, rel=0.15)

    good_box = np.asarray([[24 / W, 20 / H, 24 / W, 12 / H]], np.float32)
    bad_box = np.asarray([[0.8, 0.8, 24 / W, 12 / H]], np.float32)
    l_good = float(ellipse_consistency_loss(mask, good_box))
    l_bad = float(ellipse_consistency_loss(mask, bad_box))
    assert l_good < l_bad


def test_legacy_loss_and_targets():
    import jax
    import numpy as np

    from yolo_scratch_tpu.losses.legacy_loss import (
        LegacyLossConfig, build_legacy_targets, legacy_yolo_loss,
    )
    from yolo_scratch_tpu.models.legacy import YOLOScratchModel

    B, S = 2, 32
    model = YOLOScratchModel(num_classes=5, width_mult=0.25)
    x = np.random.RandomState(0).rand(B, S, S, 1).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    # jit the forward: eager per-op dispatch of the whole legacy model was
    # ~2 min of this test's runtime on the 1-core host (and the compiled
    # program lands in the persistent cache for later runs)
    fwd = jax.jit(lambda v, xx: model.apply(v, xx, train=False))
    preds = fwd(variables, x)
    assert len(preds) == 4
    assert preds[0]["bbox"].shape == (B, S // 4, S // 4, 4)
    assert preds[3]["classes"].shape == (B, S // 32, S // 32, 5)

    gl = np.zeros((B, 4), np.int32)
    gb = np.zeros((B, 4, 4), np.float32)
    gm = np.zeros((B, 4), bool)
    gb[0, 0] = [0.2, 0.2, 0.5, 0.6]
    gl[0, 0] = 2
    gm[0, 0] = True

    feat_hw = [(p["bbox"].shape[1], p["bbox"].shape[2]) for p in preds]
    targets = build_legacy_targets(gl, gb, gm, feat_hw)
    # center (0.35, 0.4) -> cell (y=3, x=2) at stride 4 (8x8 grid, S=32)
    t0 = targets[0]
    assert float(t0["objectness"][0, 3, 2, 0]) == 1.0
    assert int(np.asarray(t0["classes"])[0, 3, 2]) == 2
    assert float(np.asarray(t0["objectness"]).sum()) == 1.0

    out = legacy_yolo_loss(preds, targets)
    assert np.isfinite(float(out["total_loss"]))
    grads = jax.jit(jax.grad(
        lambda v: legacy_yolo_loss(model.apply(v, x, train=False), targets)["total_loss"]
    ))(variables)
    assert all(np.isfinite(np.asarray(g)).all() for g in jax.tree_util.tree_leaves(grads))
