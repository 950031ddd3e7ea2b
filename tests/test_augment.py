"""Device-side augmentation: geometric correctness of box remapping."""

import numpy as np
import jax
import pytest


def _batch_with_disk(B=4, S=48):
    """Images with one bright square per image; boxes are exact bounds."""
    rng = np.random.RandomState(0)
    img = np.zeros((B, S, S, 1), np.float32)
    bb = np.zeros((B, 8, 4), np.float32)
    lbl = np.zeros((B, 8), np.int32)
    msk = np.zeros((B, 8), bool)
    for i in range(B):
        x1, y1 = rng.randint(4, S // 2, 2)
        w, h = rng.randint(8, S // 3, 2)
        img[i, y1 : y1 + h, x1 : x1 + w, 0] = 1.0
        bb[i, 0] = [x1 / S, y1 / S, (x1 + w) / S, (y1 + h) / S]
        lbl[i, 0] = i % 5
        msk[i, 0] = True
    return {"img": img, "gt_bboxes": bb, "gt_labels": lbl, "gt_mask": msk}


def _box_covers_mass(img, box, thresh=0.99):
    """All bright pixels of a binary image lie inside box (normalized xyxy)."""
    S = img.shape[0]
    ys, xs = np.nonzero(img[..., 0] > 0.5)
    if len(xs) == 0:
        return True
    x1, y1, x2, y2 = box * S
    inside = (xs >= x1 - 1) & (xs <= x2 + 1) & (ys >= y1 - 1) & (ys <= y2 + 1)
    return inside.mean() >= thresh


def test_hflip_box_alignment():
    from yolo_scratch_tpu.data.augment import random_hflip

    batch = _batch_with_disk()
    out = random_hflip(batch, jax.random.PRNGKey(0), p=1.0)
    img = np.asarray(out["img"])
    bb = np.asarray(out["gt_bboxes"])
    for i in range(img.shape[0]):
        assert _box_covers_mass(img[i], bb[i, 0])
    # flipping twice restores the original
    out2 = random_hflip(out, jax.random.PRNGKey(1), p=1.0)
    np.testing.assert_allclose(np.asarray(out2["img"]), batch["img"])
    np.testing.assert_allclose(np.asarray(out2["gt_bboxes"][:, 0]), batch["gt_bboxes"][:, 0], atol=1e-7)


def test_mosaic_box_alignment():
    from yolo_scratch_tpu.data.augment import mosaic4

    batch = _batch_with_disk(B=4, S=48)
    out = mosaic4(batch, jax.random.PRNGKey(2), p=1.0)
    img = np.asarray(out["img"])
    bb = np.asarray(out["gt_bboxes"])
    msk = np.asarray(out["gt_mask"])
    assert img.shape == batch["img"].shape
    for i in range(4):
        # every bright pixel is covered by the union of valid boxes
        S = img.shape[1]
        ys, xs = np.nonzero(img[i, ..., 0] > 0.5)
        if len(xs) == 0:
            continue
        covered = np.zeros(len(xs), bool)
        for g in range(bb.shape[1]):
            if not msk[i, g]:
                continue
            x1, y1, x2, y2 = bb[i, g] * S
            covered |= (xs >= x1 - 1.5) & (xs <= x2 + 1.5) & (ys >= y1 - 1.5) & (ys <= y2 + 1.5)
        assert covered.mean() > 0.95, f"image {i}: {covered.mean()}"


def test_gray_and_hsv_jitter_ranges():
    from yolo_scratch_tpu.data.augment import AugmentConfig, gray_jitter, hsv_jitter

    rng = np.random.RandomState(1)
    g = rng.rand(2, 16, 16, 1).astype(np.float32)
    out = gray_jitter(g, jax.random.PRNGKey(0), AugmentConfig())
    assert out.shape == g.shape
    assert float(out.min()) >= 0 and float(out.max()) <= 1

    c = rng.rand(2, 16, 16, 3).astype(np.float32)
    out = hsv_jitter(c, jax.random.PRNGKey(0), AugmentConfig())
    assert out.shape == c.shape
    assert float(out.min()) >= -1e-5 and float(out.max()) <= 1 + 1e-5
    # zero gains => identity
    cfg0 = AugmentConfig(hsv_h=0.0, hsv_s=0.0, hsv_v=0.0)
    out0 = hsv_jitter(c, jax.random.PRNGKey(0), cfg0)
    np.testing.assert_allclose(np.asarray(out0), c, atol=2e-3)


def test_augment_batch_pipeline_jits():
    from yolo_scratch_tpu.data.augment import AugmentConfig, augment_batch

    batch = _batch_with_disk()
    cfg = AugmentConfig(mosaic_p=0.5, hflip_p=0.5)
    out = augment_batch(batch, jax.random.PRNGKey(3), cfg)
    assert out["img"].shape == batch["img"].shape
    assert out["gt_bboxes"].shape == batch["gt_bboxes"].shape
    b = np.asarray(out["gt_bboxes"])
    assert (b >= 0).all() and (b <= 1).all()


def test_mixup_blend_and_box_union():
    from yolo_scratch_tpu.data.augment import mixup

    batch = _batch_with_disk()
    out = mixup(batch, jax.random.PRNGKey(3), p=1.0, alpha=8.0)
    img = np.asarray(out["img"])
    bb = np.asarray(out["gt_bboxes"])
    msk = np.asarray(out["gt_mask"])
    B = img.shape[0]
    # pixel mass is conserved under a convex blend of binary disks: every
    # bright region must be covered by the union of that image's boxes
    for i in range(B):
        ys, xs = np.nonzero(img[i, ..., 0] > 0.05)
        if len(xs) == 0:
            continue
        S = img.shape[1]
        covered = np.zeros(len(xs), bool)
        for b, ok in zip(bb[i], msk[i]):
            if not ok:
                continue
            x1, y1, x2, y2 = b * S
            covered |= (xs >= x1 - 1) & (xs <= x2 + 1) & (ys >= y1 - 1) & (ys <= y2 + 1)
        assert covered.mean() >= 0.99
    # blending happened: some image is a true mixture (two intensity levels)
    levels = [len(np.unique(np.round(img[i, ..., 0], 3))) for i in range(B)]
    assert max(levels) >= 3  # 0, lam, (1-lam) at least (disks may overlap)


def test_mixup_p_zero_is_identity():
    from yolo_scratch_tpu.data.augment import mixup

    batch = _batch_with_disk()
    out = mixup(batch, jax.random.PRNGKey(0), p=0.0)
    for k in ("img", "gt_bboxes", "gt_labels", "gt_mask"):
        np.testing.assert_array_equal(np.asarray(out[k]), batch[k])


def test_augment_pipeline_with_mixup_jits():
    from yolo_scratch_tpu.data.augment import AugmentConfig, augment_batch

    batch = _batch_with_disk()
    cfg = AugmentConfig(mosaic_p=0.5, mixup_p=0.5)
    out = jax.jit(augment_batch, static_argnames=("cfg",))(
        batch, jax.random.PRNGKey(1), cfg)
    assert np.asarray(out["img"]).shape == batch["img"].shape
    assert np.asarray(out["gt_bboxes"]).shape == batch["gt_bboxes"].shape
    assert bool(np.asarray(out["gt_mask"]).any())
