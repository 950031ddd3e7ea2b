"""Golden-parity: TAL assigner and v8 detection loss vs the torch reference."""

import numpy as np
import pytest

from tests.conftest import requires_reference

CFG = "yolo_scratch_tpu/configs/yolo11_crater.yaml"
NC = 5


def _synthetic_assign_inputs(seed=0, B=3, A=84, G=6, nc=NC, img=64.0):
    """Random but adversarial inputs: image 1 empty, some GTs tiny (no anchor
    inside -> force pass 1), some duplicated (multi-anchor conflicts)."""
    rng = np.random.RandomState(seed)
    pd_scores = rng.rand(B, A, nc).astype(np.float32)
    # anchors on an 8x8 grid of stride 8 plus 4x4 of stride 16 plus 2x2 of 32
    pts = []
    for n, s in [(8, 8.0), (4, 16.0), (2, 32.0)]:
        g = (np.stack(np.meshgrid(np.arange(n), np.arange(n), indexing="ij"), -1)[..., ::-1]
             .reshape(-1, 2).astype(np.float32) + 0.5) * s
        pts.append(g)
    anc = np.concatenate(pts)  # (84, 2)
    assert anc.shape[0] == A

    centers = rng.rand(B, A, 2).astype(np.float32) * img
    wh = rng.rand(B, A, 2).astype(np.float32) * 30 + 2
    pd_bboxes = np.concatenate([centers - wh / 2, centers + wh / 2], -1)

    gt_bboxes = np.zeros((B, G, 4), np.float32)
    gt_labels = np.zeros((B, G), np.int64)
    mask_gt = np.zeros((B, G), bool)
    for b in range(B):
        if b == 1:
            continue  # empty image
        n = rng.randint(1, G + 1)
        for g_i in range(n):
            if g_i == 0:
                # tiny box between grid points: no anchor center inside
                cx, cy = 12.3, 12.3
                w = h = 1.0
            elif g_i == 1 and n > 1:
                cx, cy = 30.0, 30.0
                w = h = 25.0
            elif g_i == 2 and n > 2:
                cx, cy = 31.0, 29.0  # heavy overlap with g_i==1
                w = h = 24.0
            else:
                cx, cy = rng.rand(2) * (img - 10) + 5
                w, h = rng.rand(2) * 20 + 4
            gt_bboxes[b, g_i] = [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2]
            gt_labels[b, g_i] = rng.randint(0, nc)
            mask_gt[b, g_i] = True
    return pd_scores, pd_bboxes, anc, gt_labels, gt_bboxes, mask_gt


@requires_reference
@pytest.mark.parametrize("seed", [0, 1, 2, 7])
def test_assigner_parity(reference_path, seed):
    import torch
    from losses.yolo_v8_loss import TaskAlignedAssigner

    from yolo_scratch_tpu.losses.tal import task_aligned_assign

    pd_scores, pd_bboxes, anc, gt_labels, gt_bboxes, mask_gt = _synthetic_assign_inputs(seed)

    tassigner = TaskAlignedAssigner(topk=50, num_classes=NC, alpha=0.5, beta=4.0)
    t_out = tassigner(
        torch.from_numpy(pd_scores),
        torch.from_numpy(pd_bboxes),
        torch.from_numpy(anc),
        torch.from_numpy(gt_labels),
        torch.from_numpy(gt_bboxes),
        torch.from_numpy(mask_gt),
    )
    t_labels, t_bboxes, t_scores, t_fg, t_tgi = [x.numpy() for x in t_out]

    j_out = task_aligned_assign(
        pd_scores, pd_bboxes, anc, gt_labels, gt_bboxes, mask_gt, num_classes=NC,
        alpha=0.5, beta=4.0,
    )

    np.testing.assert_array_equal(np.asarray(j_out.fg_mask), t_fg)
    np.testing.assert_array_equal(np.asarray(j_out.target_gt_idx), t_tgi)
    np.testing.assert_array_equal(np.asarray(j_out.target_labels), t_labels)
    np.testing.assert_allclose(np.asarray(j_out.target_bboxes), t_bboxes, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(j_out.target_scores), t_scores, rtol=1e-4, atol=1e-7)


@requires_reference
def test_full_loss_parity(reference_path):
    """End-to-end loss triplet parity on a transplanted model + random batch."""
    import torch
    from models.yolo11_model import build_yolo11 as torch_build
    from losses.yolo_v8_loss import v8DetectionLoss

    import jax
    from yolo_scratch_tpu.models.builder import build_yolo11
    from yolo_scratch_tpu.utils.torch_import import convert_reference_state_dict
    from yolo_scratch_tpu.losses.v8_loss import DetectionLossConfig, v8_detection_loss

    torch.manual_seed(0)
    tmodel = torch_build(cfg=str(reference_path / "configs/yolo11n_crater.yaml"), ch=1, nc=NC)
    tmodel.eval()
    criterion = v8DetectionLoss(tmodel)

    rng = np.random.RandomState(3)
    B, img = 2, 160
    x = rng.rand(B, 1, img, img).astype(np.float32)

    # flat targets (reference collate format): normalized xyxy
    n_boxes = [3, 2]
    batch_idx, cls_list, boxes = [], [], []
    for b, n in enumerate(n_boxes):
        for _ in range(n):
            cx, cy = rng.rand(2) * 0.8 + 0.1
            w, h = rng.rand(2) * 0.3 + 0.05
            boxes.append([max(cx - w / 2, 0), max(cy - h / 2, 0),
                          min(cx + w / 2, 1), min(cy + h / 2, 1)])
            batch_idx.append(b)
            cls_list.append(rng.randint(0, NC))
    batch = {
        "img": torch.from_numpy(x),
        "batch_idx": torch.tensor(batch_idx, dtype=torch.long),
        "cls": torch.tensor(cls_list, dtype=torch.long).unsqueeze(1),
        "bboxes": torch.from_numpy(np.array(boxes, np.float32)),
    }

    with torch.no_grad():
        _, tfeats = tmodel(batch["img"])
        t_total, t_items = criterion(tfeats, batch)

    # ours
    jmodel = build_yolo11(CFG, ch=1, nc=NC, scale="n")
    params, batch_stats = convert_reference_state_dict(tmodel.state_dict())
    variables = {"params": params, "batch_stats": batch_stats}
    jfeats = jmodel.apply(variables, x.transpose(0, 2, 3, 1), train=False)

    G = 4
    gl = np.zeros((B, G), np.int64)
    gb = np.zeros((B, G, 4), np.float32)
    gm = np.zeros((B, G), bool)
    for i, (b, c, bx) in enumerate(zip(batch_idx, cls_list, boxes)):
        slot = int(gm[b].sum())
        gl[b, slot] = c
        gb[b, slot] = bx
        gm[b, slot] = True

    cfg = DetectionLossConfig(nc=NC, strides=jmodel.strides)
    j_total, j_items = jax.jit(
        lambda f, a, bb, m: v8_detection_loss(f, a, bb, m, cfg)
    )(jfeats, gl, gb, gm)

    np.testing.assert_allclose(np.asarray(j_items), t_items.numpy(), rtol=2e-3, atol=1e-4)
    np.testing.assert_allclose(float(j_total), float(t_total), rtol=2e-3)


def test_loss_runs_without_reference():
    """Loss smoke: empty batch and grads finite (no reference needed)."""
    import jax
    import jax.numpy as jnp
    from yolo_scratch_tpu.losses.v8_loss import DetectionLossConfig, v8_detection_loss

    B, G, nc = 2, 4, 5
    cfg = DetectionLossConfig(nc=nc, strides=(8.0, 16.0, 32.0))
    rng = np.random.RandomState(0)
    feats = [
        jnp.asarray(rng.randn(B, 8, 8, 64 + nc).astype(np.float32)),
        jnp.asarray(rng.randn(B, 4, 4, 64 + nc).astype(np.float32)),
        jnp.asarray(rng.randn(B, 2, 2, 64 + nc).astype(np.float32)),
    ]
    gl = np.zeros((B, G), np.int64)
    gb = np.zeros((B, G, 4), np.float32)
    gm = np.zeros((B, G), bool)
    gb[0, 0] = [0.1, 0.1, 0.5, 0.5]
    gm[0, 0] = True

    def lossfn(feats):
        total, items = v8_detection_loss(feats, gl, gb, gm, cfg)
        return total, items

    (total, items), grads = jax.value_and_grad(lossfn, has_aux=True)(feats)
    assert np.isfinite(float(total))
    assert all(np.isfinite(np.asarray(g)).all() for g in grads)

    # fully-empty batch: box/dfl zero, cls finite
    gm[:] = False
    gb[:] = 0
    total2, items2 = v8_detection_loss(feats, gl, gb, gm, cfg)
    assert np.isfinite(float(total2))
    assert float(items2[0]) == 0.0 and float(items2[2]) == 0.0
