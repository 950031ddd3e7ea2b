"""CocoDataset reader: generated COCO json + images."""

import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def coco_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco")
    img_dir = root / "images"
    img_dir.mkdir()
    rng = np.random.RandomState(0)

    images, annotations = [], []
    ann_id = 1
    for i in range(4):
        w, h = int(rng.randint(80, 160)), int(rng.randint(80, 160))
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        name = f"im{i}.jpg"
        cv2.imwrite(str(img_dir / name), img[..., ::-1])
        images.append({"id": i + 1, "file_name": name, "width": w, "height": h})
        for _ in range(int(rng.randint(0, 4))):
            bw, bh = rng.randint(10, w // 2), rng.randint(10, h // 2)
            x, y = rng.randint(0, w - bw), rng.randint(0, h - bh)
            annotations.append(
                {
                    "id": ann_id,
                    "image_id": i + 1,
                    "category_id": int(rng.choice([1, 3, 7])),
                    "bbox": [float(x), float(y), float(bw), float(bh)],
                    "iscrowd": 0,
                    "area": float(bw * bh),
                }
            )
            ann_id += 1
    # include a crowd ann that must be skipped
    annotations.append(
        {"id": ann_id, "image_id": 1, "category_id": 1,
         "bbox": [0, 0, 10, 10], "iscrowd": 1, "area": 100.0}
    )
    cats = [{"id": c, "name": f"cat{c}"} for c in (1, 3, 7)]
    ann_path = root / "instances.json"
    ann_path.write_text(
        json.dumps({"images": images, "annotations": annotations, "categories": cats})
    )
    return root


def test_coco_reader_stretch(coco_root):
    from yolo_scratch_tpu.data.coco import CocoDataset

    ds = CocoDataset(str(coco_root / "instances.json"), str(coco_root / "images"), img_size=64)
    assert len(ds) == 4
    assert ds.class_names == ["cat1", "cat3", "cat7"]
    img, boxes, labels = ds[0]
    assert img.shape == (64, 64, 3) and img.dtype == np.float32
    assert 0 <= img.min() and img.max() <= 1
    assert boxes.shape[1] == 4 if len(boxes) else True
    # contiguous label ids
    assert all(0 <= l < 3 for l in labels)
    # boxes normalized cx,cy,w,h
    if len(boxes):
        assert (boxes > 0).all() and (boxes <= 1).all()


def test_coco_reader_letterbox_geometry(coco_root):
    from yolo_scratch_tpu.data.coco import CocoDataset

    ds = CocoDataset(str(coco_root / "instances.json"), str(coco_root / "images"),
                     img_size=64, letterbox=True)
    img, boxes, labels = ds[0]
    assert img.shape == (64, 64, 3)
    # letterboxed boxes remain inside [0,1]
    if len(boxes):
        xy = boxes[:, :2]
        assert (xy >= 0).all() and (xy <= 1).all()


def test_coco_trains_via_loader(coco_root):
    """COCO sample flows through the padded loader format."""
    from yolo_scratch_tpu.data.coco import CocoDataset
    from yolo_scratch_tpu.data.loader import Loader

    ds = CocoDataset(str(coco_root / "instances.json"), str(coco_root / "images"), img_size=64)
    batch = next(iter(Loader(ds, batch_size=4, max_gt=8, prefetch=0)))
    assert batch["img"].shape == (4, 64, 64, 3)
    assert batch["gt_bboxes"].shape == (4, 8, 4)
    assert (batch["gt_bboxes"][~batch["gt_mask"]] == 0).all()


def test_synthetic_coco80_end_to_end(tmp_path):
    """The nc=80 synthetic generator (scripts/gen_coco_synth.py) feeds the
    reader, the padded loader, and the class-aware postprocess — the
    COCO-class-count paths that crater data (nc=5) never exercises."""
    import subprocess
    import sys as _sys
    from pathlib import Path

    import numpy as np

    root = Path(__file__).resolve().parent.parent
    out = tmp_path / "coco80"
    r = subprocess.run(
        [_sys.executable, str(root / "scripts/gen_coco_synth.py"),
         "--out", str(out), "--n", "8", "--img-size", "96", "--nc", "80"],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr

    from yolo_scratch_tpu.data.coco import CocoDataset
    from yolo_scratch_tpu.data.loader import Loader

    ds = CocoDataset(str(out / "annotations/instances.json"),
                     str(out / "images"), img_size=96)
    assert len(ds.class_names) == 80
    batch = next(iter(Loader(ds, batch_size=4, max_gt=8, prefetch=0)))
    assert batch["img"].shape == (4, 96, 96, 3)
    assert int(batch["gt_labels"].max()) < 80

    # class-aware postprocess at nc=80 (the COCO deploy default)
    from yolo_scratch_tpu.ops.decode import postprocess

    rng = np.random.RandomState(0)
    A = 126
    pred = np.zeros((2, A, 4 + 80), np.float32)
    pred[..., 0:2] = rng.rand(2, A, 2) * 96
    pred[..., 2:4] = rng.rand(2, A, 2) * 20 + 2
    pred[..., 4:] = rng.rand(2, A, 80).astype(np.float32)
    for impl in ("xla", "pallas", "tiled"):
        boxes, scores, labels, valid = postprocess(
            pred, img_size=96, conf_threshold=0.25, iou_threshold=0.45,
            max_det=20, pre_nms_topk=64, class_aware=True, nms_impl=impl)
        assert boxes.shape == (2, 20, 4)
        assert int(np.asarray(labels).max()) < 80
