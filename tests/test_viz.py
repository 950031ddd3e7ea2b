"""utils/viz.py — annotated-image output (host-side, off the compute path)."""

import json

import numpy as np
import pytest

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

from yolo_scratch_tpu.utils.viz import (  # noqa: E402
    class_color,
    draw_detections,
    load_class_names,
    save_annotated,
)


def test_class_colors_distinct_and_deterministic():
    colors = [class_color(i) for i in range(80)]
    assert colors == [class_color(i) for i in range(80)]  # deterministic
    assert len(set(colors)) == 80  # well-separated hues stay distinct
    for c in colors:
        assert all(0 <= v <= 255 for v in c)


def test_draw_modifies_pixels_inside_box_only_roughly(tmp_path):
    img = Image.fromarray(np.full((120, 160, 3), 255, np.uint8))
    before = np.asarray(img).copy()
    out = draw_detections(img, [[20, 30, 90, 100]], [0.87], [3])
    arr = np.asarray(out)
    assert (arr != before).any()  # something was drawn
    # far corner untouched (box + tag live in the upper-left region)
    assert (arr[110:, 140:] == 255).all()


def test_draw_from_path_grayscale_promoted(tmp_path):
    p = tmp_path / "g.png"
    Image.fromarray(np.zeros((64, 64), np.uint8)).save(p)
    out = draw_detections(str(p), [[5, 5, 40, 40]], [0.5], [1])
    assert out.mode == "RGB"  # gray input renders with colored boxes


def test_save_annotated_collision_and_min_score(tmp_path):
    (tmp_path / "a").mkdir()
    (tmp_path / "b").mkdir()
    paths = [tmp_path / "a" / "x.png", tmp_path / "b" / "x.png"]
    for p in paths:
        Image.fromarray(np.zeros((32, 32, 3), np.uint8)).save(p)
    results = [
        {"path": str(p), "boxes": [[1, 1, 10, 10], [2, 2, 20, 20]],
         "scores": [0.9, 0.1], "labels": [0, 1]}
        for p in paths
    ]
    written = save_annotated(results, str(tmp_path / "viz"), min_score=0.5)
    assert len(written) == 2
    assert len({w for w in written}) == 2  # same stem, disambiguated
    for w in written:
        assert Image.open(w).size == (32, 32)


def test_load_class_names_formats(tmp_path):
    txt = tmp_path / "names.txt"
    txt.write_text("crater\nrock\n\nboulder\n")
    assert load_class_names(str(txt)) == ["crater", "rock", "boulder"]

    arr = tmp_path / "names.json"
    arr.write_text(json.dumps(["a", "b"]))
    assert load_class_names(str(arr)) == ["a", "b"]

    coco = tmp_path / "ann.json"
    coco.write_text(json.dumps({
        "categories": [{"id": 7, "name": "late"}, {"id": 2, "name": "early"}]
    }))
    # sorted-id order == the contiguous train-label space (data/coco.py:44-47)
    assert load_class_names(str(coco)) == ["early", "late"]

    assert load_class_names(None) is None
