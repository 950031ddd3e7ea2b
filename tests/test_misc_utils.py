"""Device letterbox, model info, val CLI smoke."""

import json

import numpy as np
import pytest


def test_letterbox_batch_geometry():
    from yolo_scratch_tpu.data.augment import letterbox_batch

    imgs = np.ones((2, 30, 60, 1), np.float32) * 0.7
    out, r, (px, py) = letterbox_batch(imgs, 64, pad_value=0.0)
    assert out.shape == (2, 64, 64, 1)
    assert r == pytest.approx(64 / 60, rel=1e-6)
    nh = round(30 * r)
    assert py == (64 - nh) // 2 and px == 0
    o = np.asarray(out)
    assert np.allclose(o[:, py + 1 : py + nh - 1, 1:-1], 0.7, atol=1e-2)  # content
    assert np.allclose(o[:, 0, :], 0.0)  # top pad


def test_model_info_counts():
    from yolo_scratch_tpu.models.builder import build_yolo11
    from yolo_scratch_tpu.utils.model_info import count_params, model_info

    model = build_yolo11(
        "yolo_scratch_tpu/configs/yolo11_crater.yaml", ch=1, nc=5, scale="n"
    )
    info = model_info(model, img_size=64, channels=1)
    assert info["params"] == 3_072_127  # matches the CLI print / torch - 16 (DFL)
    assert info["gflops"] > 0


def test_val_cli_synthetic(capsys):
    from yolo_scratch_tpu.val import main

    out = main(["--data", "synthetic", "--imgsz", "64", "--batch", "4",
                "--max-gt", "8", "--max-batches", "2", "--conf", "0.01", "--cda"])
    assert "mAP50" in out and "cda/cda_proxy" in out
    assert np.isfinite(out["loss"])
