"""YOLOX family through the deploy stack (Predictor, infer/val CLIs).

The train CLI produces YOLOX checkpoints (``--model yolox``); these tests
pin that the serving surface handles them like YOLO11 ones: the Predictor
dispatches on model family (DFL fused select-then-decode vs generic
``yolox_eval_decode`` + shared postprocess), and ``load_deploy_model``
reconstructs the exact YOLOX architecture — depth/width included — from
the checkpoint params tree (``yolox_arch_from_params``), so ``--nc/--ch/
--scale`` flags are unnecessary.
"""

import json

import numpy as np

import jax


def _make_yolox_ckpt(tmp_path, nc=5, ch=3, imgsz=64, scale="nano"):
    from yolo_scratch_tpu.models.yolox import YOLOXModel
    from yolo_scratch_tpu.train.checkpoints import CheckpointManager
    from yolo_scratch_tpu.train.optim import make_optimizer
    from yolo_scratch_tpu.train.state import create_train_state

    model = YOLOXModel.from_scale(scale, nc=nc)
    state = create_train_state(
        model, jax.random.PRNGKey(0),
        np.zeros((1, imgsz, imgsz, ch), np.float32), make_optimizer(),
    )
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save_epoch(state, 0, {}, {"mAP50": 0.5}, float("inf"), 0.0)
    mgr.wait()
    return model, state


def test_yolox_arch_from_params():
    """(ch, nc, depth, width) read off the tree rebuilds the identical
    architecture (param-tree structure AND leaf shapes) at every scale
    where depth/width differ."""
    from yolo_scratch_tpu.models.yolox import YOLOXModel, yolox_arch_from_params

    for scale, ch, nc in [("nano", 3, 7), ("m", 1, 3)]:
        m = YOLOXModel.from_scale(scale, nc=nc)
        v = m.init(jax.random.PRNGKey(0), np.zeros((1, 64, 64, ch), np.float32))
        d_ch, d_nc, depth, width = yolox_arch_from_params(v["params"])
        assert (d_ch, d_nc) == (ch, nc)
        m2 = YOLOXModel(nc=d_nc, depth=depth, width=width)
        v2 = m2.init(jax.random.PRNGKey(0), np.zeros((1, 64, 64, d_ch), np.float32))
        assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v2)
        assert all(
            a.shape == b.shape
            for a, b in zip(jax.tree_util.tree_leaves(v), jax.tree_util.tree_leaves(v2))
        )


def test_load_deploy_model_autodetects_yolox(tmp_path):
    """No --model/--nc/--ch/--scale: the family and architecture come off
    the checkpoint, and the restored weights equal the saved ones."""
    from yolo_scratch_tpu.infer import load_deploy_model

    _, state = _make_yolox_ckpt(tmp_path, nc=7, ch=1)
    model, variables = load_deploy_model(
        "unused.yaml", scale="n", imgsz=64, ckpt=str(tmp_path / "ckpt"))
    assert type(model).__name__ == "YOLOXModel"
    assert model.nc == 7
    got = jax.tree_util.tree_leaves(variables["params"])
    want = jax.tree_util.tree_leaves(state.params)
    assert len(got) == len(want)
    assert all(np.allclose(a, b) for a, b in zip(got, want))


def test_infer_cli_serves_yolox_checkpoint(tmp_path):
    """End-to-end: the infer CLI auto-detects a YOLOX checkpoint and
    streams detections through the generic decode + shared NMS path."""
    from PIL import Image

    from yolo_scratch_tpu import infer as infer_cli

    _make_yolox_ckpt(tmp_path, nc=5, ch=3, imgsz=64)

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    for i in range(3):  # odd count exercises final-short-batch padding
        Image.fromarray((rng.rand(50, 70, 3) * 255).astype(np.uint8)).save(
            img_dir / f"i{i}.png")

    out = tmp_path / "preds.json"
    # random-init YOLOX scores are ~prior^2 (obj*cls ≈ 1e-4): a tiny conf
    # keeps candidates flowing through top-k + NMS
    results = infer_cli.main([
        "--images", str(img_dir), "--ckpt", str(tmp_path / "ckpt"),
        "--imgsz", "64", "--batch", "2", "--conf", "0.00001",
        "--out", str(out),
    ])
    assert len(results) == 3
    data = json.loads(out.read_text())
    assert len(data) == 3
    n_dets = 0
    for row in data:
        assert set(row) >= {"path", "boxes", "scores", "labels"}
        for lab in row["labels"]:
            assert 0 <= lab < 5
        n_dets += len(row["scores"])
    assert n_dets > 0  # the tiny conf must actually surface detections


def test_val_cli_yolox():
    """val CLI mirrors the train CLI's --model yolox: SimOTA val loss +
    obj*cls decode through the device-matched mAP path."""
    from yolo_scratch_tpu import val as val_cli

    out = val_cli.main([
        "--data", "synthetic", "--model", "yolox", "--scale", "nano",
        "--imgsz", "64", "--batch", "4", "--max-batches", "2",
        "--conf", "0.001",
    ])
    assert np.isfinite(out["loss"])
    assert "mAP50" in out and "mAP50-95" in out


def test_yolox_cli_handoff(tmp_path):
    """The exact user workflow: train CLI produces a YOLOX checkpoint ->
    val CLI evaluates it -> infer CLI serves it with zero architecture
    flags (family/depth/width/ch/nc all read off the checkpoint)."""
    from PIL import Image

    from yolo_scratch_tpu import infer as infer_cli
    from yolo_scratch_tpu import val as val_cli
    from yolo_scratch_tpu.train import cli as train_cli

    save = tmp_path / "run"
    train_cli.main([
        "--data", "synthetic", "--model", "yolox", "--scale", "nano",
        "--epochs", "1", "--batch", "4", "--imgsz", "64",
        "--save-dir", str(save), "--max-val-batches", "1",
        "--val-conf", "0.001",
    ])

    out = val_cli.main([
        "--data", "synthetic", "--model", "yolox", "--scale", "nano",
        "--imgsz", "64", "--batch", "4", "--max-batches", "1",
        "--conf", "0.001", "--ckpt", str(save), "--which", "last",
    ])
    assert np.isfinite(out["loss"])

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    for i in range(2):  # synthetic trains ch=1 -> grayscale serving
        Image.fromarray((rng.rand(50, 70) * 255).astype(np.uint8)).save(
            img_dir / f"i{i}.png")
    results = infer_cli.main([
        "--images", str(img_dir), "--ckpt", str(save), "--which", "last",
        "--imgsz", "64", "--batch", "2", "--conf", "0.00001",
    ])
    assert len(results) == 2
