"""Deploy CLI (infer.py): checkpoint dim auto-detect + end-to-end serving.

The reference deploy path hardcodes ch=1 nc=5 (``train_yolo11_cuda.py:554``);
our CLI reads (ch, nc) off the checkpoint's params tree so it serves
whatever the train CLI produced — including nc=80 COCO-style models with
class-aware Pallas NMS.
"""

import json
from pathlib import Path

import numpy as np

import jax

CFG = str(Path(__file__).resolve().parent.parent
          / "yolo_scratch_tpu/configs/yolo11_crater.yaml")


def _make_ckpt(tmp_path, ch, nc, imgsz=160):
    from yolo_scratch_tpu.models.builder import build_yolo11
    from yolo_scratch_tpu.train.checkpoints import CheckpointManager
    from yolo_scratch_tpu.train.optim import make_optimizer
    from yolo_scratch_tpu.train.state import create_train_state

    model = build_yolo11(CFG, ch=ch, nc=nc, scale="n")
    state = create_train_state(
        model, jax.random.PRNGKey(0),
        np.zeros((1, imgsz, imgsz, ch), np.float32), make_optimizer(),
    )
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save_epoch(state, 0, {}, {"mAP50": 0.5}, float("inf"), 0.0)
    mgr.wait()
    return state


def test_dims_from_params():
    from yolo_scratch_tpu.models.builder import build_yolo11, dims_from_params

    model = build_yolo11(CFG, ch=3, nc=80, scale="n")
    v = model.init(jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32))
    assert dims_from_params(v["params"]) == (3, 80)

    model1 = build_yolo11(CFG, ch=1, nc=5, scale="n")
    v1 = model1.init(jax.random.PRNGKey(0), np.zeros((1, 64, 64, 1), np.float32))
    assert dims_from_params(v1["params"]) == (1, 5)


def test_infer_cli_serves_nc80_checkpoint(tmp_path):
    """No --nc/--ch flags: the CLI must detect (3, 80) from the checkpoint,
    restore it, and stream class-aware Pallas-NMS detections end-to-end."""
    from PIL import Image

    from yolo_scratch_tpu import infer as infer_cli

    _make_ckpt(tmp_path, ch=3, nc=80)

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    for i in range(3):  # odd count: exercises final-short-batch padding
        Image.fromarray((rng.rand(80, 100, 3) * 255).astype(np.uint8)).save(
            img_dir / f"i{i}.png")

    out = tmp_path / "preds.json"
    viz_dir = tmp_path / "viz"
    results = infer_cli.main([
        "--images", str(img_dir), "--ckpt", str(tmp_path / "ckpt"),
        "--imgsz", "160", "--batch", "2", "--out", str(out), "--class-aware",
        "--save-viz", str(viz_dir),
    ])
    assert len(results) == 3
    assert len(list(viz_dir.glob("*.png"))) == 3  # one annotated PNG each
    data = json.loads(out.read_text())
    assert len(data) == 3
    for row in data:
        assert set(row) >= {"path", "boxes", "scores", "labels"}
        for lab in row["labels"]:
            assert 0 <= lab < 80


def test_predict_paths_inflight_depth_equivalence(tmp_path):
    """Streaming results must be independent of the pipeline depth:
    cfg.inflight only changes WHEN the oldest batch is drained, never
    what is yielded or in what order (incl. the padded tail batch)."""
    import cv2

    from yolo_scratch_tpu.infer import Predictor, PredictorConfig
    from yolo_scratch_tpu.models.builder import build_yolo11

    imgsz = 96
    model = build_yolo11(CFG, ch=1, nc=5, scale="n")
    variables = model.init(
        jax.random.PRNGKey(0), np.zeros((1, imgsz, imgsz, 1), np.float32))

    paths = []
    for i in range(10):  # B=3 -> 3 full batches + 1-image padded tail
        p = str(tmp_path / f"im{i}.png")
        cv2.imwrite(p, (np.random.RandomState(i).rand(80, 96) * 255)
                    .astype(np.uint8))
        paths.append(p)

    def run(depth):
        cfg = PredictorConfig(img_size=imgsz, batch_size=3,
                              conf_threshold=0.001, max_det=16,
                              pre_nms_topk=64, inflight=depth)
        return list(Predictor(model, variables, cfg).predict_paths(paths))

    shallow, deep = run(1), run(4)
    assert [r["path"] for r in shallow] == paths
    assert [r["path"] for r in deep] == paths
    for a, b in zip(shallow, deep):
        np.testing.assert_allclose(a["boxes"], b["boxes"], rtol=0, atol=0)
        np.testing.assert_allclose(a["scores"], b["scores"], rtol=0, atol=0)
        assert a["labels"] == b["labels"]


def test_infer_cli_topk_reaches_predictor_config(tmp_path, monkeypatch):
    """--topk (round 4) must land in PredictorConfig.pre_nms_topk: the flag
    is the deploy-side recall/latency knob (docs/PERF.md 'prefilter cap')
    and a silent drop would reintroduce the capped-recall bug the 640 H2H
    decomposition found (docs/H2H.md). Wiring-only: the Predictor is
    replaced by a recorder, so no device compile happens."""
    from PIL import Image

    from yolo_scratch_tpu import infer as infer_cli

    _make_ckpt(tmp_path, ch=1, nc=5)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    Image.fromarray(np.zeros((80, 96), np.uint8)).save(img_dir / "i0.png")

    seen = {}

    class _Recorder:
        def __init__(self, model, variables, cfg):
            seen["cfg"] = cfg

        def predict_paths(self, paths):
            return iter(())

    monkeypatch.setattr(infer_cli, "Predictor", _Recorder)
    infer_cli.main([
        "--images", str(img_dir), "--ckpt", str(tmp_path / "ckpt"),
        "--imgsz", "160", "--batch", "1", "--topk", "777",
    ])
    assert seen["cfg"].pre_nms_topk == 777
    # default stays the documented deploy default when the flag is absent
    seen.clear()
    infer_cli.main([
        "--images", str(img_dir), "--ckpt", str(tmp_path / "ckpt"),
        "--imgsz", "160", "--batch", "1",
    ])
    assert seen["cfg"].pre_nms_topk == infer_cli.PredictorConfig.pre_nms_topk
