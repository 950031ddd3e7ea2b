"""Scale-out serving: Predictor.shard_over on the virtual 8-device mesh.

The shard_map-wrapped deploy program (forward + decode + Pallas NMS per
local shard, zero collectives) must produce exactly the single-device
Predictor's detections, and its outputs must actually live sharded over
the mesh.
"""

import numpy as np

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from yolo_scratch_tpu.infer import Predictor, PredictorConfig
from yolo_scratch_tpu.models.builder import build_yolo11
from yolo_scratch_tpu.parallel.mesh import make_mesh

CFG = "yolo_scratch_tpu/configs/yolo11_crater.yaml"
IMGSZ = 160


def _predictor():
    model = build_yolo11(CFG, ch=1, nc=5, scale="n")
    variables = model.init(
        jax.random.PRNGKey(0), np.zeros((1, IMGSZ, IMGSZ, 1), np.float32)
    )
    cfg = PredictorConfig(
        img_size=IMGSZ, batch_size=8, conf_threshold=0.001, max_det=32,
        pre_nms_topk=128,
    )
    return model, variables, cfg


def test_sharded_predictor_matches_single_device():
    model, variables, cfg = _predictor()
    x = np.random.default_rng(3).integers(
        0, 256, size=(8, IMGSZ, IMGSZ, 1), dtype=np.uint8)

    single = Predictor(model, variables, cfg)
    ref = [np.asarray(o) for o in single._infer(single.variables, x)]
    assert ref[3].sum() > 0

    mesh = make_mesh(8)
    sharded = Predictor(model, variables, cfg).shard_over(mesh)
    out = sharded._infer(sharded.variables, x)

    # outputs live batch-sharded over all 8 devices, not replicated
    assert len(out[0].sharding.device_set) == 8
    assert out[0].sharding.is_equivalent_to(
        NamedSharding(mesh, P("dp")), ndim=out[0].ndim)

    got = [np.asarray(o) for o in out]
    np.testing.assert_allclose(got[0], ref[0], rtol=0, atol=1e-6)
    np.testing.assert_allclose(got[1], ref[1], rtol=0, atol=1e-6)
    np.testing.assert_array_equal(got[2], ref[2])
    np.testing.assert_array_equal(got[3], ref[3])


def test_sharded_predictor_rejects_indivisible_batch():
    model, variables, cfg = _predictor()
    cfg.batch_size = 6
    mesh = make_mesh(8)
    import pytest

    with pytest.raises(ValueError, match="not divisible"):
        Predictor(model, variables, cfg).shard_over(mesh)


def test_sharded_predictor_matches_single_device_yolox():
    """Family dispatch under shard_map: the YOLOX deploy program (generic
    decode + shared NMS) scales out identically to the DFL path.

    Pinned in f32: XLA compiles the per-shard B=1 convs with a different
    reduction order than the unsharded B=8 program (measured 1 bf16 ulp on
    the raw features), and a random-init YOLOX's scores are near-ties
    (~prior² ≈ 1e-4, gaps < 1e-5), so bf16 rank order — hence NMS keep
    sets — is not shard-invariant at init. In f32 the reassociation noise
    (~1e-7) sits far below the score gaps and detections match exactly.
    Trained models have well-separated scores; the bf16 deploy default is
    unaffected in practice (the yolo11 bf16 test above stays bit-exact)."""
    from yolo_scratch_tpu.models.yolox import YOLOXModel

    model = YOLOXModel.from_scale("nano", nc=5)
    variables = model.init(
        jax.random.PRNGKey(0), np.zeros((1, IMGSZ, IMGSZ, 3), np.float32)
    )
    cfg = PredictorConfig(
        img_size=IMGSZ, batch_size=8, conf_threshold=1e-5, max_det=32,
        pre_nms_topk=128, bf16=False,
    )
    x = np.random.default_rng(5).integers(
        0, 256, size=(8, IMGSZ, IMGSZ, 3), dtype=np.uint8)

    single = Predictor(model, variables, cfg)
    ref = [np.asarray(o) for o in single._infer(single.variables, x)]
    assert ref[3].sum() > 0

    mesh = make_mesh(8)
    sharded = Predictor(model, variables, cfg).shard_over(mesh)
    out = sharded._infer(sharded.variables, x)
    assert len(out[0].sharding.device_set) == 8

    got = [np.asarray(o) for o in out]
    np.testing.assert_allclose(got[0], ref[0], rtol=0, atol=1e-6)
    np.testing.assert_allclose(got[1], ref[1], rtol=0, atol=1e-6)
    np.testing.assert_array_equal(got[2], ref[2])
    np.testing.assert_array_equal(got[3], ref[3])


def test_packed_infer_matches_tuple_outputs():
    """_infer_packed (the 1-fetch streaming/serving variant) must encode
    exactly the 4-tuple program's outputs: [x1 y1 x2 y2 score label
    valid] per detection row, losslessly (labels < 2^24 exact in f32)."""
    model, variables, cfg = _predictor()
    x = np.random.default_rng(7).integers(
        0, 256, size=(8, IMGSZ, IMGSZ, 1), dtype=np.uint8)

    pred = Predictor(model, variables, cfg)
    boxes, scores, labels, valid = [
        np.asarray(o) for o in pred._infer(pred.variables, x)]
    packed = np.asarray(pred._infer_packed(pred.variables, x))

    assert packed.shape == (8, cfg.max_det, 7)
    assert packed.dtype == np.float32
    np.testing.assert_allclose(packed[..., :4], boxes.astype(np.float32),
                               rtol=0, atol=0)
    np.testing.assert_allclose(packed[..., 4], scores.astype(np.float32),
                               rtol=0, atol=0)
    np.testing.assert_array_equal(packed[..., 5].astype(labels.dtype), labels)
    np.testing.assert_array_equal(packed[..., 6] > 0.5, valid.astype(bool))


def test_packed_infer_sharded_matches_single_device():
    """shard_over must rewrap the packed variant too (serving scale-out
    uses it for the single-fetch path)."""
    model, variables, cfg = _predictor()
    x = np.random.default_rng(11).integers(
        0, 256, size=(8, IMGSZ, IMGSZ, 1), dtype=np.uint8)

    single = Predictor(model, variables, cfg)
    ref = np.asarray(single._infer_packed(single.variables, x))

    mesh = make_mesh(8)
    sharded = Predictor(model, variables, cfg).shard_over(mesh)
    out = sharded._infer_packed(sharded.variables, x)
    assert len(out.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(out), ref, rtol=0, atol=1e-6)
