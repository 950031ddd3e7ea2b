"""int8 PTQ tier (nn/quant.py + the ConvBNAct quant/calib hooks).

Covers: exact int-math semantics of the quantized block, full-model
closeness, inertness of the hooks on the training path (golden parity must
survive), and deploy integration through the Predictor.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolo_scratch_tpu.nn.modules import ConvBNAct
from yolo_scratch_tpu.nn.quant import (
    build_quant_tree,
    calibrate_absmax,
    count_quantized,
    quantize_for_deploy,
)


@pytest.fixture(scope="module")
def conv_block():
    m = ConvBNAct(c2=8, k=3)
    x = np.random.RandomState(0).randn(2, 16, 16, 4).astype(np.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    return m, v, x


def test_quant_conv_matches_exact_int_math(conv_block):
    """The quant branch IS symmetric int8: reproduce it by hand."""
    m, v, x = conv_block
    calib = calibrate_absmax(m, v, [x])
    q = build_quant_tree(v["params"], calib)
    assert set(q) == {"w_q", "s_w", "s_act"}
    assert q["w_q"].dtype == jnp.int8

    y_q = np.asarray(m.apply({**v, "quant": q}, x, train=False))

    s_act = float(q["s_act"])
    xq = np.clip(np.round(x / s_act), -127, 127).astype(np.int8)
    acc = np.asarray(jax.lax.conv_general_dilated(
        jnp.asarray(xq), q["w_q"], (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32))
    deq = acc.astype(np.float32) * (s_act * np.asarray(q["s_w"]))
    pbn, sbn = v["params"]["bn"], v["batch_stats"]["bn"]
    g = np.asarray(pbn["scale"]) / np.sqrt(np.asarray(sbn["var"]) + 1e-3)
    bn = (deq - np.asarray(sbn["mean"])) * g + np.asarray(pbn["bias"])
    ref = bn / (1 + np.exp(-bn))  # SiLU
    np.testing.assert_allclose(ref, y_q, atol=2e-5, rtol=1e-4)


def test_quant_error_small_vs_float(conv_block):
    m, v, x = conv_block
    calib = calibrate_absmax(m, v, [x])
    q = build_quant_tree(v["params"], calib)
    y_f = np.asarray(m.apply(v, x, train=False))
    y_q = np.asarray(m.apply({**v, "quant": q}, x, train=False))
    assert np.abs(y_f - y_q).max() < 0.05 * np.abs(y_f).max()


def test_calib_hook_inert_without_mutable(conv_block):
    """Plain apply (no mutable calib) is unchanged and creates nothing."""
    m, v, x = conv_block
    y0 = np.asarray(m.apply(v, x, train=False))
    out, mut = m.apply(v, x, train=False, mutable=["calib"])
    np.testing.assert_array_equal(y0, np.asarray(out))
    assert "absmax" in mut["calib"]
    # init must not create a calib collection
    assert "calib" not in v


def test_quant_ignored_in_train_mode(conv_block):
    """train=True never takes the int8 path even with quant mounted."""
    m, v, x = conv_block
    calib = calibrate_absmax(m, v, [x])
    q = build_quant_tree(v["params"], calib)
    y_ref, _ = m.apply(v, x, train=True, mutable=["batch_stats"])
    y_qt, _ = m.apply({**v, "quant": q}, x, train=True, mutable=["batch_stats"])
    np.testing.assert_array_equal(np.asarray(y_ref), np.asarray(y_qt))


def test_skip_predicate(conv_block):
    m, v, x = conv_block
    calib = calibrate_absmax(m, v, [x])
    q = build_quant_tree(v["params"], calib, skip=lambda path: True)
    assert count_quantized({"root": q}) == 0 and q == {}


@pytest.fixture(scope="module")
def small_model():
    from yolo_scratch_tpu.models.builder import build_yolo11

    model = build_yolo11(
        "yolo_scratch_tpu/configs/yolo11_crater.yaml", ch=1, nc=5, scale="n")
    x = np.random.RandomState(1).rand(2, 96, 96, 1).astype(np.float32)
    v = model.init(jax.random.PRNGKey(0), x)
    return model, v, x


def test_full_model_quantization(small_model):
    model, v, x = small_model
    vq = quantize_for_deploy(model, v, [x])
    assert count_quantized(vq["quant"]) > 50  # every ConvBNAct in yolo11n
    f = jax.jit(lambda vv, xx: model.apply(vv, xx, train=False))
    yf = f({k: vq[k] for k in ("params", "batch_stats")}, x)
    yq = f(vq, x)
    for a, b in zip(yf, yq):
        a, b = np.asarray(a), np.asarray(b)
        assert np.abs(a - b).max() < 0.05 * np.abs(a).max()


def test_predictor_serves_quantized_variables(small_model, tmp_path):
    """The deploy path: quant tree survives Predictor's bf16 cast and the
    jitted program runs end-to-end on image files."""
    from yolo_scratch_tpu.infer import Predictor, PredictorConfig

    model, v, x = small_model
    vq = quantize_for_deploy(model, v, [x])
    cfg = PredictorConfig(img_size=96, batch_size=2, nms_impl="xla",
                          conf_threshold=0.0)
    pred = Predictor(model, vq, cfg)
    assert "quant" in pred.variables  # bf16 cast must not drop it
    assert pred.variables["quant"] is vq["quant"]

    import cv2

    paths = []
    for i in range(2):
        p = str(tmp_path / f"im{i}.png")
        cv2.imwrite(p, (np.random.RandomState(i).rand(80, 96) * 255).astype(np.uint8))
        paths.append(p)
    results = list(pred.predict_paths(paths))
    assert len(results) == 2
    for r in results:
        assert len(r["boxes"]) == len(r["scores"]) == len(r["labels"])


def test_int8_export_roundtrip(small_model, tmp_path):
    """AOT export of the int8 deploy graph: artifact == live, int8 baked in."""
    from yolo_scratch_tpu.export import export_predictor, load_artifact, save_artifact
    from yolo_scratch_tpu.infer import Predictor, PredictorConfig

    model, v, x = small_model
    vq = quantize_for_deploy(model, v, [x])
    cfg = PredictorConfig(img_size=96, batch_size=2, conf_threshold=0.001,
                          max_det=32, pre_nms_topk=128, nms_impl="xla")
    pred = Predictor(model, vq, cfg)
    xb = np.random.default_rng(3).integers(0, 256, (2, 96, 96, 1), np.uint8)
    live = [np.asarray(o) for o in pred._infer(pred.variables, xb)]

    path = str(tmp_path / "int8.jaxexp")
    save_artifact(export_predictor(pred), path)
    art = load_artifact(path)
    got = [np.asarray(o) for o in jax.jit(art.call)(xb)]
    for g, l in zip(got, live):
        np.testing.assert_allclose(g, l, rtol=0, atol=1e-6)


def test_yolox_int8():
    """The quant tier covers the YOLOX family (shared ConvBNAct)."""
    from yolo_scratch_tpu.models.yolox import YOLOXModel

    model = YOLOXModel.from_scale("nano", nc=5)
    x = np.random.RandomState(2).rand(1, 96, 96, 3).astype(np.float32)
    v = model.init(jax.random.PRNGKey(0), x)
    vq = quantize_for_deploy(model, v, [x])
    assert count_quantized(vq["quant"]) > 30
    f = jax.jit(lambda vv, xx: model.apply(vv, xx, train=False))
    yf = f({k: vq[k] for k in ("params", "batch_stats")}, x)
    yq = f(vq, x)
    for a, b in zip(yf, yq):
        a, b = np.asarray(a), np.asarray(b)
        assert np.abs(a - b).max() < 0.06 * np.abs(a).max()


def test_serve_daemon_int8(small_model):
    """HTTP serving over a quantized Predictor end-to-end."""
    import io
    import json as _json
    import threading
    import urllib.request

    from PIL import Image

    from yolo_scratch_tpu.infer import Predictor, PredictorConfig
    from yolo_scratch_tpu.serve import BatchingServer, make_http_server

    model, v, x = small_model
    vq = quantize_for_deploy(model, v, [x])
    pred = Predictor(model, vq, PredictorConfig(
        img_size=96, batch_size=2, conf_threshold=0.01))
    batching = BatchingServer(pred, max_wait_ms=50.0)
    httpd = make_http_server(batching, port=0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        buf = io.BytesIO()
        Image.fromarray(
            (np.random.RandomState(0).rand(80, 96) * 255).astype(np.uint8),
            mode="L").save(buf, format="PNG")
        req = urllib.request.Request(
            f"http://127.0.0.1:{httpd.server_address[1]}/v1/detect",
            data=buf.getvalue(), method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            out = _json.loads(r.read())
        assert "boxes" in out and "scores" in out
    finally:
        httpd.shutdown()
        batching.close()


def test_sharded_int8_predictor_matches_single_device(small_model):
    """int8 composes with scale-out serving: shard_over a quantized
    Predictor == single-device, outputs batch-sharded."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from yolo_scratch_tpu.infer import Predictor, PredictorConfig
    from yolo_scratch_tpu.parallel.mesh import make_mesh

    model, v, x = small_model
    vq = quantize_for_deploy(model, v, [x])
    cfg = PredictorConfig(img_size=96, batch_size=8, conf_threshold=0.001,
                          max_det=32, pre_nms_topk=128, nms_impl="xla")
    xb = np.random.default_rng(5).integers(0, 256, (8, 96, 96, 1), np.uint8)

    single = Predictor(model, vq, cfg)
    ref = [np.asarray(o) for o in single._infer(single.variables, xb)]
    assert ref[3].sum() > 0

    mesh = make_mesh(8)
    sharded = Predictor(model, vq, cfg).shard_over(mesh)
    out = sharded._infer(sharded.variables, xb)
    assert out[0].sharding.is_equivalent_to(
        NamedSharding(mesh, P("dp")), ndim=out[0].ndim)
    got = [np.asarray(o) for o in out]
    for g, r in zip(got, ref):
        np.testing.assert_allclose(g, r, rtol=0, atol=1e-6)


def test_export_cli_int8(tmp_path):
    """yst-export --int8-calib-dir: checkpoint -> int8 StableHLO artifact."""
    import cv2

    from yolo_scratch_tpu import export as export_mod
    from yolo_scratch_tpu.models.builder import build_yolo11
    from yolo_scratch_tpu.train.checkpoints import CheckpointManager
    from yolo_scratch_tpu.train.optim import make_optimizer
    from yolo_scratch_tpu.train.state import create_train_state

    cfg = "yolo_scratch_tpu/configs/yolo11_crater.yaml"
    model = build_yolo11(cfg, ch=1, nc=5, scale="n")
    state = create_train_state(
        model, jax.random.PRNGKey(0),
        np.zeros((1, 96, 96, 1), np.float32), make_optimizer())
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save_epoch(state, 0, {}, {"mAP50": 0.5}, float("inf"), 0.0)
    mgr.wait()

    calib_dir = tmp_path / "calib"
    calib_dir.mkdir()
    for i in range(3):
        cv2.imwrite(str(calib_dir / f"c{i}.png"),
                    (np.random.RandomState(i).rand(96, 96) * 255).astype(np.uint8))

    out = str(tmp_path / "int8.jaxexp")
    export_mod.main([
        "--cfg", cfg, "--ckpt", str(tmp_path / "ckpt"), "--which", "best",
        "--imgsz", "96", "--batch", "2", "--nms-impl", "xla",
        "--int8-calib-dir", str(calib_dir), "--out", out, "--check",
    ])
    art = export_mod.load_artifact(out)
    x = np.random.default_rng(0).integers(
        0, 256, art.in_avals[0].shape, np.uint8)
    outs = [np.asarray(o) for o in jax.jit(art.call)(x)]
    assert outs[0].shape == (2, 300, 4)


def test_quantile_calibration_clips_outliers(conv_block):
    """Percentile calibration ignores the outlier tail that absmax tracks."""
    from yolo_scratch_tpu.nn.quant import calibrate_quantile

    m, v, _ = conv_block
    x = np.random.RandomState(0).randn(2, 16, 16, 4).astype(np.float32)
    x[0, 0, 0, 0] = 50.0  # single hot pixel
    am = calibrate_absmax(m, v, [x])
    qt = calibrate_quantile(m, v, [x], q=0.999)
    assert float(am["absmax"]) == 50.0
    assert float(qt["absmax"]) < 5.0  # the bulk of N(0,1) mass
    # the tree drops into the same builder and the quant path still runs
    q = build_quant_tree(v["params"], qt)
    y = np.asarray(m.apply({**v, "quant": q}, x, train=False))
    assert np.isfinite(y).all()


def test_quantize_for_deploy_quantile_mode(small_model):
    model, v, x = small_model
    vq = quantize_for_deploy(model, v, [x], quantile=0.999)
    assert count_quantized(vq["quant"]) > 50
    f = jax.jit(lambda vv, xx: model.apply(vv, xx, train=False))
    yq = f(vq, x)
    yf = f({k: vq[k] for k in ("params", "batch_stats")}, x)
    for a, b in zip(yf, yq):
        a, b = np.asarray(a), np.asarray(b)
        assert np.abs(a - b).max() < 0.08 * np.abs(a).max()
