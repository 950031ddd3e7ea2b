"""jax.export serving artifacts: roundtrip numerics + shape contract.

The deploy graph (Predictor._infer: u8 -> boxes/scores/labels/valid)
exported with weights-as-constants, serialized, deserialized, and run —
must match the live Predictor exactly. Runs on the forced-CPU backend
(conftest), where the Pallas NMS uses interpret mode; the xla-impl case
covers the pure stable-HLO artifact path the export CLI offers.
"""

import numpy as np
import pytest

import jax

from yolo_scratch_tpu.export import export_predictor, load_artifact, save_artifact
from yolo_scratch_tpu.infer import Predictor, PredictorConfig
from yolo_scratch_tpu.models.builder import build_yolo11

CFG = "yolo_scratch_tpu/configs/yolo11_crater.yaml"
IMGSZ = 160


def _tiny_predictor(nms_impl="pallas", class_aware=False, u8=True):
    model = build_yolo11(CFG, ch=1, nc=5, scale="n")
    variables = model.init(
        jax.random.PRNGKey(0), np.zeros((1, IMGSZ, IMGSZ, 1), np.float32)
    )
    cfg = PredictorConfig(
        img_size=IMGSZ, batch_size=2, conf_threshold=0.001, max_det=32,
        pre_nms_topk=128, nms_impl=nms_impl, class_aware_nms=class_aware,
        u8_transfer=u8,
    )
    return Predictor(model, variables, cfg)


def _rand_batch(u8=True):
    rng = np.random.default_rng(7)
    x = rng.integers(0, 256, size=(2, IMGSZ, IMGSZ, 1), dtype=np.uint8)
    return x if u8 else (x.astype(np.float32) / 255.0)


@pytest.mark.parametrize("nms_impl,class_aware", [("pallas", False), ("xla", True)])
def test_export_roundtrip_matches_live(tmp_path, nms_impl, class_aware):
    pred = _tiny_predictor(nms_impl=nms_impl, class_aware=class_aware)
    x = _rand_batch()
    live = [np.asarray(o) for o in pred._infer(pred.variables, x)]
    assert live[3].sum() > 0, "random-init model at conf=0.001 must detect something"

    exported = export_predictor(pred)
    path = str(tmp_path / "model.jaxexp")
    nbytes = save_artifact(exported, path)
    assert nbytes > 1000

    art = load_artifact(path)
    (aval,) = art.in_avals
    assert tuple(aval.shape) == (2, IMGSZ, IMGSZ, 1) and aval.dtype == np.uint8
    got = [np.asarray(o) for o in jax.jit(art.call)(x)]

    np.testing.assert_allclose(got[0], live[0], rtol=0, atol=1e-6)  # boxes
    np.testing.assert_allclose(got[1], live[1], rtol=0, atol=1e-6)  # scores
    np.testing.assert_array_equal(got[2], live[2])  # labels
    np.testing.assert_array_equal(got[3], live[3])  # valid


def test_export_enforces_input_shape(tmp_path):
    pred = _tiny_predictor()
    exported = export_predictor(pred, batch_size=4)
    path = str(tmp_path / "model.jaxexp")
    save_artifact(exported, path)
    art = load_artifact(path)
    assert tuple(art.in_avals[0].shape) == (4, IMGSZ, IMGSZ, 1)
    with pytest.raises(ValueError):
        jax.jit(art.call)(_rand_batch())  # B=2 into a B=4 artifact


def test_export_f32_input_variant(tmp_path):
    pred = _tiny_predictor(u8=False)
    x = _rand_batch(u8=False)
    live = [np.asarray(o) for o in pred._infer(pred.variables, x)]
    exported = export_predictor(pred)
    path = str(tmp_path / "model.jaxexp")
    save_artifact(exported, path)
    art = load_artifact(path)
    assert art.in_avals[0].dtype == np.float32
    got = [np.asarray(o) for o in jax.jit(art.call)(x)]
    np.testing.assert_allclose(got[0], live[0], rtol=0, atol=1e-6)
    np.testing.assert_array_equal(got[3], live[3])


def test_export_roundtrip_yolox(tmp_path):
    """YOLOX-family predictors export identically: generic decode + shared
    postprocess traced into the artifact (xla NMS = pure stable-HLO)."""
    from yolo_scratch_tpu.models.yolox import YOLOXModel

    model = YOLOXModel.from_scale("nano", nc=5)
    variables = model.init(
        jax.random.PRNGKey(0), np.zeros((1, IMGSZ, IMGSZ, 3), np.float32)
    )
    cfg = PredictorConfig(
        img_size=IMGSZ, batch_size=2, conf_threshold=1e-5, max_det=32,
        pre_nms_topk=128, nms_impl="xla",
    )
    pred = Predictor(model, variables, cfg)
    rng = np.random.default_rng(7)
    x = rng.integers(0, 256, size=(2, IMGSZ, IMGSZ, 3), dtype=np.uint8)
    live = [np.asarray(o) for o in pred._infer(pred.variables, x)]
    assert live[3].sum() > 0

    path = str(tmp_path / "yolox.jaxexp")
    save_artifact(export_predictor(pred), path)
    art = load_artifact(path)
    (aval,) = art.in_avals
    assert tuple(aval.shape) == (2, IMGSZ, IMGSZ, 3) and aval.dtype == np.uint8
    got = [np.asarray(o) for o in jax.jit(art.call)(x)]
    np.testing.assert_allclose(got[0], live[0], rtol=0, atol=1e-6)
    np.testing.assert_allclose(got[1], live[1], rtol=0, atol=1e-6)
    np.testing.assert_array_equal(got[2], live[2])
    np.testing.assert_array_equal(got[3], live[3])


def _write_images(tmp_path, n, w=100, h=80):
    import cv2

    paths = []
    for i in range(n):
        p = str(tmp_path / f"im{i}.png")
        cv2.imwrite(p, (np.random.RandomState(i).rand(h, w) * 255)
                    .astype(np.uint8))
        paths.append(p)
    return paths


def test_artifact_predictor_streams_like_live(tmp_path):
    """ArtifactPredictor must run the whole streaming path (host prep ->
    artifact program -> unmap) with results identical to the live
    Predictor, deriving its geometry from the artifact specs alone."""
    from yolo_scratch_tpu.export import ArtifactPredictor

    pred = _tiny_predictor(nms_impl="xla")  # stable-HLO: portable artifact
    path = str(tmp_path / "m.jaxexp")
    save_artifact(export_predictor(pred), path)

    art_pred = ArtifactPredictor(load_artifact(path))
    assert art_pred.cfg.img_size == IMGSZ
    assert art_pred.cfg.batch_size == pred.cfg.batch_size
    assert art_pred.cfg.max_det == pred.cfg.max_det
    assert art_pred.in_ch == 1 and art_pred.cfg.u8_transfer

    paths = _write_images(tmp_path, 5)  # B=2 -> 2 full + padded tail
    live = list(pred.predict_paths(paths))
    via_artifact = list(art_pred.predict_paths(paths))
    assert [r["path"] for r in via_artifact] == paths
    for a, b in zip(live, via_artifact):
        np.testing.assert_allclose(a["boxes"], b["boxes"], rtol=0, atol=1e-5)
        np.testing.assert_allclose(a["scores"], b["scores"], rtol=0, atol=0)
        assert a["labels"] == b["labels"]


def test_artifact_host_prep_sidecar_roundtrip(tmp_path):
    """The .meta.json sidecar written at export must drive the serving-side
    host prep: a stretch-exported artifact served via the sidecar must NOT
    letterbox (the silent-mismatch bug: --artifact used to hardcode the
    default letterbox prep regardless of how the program was exported)."""
    from yolo_scratch_tpu.export import ArtifactPredictor, load_host_prep

    model = build_yolo11(CFG, ch=1, nc=5, scale="n")
    variables = model.init(
        jax.random.PRNGKey(0), np.zeros((1, IMGSZ, IMGSZ, 1), np.float32))
    cfg = PredictorConfig(
        img_size=IMGSZ, batch_size=2, conf_threshold=0.001, max_det=32,
        pre_nms_topk=128, nms_impl="xla", letterbox=False,  # stretch prep
    )
    pred = Predictor(model, variables, cfg)
    path = str(tmp_path / "m.jaxexp")
    save_artifact(export_predictor(pred), path,
                  host_prep={"letterbox": cfg.letterbox,
                             "fast_jpeg": cfg.fast_jpeg})

    prep = load_host_prep(path)
    assert prep == {"letterbox": False, "fast_jpeg": cfg.fast_jpeg}
    art_pred = ArtifactPredictor(load_artifact(path), host_prep=prep)
    assert art_pred.cfg.letterbox is False

    # non-square source images make stretch vs letterbox observable
    paths = _write_images(tmp_path, 3, w=96, h=192)
    live = list(pred.predict_paths(paths))
    via = list(art_pred.predict_paths(paths))
    for a, b in zip(live, via):
        np.testing.assert_allclose(a["boxes"], b["boxes"], rtol=0, atol=1e-5)
        np.testing.assert_allclose(a["scores"], b["scores"], rtol=0, atol=0)

    # no sidecar -> None (old artifacts keep working, defaults assumed)
    path2 = str(tmp_path / "bare.jaxexp")
    save_artifact(export_predictor(pred), path2)
    assert load_host_prep(path2) is None


def test_serve_artifact_spec_parsing():
    """NAME=PATH splitting must not eat '=' inside the path itself."""
    from yolo_scratch_tpu.serve import parse_artifact_spec as parse

    assert parse("det=models/a.jaxexp") == ("det", "models/a.jaxexp")
    assert parse("models/a.jaxexp") == ("a", "models/a.jaxexp")
    # '=' inside a sweep-style directory name is part of the PATH
    assert parse("runs/lr=0.01/m.jaxexp") == ("m", "runs/lr=0.01/m.jaxexp")
    assert parse("det=runs/lr=0.01/m.jaxexp") == ("det", "runs/lr=0.01/m.jaxexp")


def test_serve_daemon_over_artifact(tmp_path):
    """The daemon must serve a .jaxexp end-to-end over HTTP — no model
    code — with detections in original-image pixel space."""
    import io
    import json
    import threading
    import urllib.request

    from PIL import Image

    from yolo_scratch_tpu.export import ArtifactPredictor
    from yolo_scratch_tpu.serve import BatchingServer, make_http_server

    pred = _tiny_predictor(nms_impl="xla")
    path = str(tmp_path / "m.jaxexp")
    save_artifact(export_predictor(pred), path)

    batching = BatchingServer(ArtifactPredictor(load_artifact(path)),
                              max_wait_ms=25.0)
    httpd = make_http_server(batching, port=0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{httpd.server_address[1]}"
        buf = io.BytesIO()
        Image.fromarray(
            (np.random.RandomState(3).rand(80, 100) * 255).astype(np.uint8),
            mode="L").save(buf, format="PNG")
        req = urllib.request.Request(
            f"{url}/v1/detect", data=buf.getvalue(), method="POST")
        with urllib.request.urlopen(req, timeout=300) as r:
            body = json.loads(r.read())
        assert set(body) == {"boxes", "scores", "labels"}
        for x1, y1, x2, y2 in body["boxes"]:
            assert 0 <= x1 <= x2 <= 100 and 0 <= y1 <= y2 <= 80
    finally:
        httpd.shutdown()
        batching.close()


def test_multi_model_daemon_routes_by_name(tmp_path):
    """Two artifacts behind one daemon: /v1/detect/<name> routes to the
    right model's own batching queue; /healthz reports per-model stats;
    unknown names 404. (The serving-density case int8's 4x-smaller
    weights buy — docs/QUANT.md.)"""
    import io
    import json
    import threading
    import urllib.error
    import urllib.request

    from PIL import Image

    from yolo_scratch_tpu.export import ArtifactPredictor
    from yolo_scratch_tpu.serve import BatchingServer, make_http_server

    servers = {}
    for name in ("alpha", "beta"):
        pred = _tiny_predictor(nms_impl="xla")
        path = str(tmp_path / f"{name}.jaxexp")
        save_artifact(export_predictor(pred), path)
        servers[name] = BatchingServer(
            ArtifactPredictor(load_artifact(path)), max_wait_ms=10.0)

    httpd = make_http_server(servers, port=0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{httpd.server_address[1]}"
        buf = io.BytesIO()
        Image.fromarray(
            (np.random.RandomState(5).rand(80, 100) * 255).astype(np.uint8),
            mode="L").save(buf, format="PNG")
        png = buf.getvalue()

        for route in ("/v1/detect/beta", "/v1/detect"):  # named + default
            req = urllib.request.Request(f"{url}{route}", data=png,
                                         method="POST")
            with urllib.request.urlopen(req, timeout=300) as r:
                assert set(json.loads(r.read())) == {
                    "boxes", "scores", "labels"}

        with urllib.request.urlopen(f"{url}/healthz", timeout=30) as r:
            body = json.loads(r.read())
        assert body["models"] == ["alpha", "beta"]
        assert body["model"] == "alpha"  # default = first
        assert body["stats"]["alpha"]["requests"] == 1  # the bare /v1/detect
        assert body["stats"]["beta"]["requests"] == 1

        req = urllib.request.Request(f"{url}/v1/detect/nope", data=png,
                                     method="POST")
        try:
            urllib.request.urlopen(req, timeout=30)
            assert False, "unknown model must 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        httpd.shutdown()
        for s in servers.values():
            s.close()
