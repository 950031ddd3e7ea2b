"""Serving daemon: dynamic batching + HTTP endpoint, end-to-end in-process."""

import io
import json
import threading
import urllib.request
from pathlib import Path

import numpy as np
import pytest

import jax

CFG = str(Path(__file__).resolve().parent.parent
          / "yolo_scratch_tpu/configs/yolo11_crater.yaml")


def _png_bytes(rng, w=100, h=80):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray((rng.rand(h, w) * 255).astype(np.uint8), mode="L").save(
        buf, format="PNG")
    return buf.getvalue()


@pytest.fixture(scope="module")
def served():
    from yolo_scratch_tpu.infer import Predictor, PredictorConfig
    from yolo_scratch_tpu.models.builder import build_yolo11
    from yolo_scratch_tpu.serve import BatchingServer, make_http_server

    model = build_yolo11(CFG, ch=1, nc=5, scale="n")
    variables = model.init(
        jax.random.PRNGKey(0), np.zeros((1, 96, 96, 1), np.float32))
    pred = Predictor(model, variables, PredictorConfig(
        img_size=96, batch_size=4, conf_threshold=0.01))
    batching = BatchingServer(pred, max_wait_ms=150.0)
    httpd = make_http_server(batching, port=0)  # ephemeral port
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{httpd.server_address[1]}"
    yield url, batching
    httpd.shutdown()
    batching.close()


def test_healthz(served):
    url, _ = served
    with urllib.request.urlopen(f"{url}/healthz", timeout=30) as r:
        body = json.loads(r.read())
    assert body["ok"] is True
    assert "stats" in body


def test_detect_roundtrip(served):
    url, _ = served
    rng = np.random.RandomState(0)
    req = urllib.request.Request(
        f"{url}/v1/detect", data=_png_bytes(rng), method="POST")
    with urllib.request.urlopen(req, timeout=300) as r:
        body = json.loads(r.read())
    assert set(body) == {"boxes", "scores", "labels"}
    for b in body["boxes"]:  # original-image pixel space (100x80 input)
        x1, y1, x2, y2 = b
        assert 0 <= x1 <= x2 <= 100 and 0 <= y1 <= y2 <= 80


def test_concurrent_requests_coalesce(served):
    """Requests issued together land in fewer device batches than requests
    (the batching window coalesces them) and every one gets an answer."""
    url, batching = served
    rng = np.random.RandomState(1)
    payloads = [_png_bytes(rng) for _ in range(6)]
    results = [None] * 6

    def post(i):
        req = urllib.request.Request(
            f"{url}/v1/detect", data=payloads[i], method="POST")
        with urllib.request.urlopen(req, timeout=300) as r:
            results[i] = json.loads(r.read())

    b0 = batching.stats["batches"]
    threads = [threading.Thread(target=post, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(r is not None and "boxes" in r for r in results)
    assert batching.stats["batches"] - b0 < 6  # coalesced (batch size 4)


def test_bad_requests(served):
    url, _ = served
    req = urllib.request.Request(f"{url}/v1/detect", data=b"", method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(f"{url}/nope", timeout=30)
    assert e.value.code == 404
    # garbage bytes -> 500 with an error message, server stays alive
    req = urllib.request.Request(
        f"{url}/v1/detect", data=b"not an image", method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=300)
    assert e.value.code == 500
    with urllib.request.urlopen(f"{url}/healthz", timeout=30) as r:
        assert json.loads(r.read())["ok"] is True


def test_poisoned_request_does_not_fail_neighbors(served):
    """A garbage payload coalesced with good ones fails ALONE."""
    url, _ = served
    rng = np.random.RandomState(2)
    payloads = [_png_bytes(rng), b"this is not an image", _png_bytes(rng)]
    codes = [None] * 3

    def post(i):
        req = urllib.request.Request(
            f"{url}/v1/detect", data=payloads[i], method="POST")
        try:
            with urllib.request.urlopen(req, timeout=300) as r:
                codes[i] = r.status
        except urllib.error.HTTPError as e:
            codes[i] = e.code

    threads = [threading.Thread(target=post, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert codes[0] == 200 and codes[2] == 200  # neighbors unaffected
    assert codes[1] == 500                      # the poison fails alone


def test_oversized_body_rejected(served):
    """A Content-Length above the cap gets 413 WITHOUT the body being read
    (one huge POST must not OOM the daemon), and the server stays alive."""
    url, _ = served
    import http.client
    import urllib.parse

    host = urllib.parse.urlparse(url).netloc
    conn = http.client.HTTPConnection(host, timeout=30)
    try:
        # claim a 10 GiB body but send none — the 413 must come back
        # before any body bytes arrive
        conn.putrequest("POST", "/v1/detect")
        conn.putheader("Content-Length", str(10 << 30))
        conn.endheaders()
        resp = conn.getresponse()
        assert resp.status == 413
        assert "cap" in json.loads(resp.read())["error"]
    finally:
        conn.close()
    with urllib.request.urlopen(f"{url}/healthz", timeout=30) as r:
        assert json.loads(r.read())["ok"] is True


def test_healthz_latency_and_fill_stats(served):
    """/healthz reports per-request latency percentiles and batch fill rate
    once traffic has flowed (VERDICT r3: production claims need latency
    observability)."""
    url, _ = served
    rng = np.random.RandomState(4)
    req = urllib.request.Request(
        f"{url}/v1/detect", data=_png_bytes(rng), method="POST")
    with urllib.request.urlopen(req, timeout=300):
        pass
    with urllib.request.urlopen(f"{url}/healthz", timeout=30) as r:
        body = json.loads(r.read())
    stats = body["stats"][body["model"]]  # per-model since multi-model routing
    assert stats["requests"] >= 1 and stats["batches"] >= 1
    assert 0.0 < stats["batch_fill"] <= 1.0
    lat = stats["latency_ms"]
    assert lat["n"] >= 1 and 0 < lat["p50"] <= lat["p99"]


def test_serve_over_dp_mesh():
    """BatchingServer composes with Predictor.shard_over: the daemon's
    fixed-shape batches run the shard_map'd deploy program on a dp mesh."""
    from yolo_scratch_tpu.infer import Predictor, PredictorConfig
    from yolo_scratch_tpu.models.builder import build_yolo11
    from yolo_scratch_tpu.parallel.mesh import make_mesh
    from yolo_scratch_tpu.serve import BatchingServer

    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 devices")

    model = build_yolo11(CFG, ch=1, nc=5, scale="n")
    variables = model.init(
        jax.random.PRNGKey(0), np.zeros((1, 96, 96, 1), np.float32))
    pred = Predictor(model, variables, PredictorConfig(
        img_size=96, batch_size=4, conf_threshold=0.01,
        nms_impl="xla",  # pallas interpret mode inside shard_map is CPU-test-only noise
    )).shard_over(make_mesh(4))
    batching = BatchingServer(pred, max_wait_ms=100.0)
    try:
        rng = np.random.RandomState(3)
        futs = [batching.submit(_png_bytes(rng)) for _ in range(2)]
        for f in futs:
            out = f.result(timeout=600)
            assert set(out) == {"boxes", "scores", "labels"}
    finally:
        batching.close()


# ---------------------------------------------------------------- pipelining

class _LazyOut:
    """Mimics an async device result: 'completes' d_dev after dispatch;
    np.asarray blocks until then (the daemon's fetch discipline)."""

    def __init__(self, d_dev, B):
        import time

        self.ready_at = time.monotonic() + d_dev
        self.B = B

    def __array__(self, dtype=None, copy=None):
        import time

        wait = self.ready_at - time.monotonic()
        if wait > 0:
            time.sleep(wait)
        return np.zeros((self.B, 4, 7), np.float32)


class _FakePredictor:
    """Host decode costs d_host (sleep), device costs d_dev (LazyOut)."""

    class _Cfg:
        batch_size = 2
        img_size = 8
        u8_transfer = False

    in_ch = 1
    variables = None

    def __init__(self, d_host, d_dev, inflight):
        self.d_host, self.d_dev = d_host, d_dev
        self.cfg = self._Cfg()
        self.cfg.inflight = inflight

    def _prepare(self, paths):
        import time

        time.sleep(self.d_host)
        n = len(paths)
        return (np.zeros((n, 8, 8, 1), np.float32),
                np.zeros((n, 5), np.float32))

    def _infer_packed(self, variables, imgs):
        return _LazyOut(self.d_dev, imgs.shape[0])

    def _unmap_boxes(self, b, m):
        return b


def _drive(inflight, n_req=8, d=0.03):
    import time

    from yolo_scratch_tpu.serve import BatchingServer

    srv = BatchingServer(_FakePredictor(d, d, inflight), max_wait_ms=50.0,
                         inflight=inflight)
    t0 = time.monotonic()
    futs = [srv.submit(b"x") for _ in range(n_req)]
    for f in futs:
        out = f.result(timeout=30)
        assert out["boxes"] == [] and out["scores"] == []
    dt = time.monotonic() - t0
    srv.close()
    return dt


def test_worker_pipelines_decode_with_device():
    """With inflight>1 the worker decodes batch N+1 while batch N runs on
    the 'device': 4 batches of (30 ms decode + 30 ms device) must finish
    materially faster than the serialized inflight=1 loop (~240 ms vs
    ~150 ms ideal; require a conservative 1.2x)."""
    t_serial = _drive(inflight=1)
    t_pipe = _drive(inflight=3)
    assert t_serial > 1.2 * t_pipe, (t_serial, t_pipe)
