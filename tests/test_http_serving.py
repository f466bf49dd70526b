"""HTTP serving surface (engine/http_serving.py) driven as a user would:
real sockets, concurrent clients, PNG request bodies.

No reference analog (the reference ships offline scripts only); the
contract under test is ours: concurrent requests coalesce through the
ContinuousBatcher into shared fixed-shape forwards.
"""

import base64
import io
import json
import urllib.error
import urllib.request
from concurrent.futures import ThreadPoolExecutor

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.model


@pytest.fixture(scope="module")
def server():
    from advancedliteratemachinery_tpu.codecs.char_codec import CharCodec
    from advancedliteratemachinery_tpu.engine.http_serving import (
        RecognitionHTTPServer)
    from advancedliteratemachinery_tpu.engine.infer import MGPSTRInference
    from advancedliteratemachinery_tpu.models.mgp_str import (
        MGPSTR, MGPSTRConfig)

    model = MGPSTR(MGPSTRConfig(variant="tiny"))
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 32, 128, 3)))["params"]
    engine = MGPSTRInference(model, params, CharCodec())

    def detect_fn(image):
        # fixed two-word layout; the endpoint logic (detect → crop →
        # batched recognize → JSON) is what's under test
        h, w = image.shape[:2]
        quads = np.asarray([
            [[0, 0], [w // 2, 0], [w // 2, h], [0, h]],
            [[w // 2, 0], [w, 0], [w, h], [w // 2, h]],
        ], np.float32)
        return quads, np.asarray([0.9, 0.8], np.float32)

    srv = RecognitionHTTPServer(engine, batch_size=8, max_wait_ms=20.0,
                                port=0, detect_fn=detect_fn).start()
    yield srv
    srv.stop()


def _png_bytes(rng, h=40, w=160):
    from PIL import Image

    img = Image.fromarray(rng.integers(0, 256, (h, w, 3), dtype=np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


def _post(port, path, body, content_type="image/png"):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=body,
        headers={"Content-Type": content_type})
    with urllib.request.urlopen(req, timeout=60) as r:
        return r.status, json.loads(r.read())


class TestHTTPServing:
    def test_healthz_and_stats(self, server):
        with urllib.request.urlopen(
                f"http://127.0.0.1:{server.port}/healthz", timeout=30) as r:
            payload = json.loads(r.read())
        assert payload["ok"] and payload["model"] == "mgp_str"
        with urllib.request.urlopen(
                f"http://127.0.0.1:{server.port}/v1/stats", timeout=30) as r:
            assert set(json.loads(r.read())) >= {"batches", "items"}

    def test_recognize_png_body(self, server):
        rng = np.random.default_rng(0)
        status, payload = _post(server.port, "/v1/recognize",
                                _png_bytes(rng))
        assert status == 200
        assert set(payload) == {"text", "confidence", "head"}

    def test_recognize_json_b64_body(self, server):
        rng = np.random.default_rng(1)
        body = json.dumps({"image_b64": base64.b64encode(
            _png_bytes(rng)).decode()}).encode()
        status, payload = _post(server.port, "/v1/recognize", body,
                                "application/json")
        assert status == 200 and "text" in payload

    def test_concurrent_requests_share_batches(self, server):
        rng = np.random.default_rng(2)
        bodies = [_png_bytes(rng) for _ in range(8)]
        before = dict(server.batcher.stats)
        with ThreadPoolExecutor(8) as ex:
            results = list(ex.map(
                lambda b: _post(server.port, "/v1/recognize", b), bodies))
        assert all(s == 200 for s, _ in results)
        batches = server.batcher.stats["batches"] - before["batches"]
        items = server.batcher.stats["items"] - before["items"]
        assert items == 8
        assert batches < 8, "concurrent requests never coalesced"

    def test_read_endpoint(self, server):
        rng = np.random.default_rng(3)
        status, payload = _post(server.port, "/v1/read",
                                _png_bytes(rng, h=64, w=256))
        assert status == 200
        assert len(payload["words"]) == 2
        w0 = payload["words"][0]
        assert set(w0) == {"text", "confidence", "det_score", "quad"}
        assert np.asarray(w0["quad"]).shape == (4, 2)

    def test_connection_burst_not_reset(self, server):
        # Regression: stdlib request_queue_size=5 ECONNRESET a 32-client
        # burst (scripts/http_load_probe.py, round 5). 48 simultaneous
        # connects must all be served.
        assert server._httpd.request_queue_size >= 64
        rng = np.random.default_rng(4)
        body = _png_bytes(rng)
        with ThreadPoolExecutor(48) as ex:
            results = list(ex.map(
                lambda _: _post(server.port, "/v1/recognize", body),
                range(48)))
        assert all(s == 200 for s, _ in results)

    def test_keepalive_connection_reuse(self, server):
        # HTTP/1.1 + Content-Length on every response → one TCP
        # connection serves many requests.
        import http.client

        conn = http.client.HTTPConnection("127.0.0.1", server.port,
                                          timeout=60)
        try:
            for _ in range(3):
                conn.request("GET", "/healthz")
                resp = conn.getresponse()
                assert resp.status == 200
                assert json.loads(resp.read())["ok"]
                assert resp.version == 11
        finally:
            conn.close()

    def test_bad_body_is_a_clean_400(self, server):
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(server.port, "/v1/recognize", b"not an image")
        assert ei.value.code == 400
        assert "error" in json.loads(ei.value.read())

    def test_unknown_route_404(self, server):
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(server.port, "/v1/nope", b"x")
        assert ei.value.code == 404
