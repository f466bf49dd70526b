"""HTTP deployment surface over the continuous-batching engine.

The reference ships no server at all (its deployment story is offline
scripts — DocXChain ``example.py``, MGP-STR ``demo.py``); this module is
the production-serving front the TPU framework is built for: a stdlib
``ThreadingHTTPServer`` where every request thread submits into one
``ContinuousBatcher``, so concurrent clients coalesce into single fixed-
shape TPU forwards (one compiled graph, no shape churn).

Endpoints:
  GET  /healthz        → {"ok": true, "model": ..., "device": ...}
  GET  /v1/stats       → batcher counters (batches, items, padded_slots)
  POST /v1/recognize   → one word crop → {"text", "confidence", "head"}
  POST /v1/read        → full page → {"words": [{"text", "confidence",
                          "quad"}, ...]} (detector + batched recognition)

Bodies: raw image bytes (any PIL-decodable format), or JSON
``{"image_b64": "..."}``. No third-party web framework — zero-dependency
deployment (stdlib + PIL), matching the repo's no-new-deps rule.
"""

from __future__ import annotations

import base64
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, Optional

import numpy as np

from advancedliteratemachinery_tpu.engine.serving import ContinuousBatcher


def _decode_image(body: bytes, content_type: str) -> np.ndarray:
    """Request body → RGB uint8 [H, W, 3] (PIL convention, cli._load_image)."""
    if "json" in (content_type or ""):
        payload = json.loads(body.decode("utf-8"))
        body = base64.b64decode(payload["image_b64"])
    from PIL import Image

    return np.asarray(Image.open(io.BytesIO(body)).convert("RGB"))


class _DeepBacklogServer(ThreadingHTTPServer):
    """ThreadingHTTPServer with a listen backlog sized for bursty load.

    The stdlib default ``request_queue_size = 5`` resets connections the
    moment more than a handful of clients connect in the same accept
    window (measured: ECONNRESET at 32 concurrent clients,
    scripts/http_load_probe.py).
    """

    request_queue_size = 128
    daemon_threads = True


class RecognitionHTTPServer:
    """Serve a recognition engine (and optional detector) over HTTP.

    engine: an ``engine.infer`` inference object with
    ``recognize(images_u8) -> [(text, conf, head), ...]`` and a crop shape
    of ``crop_hw``. detect_fn: optional ``image -> (quads [N,4,2],
    scores)`` (e.g. ``cli._db_detect_fn``) enabling ``/v1/read``.
    """

    def __init__(self, engine, *, crop_hw=(32, 128), batch_size: int = 32,
                 max_wait_ms: float = 5.0, host: str = "127.0.0.1",
                 port: int = 8000,
                 detect_fn: Optional[Callable] = None,
                 model_name: str = "mgp_str"):
        self.engine = engine
        self.crop_hw = tuple(crop_hw)
        self.detect_fn = detect_fn
        self.model_name = model_name
        self.batcher = ContinuousBatcher(
            lambda b: engine.recognize(b), batch_size,
            (*self.crop_hw, 3), max_wait_ms=max_wait_ms)
        self._httpd = _DeepBacklogServer((host, port),
                                         self._make_handler())
        self._thread: Optional[threading.Thread] = None

    @property
    def port(self) -> int:
        return self._httpd.server_address[1]

    # ---- request handling ----

    def _resize_crop(self, image: np.ndarray) -> np.ndarray:
        import cv2

        h, w = self.crop_hw
        return cv2.resize(image, (w, h)).astype(np.uint8)

    def _recognize_one(self, image: np.ndarray) -> dict:
        text, conf, head = self.batcher.submit(
            self._resize_crop(image)).result()
        return {"text": text, "confidence": round(float(conf), 4),
                "head": head}

    def _read_page(self, image: np.ndarray) -> dict:
        if self.detect_fn is None:
            raise ValueError("server started without a detector; "
                             "/v1/read unavailable")
        from advancedliteratemachinery_tpu.pipelines.modules import crop_image

        quads, scores = self.detect_fn(image)
        futs = [self.batcher.submit(self._resize_crop(crop_image(image, q)))
                for q in quads]
        words = []
        for q, s, f in zip(quads, scores, futs):
            text, conf, head = f.result()
            words.append({"text": text, "confidence": round(float(conf), 4),
                          "det_score": round(float(s), 4),
                          "quad": np.asarray(q).round(1).tolist()})
        return {"words": words}

    def _make_handler(self):
        server = self

        class Handler(BaseHTTPRequestHandler):
            # _send always emits Content-Length, so HTTP/1.1 keep-alive
            # is safe: each client holds one connection across requests
            # instead of a connect/teardown per request.
            protocol_version = "HTTP/1.1"

            def log_message(self, *a):  # quiet; stats live in /v1/stats
                pass

            def _send(self, code: int, obj: dict) -> None:
                data = json.dumps(obj).encode("utf-8")
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def do_GET(self):
                if self.path == "/healthz":
                    import jax

                    self._send(200, {
                        "ok": True, "model": server.model_name,
                        "device": jax.devices()[0].platform})
                elif self.path == "/v1/stats":
                    self._send(200, dict(server.batcher.stats))
                else:
                    self._send(404, {"error": f"no route {self.path}"})

            def do_POST(self):
                if self.path not in ("/v1/recognize", "/v1/read"):
                    self._send(404, {"error": f"no route {self.path}"})
                    return
                n = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(n)
                try:
                    image = _decode_image(
                        body, self.headers.get("Content-Type", ""))
                    if self.path == "/v1/recognize":
                        self._send(200, server._recognize_one(image))
                    else:
                        self._send(200, server._read_page(image))
                except Exception as e:  # surface the cause to the client
                    self._send(400, {"error": f"{type(e).__name__}: {e}"})

        return Handler

    # ---- lifecycle ----

    def start(self) -> "RecognitionHTTPServer":
        self.batcher.start()
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=5)
        self.batcher.stop()

    def serve_forever(self) -> None:
        """Foreground mode for the CLI."""
        self.batcher.start()
        try:
            self._httpd.serve_forever()
        finally:
            self.stop()
