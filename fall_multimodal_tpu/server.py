"""HTTP serving endpoint: a JSON prediction API around :class:`Predictor`.

The reference has no serving surface at all (SURVEY.md §1 L5); this is the
network-facing half of the serving layer — stdlib-only (no web framework
to pin), one compiled model per process, suitable behind any reverse proxy:

    python -m fall_multimodal_tpu.serve serve \
        --config gstcan_urfall_3stream --checkpoint outputs/run/ckpt \
        --port 8000

    curl -s localhost:8000/healthz
    curl -s -X POST localhost:8000/v1/predict -d \
        '{"skeleton": [[[...30x14x3...]]], "sensor": [[[...30x4...]]]}'

API:

* ``GET /healthz`` — liveness + model identity (config name, classes,
  compiled batch size).
* ``POST /v1/predict`` — body ``{"skeleton": nested list (N,T,V,C),
  "sensor": nested list (N,T,S) | absent}``; add ``"proba": true`` for
  per-class probabilities. Responds ``{"predictions": [int], "n": N
  [, "probabilities": [[float]]]}``.

Shape/validation errors return 400 with the reason; the device forward is
serialized by a lock (one TPU, deterministic tail latency) while request
parsing runs concurrently in the ThreadingHTTPServer's per-request
threads. ``--checkpoint`` accepts an orbax dir or a reference torch file
(see docs/migration.md).
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional, Tuple

import numpy as np

__all__ = ["PredictionServer", "make_server"]

_MAX_BODY = 256 * 1024 * 1024  # refuse absurd request bodies outright


class _Handler(BaseHTTPRequestHandler):
    # set on the class returned by make_server
    predictor = None
    server_lock: threading.Lock = None
    quiet = True

    def log_message(self, fmt, *args):  # route through logging, not stderr
        if not self.quiet:
            super().log_message(fmt, *args)

    # ------------------------------------------------------------ plumbing

    def _send_json(self, code: int, payload: dict):
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _error(self, code: int, message: str):
        self._send_json(code, {"error": message})

    # ------------------------------------------------------------- routes

    def do_GET(self):
        if self.path != "/healthz":
            return self._error(404, f"no route {self.path!r}; GET /healthz")
        pred = self.predictor
        self._send_json(200, {
            "status": "ok",
            "model": pred.config.model.name,
            "num_classes": pred.config.data.num_classes,
            "batch_size": pred.batch_size,
            "requires_sensor": pred.requires_sensor,
        })

    def do_POST(self):
        if self.path != "/v1/predict":
            return self._error(404, f"no route {self.path!r}; POST /v1/predict")
        try:
            length = int(self.headers.get("Content-Length", 0))
        except ValueError:
            return self._error(400, "bad Content-Length")
        if length <= 0:
            return self._error(400, "empty body; send a JSON object")
        if length > _MAX_BODY:
            return self._error(413, f"body over {_MAX_BODY} bytes")
        try:
            req = json.loads(self.rfile.read(length))
        except (json.JSONDecodeError, UnicodeDecodeError) as e:
            return self._error(400, f"invalid JSON: {e}")
        if not isinstance(req, dict) or "skeleton" not in req:
            return self._error(400, "body must be a JSON object with 'skeleton'")

        try:
            skeleton = np.asarray(req["skeleton"], np.float32)
            sensor = (
                np.asarray(req["sensor"], np.float32)
                if req.get("sensor") is not None else None
            )
        except (ValueError, TypeError) as e:
            return self._error(400, f"arrays are ragged or non-numeric: {e}")

        d = self.predictor.config.data
        if skeleton.ndim == 3:          # single window convenience
            skeleton = skeleton[None]
            if sensor is not None and sensor.ndim == 2:
                sensor = sensor[None]
        if skeleton.ndim != 4:
            return self._error(
                400, f"skeleton must be (N, T, V, C), got shape "
                     f"{tuple(skeleton.shape)}")
        if skeleton.shape[1:] != (d.seq_len, d.num_joints, d.in_channels):
            return self._error(
                400, f"skeleton windows must be "
                     f"({d.seq_len}, {d.num_joints}, {d.in_channels}), got "
                     f"{tuple(skeleton.shape[1:])}")
        if sensor is not None:
            # validate here: a wrong sensor shape reaching the jitted
            # forward raises TypeError/flax errors, not ValueError, which
            # would otherwise escape the handler as a connection reset
            if sensor.ndim != 3 or sensor.shape[1:] != (d.seq_len, d.sensor_dim):
                return self._error(
                    400, f"sensor windows must be "
                         f"({d.seq_len}, {d.sensor_dim}), got "
                         f"{tuple(sensor.shape[1:]) if sensor.ndim == 3 else tuple(sensor.shape)}")

        try:
            # one forward at a time: a single accelerator behind the server
            with self.server_lock:
                proba = self.predictor.predict_proba(skeleton, sensor)
        except ValueError as e:          # predictor-level validation
            return self._error(400, str(e))
        except Exception as e:           # anything else is ours, not theirs
            return self._error(500, f"{type(e).__name__}: {e}")
        out = {
            "predictions": [int(c) for c in proba.argmax(-1)],
            "n": int(len(proba)),
        }
        if req.get("proba"):
            out["probabilities"] = [[float(v) for v in row] for row in proba]
        self._send_json(200, out)


class PredictionServer:
    """Owns a ``ThreadingHTTPServer`` bound to (host, port); ``port=0``
    picks an ephemeral port (``.port`` has the real one). Use ``serve()``
    to block, or ``start()``/``close()`` around a background thread."""

    def __init__(self, predictor, host: str = "127.0.0.1", port: int = 8000,
                 quiet: bool = True):
        handler = type("Handler", (_Handler,), {
            "predictor": predictor,
            "server_lock": threading.Lock(),
            "quiet": quiet,
        })
        self._httpd = ThreadingHTTPServer((host, port), handler)
        self._thread: Optional[threading.Thread] = None

    @property
    def port(self) -> int:
        return self._httpd.server_address[1]

    @property
    def host(self) -> str:
        return self._httpd.server_address[0]

    def serve(self):
        """Block serving requests until interrupted."""
        try:
            self._httpd.serve_forever()
        except KeyboardInterrupt:
            pass
        finally:
            self._httpd.server_close()

    def start(self):
        """Serve on a daemon thread (tests, embedding)."""
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    def close(self):
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=5)


def make_server(predictor, host: str = "127.0.0.1", port: int = 8000,
                quiet: bool = True) -> PredictionServer:
    return PredictionServer(predictor, host=host, port=port, quiet=quiet)
