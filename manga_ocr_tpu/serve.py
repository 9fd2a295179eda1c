"""HTTP OCR serving: production entry point around the batched engine.

The reference is a desktop app; a TPU deployment is a service.  This is a
dependency-free (stdlib ``http.server``) endpoint that exposes the engine
with microbatching — concurrent single-crop requests coalesce into padded
page-size device dispatches:

- ``POST /ocr``       — body: raw image bytes (PNG/JPEG/WebP) → {"text"}
- ``POST /ocr_batch`` — body: JSON {"images": [base64, ...]} → {"texts"}
- ``GET  /healthz``   — liveness + device info
- ``GET  /stats``     — throughput + stage timing counters

Run: python -m manga_ocr_tpu.serve --port 8080 [--checkpoint DIR]
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import threading
from concurrent.futures import TimeoutError as FuturesTimeout
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from manga_ocr_tpu.utils.metrics import GLOBAL_TIMER, OCR_COUNTER

# Unauthenticated stdlib server: cap request bodies (ADVICE round-1 low #5).
MAX_REQUEST_BYTES = 32 * 1024 * 1024


def _decode_image(data: bytes) -> np.ndarray:
    from PIL import Image

    rgb = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    return rgb[..., ::-1].copy()


class OcrService:
    """Engine + microbatcher wrapper used by the HTTP handler (and tests)."""

    def __init__(self, engine, window_ms: float = 10.0):
        from manga_ocr_tpu.runtime.pipeline import MicroBatcher

        self.engine = engine
        self.batcher = MicroBatcher(engine.ocr_page, window_ms=window_ms)

    def ocr_bytes(self, data: bytes) -> str:
        img = _decode_image(data)
        with GLOBAL_TIMER.stage("ocr_request"):
            text = self.batcher.ocr(img)
        OCR_COUNTER.add(1)
        return text

    def ocr_batch_b64(self, images_b64: list[str]) -> list[str]:
        crops = [_decode_image(base64.b64decode(s)) for s in images_b64]
        with GLOBAL_TIMER.stage("ocr_batch_request"):
            texts = self.engine.ocr_page(crops)
        OCR_COUNTER.add(len(crops))
        return texts

    def close(self):
        self.batcher.close()


def make_handler(service: OcrService):
    class Handler(BaseHTTPRequestHandler):
        def _reply(self, code: int, payload: dict) -> None:
            body = json.dumps(payload, ensure_ascii=False).encode()
            try:
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            except (ConnectionError, BrokenPipeError):
                # Client went away mid-reply (cancellation): nothing to tell
                # it, and the per-connection thread must exit cleanly rather
                # than bubble a traceback through handle_error.
                self.close_connection = True

        def do_GET(self):
            if self.path == "/healthz":
                import jax

                self._reply(
                    200,
                    {
                        "status": "ok",
                        "backend": jax.default_backend(),
                        "devices": [str(d) for d in jax.devices()],
                    },
                )
            elif self.path == "/stats":
                self._reply(
                    200,
                    {
                        "stages": GLOBAL_TIMER.summary(),
                        "ocr_total": OCR_COUNTER.total,
                        "ocr_rate_per_s": round(OCR_COUNTER.rate(), 2),
                    },
                )
            else:
                self._reply(404, {"error": "not found"})

        def do_POST(self):
            # Validate Content-Length ourselves: a negative value would
            # bypass the size cap (read(-1) = until EOF, unbounded buffering
            # on an unauthenticated endpoint) and a malformed one would
            # escape as an uncaught ValueError.
            try:
                length = int(self.headers.get("Content-Length", 0))
            except (TypeError, ValueError):
                self._reply(400, {"error": "invalid Content-Length"})
                return
            if length < 0 or length > MAX_REQUEST_BYTES:
                self._reply(413, {"error": f"request too large (> {MAX_REQUEST_BYTES} bytes)"})
                return
            try:
                data = self.rfile.read(length)
            except (ConnectionError, BrokenPipeError):
                # client reset mid-body (cancellation): nothing to answer,
                # and no traceback through handle_error per rude client
                self.close_connection = True
                return
            try:
                if self.path == "/ocr":
                    self._reply(200, {"text": service.ocr_bytes(data)})
                elif self.path == "/ocr_batch":
                    req = json.loads(data)
                    texts = service.ocr_batch_b64(req.get("images", []))
                    self._reply(200, {"texts": texts})
                else:
                    self._reply(404, {"error": "not found"})
            except (TimeoutError, FuturesTimeout) as e:
                # concurrent.futures.TimeoutError only aliases the builtin
                # from 3.11; catch both for 3.10
                self._reply(503, {"error": f"busy/compiling: {e}"})
            except Exception as e:
                self._reply(400, {"error": f"{type(e).__name__}: {e}"})

        def log_message(self, fmt, *args):  # quiet by default
            pass

    return Handler


def serve(
    engine, port: int = 8080, window_ms: float = 10.0, host: str = "127.0.0.1"
) -> ThreadingHTTPServer:
    """Start the server (non-blocking; returns the server object).

    Binds loopback by default — the service has no auth; exposing it needs
    an explicit ``host`` (``--host 0.0.0.0``) behind a real ingress."""
    service = OcrService(engine, window_ms)
    httpd = ThreadingHTTPServer((host, port), make_handler(service))
    httpd.service = service  # type: ignore[attr-defined]
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    return httpd


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--checkpoint", default="")
    p.add_argument("--max-length", type=int, default=300)
    p.add_argument(
        "--wire", default="gray", choices=("gray", "packed"),
        help="host->device crop format (see cli.py --wire)",
    )
    p.add_argument(
        "--no-coalesce", action="store_true",
        help="disable multi-bucket page coalescing (see cli.py --no-coalesce)",
    )
    p.add_argument(
        "--mesh-data", type=int, default=0,
        help="shard crop batches over N devices (see cli.py --mesh-data)",
    )
    p.add_argument(
        "--dtype", default="bfloat16", choices=("bfloat16", "float32"),
        help="compute dtype (see cli.py --dtype)",
    )
    p.add_argument(
        "--serving-kernels", default="auto", choices=("auto", "on", "off"),
        help="fused Pallas+int8 serving config (see cli.py --serving-kernels)",
    )
    p.add_argument("--window-ms", type=float, default=10.0)
    p.add_argument(
        "--no-aot", action="store_true",
        help="disable the cross-process AOT executable store (the store "
        "lets the server cold-start without multi-minute Pallas compiles; "
        "single-device only)",
    )
    args = p.parse_args(argv)

    from manga_ocr_tpu import cli

    engine = cli._build_engine(args)
    engine.warmup()
    httpd = serve(engine, args.port, args.window_ms, host=args.host)
    print(f"serving on {args.host}:{args.port}")
    try:
        threading.Event().wait()
    except KeyboardInterrupt:
        httpd.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
