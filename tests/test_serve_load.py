"""Concurrency load tests for the HTTP serving path (VERDICT r3 #7).

The reference serves crops through 15 Qt worker threads pulling from a
mutex-guarded list (`/root/reference/src/ui/main_window.py:4317-4335`);
here concurrent HTTP clients funnel into the MicroBatcher + engine-cache
+ futures composition.  These tests hammer the real ThreadingHTTPServer
with N concurrent clients against the tiny-config engine on CPU and
assert nothing deadlocks, no future is lost, every response is accounted
for in /stats, and hostile clients (mid-flight disconnect, oversized
body) cannot wedge the service for well-behaved ones.
"""

import base64
import http.client
import io
import json
import socket
import threading
import urllib.parse
import urllib.request

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def server():
    from manga_ocr_tpu import serve as srv
    from manga_ocr_tpu.engine import TpuMangaOcrEngine
    from manga_ocr_tpu.models import model as mdl
    from manga_ocr_tpu.models.config import MangaOCRConfig
    from manga_ocr_tpu.models.tokenizer import CharTokenizer

    cfg = MangaOCRConfig.tiny()
    engine = TpuMangaOcrEngine(
        mdl.init_params(cfg, jax.random.PRNGKey(0)),
        cfg,
        CharTokenizer.synthetic(),
        max_length=8,
        dtype=jnp.float32,
    )
    httpd = srv.serve(engine, port=0, window_ms=5.0)
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()
    httpd.service.close()


def _png_bytes(seed=0, h=40, w=60):
    from PIL import Image

    arr = np.random.default_rng(seed).integers(0, 255, size=(h, w, 3)).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


def _post(url, data, headers=None, timeout=120):
    req = urllib.request.Request(url, data=data, headers=headers or {}, method="POST")
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return resp.status, json.loads(resp.read())


def _stats(server):
    with urllib.request.urlopen(f"{server}/stats", timeout=30) as resp:
        return json.loads(resp.read())


def test_concurrent_clients_no_deadlock_and_exact_accounting(server):
    """12 clients x 4 requests (mixed /ocr and /ocr_batch, varied crop
    shapes so several shape buckets are in play) all succeed, and /stats
    counts every crop exactly once."""
    before = _stats(server)["ocr_total"]
    n_clients, n_requests = 12, 4
    results: list = [None] * n_clients
    crops_sent = [0] * n_clients

    def client(i: int) -> None:
        out = []
        for j in range(n_requests):
            seed = i * 100 + j
            if (i + j) % 3 == 2:
                imgs = [
                    base64.b64encode(_png_bytes(seed + k, 30 + 7 * k, 50)).decode()
                    for k in range(2)
                ]
                status, body = _post(
                    f"{server}/ocr_batch",
                    json.dumps({"images": imgs}).encode(),
                    {"Content-Type": "application/json"},
                )
                assert status == 200 and len(body["texts"]) == 2
                crops_sent[i] += 2
                out.extend(body["texts"])
            else:
                status, body = _post(
                    f"{server}/ocr", _png_bytes(seed, 32 + (j % 3) * 16, 48)
                )
                assert status == 200 and isinstance(body["text"], str)
                crops_sent[i] += 1
                out.append(body["text"])
        results[i] = out

    threads = [threading.Thread(target=client, args=(i,)) for i in range(n_clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not any(t.is_alive() for t in threads), "client threads hung: deadlock"
    assert all(r is not None for r in results), "a client lost responses"
    after = _stats(server)["ocr_total"]
    assert after - before == sum(crops_sent)


def test_midflight_disconnect_does_not_wedge(server):
    """A client that sends headers (and half a body) then slams the socket
    shut must not take down or wedge the worker; well-behaved requests keep
    succeeding concurrently and afterwards."""
    u = urllib.parse.urlparse(server)
    png = _png_bytes(7)

    def rude_client():
        raw = socket.create_connection((u.hostname, u.port), timeout=30)
        try:
            head = (
                f"POST /ocr HTTP/1.1\r\nHost: {u.hostname}\r\n"
                f"Content-Length: {len(png)}\r\n\r\n"
            ).encode()
            raw.sendall(head + png[: len(png) // 2])
        finally:
            # abort (RST) rather than graceful FIN: the harshest cancel
            raw.setsockopt(socket.SOL_SOCKET, socket.SO_LINGER,
                           b"\x01\x00\x00\x00\x00\x00\x00\x00")
            raw.close()

    polite_ok = []

    def polite_client(seed):
        status, body = _post(f"{server}/ocr", _png_bytes(seed))
        polite_ok.append(status == 200 and isinstance(body["text"], str))

    threads = [threading.Thread(target=rude_client) for _ in range(4)] + [
        threading.Thread(target=polite_client, args=(i,)) for i in range(4)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert not any(t.is_alive() for t in threads)
    assert polite_ok == [True] * 4
    # service is still fully alive
    status, body = _post(f"{server}/ocr", _png_bytes(99))
    assert status == 200


def test_oversized_body_rejected_without_reading(server):
    """A Content-Length over the cap is rejected up front (413) — the body
    is never buffered, so a hostile client cannot exhaust memory."""
    from manga_ocr_tpu.serve import MAX_REQUEST_BYTES

    u = urllib.parse.urlparse(server)
    conn = http.client.HTTPConnection(u.hostname, u.port, timeout=30)
    conn.putrequest("POST", "/ocr", skip_accept_encoding=True)
    conn.putheader("Content-Length", str(MAX_REQUEST_BYTES + 1))
    conn.endheaders()
    resp = conn.getresponse()
    assert resp.status == 413
    conn.close()
    # and the service still answers
    status, _ = _post(f"{server}/ocr", _png_bytes(3))
    assert status == 200
