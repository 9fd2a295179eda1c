"""HTTP serving tests (real sockets, tiny engine)."""

import base64
import io
import json
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
    httpd = srv.serve(engine, port=0)  # ephemeral port
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()
    httpd.service.close()


def _png_bytes(seed=0):
    from PIL import Image

    arr = np.random.default_rng(seed).integers(0, 255, size=(40, 60, 3)).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


def _post(url, data, headers=None):
    req = urllib.request.Request(url, data=data, headers=headers or {}, method="POST")
    with urllib.request.urlopen(req, timeout=60) as resp:
        return resp.status, json.loads(resp.read())


def test_healthz(server):
    with urllib.request.urlopen(f"{server}/healthz", timeout=30) as resp:
        body = json.loads(resp.read())
    assert body["status"] == "ok" and body["devices"]


def test_ocr_single(server):
    status, body = _post(f"{server}/ocr", _png_bytes())
    assert status == 200 and isinstance(body["text"], str)


def test_ocr_batch(server):
    images = [base64.b64encode(_png_bytes(i)).decode() for i in range(3)]
    status, body = _post(
        f"{server}/ocr_batch",
        json.dumps({"images": images}).encode(),
        {"Content-Type": "application/json"},
    )
    assert status == 200 and len(body["texts"]) == 3


def test_bad_image_is_400(server):
    import urllib.error

    try:
        _post(f"{server}/ocr", b"not an image")
        raise AssertionError("expected HTTPError")
    except urllib.error.HTTPError as e:
        assert e.code == 400
        assert "error" in json.loads(e.read())


def test_stats_counts(server):
    _post(f"{server}/ocr", _png_bytes(9))
    with urllib.request.urlopen(f"{server}/stats", timeout=30) as resp:
        body = json.loads(resp.read())
    assert body["ocr_total"] >= 1
    assert "ocr_request" in body["stages"]


def test_negative_content_length_rejected(server):
    """A negative Content-Length must not bypass the request-size cap
    (read(-1) would buffer until EOF on an unauthenticated endpoint)."""
    import http.client
    import urllib.parse

    u = urllib.parse.urlparse(server)
    conn = http.client.HTTPConnection(u.hostname, u.port, timeout=30)
    conn.putrequest("POST", "/ocr", skip_accept_encoding=True)
    conn.putheader("Content-Length", "-1")
    conn.endheaders()
    resp = conn.getresponse()
    assert resp.status == 413
    conn.close()


def test_malformed_content_length_is_400(server):
    import http.client
    import urllib.parse

    u = urllib.parse.urlparse(server)
    conn = http.client.HTTPConnection(u.hostname, u.port, timeout=30)
    conn.putrequest("POST", "/ocr", skip_accept_encoding=True)
    conn.putheader("Content-Length", "abc")
    conn.endheaders()
    resp = conn.getresponse()
    assert resp.status == 400
    conn.close()
