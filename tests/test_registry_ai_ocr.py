"""Engine registry dispatch + AI-OCR HTTP engine tests (offline)."""

import json

import numpy as np
import pytest

from manga_ocr_tpu.engine.ai_ocr import AiOcrEngine, ocr_prompt
from manga_ocr_tpu.engine.registry import EngineRegistry, make_default_registry
from manga_ocr_tpu.utils.http import HttpResponse


class FakeEngine:
    def __init__(self, reply="text"):
        self.reply = reply
        self.calls = 0

    def perform_ocr(self, image, settings=None):
        self.calls += 1
        return self.reply


def _img():
    return np.full((20, 30, 3), 128, np.uint8)


def test_registry_dispatch_and_sentinels():
    reg = EngineRegistry()
    reg.register("Manga-OCR", FakeEngine("こんにちは"))
    out = reg.perform_ocr(_img(), {"ocr_engine": "Manga-OCR", "ocr_lang": "ja"})
    assert out == "こんにちは"
    out = reg.perform_ocr(_img(), {"ocr_engine": "NoSuch", "ocr_lang": "en"})
    assert out.startswith("[ERROR")


def test_japanese_forced_to_manga_ocr():
    reg = EngineRegistry()
    manga = FakeEngine("jp")
    other = FakeEngine("other")
    reg.register("Manga-OCR", manga)
    reg.register("EasyOCR", other)
    out = reg.perform_ocr(_img(), {"ocr_engine": "EasyOCR", "ocr_lang": "ja"})
    assert out == "jp" and manga.calls == 1 and other.calls == 0
    # non-Japanese goes where asked
    out = reg.perform_ocr(_img(), {"ocr_engine": "EasyOCR", "ocr_lang": "en"})
    assert out == "other"


def test_registry_engine_errors_become_sentinels():
    class Boom:
        def perform_ocr(self, image, settings=None):
            raise RuntimeError("kaput")

    reg = EngineRegistry()
    reg.register("Manga-OCR", Boom())
    out = reg.perform_ocr(_img(), {"ocr_engine": "Manga-OCR", "ocr_lang": "ja"})
    assert out.startswith("[ERROR") and "kaput" in out


def test_lazy_factory_failure_is_unavailable():
    reg = EngineRegistry()
    reg.register_lazy("Broken", lambda: (_ for _ in ()).throw(RuntimeError()))
    assert reg.get("Broken") is None
    assert "Broken" not in reg.available_engines()


def test_ocr_languages_contract():
    reg = make_default_registry(tpu_engine=FakeEngine())
    langs = reg.ocr_languages()
    assert langs["Manga-OCR"] == ["ja"]
    for name, ls in langs.items():
        if name not in ("Manga-OCR", "Tesseract", "AI_OCR", "MOFRL-GPT"):
            assert "ja" not in ls  # suppressed in favor of Manga-OCR


# -- AI OCR -------------------------------------------------------------------


def _openai_reply(text):
    return HttpResponse(
        200, json.dumps({"choices": [{"message": {"content": text}}]}).encode()
    )


def test_ai_ocr_first_variant_success(tmp_path):
    payloads = []

    def transport(url, data, headers, timeout):
        payloads.append(json.loads(data))
        return _openai_reply("ドラゴン")

    eng = AiOcrEngine(
        "https://api.example/v1/chat/completions",
        api_key="k",
        model="gpt-4o-mini",
        cache_dir=str(tmp_path),
        transport=transport,
    )
    out = eng.perform_ocr(_img(), {"ocr_lang": "ja"})
    assert out == "ドラゴン"
    content = payloads[0]["messages"][0]["content"]
    assert content[1]["type"] == "image_url"
    assert "max_tokens" in payloads[0]


def test_ai_ocr_variant_ladder_falls_through():
    calls = []

    def transport(url, data, headers, timeout):
        calls.append(json.loads(data))
        if len(calls) < 3:
            return HttpResponse(400, b"bad schema")
        return _openai_reply("ok!")

    eng = AiOcrEngine("https://x/v1", model="m", transport=transport)
    out = eng.perform_ocr(_img())
    assert out == "ok!" and len(calls) == 3
    assert calls[1]["messages"][0]["content"][1]["type"] == "input_image"
    assert isinstance(calls[2]["messages"][0]["content"], str)


def test_ai_ocr_cache_hits(tmp_path):
    calls = []

    def transport(url, data, headers, timeout):
        calls.append(1)
        return _openai_reply("cached!")

    eng = AiOcrEngine("https://x/v1", model="m", cache_dir=str(tmp_path), transport=transport)
    assert eng.perform_ocr(_img()) == "cached!"
    assert eng.perform_ocr(_img()) == "cached!"
    assert len(calls) == 1  # second call from cache


def test_ai_ocr_gpt5_token_key():
    captured = {}

    def transport(url, data, headers, timeout):
        captured.update(json.loads(data))
        return _openai_reply("x")

    eng = AiOcrEngine("https://x/v1", model="gpt-5-mini", transport=transport)
    eng.perform_ocr(_img())
    assert "max_completion_tokens" in captured and "max_tokens" not in captured


def test_ai_ocr_gemini_inline_data():
    captured = {}

    def transport(url, data, headers, timeout):
        captured["url"] = url
        captured["payload"] = json.loads(data)
        body = {"candidates": [{"content": {"parts": [{"text": "猫"}]}}]}
        return HttpResponse(200, json.dumps(body).encode())

    eng = AiOcrEngine(
        "https://generativelanguage.googleapis.com/v1beta/models/g:generateContent",
        api_key="K",
        model="gemini-2.5-flash",
        transport=transport,
    )
    out = eng.perform_ocr(_img())
    assert out == "猫"
    assert captured["url"].endswith("?key=K")
    parts = captured["payload"]["contents"][0]["parts"]
    assert parts[1]["inline_data"]["mime_type"] == "image/png"


def test_ai_ocr_total_failure_sentinel():
    eng = AiOcrEngine(
        "https://x/v1",
        model="m",
        transport=lambda *a: HttpResponse(500, b"down"),
    )
    out = eng.perform_ocr(_img())
    assert out.startswith("[ERROR")


def test_japanese_prompt_mentions_furigana():
    assert "furigana" in ocr_prompt("ja")
    assert "furigana" not in ocr_prompt("en")
