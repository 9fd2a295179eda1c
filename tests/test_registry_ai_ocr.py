"""Engine registry dispatch + AI-OCR HTTP engine tests (offline)."""

import json

import numpy as np
import pytest

from manga_ocr_tpu.engine.ai_ocr import AiOcrEngine, engine_from_settings, ocr_prompt
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


def test_japanese_prompt_carries_reference_output_contract():
    """VERDICT r2 #7: the Japanese prompt must convey the reference's rules
    (main_window.py:9933-9951): notes/furigana in parentheses AFTER the
    kanji, keep line breaks, preserve punctuation, no markdown."""
    p = ocr_prompt("ja")
    assert "parentheses" in p
    assert "漢字(note)" in p
    assert "line break" in p
    assert "punctuation" in p
    assert "markdown" in p.lower()


def test_engine_from_settings_swaps_url_key_model_together():
    """The per-job provider selects the provider BLOCK — URL, key and model
    move together, so the Gemini dialect can only ever pair with a Gemini
    endpoint (advisor r2 #1)."""
    root = {
        "ocr": {
            "openrouter": {
                "url": "https://openrouter.ai/api/v1/chat/completions",
                "api_key": "OR",
                "models": [{"id": "x/or-model", "active": True}],
            },
            "gemini": {
                "url": "https://generativelanguage.googleapis.com/v1/models/g:generateContent",
                "api_key": "G",
                "models": [{"id": "gemini-2.5", "active": True}],
            },
        }
    }
    eng = engine_from_settings(root, {"ocr_ai_provider": "openrouter"})
    assert eng.url.startswith("https://openrouter.ai") and eng.api_key == "OR"
    assert eng.model == "x/or-model"
    g = engine_from_settings(root, {"ocr_ai_provider": "gemini"})
    assert "generativelanguage" in g.url and g.api_key == "G"
    # job-level model override wins
    g2 = engine_from_settings(
        root, {"ocr_ai_provider": "gemini", "ocr_ai_model_id": "gemini-exp"}
    )
    assert g2.model == "gemini-exp"
    # unknown provider or missing URL -> None
    assert engine_from_settings(root, {"ocr_ai_provider": "nope"}) is None
    assert engine_from_settings({}, {"ocr_ai_provider": "gemini"}) is None
