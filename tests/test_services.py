"""Settings, HTTP retry, rate limiter and translation-service tests (offline:
transports and clocks are injected)."""

import json

import pytest

from manga_ocr_tpu.core.settings import Settings, deep_merge, default_settings
from manga_ocr_tpu.translate import prompts
from manga_ocr_tpu.translate.service import TranslationService
from manga_ocr_tpu.utils.http import HttpResponse, robust_post
from manga_ocr_tpu.utils.rate_limit import ModelLimits, RateLimiter


# -- settings -----------------------------------------------------------------


def test_settings_deep_merge_and_roundtrip(tmp_path):
    path = tmp_path / "settings.json"
    path.write_text(json.dumps({"general": {"save_format": "WEBP"}, "custom": 1}))
    s = Settings(str(path))
    assert s.get("general.save_format") == "WEBP"
    assert s.get("general.save_quality") == 95  # default preserved
    assert s.get("custom") == 1  # unknown keys preserved
    s.set("tpu.max_decode_length", 128)
    s.save()
    s2 = Settings(str(path))
    assert s2.get("tpu.max_decode_length") == 128


def test_settings_key_rotation():
    s = Settings()
    s.add_key("gemini", "k1")
    s.add_key("gemini", "k2")
    assert [s.get_active_key("gemini") for _ in range(3)] == ["k1", "k2", "k1"]
    assert s.get_active_key("deepl") is None


# -- http ----------------------------------------------------------------------


def test_robust_post_retries_on_5xx_and_429():
    calls = []

    def transport(url, data, headers, timeout):
        calls.append(url)
        if len(calls) < 3:
            return HttpResponse(503 if len(calls) == 1 else 429, b"busy")
        return HttpResponse(200, b'{"ok": true}')

    resp = robust_post("http://x", json={}, transport=transport, sleep=lambda s: None)
    assert resp.ok and len(calls) == 3


def test_robust_post_fatal_4xx_no_retry():
    calls = []

    def transport(url, data, headers, timeout):
        calls.append(1)
        return HttpResponse(401, b"nope")

    resp = robust_post("http://x", json={}, transport=transport, sleep=lambda s: None)
    assert resp.status_code == 401 and len(calls) == 1


# -- rate limiter ----------------------------------------------------------------


def test_rate_limiter_rpm_window():
    now = [1000.0]
    lim = RateLimiter(
        {"m": ModelLimits(rpm=2, rpd=10)}, clock=lambda: now[0], sleep=lambda s: None
    )
    assert lim.try_acquire("m") and lim.try_acquire("m")
    assert not lim.try_acquire("m")
    assert lim.seconds_until_slot("m") == pytest.approx(60.0, abs=1e-6)
    now[0] += 61
    assert lim.try_acquire("m")


def test_rate_limiter_blocking_acquire():
    now = [0.0]

    def sleep(s):
        now[0] += s

    lim = RateLimiter({"m": ModelLimits(rpm=1)}, clock=lambda: now[0], sleep=sleep)
    assert lim.acquire("m")
    assert lim.acquire("m")  # blocks via injected sleep, then succeeds
    assert now[0] >= 60.0


def test_rate_limiter_cost_and_persistence(tmp_path):
    path = str(tmp_path / "usage.json")
    lim = RateLimiter({"m": ModelLimits(0, 0, 0.001, 0.002)}, store_path=path)
    lim.try_acquire("m")
    cost = lim.add_cost("m", 1000, 500)
    assert cost == pytest.approx(0.002)
    lim.save()
    lim2 = RateLimiter({"m": ModelLimits()}, store_path=path)
    assert lim2.usage_summary()["m"]["cost_usd"] == pytest.approx(0.002)


# -- prompts / parsing -------------------------------------------------------------


def test_numbered_batch_roundtrip():
    texts = ["a", "b", "c"]
    p = prompts.build_batch_prompt(texts)
    assert "1. a" in p and "3. c" in p
    parsed = prompts.parse_numbered_response("1. A\n2) B\njunk\n3: C", 3)
    assert parsed == ["A", "B", "C"]


def test_scene_roundtrip():
    entries = [("原文1", "trans1"), ("原文2", "trans2")]
    p = prompts.build_scene_prompt(entries)
    reply = "[Text 1]\nBetter one\n[Text 2]\nOriginal: echoed\nBetter two"
    parsed = prompts.parse_scene_response(reply, 2)
    assert parsed == ["Better one", "Better two"]


def test_json_array_parse_with_fences():
    reply = 'noise ```json\n[{"index": 0, "verdict": "ok", "suggestion": ""}]\n``` tail'
    out = prompts.parse_json_array_response(reply)
    assert out[0]["verdict"] == "ok"


# -- translation service --------------------------------------------------------------


def _gemini_transport(reply_text):
    def transport(url, data, headers, timeout):
        body = {
            "candidates": [{"content": {"parts": [{"text": reply_text}]}}],
            "usageMetadata": {"promptTokenCount": 10, "candidatesTokenCount": 5},
        }
        return HttpResponse(200, json.dumps(body).encode())

    return transport


def test_translate_with_ai_gemini():
    s = Settings()
    s.add_key("gemini", "test-key")
    svc = TranslationService(s, transport=_gemini_transport("Hello!"))
    out = svc.translate_with_ai("こんにちは", provider="gemini")
    assert out == "Hello!"
    summary = svc.limiter.usage_summary()
    assert summary["gemini-2.5-flash-lite"]["tokens"]["input"] == 10


def test_translate_enhanced_includes_both_ocr():
    s = Settings()
    s.add_key("gemini", "k")
    captured = {}

    def transport(url, data, headers, timeout):
        captured["payload"] = json.loads(data)
        return _gemini_transport("merged")(url, data, headers, timeout)

    svc = TranslationService(s, transport=transport)
    out = svc.translate_with_ai(
        "x",
        is_enhanced=True,
        ocr_results={"manga_ocr": "こん", "tesseract": "こん?"},
    )
    assert out == "merged"
    prompt = captured["payload"]["contents"][0]["parts"][0]["text"]
    assert "OCR[manga_ocr]" in prompt and "OCR[tesseract]" in prompt


def test_translate_no_keys_returns_sentinel():
    svc = TranslationService(Settings(), transport=_gemini_transport("x"))
    out = svc.translate_with_ai("text")
    assert out.startswith("[ERROR")


def test_translate_batch_parses_slots():
    s = Settings()
    s.add_key("gemini", "k")
    svc = TranslationService(s, transport=_gemini_transport("1. one\n2. two"))
    assert svc.translate_batch(["a", "b"]) == ["one", "two"]


# -- translation styles -----------------------------------------------------------


def test_translation_styles_roundtrip(tmp_path):
    from manga_ocr_tpu.translate.styles import TranslationStyles

    path = str(tmp_path / "styles.json")
    s = TranslationStyles(path)
    assert "Standard" in s.names()
    s.set("Shonen", "High-energy battle dialogue; short punchy lines.")
    s.save()
    s2 = TranslationStyles(path)
    assert s2.get("Shonen").startswith("High-energy")
    s2.delete("Shonen")
    assert s2.get("Shonen") is None


def test_style_notes_flow_into_prompt():
    from manga_ocr_tpu.translate.prompts import build_translation_prompt

    p = build_translation_prompt("x", style_notes="Keep honorifics.")
    assert "Keep honorifics." in p


def test_translation_service_rotates_keys_across_calls():
    """Client caching must not pin the first API key (regression: per-
    provider caching defeated get_active_key's round-robin rotation)."""
    used = []

    def transport(url, data, headers, timeout):
        used.append((dict(headers), url))
        return HttpResponse(
            200,
            json.dumps(
                {"candidates": [{"content": {"parts": [{"text": "ok"}]}}]}
            ).encode(),
        )

    s = Settings()
    s.set("apis.gemini.keys", ["K1", "K2"])
    svc = TranslationService(s, transport=transport)
    for _ in range(4):
        svc.translate_with_ai("hello", provider="gemini")
    keys_seen = [url.split("key=")[-1] for _, url in used]
    assert set(keys_seen) == {"K1", "K2"}
    assert keys_seen[0] != keys_seen[1]  # alternating, not pinned


def test_rate_limiter_save_load_roundtrip(tmp_path):
    """save() snapshots under the lock and the deque-based windows reload
    (regression: live-structure serialization race + list->deque move)."""
    t = [1000.0]
    path = str(tmp_path / "usage.json")
    lims = {"m": ModelLimits(rpm=2, rpd=5, input_cost_per_1k=0.001, output_cost_per_1k=0.002)}
    rl = RateLimiter(lims, store_path=path, clock=lambda: t[0])
    assert rl.try_acquire("m") and rl.try_acquire("m")
    assert not rl.try_acquire("m")  # rpm exhausted
    rl.add_cost("m", 1000, 500)
    rl.save()
    rl2 = RateLimiter(lims, store_path=path, clock=lambda: t[0])
    s = rl2.usage_summary()["m"]
    assert s["rpm_used"] == 2 and s["rpd_used"] == 2
    assert s["cost_usd"] > 0
    assert not rl2.try_acquire("m")
    t[0] += 61  # minute window rolls over, day window persists
    assert rl2.try_acquire("m")
    assert rl2.usage_summary()["m"]["rpd_used"] == 3
