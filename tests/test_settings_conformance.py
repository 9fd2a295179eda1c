"""Reference settings-dict conformance suite (VERDICT round-1 #9).

The reference snapshots ~42 UI knobs into every crop job
(``get_current_settings()``, ``/root/reference/src/ui/main_window.py:
4886-4973``); that dict is the de-facto engine flag system (SURVEY §5.6).
This suite asserts every key is either CONSUMED by the rebuilt engine /
pipeline (grep-verified against the package source, plus behavioral spot
checks) or EXPLICITLY ignored with a recorded rationale — nothing falls
through silently.

Plus a headless smoke of the reference's worker calling pattern: 15
threads each performing per-crop OCR (the QueueProcessorWorker shape,
``workers.py:200-436``) against the microbatcher — coalescing and the
sentinel-error contract must hold under concurrency.
"""

from __future__ import annotations

import os
import threading

import numpy as np
import pytest

PKG = os.path.join(os.path.dirname(__file__), "..", "manga_ocr_tpu")

# Every key of the reference's get_current_settings() dict, in source order
# (main_window.py:4925-4973), mapped to how the rebuild handles it.
#   consumed: read by package code (grep-asserted below)
#   gui-only: pure UI state with no engine-side behavior
#   host-hint: backend tuning hints for CPU/torch stacks that do not apply
#              to the TPU engine (documented, deliberately ignored)
CONTRACT = {
    "ocr_engine": ("consumed", "engine dispatch (registry.perform_ocr)"),
    "ocr_lang": ("consumed", "language routing incl. Japanese->Manga-OCR rule"),
    "ocr_ai_provider": ("consumed", "AI-OCR provider selection (ai_ocr)"),
    "ocr_ai_provider_label": ("gui-only", "display label of the provider"),
    "ocr_ai_model_id": ("consumed", "AI-OCR model override (ai_ocr.perform_ocr)"),
    "ocr_ai_model_name": ("consumed", "AI-OCR model override fallback"),
    "orientation": ("consumed", "crop rotation rule (engine + preprocess)"),
    "target_lang": ("consumed", "translation target (translate_for_job)"),
    "use_ai": ("gui-only", "constant True in the reference; no branch reads it"),
    "font": ("consumed", "TypesetArea font (create_typeset_area)"),
    "color": ("consumed", "TypesetArea color"),
    "enhanced_pipeline": ("consumed", "dual-pass switch (process_jobs)"),
    "use_ai_only_translate": ("consumed", "translation routing option 1"),
    "use_deepl_only_translate": ("consumed", "translation routing option 2"),
    "use_dl_detector": ("consumed", "detector dispatch gate"),
    "dl_provider": ("consumed", "detector registry key"),
    "dl_model_file": ("consumed", "detector registry key"),
    "ai_model": ("consumed", "(provider, model) pair for AI translation"),
    "ai_model_label": ("gui-only", "display label"),
    "ai_model_info": ("gui-only", "display metadata"),
    "translation_style": ("consumed", "style preset -> prompt + area field"),
    "auto_split_bubbles": ("consumed", "split_extended_bubbles gate (cli)"),
    "safe_mode": ("consumed", "translated-text word filter"),
    "use_gpu": ("host-hint", "CUDA toggle for host torch engines; TPU path N/A"),
    "use_inpaint": ("consumed", "per-area cleanup override"),
    "inpaint_model_name": ("gui-only", "combo text; key below is the selector"),
    "inpaint_model_key": ("consumed", "inpaint tier selection (cleanup ladder)"),
    "inpaint_padding": ("consumed", "cleanup mask dilation"),
    "cpu_threads": ("host-hint", "paddle/torch CPU tuning; TPU path N/A"),
    "enable_mkldnn": ("host-hint", "paddle CPU tuning; TPU path N/A"),
    "orientation_mode": ("consumed", "typeset text orientation"),
    "create_bubble": ("consumed", "TypesetArea bubble_enabled"),
    "use_background_box": ("consumed", "per-area cleanup override"),
    "text_effect": ("consumed", "TypesetArea effect"),
    "effect_intensity": ("consumed", "TypesetArea effect intensity"),
    "bezier_points": ("consumed", "curved-text control points"),
    "alignment": ("consumed", "TypesetArea alignment"),
    "line_spacing": ("consumed", "TypesetArea line spacing"),
    "char_spacing": ("consumed", "TypesetArea char spacing"),
    "text_outline": ("consumed", "TypesetArea outline toggle"),
    "outline_width": ("consumed", "TypesetArea outline width"),
    "outline_color": ("consumed", "TypesetArea outline color"),
    "outline_style": ("consumed", "TypesetArea outline style (stroke/glow)"),
    "margins": ("consumed", "TypesetArea margins"),
    "manga_use_easy_detection": ("host-hint", "EasyOCR-assisted detection for the host engine family"),
    "tesseract_use_easy_detection": ("host-hint", "EasyOCR-assisted detection for the host engine family"),
}


def _package_source() -> str:
    chunks = []
    for root, _, files in os.walk(PKG):
        for f in files:
            if f.endswith(".py"):
                with open(os.path.join(root, f), encoding="utf-8") as fh:
                    chunks.append(fh.read())
    return "\n".join(chunks)


def test_contract_covers_reference_key_set():
    """The table above must list exactly the reference's keys."""
    assert len(CONTRACT) == 46
    # spot-check source ordering anchors
    keys = list(CONTRACT)
    assert keys[0] == "ocr_engine" and keys[-1] == "tesseract_use_easy_detection"


def test_consumed_keys_appear_in_package_source():
    src = _package_source()
    missing = [
        k
        for k, (status, _) in CONTRACT.items()
        if status == "consumed" and f'"{k}"' not in src and f"'{k}'" not in src
    ]
    assert not missing, f"keys marked consumed but absent from source: {missing}"


def test_typeset_keys_flow_onto_area():
    from manga_ocr_tpu.core.geometry import Rect
    from manga_ocr_tpu.runtime.pipeline import OcrJob, create_typeset_area

    settings = {
        "orientation_mode": "vertical",
        "text_effect": "wavy",
        "effect_intensity": 33.0,
        "bezier_points": [[0, 0], [1, 1]],
        "create_bubble": True,
        "text_outline": True,
        "outline_width": 4.5,
        "outline_color": "#112233",
        "outline_style": "glow",
        "alignment": "left",
        "line_spacing": 1.5,
        "char_spacing": 120.0,
        "margins": {"top": 1, "right": 2, "bottom": 3, "left": 4},
        "translation_style": "Casual",
        "font": {"family": "X", "size": 20},
        "color": "#445566",
        "use_inpaint": False,
        "use_background_box": False,
    }
    job = OcrJob("p", Rect(0, 0, 10, 10), np.zeros((4, 2), np.int32), None, settings)
    area = create_typeset_area(job, "t", "o")
    assert area.orientation == "vertical"
    assert area.effect == "wavy" and area.effect_intensity == 33.0
    assert area.bezier_points == [[0, 0], [1, 1]]
    assert area.bubble_enabled is True
    assert area.text_outline and area.text_outline_width == 4.5
    assert area.text_outline_color == "#112233" and area.text_outline_style == "glow"
    assert area.alignment == "left"
    assert area.line_spacing == 1.5 and area.char_spacing == 120.0
    assert area.margins["left"] == 4
    assert area.translation_style == "Casual"
    assert area.font["family"] == "X" and area.color == "#445566"
    assert area.get_override("use_inpaint") is False
    assert area.get_override("use_background_box") is False


def test_safe_mode_filter():
    from manga_ocr_tpu.runtime.pipeline import apply_safe_mode

    assert apply_safe_mode("a PENIS b", {"safe_mode": True}) == "a burung b"
    assert apply_safe_mode("a PENIS b", {"safe_mode": False}) == "a PENIS b"


def test_enhanced_pipeline_key_triggers_dual_pass():
    from manga_ocr_tpu.core.geometry import Rect
    from manga_ocr_tpu.runtime.pipeline import OcrJob, PagePipeline

    calls = {"dual": 0, "single": 0}

    def ocr(crops):
        calls["single"] += 1
        return ["x"] * len(crops)

    def dual(crops):
        calls["dual"] += 1
        return [("a", "b")] * len(crops)

    pipe = PagePipeline(ocr, dual_pass=dual)
    job = OcrJob(
        "p",
        Rect(0, 0, 4, 4),
        np.zeros((4, 2), np.int32),
        np.zeros((4, 4, 3), np.uint8),
        {"enhanced_pipeline": True},
    )
    pipe.process_jobs([job])
    assert calls == {"dual": 1, "single": 0}


def test_translation_routing_keys():
    from manga_ocr_tpu.translate.service import TranslationService

    calls = []
    svc = TranslationService()
    svc.translate_with_ai = lambda text, **kw: calls.append(("ai", kw)) or "AI"
    svc.translate_text = lambda text, target_lang: calls.append(("deepl", target_lang)) or "DL"

    out = svc.translate_for_job(
        "x", {"use_ai_only_translate": True, "ai_model": ("openai", "gpt"), "target_lang": "English"}
    )
    assert out == "AI" and calls[-1][0] == "ai"
    assert calls[-1][1]["provider"] == "openai" and calls[-1][1]["model"] == "gpt"
    out = svc.translate_for_job("x", {"use_deepl_only_translate": True})
    assert out == "DL" and calls[-1][0] == "deepl"
    out = svc.translate_for_job("x", {})  # option 3: standard flow
    assert out == "DL"


def test_detector_dispatch_keys():
    from manga_ocr_tpu.detect.detector import detector_from_settings

    sentinel = object()
    models = {("Kitsumed", "model_dynamic.onnx"): sentinel}
    assert detector_from_settings({"use_dl_detector": False}, models) is None
    got = detector_from_settings(
        {"use_dl_detector": True, "dl_provider": "Kitsumed", "dl_model_file": "model_dynamic.onnx"},
        models,
    )
    assert got is sentinel
    assert (
        detector_from_settings(
            {"use_dl_detector": True, "dl_provider": "?", "dl_model_file": "?"}, models
        )
        is None
    )


def test_worker_loop_smoke_15_threads_microbatch():
    """The reference's per-crop worker pattern (15 threads) against the
    microbatcher: coalescing happens and sentinel errors pass through."""
    from manga_ocr_tpu.runtime.pipeline import MicroBatcher

    dispatches = []

    def batch_fn(crops):
        dispatches.append(len(crops))
        return [
            "[ERROR: empty image]" if c.size == 0 else f"text{c.shape[0]}"
            for c in crops
        ]

    mb = MicroBatcher(batch_fn, window_ms=30.0)
    results = [None] * 60
    barrier = threading.Barrier(15)

    def worker(tid):
        barrier.wait()
        for j in range(4):
            i = tid * 4 + j
            crop = (
                np.zeros((0, 0, 3), np.uint8)
                if i % 7 == 0
                else np.zeros((8 + i, 8, 3), np.uint8)
            )
            results[i] = mb.ocr(crop, timeout=30)

    threads = [threading.Thread(target=worker, args=(t,)) for t in range(15)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    mb.close()
    assert all(r is not None for r in results)
    for i, r in enumerate(results):
        if i % 7 == 0:
            assert r.startswith("[ERROR")  # sentinel contract preserved
        else:
            assert r == f"text{8 + i}"
    # Coalescing: far fewer dispatches than the 60 per-crop submissions
    assert len(dispatches) < 30, dispatches
    assert max(dispatches) > 1
