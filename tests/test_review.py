"""Scene + review workflow tests (offline fake transports)."""

import json

import numpy as np

from manga_ocr_tpu.core.geometry import Rect, polygon_from_rect
from manga_ocr_tpu.core.project import Project
from manga_ocr_tpu.core.review import (
    SceneManager,
    apply_review_suggestions,
    run_review_pass,
)
from manga_ocr_tpu.core.settings import Settings
from manga_ocr_tpu.translate.service import TranslationService
from manga_ocr_tpu.typeset.area import TypesetArea
from manga_ocr_tpu.utils.http import HttpResponse


def _project_with_history(n=3):
    proj = Project()
    for i in range(n):
        area = TypesetArea(rect=Rect(0, i * 50, 100, 40), text=f"tr{i}")
        proj.add_area("p.png", area, push_undo=False)
        proj.register_history_entry("p.png", area, f"orig{i}", f"tr{i}")
    return proj


def _svc(reply_text):
    s = Settings()
    s.add_key("gemini", "k")

    def transport(url, data, headers, timeout):
        body = {"candidates": [{"content": {"parts": [{"text": reply_text}]}}]}
        return HttpResponse(200, json.dumps(body).encode())

    return TranslationService(s, transport=transport)


def test_scene_create_revise_apply():
    proj = _project_with_history(2)
    mgr = SceneManager(proj)
    ids = [e["id"] for e in proj.history_entries]
    mgr.create_scene("chapter1", ids)
    assert proj.scene_order == ["chapter1"]

    svc = _svc("[Text 1]\nBetter zero\n[Text 2]\nBetter one")
    revised = mgr.revise_with_ai("chapter1", svc)
    assert [r[1] for r in revised] == ["Better zero", "Better one"]
    updated = mgr.apply_to_areas("chapter1")
    assert updated == 2
    texts = [a.text for a in proj.image_state("p.png").areas]
    assert texts == ["Better zero", "Better one"]


def test_scene_delete():
    proj = _project_with_history(1)
    mgr = SceneManager(proj)
    mgr.create_scene("s", [proj.history_entries[0]["id"]])
    mgr.delete_scene("s")
    assert proj.scenes == {} and proj.scene_order == []


def test_review_pass_and_apply():
    proj = _project_with_history(2)
    reply = json.dumps(
        [
            {"index": 0, "verdict": "fix", "suggestion": "fixed zero"},
            {"index": 1, "verdict": "ok", "suggestion": ""},
        ]
    )
    svc = _svc(reply)
    records = run_review_pass(proj, svc, mode="proofread")
    assert len(records) == 2
    assert proj.proofreader_entries == records
    applied = apply_review_suggestions(proj, records)
    assert applied == 1
    assert proj.image_state("p.png").areas[0].text == "fixed zero"
    assert proj.image_state("p.png").areas[1].text == "tr1"


def test_review_pass_quality_mode_records_separately():
    proj = _project_with_history(1)
    svc = _svc(json.dumps([{"index": 0, "verdict": "ok", "suggestion": ""}]))
    run_review_pass(proj, svc, mode="quality")
    assert len(proj.quality_entries) == 1 and proj.proofreader_entries == []


def test_scene_survives_project_roundtrip(tmp_path):
    from manga_ocr_tpu.core.project import load_project, save_project

    proj = _project_with_history(1)
    SceneManager(proj).create_scene("s1", [proj.history_entries[0]["id"]])
    path = str(tmp_path / "p.json")
    save_project(proj, path)
    loaded = load_project(path)
    assert "s1" in loaded.scenes and loaded.scene_order == ["s1"]
