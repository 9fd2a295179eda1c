"""Runtime pipeline + project persistence tests."""

import threading
import time

import numpy as np
import pytest

from manga_ocr_tpu.core.geometry import Rect, polygon_from_rect
from manga_ocr_tpu.core.project import (
    AutoSaver,
    ImageState,
    Project,
    load_project,
    save_project,
)
from manga_ocr_tpu.runtime.pipeline import (
    JobResult,
    MicroBatcher,
    OcrJob,
    PagePipeline,
    create_typeset_area,
)
from manga_ocr_tpu.typeset.area import TypesetArea


def _job(i=0, pre_text=None):
    return OcrJob(
        image_path="page.png",
        rect=Rect(10 * i, 0, 50, 40),
        polygon=polygon_from_rect(Rect(10 * i, 0, 50, 40)),
        cropped_image=np.full((40, 50, 3), 200 + i, np.uint8),
        settings={"use_inpaint": False},
        pre_text=pre_text,
    )


# -- microbatcher ---------------------------------------------------------------


def test_microbatcher_coalesces():
    batches = []

    def batch_fn(crops):
        batches.append(len(crops))
        return [f"t{i}" for i in range(len(crops))]

    mb = MicroBatcher(batch_fn, window_ms=50)
    futs = [mb.submit(np.zeros((4, 4, 3), np.uint8)) for _ in range(5)]
    out = [f.result(5) for f in futs]
    mb.close()
    assert len(out) == 5
    assert max(batches) >= 2  # at least some coalescing happened


def test_microbatcher_propagates_errors():
    def batch_fn(crops):
        raise ValueError("boom")

    mb = MicroBatcher(batch_fn, window_ms=5)
    with pytest.raises(ValueError):
        mb.ocr(np.zeros((4, 4, 3), np.uint8), timeout=5)
    mb.close()


# -- page pipeline -----------------------------------------------------------------


def test_pipeline_basic_flow():
    def ocr_page(crops):
        return [f"text{k}" for k in range(len(crops))]

    def translate(text, settings):
        return f"EN[{text}]"

    pipe = PagePipeline(ocr_page, translate=translate)
    results = pipe.process_jobs([_job(0), _job(1)])
    assert [r.original_text for r in results] == ["text0", "text1"]
    assert [r.translated_text for r in results] == ["EN[text0]", "EN[text1]"]
    assert all(isinstance(r.area, TypesetArea) for r in results)
    assert results[0].area.get_override("use_inpaint") is False


def test_pipeline_pre_text_skips_ocr():
    calls = []

    def ocr_page(crops):
        calls.append(len(crops))
        return ["x"] * len(crops)

    pipe = PagePipeline(ocr_page, translate=lambda t, s: t.upper())
    results = pipe.process_jobs([_job(0, pre_text="given"), _job(1)])
    assert calls == [1]  # only one crop OCR'd
    assert results[0].original_text == "given"
    assert results[0].translated_text == "GIVEN"


def test_pipeline_enhanced_dual_pass():
    def dual(crops):
        return [("longer raw text", "short")] * len(crops)

    captured = {}

    def translate(text, settings):
        captured.update(settings)
        return "merged!"

    pipe = PagePipeline(lambda c: ["?"] * len(c), translate=translate, dual_pass=dual)
    results = pipe.process_jobs([_job(0)], enhanced=True)
    assert results[0].original_text == "longer raw text"
    assert captured.get("is_enhanced") is True
    assert "manga_ocr" in captured.get("ocr_results", {})


def test_pipeline_error_sentinel_propagates():
    pipe = PagePipeline(lambda c: ["[ERROR: broken]"] * len(c))
    results = pipe.process_jobs([_job(0)])
    assert results[0].error == "[ERROR: broken]"
    assert results[0].area is None


def test_pipeline_batch_translate_path():
    def batch_translate(texts, settings):
        return [f"B[{t}]" for t in texts]

    pipe = PagePipeline(
        lambda c: [f"o{k}" for k in range(len(c))], translate_batch=batch_translate
    )
    results = pipe.process_jobs([_job(0), _job(1)])
    assert [r.translated_text for r in results] == ["B[o0]", "B[o1]"]


# -- project persistence ---------------------------------------------------------------


def test_project_roundtrip(tmp_path):
    proj = Project(project_dir=str(tmp_path))
    area = create_typeset_area(_job(0), "Hello", "こんにちは")
    proj.add_area("page.png", area)
    proj.register_history_entry("page.png", area, "こんにちは", "Hello")
    path = str(tmp_path / "proj.json")
    save_project(proj, path)
    loaded = load_project(path)
    assert loaded.history_counter == 1
    st = loaded.image_state("page.png")
    assert len(st.areas) == 1
    assert st.areas[0].text == "Hello"
    assert st.areas[0].original_text == "こんにちは"
    assert loaded.history_entries[0]["translated"] == "Hello"


def test_undo_redo():
    proj = Project()
    a1 = create_typeset_area(_job(0), "one", "1")
    a2 = create_typeset_area(_job(1), "two", "2")
    proj.add_area("p", a1)
    proj.add_area("p", a2)
    st = proj.image_state("p")
    assert len(st.areas) == 2
    assert st.undo() and len(st.areas) == 1
    assert st.undo() and len(st.areas) == 0
    assert not st.undo()
    assert st.redo() and len(st.areas) == 1
    assert st.redo() and st.areas[1].text == "two"


def test_legacy_migration():
    legacy = {
        "schema_version": 1,
        "areas_by_image": {"p.png": [{"rect": {"x": 1, "y": 2, "w": 3, "h": 4}, "text": "t"}]},
    }
    proj = Project.from_payload(legacy)
    assert proj.image_state("p.png").areas[0].text == "t"


def test_autosaver(tmp_path):
    proj = Project()
    path = str(tmp_path / "auto.json")
    saver = AutoSaver(lambda: proj, path, interval_ms=5000)  # floor is 5s
    saver.interval_s = 0.05  # accelerate for the test
    saver.start()
    time.sleep(0.2)
    saver.stop()
    loaded = load_project(path)
    assert loaded.to_payload()["schema_version"] == 2


def test_process_pages_overlapped():
    import numpy as np

    from manga_ocr_tpu.core.geometry import Rect, polygon_from_rect

    def detect(page):
        h, w = page.shape[:2]
        return [{"polygon": polygon_from_rect(Rect(0, 0, w // 2, h // 2)), "text": None}]

    def ocr_page(crops):
        return [f"t{i}" for i in range(len(crops))]

    pipe = PagePipeline(ocr_page, translate=lambda t, s: t.upper())
    pages = [
        ("a.png", np.full((40, 40, 3), 200, np.uint8)),
        ("b.png", np.full((60, 60, 3), 100, np.uint8)),
    ]
    seen = []
    out = pipe.process_pages(pages, detect, on_page=lambda p, r: seen.append(p))
    assert sorted(out) == ["a.png", "b.png"]
    assert seen == ["a.png", "b.png"]
    assert out["a.png"][0].translated_text == "T0"


def test_microbatcher_cancelled_future_does_not_poison_batch():
    """A caller cancelling its queued future must not corrupt batchmates'
    results (regression: set_result on a cancelled future raised
    InvalidStateError and the handler then failed the whole batch)."""
    release = threading.Event()

    def batch_fn(crops):
        return [f"ok{i}" for i in range(len(crops))]

    mb = MicroBatcher(batch_fn, window_ms=80)
    # first submit wakes the drain thread; grace window coalesces the rest
    futs = [mb.submit(np.zeros((4, 4, 3), np.uint8)) for _ in range(4)]
    cancelled = futs[1].cancel()  # may race the dispatch; either way no poison
    out = [f.result(5) for j, f in enumerate(futs) if not (j == 1 and cancelled)]
    mb.close()
    assert all(o.startswith("ok") for o in out)


def test_pipeline_error_sentinel_not_translated():
    """OCR failures must not be sent to the translator (wasted call,
    garbage 'translation')."""
    seen = []

    def ocr_page(crops):
        return ["[ERROR: boom]"] + ["text"] * (len(crops) - 1)

    def translate(text, settings):
        seen.append(text)
        return f"T({text})"

    pipe = PagePipeline(ocr_page, translate=translate)
    results = pipe.process_jobs([_job(0), _job(1)])
    pipe.close()
    assert results[0].error == "[ERROR: boom]"
    assert results[0].area is None
    assert results[1].translated_text == "T(text)"
    assert seen == ["text"]


def test_pipeline_batch_translate_skips_error_sentinels():
    calls = []

    def ocr_page(crops):
        return ["[ERROR: boom]", "good"]

    def translate_batch(texts, settings):
        calls.append(list(texts))
        return [f"B({t})" for t in texts]

    pipe = PagePipeline(ocr_page, translate_batch=translate_batch)
    results = pipe.process_jobs([_job(0), _job(1)])
    pipe.close()
    assert calls == [["good"]]
    assert results[1].translated_text == "B(good)"
    assert results[0].error == "[ERROR: boom]"


def test_project_pdf_page_zero_survives_roundtrip(tmp_path):
    """current_pdf_page=0 is a valid page and must not collapse to the -1
    sentinel on load (regression: falsy-zero coercion)."""
    proj = Project(project_dir=str(tmp_path), current_pdf_page=0)
    path = str(tmp_path / "p.json")
    save_project(proj, path)
    assert load_project(path).current_pdf_page == 0
