"""Text-mode detection tests (proposals, refinement, batched re-OCR)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from manga_ocr_tpu.core.geometry import polygon_bounding_rect
from manga_ocr_tpu.detect import text_detect as td


@pytest.fixture()
def page():
    page = np.full((300, 400, 3), 245, np.uint8)
    cv2.putText(page, "HELLO WORLD", (40, 60), cv2.FONT_HERSHEY_SIMPLEX, 1.2, (10, 10, 10), 3)
    cv2.putText(page, "SECOND LINE", (40, 100), cv2.FONT_HERSHEY_SIMPLEX, 1.2, (10, 10, 10), 3)
    cv2.putText(page, "FAR AWAY", (200, 270), cv2.FONT_HERSHEY_SIMPLEX, 1.0, (10, 10, 10), 3)
    return page


def test_proposals_cover_text(page):
    polys = td.propose_text_regions(page)
    assert len(polys) >= 2
    rects = [polygon_bounding_rect(p) for p in polys]
    # some proposal overlaps the first line
    assert any(r.top < 70 and r.bottom > 30 and r.left < 100 for r in rects)


def test_refine_tightens_to_ink(page):
    from manga_ocr_tpu.core.geometry import Rect, polygon_from_rect

    loose = polygon_from_rect(Rect(20, 20, 360, 100))
    tight = td.refine_polygon_with_image(page, loose)
    r = polygon_bounding_rect(tight)
    assert r.w <= 360 and r.h <= 100
    assert r.area < 360 * 100  # actually tightened


def test_detect_text_regions_end_to_end(page):
    calls = []

    def fake_ocr(crops):
        calls.append(len(crops))
        return [f"text region {i}" for i in range(len(crops))]

    items = td.detect_text_regions(page, fake_ocr)
    assert len(calls) == 1  # single batched dispatch
    assert calls[0] >= 2
    assert all(isinstance(t, str) and len(p) >= 4 for t, p in items)
    # merge pulled the two adjacent lines together or kept them; either way
    # results are non-empty and filtered
    assert 1 <= len(items) <= calls[0]


def test_error_sentinels_filtered(page):
    items = td.detect_text_regions(page, lambda crops: ["[ERROR: x]"] * len(crops))
    assert items == []


class _StubLatin:
    """detect_boxes stand-in: returns fixed word boxes in image coords."""

    def __init__(self, boxes):
        self.boxes = boxes
        self.seen = []

    def detect_boxes(self, rgb):
        self.seen.append(rgb.shape)
        return list(self.boxes)


def test_craft_proposer_groups_lines(page):
    # two words on one line + one separate lower word -> 2 line polygons
    stub = _StubLatin([(40, 40, 100, 24), (150, 42, 110, 22), (200, 250, 90, 24)])
    propose = td.craft_proposer(stub)
    polys = propose(page)
    assert len(polys) == 2
    rects = sorted((polygon_bounding_rect(p) for p in polys), key=lambda r: r.top)
    # first line spans the union of the two word boxes
    assert rects[0].left == 40 and rects[0].right >= 259
    assert rects[0].top == 40 and rects[0].bottom >= 63
    assert rects[1].top == 250
    # proposer received RGB of the same page shape
    assert stub.seen == [page.shape]


def test_craft_proposer_feeds_detection(page):
    stub = _StubLatin([(40, 40, 320, 60)])
    items = td.detect_text_regions(
        page, lambda crops: ["hello"] * len(crops), proposer=td.craft_proposer(stub)
    )
    assert len(items) == 1
    text, poly = items[0]
    assert text == "hello"
    r = polygon_bounding_rect(poly)
    assert (r.left, r.top) == (40, 40)
