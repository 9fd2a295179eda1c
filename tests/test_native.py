"""Native C++ host-ops: build, bindings, parity vs cv2/NumPy references."""

import numpy as np
import pytest

from manga_ocr_tpu import native
from manga_ocr_tpu.core.geometry import polygon_bounding_rect


@pytest.fixture(scope="module")
def lib():
    lib = native.load()
    if lib is None:
        pytest.fail("native library failed to build — g++ toolchain expected")
    return lib


def test_trace_contours_matches_cv2(lib):
    cv2 = pytest.importorskip("cv2")
    mask = np.zeros((80, 100), np.uint8)
    mask[10:30, 10:40] = 255
    mask[50:70, 60:90] = 255
    got = native.trace_external_contours(mask)
    ref, _ = cv2.findContours(mask, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
    assert len(got) == len(ref) == 2
    got_rects = sorted(
        ((r.x, r.y, r.w, r.h) for r in map(polygon_bounding_rect, got))
    )
    ref_rects = sorted(
        ((r.x, r.y, r.w, r.h) for r in map(
            polygon_bounding_rect, (c.reshape(-1, 2) for c in ref)
        ))
    )
    assert got_rects == ref_rects


def test_fill_polygon_matches_cv2(lib):
    cv2 = pytest.importorskip("cv2")
    poly = np.array([[5, 5], [45, 10], [40, 35], [10, 30]], np.int32)
    m_native = np.zeros((40, 50), np.uint8)
    m_cv = np.zeros((40, 50), np.uint8)
    assert native.fill_polygon(m_native, poly)
    cv2.drawContours(m_cv, [poly.reshape(-1, 1, 2)], -1, 255, -1)
    assert np.mean(m_native != m_cv) < 0.03  # boundary pixels may differ


def test_dilate_matches_cv2(lib):
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(0)
    mask = (rng.uniform(size=(60, 70)) > 0.95).astype(np.uint8) * 255
    got = native.dilate_box(mask, 3)
    k = cv2.getStructuringElement(cv2.MORPH_RECT, (7, 7))
    ref = cv2.dilate(mask, k)
    np.testing.assert_array_equal(got, ref)


def test_trace_handles_empty_and_full(lib):
    assert native.trace_external_contours(np.zeros((10, 10), np.uint8)) == []
    full = native.trace_external_contours(np.full((10, 10), 255, np.uint8))
    assert len(full) == 1


def test_fill_clamps_out_of_bounds(lib):
    m = np.zeros((20, 20), np.uint8)
    poly = np.array([[-5, -5], [30, -5], [30, 30], [-5, 30]], np.int32)
    assert native.fill_polygon(m, poly)
    assert m.all()  # whole mask filled, no crash
