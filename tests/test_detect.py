"""Detection stack tests: U-Net graph, contours, post-processing, crop jobs."""

import numpy as np
import pytest

import jax

from manga_ocr_tpu.core.geometry import Rect, polygon_bounding_rect, polygon_from_rect
from manga_ocr_tpu.detect import contours as cont
from manga_ocr_tpu.detect import postprocess as post
from manga_ocr_tpu.detect.detector import BubbleDetector, crops_from_detections
from manga_ocr_tpu.models import detector as seg


def test_unet_shapes():
    cfg = seg.DetectorConfig(input_size=64, base_channels=4, depth=2)
    params = seg.init_params(cfg, jax.random.PRNGKey(0))
    pages = np.random.default_rng(0).integers(0, 255, size=(2, 100, 80, 3)).astype(np.uint8)
    import jax.numpy as jnp

    masks = np.asarray(seg.segment_pages(params, jnp.asarray(pages), cfg, 100, 80))
    assert masks.shape == (2, 100, 80)
    assert set(np.unique(masks)).issubset({0, 255})


def test_unet_save_load_roundtrip(tmp_path):
    cfg = seg.DetectorConfig(input_size=32, base_channels=4, depth=2)
    params = seg.init_params(cfg, jax.random.PRNGKey(0))
    path = str(tmp_path / "det.npz")
    seg.save_params(params, path)
    loaded = seg.load_params(path, cfg)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_mask_to_polygons_pure_python_matches_cv2():
    mask = np.zeros((60, 80), np.uint8)
    mask[10:30, 10:40] = 255
    mask[40:55, 50:75] = 255
    ref = cont.mask_to_polygons(mask)
    pure = cont._trace_external_contours(mask)
    assert len(ref) == len(pure) == 2
    for polys in (ref, pure):
        rects = sorted(
            (polygon_bounding_rect(p) for p in polys), key=lambda r: r.top
        )
        assert (rects[0].x, rects[0].y) == (10, 10)
        assert (rects[1].x, rects[1].y) == (50, 40)


def test_fill_polygon_pure_matches_cv2():
    poly = np.array([[5, 5], [40, 8], [35, 30], [8, 25]], np.int32)
    m1 = np.zeros((40, 50), np.uint8)
    m2 = np.zeros((40, 50), np.uint8)
    cont.fill_polygon(m1, poly)  # cv2 path
    # force pure path
    has = cont.HAS_CV2
    cont.HAS_CV2 = False
    try:
        cont.fill_polygon(m2, poly)
    finally:
        cont.HAS_CV2 = has
    # boundaries can differ by a pixel; interiors must agree
    disagree = np.mean(m1 != m2)
    assert disagree < 0.03


def test_classical_bubble_finder_finds_drawn_bubble():
    cv2 = pytest.importorskip("cv2")
    page = np.full((200, 200, 3), 200, np.uint8)
    # bubble must fit inside the text rect + 25px search pad (reference rule)
    cv2.circle(page, (100, 100), 35, (255, 255, 255), -1)  # bubble
    cv2.circle(page, (100, 100), 35, (0, 0, 0), 3)  # outline
    cv2.putText(page, "AA", (82, 108), cv2.FONT_HERSHEY_SIMPLEX, 0.8, (0, 0, 0), 2)
    mask = cont.find_speech_bubble_mask_contour(page, Rect(78, 88, 44, 24))
    assert mask is not None
    assert mask[100, 100] == 255 and mask[5, 5] == 0
    # mask roughly circle-sized
    area = (mask > 0).sum()
    assert 0.5 * np.pi * 35**2 < area < 1.6 * np.pi * 35**2


def test_filter_detection_noise():
    img_shape = (500, 500)
    big = polygon_from_rect(Rect(10, 10, 100, 50))
    tiny = polygon_from_rect(Rect(0, 0, 3, 3))
    items = [
        ("hello world", big),
        ("", big),
        ("!!!", big),
        ("ok", tiny),
        ("whole page", polygon_from_rect(Rect(0, 0, 499, 499))),
    ]
    out = post.filter_detection_noise(items, img_shape)
    assert [t for t, _ in out] == ["hello world"]


def test_merge_text_boxes():
    img_shape = (1000, 1000)
    a = ("line one", polygon_from_rect(Rect(100, 100, 200, 30)))
    b = ("line two", polygon_from_rect(Rect(100, 134, 200, 30)))  # adjacent below
    c = ("far away", polygon_from_rect(Rect(800, 900, 100, 30)))
    merged = post.merge_text_boxes_to_blocks([a, b, c], img_shape)
    texts = sorted(t for t, _ in merged)
    assert texts == ["far away", "line one line two"]


def test_split_extended_bubbles():
    wide = {"polygon": polygon_from_rect(Rect(0, 0, 300, 50)), "text": "x"}
    tall = {"polygon": polygon_from_rect(Rect(0, 0, 40, 200)), "text": "y"}
    ok = {"polygon": polygon_from_rect(Rect(0, 0, 100, 100)), "text": "z"}
    out = post.split_extended_bubbles([wide, tall, ok])
    assert len(out) == 5
    assert sum(1 for d in out if d["text"] is None) == 4


def test_crops_from_detections_masks_outside():
    page = np.full((100, 100, 3), 50, np.uint8)
    tri = np.array([[10, 10], [60, 10], [10, 60]], np.int32)
    crops, jobs = crops_from_detections(page, [{"polygon": tri, "text": None}])
    assert len(crops) == 1
    crop = crops[0]
    assert crop[2, 2].tolist() == [50, 50, 50]  # inside triangle
    assert crop[-2, -2].tolist() == [255, 255, 255]  # outside -> white


def test_detector_end_to_end_random_weights():
    cfg = seg.DetectorConfig(input_size=64, base_channels=4, depth=2)
    det = BubbleDetector(seg.init_params(cfg, jax.random.PRNGKey(0)), cfg)
    page = np.random.default_rng(1).integers(0, 255, size=(120, 90, 3)).astype(np.uint8)
    dets = det.detect_bubbles(page)
    assert isinstance(dets, list)  # random weights: any count, valid schema
    for d in dets:
        assert d["text"] is None and d["polygon"].ndim == 2


def test_split_extended_bubbles_odd_size_covers_every_column():
    det = [{"polygon": polygon_from_rect(Rect(10, 20, 301, 40)), "text": "x"}]
    out = post.split_extended_bubbles(det, split_threshold=4.0)
    assert len(out) == 2
    r1 = polygon_bounding_rect(out[0]["polygon"])
    r2 = polygon_bounding_rect(out[1]["polygon"])
    assert r1.left == 10 and r1.w == 150
    assert r2.left == 160 and r2.w == 151  # remainder column kept
    assert r1.right + 1 == r2.left and r2.right == Rect(10, 20, 301, 40).right


def test_classical_finder_bubble_touching_border():
    """The search-window slice must keep its inclusive last row/col so a
    bubble outline on the page border isn't cut (regression)."""
    img = np.full((120, 120, 3), 255, np.uint8)
    # bubble outline flush against the bottom-right page corner
    img[60:120, 60:120] = 255
    for t in range(3):  # thick dark outline
        img[60 + t, 60:120] = 30
        img[119 - t, 60:120] = 30
        img[60:120, 60 + t] = 30
        img[60:120, 119 - t] = 30
    mask = cont.find_speech_bubble_mask_contour(
        img, Rect(80, 80, 20, 20), padding=25
    )
    assert mask is not None
    assert mask.sum() > 0
