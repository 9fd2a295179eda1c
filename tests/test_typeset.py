"""Typesetting tests: area payload roundtrip, cleanup, rendering."""

import numpy as np
import pytest

from manga_ocr_tpu.core.geometry import Rect, polygon_from_rect
from manga_ocr_tpu.typeset import cleanup as cl
from manga_ocr_tpu.typeset.area import TypesetArea
from manga_ocr_tpu.typeset.render import draw_single_area, render_page


def _page(h=200, w=200, color=(230, 230, 230)):
    page = np.zeros((h, w, 3), np.uint8)
    page[:] = color
    return page


def test_area_payload_roundtrip():
    area = TypesetArea(
        rect=Rect(10, 20, 100, 50),
        text="Hello",
        color="#112233",
        orientation="vertical",
        bubble_enabled=True,
        text_outline=True,
        rotation=12.5,
        overrides={"use_inpaint": False},
    )
    payload = area.to_payload()
    back = TypesetArea.from_payload(payload)
    assert back.rect == area.rect
    assert back.text == "Hello"
    assert back.color == "#112233"
    assert back.orientation == "vertical"
    assert back.overrides == {"use_inpaint": False}
    assert back.rotation == 12.5
    # payload keys match the reference schema (interop contract)
    for key in (
        "rect", "cleanup_rect", "text", "font", "color", "polygon",
        "cleanup_polygon", "orientation", "effect", "bubble_enabled",
        "segments", "text_outline", "alignment", "line_spacing",
        "char_spacing", "rotation", "margins", "overrides",
        "gradient_enabled",
    ):
        assert key in payload, key


def test_area_payload_tolerates_garbage():
    area = TypesetArea.from_payload({"rect": {"x": "nan", "w": None}, "font": "bad"})
    assert area.rect.w == 0
    assert area.font["family"] == "Arial"
    assert TypesetArea.from_payload("not a dict").text == ""


def test_background_color_estimation():
    page = _page(color=(200, 210, 220))
    page[40:60, 40:120] = (10, 10, 10)  # dark text strokes (minority)
    color = cl.get_background_color(page, Rect(30, 30, 120, 60))
    assert all(abs(c - e) < 12 for c, e in zip(color, (200, 210, 220)))


def test_auto_text_color():
    dark = _page(color=(20, 20, 20))
    light = _page(color=(240, 240, 240))
    assert cl.auto_text_color(dark, Rect(0, 0, 100, 100)) == "#ffffff"
    assert cl.auto_text_color(light, Rect(0, 0, 100, 100)) == "#000000"


def test_erase_area_inpaint_removes_text():
    page = _page(color=(250, 250, 250))
    page[90:110, 50:150] = (0, 0, 0)  # "text"
    poly = polygon_from_rect(Rect(45, 85, 110, 30))
    out = cl.erase_area(page, poly, Rect(45, 85, 110, 30))
    assert out[100, 100].mean() > 200  # erased to background
    assert out[10, 10].tolist() == [250, 250, 250]  # untouched elsewhere


def test_erase_area_background_box():
    page = _page(color=(250, 250, 250))
    page[90:110, 50:150] = (0, 0, 0)
    # cleanup rect large enough that background (not text) is the majority
    poly = polygon_from_rect(Rect(40, 70, 120, 60))
    out = cl.erase_area(
        page, poly, Rect(40, 70, 120, 60), use_inpaint=False, use_background_box=True
    )
    assert out[100, 100].mean() > 150


def test_draw_single_area_renders_text_pixels():
    page = _page()
    area = TypesetArea(rect=Rect(20, 20, 160, 80), text="HELLO WORLD", color="#000000")
    out = draw_single_area(page, area, do_cleanup=False)
    region = out[20:100, 20:180]
    assert (region < 100).any()  # some dark text pixels appeared
    assert out.shape == page.shape and out.dtype == np.uint8


def test_draw_vertical_text():
    page = _page()
    area = TypesetArea(
        rect=Rect(60, 10, 80, 180), text="こんにちは", orientation="vertical"
    )
    out = draw_single_area(page, area, do_cleanup=False)
    assert (out[10:190, 60:140] < 100).any()


def test_bubble_and_rotation():
    page = _page()
    area = TypesetArea(
        rect=Rect(40, 40, 120, 100),
        text="Hi",
        bubble_enabled=True,
        bubble_fill="#ffffff",
        rotation=15.0,
    )
    out = draw_single_area(page, area, do_cleanup=False)
    assert out[90, 100].tolist() == [255, 255, 255]  # bubble interior


def test_render_page_multiple_areas():
    page = _page(300, 300)
    areas = [
        TypesetArea(rect=Rect(10, 10, 120, 60), text="one"),
        TypesetArea(rect=Rect(150, 200, 120, 60), text="two"),
    ]
    out = render_page(page, areas)
    assert out.shape == page.shape


def test_gradient_fill_changes_glyph_colors():
    page = _page()
    area = TypesetArea(
        rect=Rect(10, 10, 180, 80),
        text="GRADIENT",
        gradient_enabled=True,
        gradient_colors=["#ff0000", "#0000ff"],
        gradient_angle=0.0,
    )
    out = draw_single_area(page, area, do_cleanup=False)
    region = out[10:90, 10:190]
    # text pixels exist and are not monochrome black: red-ish on the left,
    # blue-ish on the right (BGR layout)
    colored = region[(region.sum(-1) < 650) & (region.sum(-1) > 30)]
    assert len(colored) > 0


def test_text_effects_render():
    page = _page()
    for effect in ("curved", "wavy", "jagged"):
        area = TypesetArea(
            rect=Rect(10, 60, 180, 80),
            text="WAVY TEXT",
            effect=effect,
            effect_intensity=6.0,
        )
        out = draw_single_area(page, area, do_cleanup=False)
        assert (out[40:160, 10:190] < 100).any(), effect


def test_effect_offsets():
    from manga_ocr_tpu.typeset.render import _effect_offset

    assert _effect_offset("curved", 0.0, 10, 0) == 0.0
    assert _effect_offset("curved", 0.5, 10, 0) == -10.0
    assert abs(_effect_offset("wavy", 0.25, 10, 0) - 10.0) < 1e-9
    assert _effect_offset("jagged", 0.1, 5, 0) == -5
    assert _effect_offset("jagged", 0.1, 5, 1) == 5
    assert _effect_offset("none", 0.5, 10, 0) == 0.0


def test_zero_outline_width_roundtrips():
    """bubble_outline_width=0.0 (outline removed) must survive save/load
    (regression: falsy-zero default resurrection)."""
    area = TypesetArea(
        Rect(0, 0, 10, 10), "t", bubble_enabled=True, bubble_outline_width=0.0
    )
    p = area.to_payload()
    assert p["bubble_outline_width"] == 0.0
    assert TypesetArea.from_payload(p).bubble_outline_width == 0.0
