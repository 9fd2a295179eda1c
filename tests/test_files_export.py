"""File management + export pipeline tests."""

import os

import numpy as np
import pytest

from manga_ocr_tpu.core import files as fio
from manga_ocr_tpu.core.geometry import Rect
from manga_ocr_tpu.core.project import Project
from manga_ocr_tpu.runtime import export as ex
from manga_ocr_tpu.typeset.area import TypesetArea


def _write_img(path, color=(200, 200, 200), size=(80, 100)):
    from PIL import Image

    arr = np.zeros((*size, 3), np.uint8)
    arr[:] = color
    Image.fromarray(arr).save(path)


def test_natural_sort():
    names = ["p10.png", "p2.png", "p1.png", "cover.png"]
    assert sorted(names, key=fio.natural_sort_key) == [
        "cover.png",
        "p1.png",
        "p2.png",
        "p10.png",
    ]


def test_list_images_and_safe_open(tmp_path):
    _write_img(tmp_path / "b2.png")
    _write_img(tmp_path / "b10.jpg")
    (tmp_path / "notes.txt").write_text("x")
    imgs = fio.list_images(str(tmp_path))
    assert [os.path.basename(p) for p in imgs] == ["b2.png", "b10.jpg"]
    arr = fio.safe_open_image(imgs[0])
    assert arr is not None and arr.shape == (80, 100, 3)
    assert fio.safe_open_image(str(tmp_path / "missing.png")) is None
    # corrupt file: decoders all fail -> None
    bad = tmp_path / "bad.png"
    bad.write_bytes(b"not an image at all")
    assert fio.safe_open_image(str(bad)) is None


def test_save_image_formats(tmp_path):
    arr = np.full((20, 30, 3), 100, np.uint8)
    for fmt in ("PNG", "JPG", "WEBP"):
        p = str(tmp_path / f"out.{fmt.lower()}")
        fio.save_image(p, arr, fmt)
        assert os.path.getsize(p) > 0


def test_pdf_page_key_roundtrip():
    key = fio.pdf_page_key("/a/b.pdf", 3)
    assert fio.parse_pdf_page_key(key) == ("/a/b.pdf", 3)
    assert fio.parse_pdf_page_key("/plain.png") is None


def test_pdf_raster_unavailable_raises(tmp_path):
    with pytest.raises(fio.PdfSupportUnavailable):
        fio.pdf_page_count(str(tmp_path / "x.pdf"))


def test_batch_save_and_pdf_export(tmp_path):
    p1, p2 = str(tmp_path / "page1.png"), str(tmp_path / "page2.png")
    _write_img(p1)
    _write_img(p2)
    proj = Project()
    proj.add_area(p1, TypesetArea(rect=Rect(10, 10, 60, 40), text="Hi"), push_undo=False)
    proj.add_area(p2, TypesetArea(rect=Rect(10, 10, 60, 40), text="Yo"), push_undo=False)
    calls = []
    written = ex.batch_save(proj, progress=lambda i, n, p: calls.append((i, n)))
    assert sorted(os.path.basename(w) for w in written) == [
        "page1_typeset.png",
        "page2_typeset.png",
    ]
    assert calls[-1][0] == 2
    pdf = str(tmp_path / "book.pdf")
    ex.export_pdf(proj, pdf)
    assert os.path.getsize(pdf) > 500
    with open(pdf, "rb") as f:
        assert f.read(5) == b"%PDF-"


def test_export_empty_project_raises(tmp_path):
    with pytest.raises(ValueError):
        ex.export_pdf(Project(), str(tmp_path / "x.pdf"))
