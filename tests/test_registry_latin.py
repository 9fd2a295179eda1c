"""Latin-engine dispatch rules: preprocessing + raw-crop retry."""

import numpy as np

from manga_ocr_tpu.engine.registry import EngineRegistry


class RecordingEngine:
    def __init__(self, replies):
        self.replies = list(replies)
        self.images = []

    def perform_ocr(self, image, settings=None):
        self.images.append(image.copy())
        return self.replies.pop(0)


def _crop():
    rng = np.random.default_rng(0)
    img = np.full((40, 60, 3), 240, np.uint8)
    img[15:25, 10:50] = 0
    noise = rng.integers(-8, 8, size=img.shape).astype(np.int16)
    return np.clip(img.astype(np.int16) + noise, 0, 255).astype(np.uint8)


def test_latin_engine_gets_binarized_input():
    eng = RecordingEngine(["hello"])
    reg = EngineRegistry()
    reg.register("Tesseract", eng)
    out = reg.perform_ocr(_crop(), {"ocr_engine": "Tesseract", "ocr_lang": "en"})
    assert out == "hello"
    seen = eng.images[0]
    assert set(np.unique(seen)).issubset({0, 255})  # binarized


def test_latin_empty_result_retries_raw():
    eng = RecordingEngine(["", "raw worked"])
    reg = EngineRegistry()
    reg.register("Tesseract", eng)
    out = reg.perform_ocr(_crop(), {"ocr_engine": "Tesseract", "ocr_lang": "en"})
    assert out == "raw worked"
    assert len(eng.images) == 2
    # second call got the raw (non-binary) crop
    assert len(np.unique(eng.images[1])) > 2


def test_manga_ocr_gets_raw_crop():
    eng = RecordingEngine(["jp"])
    reg = EngineRegistry()
    reg.register("Manga-OCR", eng)
    reg.perform_ocr(_crop(), {"ocr_engine": "Manga-OCR", "ocr_lang": "ja"})
    assert len(np.unique(eng.images[0])) > 2  # untouched


def test_latin_vertical_rotates_in_frame_like_reference():
    """The Latin 'Vertical' rule is the reference's preprocess_for_ocr:
    +90 CCW in the SAME (h, w) frame (clipping), NOT the frame-swapping
    manga-ocr rule (regression: host-side rot90 produced a (w, h) frame
    rotated the opposite way)."""
    import jax.numpy as jnp

    from manga_ocr_tpu.engine.registry import _latin_preprocess
    from manga_ocr_tpu.ops import preprocess as pp
    from manga_ocr_tpu.parallel import batching

    rng = np.random.default_rng(2)
    wide = rng.integers(0, 255, size=(40, 90, 3)).astype(np.uint8)
    out = _latin_preprocess(wide, {"orientation": "Vertical"})
    assert out.shape[:2] == (40, 90)  # frame preserved (reference warpAffine)
    # and it is exactly the graph's faithful ORIENT_VERTICAL branch
    [batch] = batching.bucket_crops([wide])
    ref, _ = pp.ocr_preprocess(
        jnp.asarray(batch.crops), orientation=pp.ORIENT_VERTICAL,
        sizes=jnp.asarray(batch.sizes),
    )
    np.testing.assert_array_equal(out, np.asarray(ref[0, :40, :90]))
