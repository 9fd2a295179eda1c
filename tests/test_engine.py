"""Engine-layer contract tests (batched page OCR + reference-compatible
single-crop entry)."""

import numpy as np
import pytest

import jax

from manga_ocr_tpu.engine import TpuMangaOcrEngine
from manga_ocr_tpu.models import model as mdl
from manga_ocr_tpu.models.config import MangaOCRConfig
from manga_ocr_tpu.models.tokenizer import CharTokenizer
from manga_ocr_tpu.parallel import batching


@pytest.fixture(scope="module")
def engine():
    cfg = MangaOCRConfig.tiny()
    params = mdl.init_params(cfg, jax.random.PRNGKey(0))
    tok = CharTokenizer.synthetic()
    # tiny vocab (100) < synthetic vocab; decode clamps out-of-range ids
    import jax.numpy as jnp

    return TpuMangaOcrEngine(params, cfg, tok, max_length=8, dtype=jnp.float32)


def _crop(h, w, seed=0):
    return np.random.default_rng(seed).integers(0, 255, size=(h, w, 3)).astype(np.uint8)


def test_bucketing_roundtrip():
    crops = [_crop(40, 60), _crop(300, 90), _crop(100, 400), _crop(40, 60, 1)]
    batches = batching.bucket_crops(crops)
    # scatter identity check
    results = [[f"b{bi}_r{ri}" for ri in range(b.valid)] for bi, b in enumerate(batches)]
    flat = batching.scatter_results(batches, results)
    assert len(flat) == 4 and all(r is not None for r in flat)
    # batch rows padded to schedule
    for b in batches:
        assert b.crops.shape[0] in batching.BATCH_SCHEDULE
        assert b.crops.shape[1:3] == b.bucket_hw


def test_ocr_page_returns_text_per_crop(engine):
    crops = [_crop(40, 60), _crop(64, 48, 1), _crop(30, 30, 2)]
    texts = engine.ocr_page(crops)
    assert len(texts) == 3
    assert all(isinstance(t, str) for t in texts)


def test_ocr_page_consistent_with_single(engine):
    """A crop OCR'd alone and inside a page batch must give the same text
    (padding rows must not affect real rows)."""
    crop = _crop(48, 48, 3)
    alone = engine.ocr_page([crop])[0]
    batched = engine.ocr_page([crop, _crop(48, 48, 4), _crop(48, 48, 5)])[0]
    assert alone == batched


def test_perform_ocr_contract(engine):
    out = engine.perform_ocr(_crop(40, 60), {"orientation": "Vertical"})
    assert isinstance(out, str) and not out.startswith("[ERROR")
    # sentinel error contract
    assert engine.perform_ocr(np.zeros((0, 0, 3), np.uint8)).startswith("[ERROR")
    assert engine.perform_ocr(None).startswith("[ERROR")
    # gray input is upgraded to 3 channels
    out = engine.perform_ocr(np.full((32, 32), 128, np.uint8))
    assert isinstance(out, str) and not out.startswith("[ERROR")


def test_dual_pass(engine):
    pairs = engine.ocr_page_dual([_crop(40, 60), _crop(64, 48, 1)])
    assert len(pairs) == 2
    assert all(len(p) == 2 for p in pairs)


def test_wide_crop_rotates_for_vertical(engine):
    """Vertical orientation + wide crop should not error (rot90 path)."""
    out = engine.ocr_page([_crop(40, 120)])
    assert len(out) == 1
