"""Valid-region semantics for bucket-padded crops (ADVICE.md round-1 fixes).

Crops live padded inside fixed shape buckets; every statistic and resample
must be computed over the crop's REAL extent:

- model inputs: per-crop valid-region resize == resizing the raw crop
  (ADVICE high #1 — padding used to leak into the 224x224 model input),
- equalize/Otsu statistics masked to the valid region (ADVICE medium #4),
- oversized crops downscaled, never truncated (ADVICE medium #3).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from manga_ocr_tpu.ops import image as im
from manga_ocr_tpu.ops import preprocess as pp
from manga_ocr_tpu.parallel import batching


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _pad_into(crop, bh, bw):
    [batch] = batching.bucket_crops([crop], buckets=[(bh, bw)])
    return batch


def test_resize_valid_matches_full_resize_when_unpadded(rng):
    img = rng.integers(0, 256, size=(2, 96, 64), dtype=np.uint8)
    sizes = jnp.asarray([[96, 64], [96, 64]], jnp.int32)
    got = np.asarray(im.resize_bilinear_valid(jnp.asarray(img), sizes, 224, 224))
    ref = np.asarray(im.resize_bilinear(jnp.asarray(img), 224, 224))
    np.testing.assert_allclose(got, ref, atol=5e-3)


def test_resize_valid_ignores_padding(rng):
    """The core ADVICE high #1 regression: a 60x100 crop padded into a
    128x128 bucket must produce the same 224x224 model input as the raw
    crop resized directly."""
    crop = rng.integers(0, 256, size=(60, 100), dtype=np.uint8)
    padded = np.pad(crop, ((0, 68), (0, 28)), mode="edge")
    sizes = jnp.asarray([[60, 100]], jnp.int32)
    got = np.asarray(
        im.resize_bilinear_valid(jnp.asarray(padded[None]), sizes, 224, 224)
    )[0]
    ref = np.asarray(im.resize_bilinear(jnp.asarray(crop[None]), 224, 224))[0]
    np.testing.assert_allclose(got, ref, atol=5e-3)


def test_model_preprocess_bucket_invariant(rng):
    """The model input must be identical whichever bucket a crop lands in."""
    crop = rng.integers(0, 256, size=(60, 100, 3), dtype=np.uint8)
    outs = []
    for bh, bw in ((128, 128), (128, 256), (256, 256)):
        b = _pad_into(crop, bh, bw)
        outs.append(
            np.asarray(
                pp.model_preprocess(jnp.asarray(b.crops), sizes=jnp.asarray(b.sizes))
            )[0]
        )
    direct = np.asarray(pp.model_preprocess(jnp.asarray(crop[None])))[0]
    for out in outs:
        np.testing.assert_allclose(out, direct, atol=1e-4)


def test_masked_equalize_matches_exact_crop(rng):
    crop = rng.integers(20, 200, size=(40, 56), dtype=np.uint8)
    padded = np.pad(crop, ((0, 88), (0, 72)), mode="constant", constant_values=255)
    sizes = jnp.asarray([[40, 56]], jnp.int32)
    mask = im.valid_mask(padded[None].shape, sizes)
    got = np.asarray(im.equalize_hist_u8(jnp.asarray(padded[None]), mask))[0][:40, :56]
    ref = np.asarray(im.equalize_hist_u8(jnp.asarray(crop[None])))[0]
    np.testing.assert_array_equal(got, ref)


def test_masked_otsu_matches_exact_crop(rng):
    crop = rng.integers(0, 256, size=(40, 56), dtype=np.uint8)
    padded = np.pad(crop, ((0, 88), (0, 72)), mode="constant", constant_values=255)
    sizes = jnp.asarray([[40, 56]], jnp.int32)
    mask = im.valid_mask(padded[None].shape, sizes)
    got = float(im.otsu_threshold(jnp.asarray(padded[None]), mask)[0])
    ref = float(im.otsu_threshold(jnp.asarray(crop[None]))[0])
    assert got == ref


def test_ocr_preprocess_masked_stats_match_exact_crop(rng):
    """End-to-end: ocr_preprocess of a padded crop, cropped back to the valid
    region, equals ocr_preprocess of the exact crop (ORIENT_NONE: no
    rotation, pure statistics path)."""
    crop = rng.integers(0, 256, size=(40, 56, 3), dtype=np.uint8)
    b = _pad_into(crop, 128, 128)
    got, _ = pp.ocr_preprocess(
        jnp.asarray(b.crops), orientation=pp.ORIENT_NONE, sizes=jnp.asarray(b.sizes)
    )
    got = np.asarray(got)[0][:40, :56]
    ref, _ = pp.ocr_preprocess(jnp.asarray(crop[None]), orientation=pp.ORIENT_NONE)
    np.testing.assert_array_equal(got, np.asarray(ref)[0])


def test_oversized_crop_downscaled_not_truncated(rng):
    """ADVICE medium #3: a 1100x600 crop must be downscaled to fit the
    largest bucket with aspect preserved — not chopped at 1024x512."""
    crop = rng.integers(0, 256, size=(1100, 600, 3), dtype=np.uint8)
    [batch] = batching.bucket_crops([crop])
    h, w = batch.sizes[0]
    assert h <= 1024 and w <= 512
    # aspect preserved within rounding
    assert abs((h / w) - (1100 / 600)) < 0.05
    # content from the bottom of the crop survives (would be zeroed/cropped
    # away under truncation): compare means of the last valid rows
    tail = batch.crops[0][h - 8 : h, :w].mean()
    assert abs(tail - crop[-16:].mean()) < 30


def test_bucket_sizes_bookkeeping(rng):
    crops = [
        rng.integers(0, 256, size=(60, 100, 3), dtype=np.uint8),
        rng.integers(0, 256, size=(200, 120, 3), dtype=np.uint8),
    ]
    batches = batching.bucket_crops(crops)
    by_hw = {b.bucket_hw: b for b in batches}
    assert tuple(by_hw[(128, 128)].sizes[0]) == (60, 100)
    assert tuple(by_hw[(256, 128)].sizes[0]) == (200, 120)
    # batch-padding rows repeat the last valid row's extents
    b = by_hw[(128, 128)]
    assert (b.sizes[b.valid :] == b.sizes[b.valid - 1]).all()
