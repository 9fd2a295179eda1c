"""Orientation-rule coverage (the reference's rotation rules:
Vertical & w>h -> CW; Horizontal & h>w -> CCW, ``workers.py:318-327``).

The rule is applied host-side per crop on REAL crop dims (the round-1 bug:
a static per-bucket rule in square buckets never fired for wide crops —
ADVICE.md high #2).  These tests pin the host rule against cv2.rotate and
prove the rule still fires for crops padded into square buckets.
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax.numpy as jnp

from manga_ocr_tpu.ops import preprocess as pp
from manga_ocr_tpu.parallel import batching


def _wide_crop():
    img = np.full((40, 80, 3), 230, np.uint8)
    img[10:30, 5:75] = 0
    return img


def _tall_crop():
    return np.transpose(_wide_crop(), (1, 0, 2)).copy()


def test_orient_crop_vertical_rotates_wide():
    got = batching.orient_crop(_wide_crop(), pp.ORIENT_VERTICAL)
    ref = cv2.rotate(_wide_crop(), cv2.ROTATE_90_CLOCKWISE)
    np.testing.assert_array_equal(got, ref)


def test_orient_crop_vertical_keeps_tall():
    got = batching.orient_crop(_tall_crop(), pp.ORIENT_VERTICAL)
    np.testing.assert_array_equal(got, _tall_crop())


def test_orient_crop_horizontal_rotates_tall():
    got = batching.orient_crop(_tall_crop(), pp.ORIENT_HORIZONTAL)
    ref = cv2.rotate(_tall_crop(), cv2.ROTATE_90_COUNTERCLOCKWISE)
    np.testing.assert_array_equal(got, ref)


def test_orient_crop_none_and_auto_pass_through():
    for mode in (pp.ORIENT_AUTO, pp.ORIENT_NONE):
        np.testing.assert_array_equal(
            batching.orient_crop(_wide_crop(), mode), _wide_crop()
        )


def test_wide_crop_in_square_bucket_still_rotates():
    """Regression (ADVICE high #2): the 40x80 wide crop lands in a 128x128
    square bucket; under Vertical it must still be rotated — the decision
    must come from crop dims, not bucket dims."""
    oriented = batching.orient_crop(_wide_crop(), pp.ORIENT_VERTICAL)
    assert oriented.shape[:2] == (80, 40)  # now tall
    [batch] = batching.bucket_crops([oriented])
    assert batch.bucket_hw == (128, 128)
    np.testing.assert_array_equal(batch.sizes[0], (80, 40))
    # model input equals the raw rotated crop's own resize, padding-free
    out_bucketed = np.asarray(
        pp.model_preprocess(jnp.asarray(batch.crops), sizes=jnp.asarray(batch.sizes))
    )[0]
    out_direct = np.asarray(pp.model_preprocess(jnp.asarray(oriented[None])))[0]
    np.testing.assert_allclose(out_bucketed, out_direct, atol=1e-4)


def test_ocr_preprocess_vertical_hint_rotates_wide():
    crops = jnp.asarray(_wide_crop()[None])
    out, angles = pp.ocr_preprocess(crops, orientation=pp.ORIENT_VERTICAL)
    assert float(angles[0]) == 90.0


def test_ocr_preprocess_vertical_hint_uses_valid_extents():
    """A wide crop padded into a square bucket must still get the 90° hint
    (w>h judged on valid extents, not the bucket)."""
    [batch] = batching.bucket_crops([_wide_crop()])
    out, angles = pp.ocr_preprocess(
        jnp.asarray(batch.crops),
        orientation=pp.ORIENT_VERTICAL,
        sizes=jnp.asarray(batch.sizes),
    )
    assert float(angles[0]) == 90.0
