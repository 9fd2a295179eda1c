"""Orientation-rule coverage for the preprocessing graphs (the reference's
rotation rules: Vertical & w>h -> CW; Horizontal & h>w -> CCW)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax.numpy as jnp

from manga_ocr_tpu.ops import preprocess as pp


def _wide_crop():
    img = np.full((40, 80, 3), 230, np.uint8)
    img[10:30, 5:75] = 0
    return img


def _tall_crop():
    return np.transpose(_wide_crop(), (1, 0, 2)).copy()


def test_model_preprocess_vertical_rotates_wide():
    crops = jnp.asarray(_wide_crop()[None])
    out_rot = np.asarray(pp.model_preprocess(crops, orientation=pp.ORIENT_VERTICAL))
    out_none = np.asarray(pp.model_preprocess(crops, orientation=pp.ORIENT_NONE))
    # rotated version differs from unrotated (resize makes shapes equal)
    assert not np.allclose(out_rot, out_none)
    # equivalence: rotating the crop manually then ORIENT_NONE == ORIENT_VERTICAL
    manual = cv2.rotate(_wide_crop(), cv2.ROTATE_90_CLOCKWISE)
    out_manual = np.asarray(
        pp.model_preprocess(jnp.asarray(manual[None]), orientation=pp.ORIENT_NONE)
    )
    np.testing.assert_allclose(out_rot, out_manual, atol=1e-5)


def test_model_preprocess_vertical_keeps_tall():
    crops = jnp.asarray(_tall_crop()[None])
    out_rot = np.asarray(pp.model_preprocess(crops, orientation=pp.ORIENT_VERTICAL))
    out_none = np.asarray(pp.model_preprocess(crops, orientation=pp.ORIENT_NONE))
    np.testing.assert_allclose(out_rot, out_none)  # tall + Vertical: no rotation


def test_model_preprocess_horizontal_rotates_tall():
    crops = jnp.asarray(_tall_crop()[None])
    out_rot = np.asarray(pp.model_preprocess(crops, orientation=pp.ORIENT_HORIZONTAL))
    manual = cv2.rotate(_tall_crop(), cv2.ROTATE_90_COUNTERCLOCKWISE)
    out_manual = np.asarray(
        pp.model_preprocess(jnp.asarray(manual[None]), orientation=pp.ORIENT_NONE)
    )
    np.testing.assert_allclose(out_rot, out_manual, atol=1e-5)


def test_ocr_preprocess_vertical_hint_rotates_wide():
    crops = jnp.asarray(_wide_crop()[None])
    out, angles = pp.ocr_preprocess(crops, orientation=pp.ORIENT_VERTICAL)
    assert float(angles[0]) == 90.0
