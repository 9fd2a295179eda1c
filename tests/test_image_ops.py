"""Pixel-level parity of the batched TPU image ops vs OpenCV/PIL."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax.numpy as jnp  # noqa: E402

from manga_ocr_tpu.ops import image as im  # noqa: E402
from manga_ocr_tpu.ops import preprocess as pp  # noqa: E402


@pytest.fixture(scope="module")
def crops(rng=None):
    rng = np.random.default_rng(7)
    # synthetic "text on paper": light background, dark strokes
    batch = []
    for _ in range(3):
        img = np.full((64, 96, 3), 235, np.uint8)
        for _ in range(6):
            x0, y0 = rng.integers(5, 80), rng.integers(5, 50)
            cv2.line(img, (x0, y0), (x0 + rng.integers(5, 15), y0), (20, 20, 20), 2)
        noise = rng.integers(-10, 10, size=img.shape).astype(np.int16)
        img = np.clip(img.astype(np.int16) + noise, 0, 255).astype(np.uint8)
        batch.append(img)
    return np.stack(batch)


def test_bgr_to_gray_matches_cv2(crops):
    got = np.asarray(im.bgr_to_gray_u8(jnp.asarray(crops)))
    ref = np.stack([cv2.cvtColor(c, cv2.COLOR_BGR2GRAY) for c in crops])
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1


def test_equalize_hist_matches_cv2(crops):
    gray = np.stack([cv2.cvtColor(c, cv2.COLOR_BGR2GRAY) for c in crops])
    got = np.asarray(im.equalize_hist_u8(jnp.asarray(gray)))
    ref = np.stack([cv2.equalizeHist(g) for g in gray])
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1


def test_gaussian_blur3_matches_cv2(crops):
    gray = np.stack([cv2.cvtColor(c, cv2.COLOR_BGR2GRAY) for c in crops])
    got = np.asarray(im.gaussian_blur3_u8(jnp.asarray(gray)))
    ref = np.stack([cv2.GaussianBlur(g, (3, 3), 0) for g in gray])
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1


def test_otsu_matches_cv2(crops):
    gray = np.stack([cv2.cvtColor(c, cv2.COLOR_BGR2GRAY) for c in crops])
    got_t = np.asarray(im.otsu_threshold(jnp.asarray(gray)))
    got_bin = np.asarray(im.otsu_binarize(jnp.asarray(gray)))
    for i, g in enumerate(gray):
        t_ref, bin_ref = cv2.threshold(g, 0, 255, cv2.THRESH_BINARY + cv2.THRESH_OTSU)
        assert abs(got_t[i] - t_ref) <= 1.0
        mismatch = np.mean(got_bin[i] != bin_ref)
        assert mismatch < 0.01  # only pixels exactly at a +-1 threshold differ


def test_rot90_matches_cv2(crops):
    got_cw = np.asarray(im.rot90_cw(jnp.asarray(crops)))
    got_ccw = np.asarray(im.rot90_ccw(jnp.asarray(crops)))
    for i, c in enumerate(crops):
        np.testing.assert_array_equal(got_cw[i], cv2.rotate(c, cv2.ROTATE_90_CLOCKWISE))
        np.testing.assert_array_equal(
            got_ccw[i], cv2.rotate(c, cv2.ROTATE_90_COUNTERCLOCKWISE)
        )


def test_rotate_matches_cv2_warp(crops):
    gray = np.stack([cv2.cvtColor(c, cv2.COLOR_BGR2GRAY) for c in crops])
    angle = 7.5
    got = np.asarray(
        im.rotate_image(jnp.asarray(gray), jnp.full((3,), angle), interpolation="cubic")
    )
    h, w = gray.shape[1:]
    M = cv2.getRotationMatrix2D((w // 2, h // 2), angle, 1.0)
    ref = np.stack(
        [
            cv2.warpAffine(
                g, M, (w, h), flags=cv2.INTER_CUBIC, borderMode=cv2.BORDER_REPLICATE
            )
            for g in gray
        ]
    )
    diff = np.abs(got.astype(int) - ref.astype(int))
    assert np.mean(diff) < 1.0 and np.percentile(diff, 99) <= 6


def test_resize_matches_pil(crops):
    from PIL import Image

    got = np.asarray(im.resize_bilinear(jnp.asarray(crops), 224, 224))
    for i, c in enumerate(crops):
        ref = np.asarray(
            Image.fromarray(c).resize((224, 224), Image.BILINEAR), np.float32
        )
        assert np.abs(got[i] - ref).max() <= 2.0


def test_model_preprocess_contract(crops):
    out = np.asarray(pp.model_preprocess(jnp.asarray(crops)))
    assert out.shape == (3, 224, 224, 3)
    assert out.min() >= -1.0 and out.max() <= 1.0
    # grayscale: all three channels equal
    np.testing.assert_allclose(out[..., 0], out[..., 1], atol=1e-6)


def test_ocr_preprocess_binarizes(crops):
    out, angles = pp.ocr_preprocess(jnp.asarray(crops), orientation=pp.ORIENT_NONE)
    out = np.asarray(out)
    assert set(np.unique(out)).issubset({0, 255})
    assert out.shape == crops.shape


def test_skew_correction_recovers_synthetic_rotation():
    """Text-like stripes rotated by a known skew must be detected (approx)."""
    img = np.full((128, 128), 255, np.uint8)
    for y in range(20, 110, 18):
        cv2.line(img, (16, y), (112, y), 0, 3)
    rot = cv2.warpAffine(
        img,
        cv2.getRotationMatrix2D((64, 64), -8.0, 1.0),
        (128, 128),
        flags=cv2.INTER_CUBIC,
        borderMode=cv2.BORDER_REPLICATE,
    )
    ang = np.asarray(
        im.normalize_skew_angle(im.orientation_angle_moments(jnp.asarray(rot[None])))
    )[0]
    assert abs(ang - 8.0) < 2.0  # corrective angle ~ +8 deg


def test_rotate_zero_angle_is_identity():
    """Zero-angle bicubic rotation is bit-exact identity — the invariant
    behind ocr_preprocess skipping rotation for static-zero orientations."""
    rng = np.random.default_rng(5)
    x = rng.integers(0, 256, size=(3, 40, 56)).astype(np.uint8)
    out = np.asarray(
        im.rotate_image(jnp.asarray(x), jnp.zeros((3,), jnp.float32), interpolation="cubic")
    )
    np.testing.assert_array_equal(out, x)
    sizes = jnp.asarray([[40, 56], [30, 20], [12, 56]], jnp.int32)
    out2 = np.asarray(
        im.rotate_image(
            jnp.asarray(x), jnp.zeros((3,), jnp.float32), interpolation="cubic", sizes=sizes
        )
    )
    np.testing.assert_array_equal(out2, x)
