"""The fused OCR preprocessing graphs (one jitted XLA program each).

Two pipelines, mirroring the reference's two crop-preparation rules
(SURVEY §2.4 #28):

1. ``model_preprocess`` — the manga-ocr input path: raw crop, optional
   orientation-only 90° rotation (``workers.py:318-327``), then the pip
   package's grayscale→RGB→resize(224)→rescale→normalize(0.5/0.5).
   Output feeds ``models.model.encode`` directly; emitted in the
   TPU-friendly flattened [B, 224, 224*3] layout is NOT needed because the
   encoder's patch embed consumes [B, H, W, C] and XLA lays it out after
   fusion with the resize (all one program).

2. ``ocr_preprocess`` — the Latin-engine path (``main_window.py:4204``):
   gray → skew detect → corrective rotation → equalizeHist → Gaussian(3,3)
   → Otsu → BGR.

Both are batched over crops with static shapes; callers bucket crops by
padded size (see ``parallel/batching.py``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from manga_ocr_tpu.ops import image as im

# Orientation modes (reference settings values)
ORIENT_AUTO = 0  # "Auto-Detect": skew correction from pixel moments
ORIENT_VERTICAL = 1  # rotate 90 CW when wider than tall
ORIENT_HORIZONTAL = 2  # rotate 90 CCW when taller than wide
ORIENT_NONE = 3


def _orientation_rot90(crops_u8: jax.Array, orientation: int) -> jax.Array:
    """Whole-batch static 90° orientation rule.  The reference applies
    `Vertical & w>h -> CW` / `Horizontal & h>w -> CCW` per crop; with bucketed
    static shapes the w/h comparison is static per bucket."""
    b, h, w = crops_u8.shape[:3]
    if orientation == ORIENT_VERTICAL and w > h:
        return im.rot90_cw(crops_u8)
    if orientation == ORIENT_HORIZONTAL and h > w:
        return im.rot90_ccw(crops_u8)
    return crops_u8


@functools.partial(jax.jit, static_argnames=("orientation", "image_size"))
def model_preprocess(
    crops_u8: jax.Array,
    orientation: int = ORIENT_NONE,
    image_size: int = 224,
) -> jax.Array:
    """[B, H, W, 3] uint8 BGR crops -> [B, S, S, 3] float32 normalized pixels
    ready for the ViT encoder (the manga-ocr input contract)."""
    x = _orientation_rot90(crops_u8, orientation)
    gray = im.bgr_to_gray_u8(x)  # convert("L")
    rgb = im.gray_to_bgr(gray)  # convert("RGB") — channels equal
    resized = im.resize_bilinear(rgb, image_size, image_size)  # float32
    return (resized / 255.0 - 0.5) / 0.5


@functools.partial(jax.jit, static_argnames=("orientation",))
def ocr_preprocess(crops_u8: jax.Array, orientation: int = ORIENT_AUTO):
    """[B, H, W, 3] uint8 BGR -> (processed [B, H, W, 3] uint8 BGR binarized,
    angles [B] float32): the reference's Latin-OCR preprocessing."""
    gray = im.bgr_to_gray_u8(crops_u8)
    b, h, w = gray.shape
    if orientation == ORIENT_AUTO:
        angles = im.normalize_skew_angle(im.orientation_angle_moments(gray))
    elif orientation == ORIENT_VERTICAL and w > h:
        angles = jnp.full((b,), 90.0, jnp.float32)
    else:
        angles = jnp.zeros((b,), jnp.float32)
    rotated = im.rotate_image(gray, angles, interpolation="cubic")
    eq = im.equalize_hist_u8(rotated)
    blurred = im.gaussian_blur3_u8(eq)
    binary = im.otsu_binarize(blurred)
    return im.gray_to_bgr(binary), angles
