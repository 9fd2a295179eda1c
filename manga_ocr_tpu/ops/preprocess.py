"""The fused OCR preprocessing graphs (one jitted XLA program each).

Two pipelines, mirroring the reference's two crop-preparation rules
(SURVEY §2.4 #28):

1. ``model_preprocess`` — the manga-ocr input path: the pip package's
   grayscale→RGB→resize(224)→rescale→normalize(0.5/0.5) applied to each
   crop's *valid region* inside its padded bucket.  The reference feeds the
   raw crop (orientation-rotated on the host, ``workers.py:318-327``)
   directly into the resize; ``sizes`` carries the real per-crop (h, w) so
   the resize samples only real pixels, never bucket padding.  Orientation
   rotation happens host-side per crop (``parallel.batching.orient_crop``)
   because the rule depends on the crop's own aspect ratio, which the padded
   bucket shape does not preserve.

2. ``ocr_preprocess`` — the Latin-engine path (``main_window.py:4204``):
   gray → skew detect → corrective rotation → equalizeHist → Gaussian(3,3)
   → Otsu → BGR, with all statistics (moments/histogram/threshold) computed
   over the valid region only.

Both are batched over crops with static shapes; callers bucket crops by
padded size (see ``parallel/batching.py``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from manga_ocr_tpu.ops import image as im

# Orientation modes (reference settings values).  The reference has TWO
# distinct rotation rules selected by these constants, and both are kept:
# - Manga-OCR crop prep (workers.py:318-327): frame-SWAPPING cv2.rotate,
#   Vertical & w>h -> 90 CW, Horizontal & h>w -> 90 CCW — applied host-side
#   per crop (parallel.batching.orient_crop) because it changes the shape.
# - Latin-engine preprocess (main_window.py:4225-4232): +90 CCW via
#   warpAffine *in the same (w, h) frame* (clips a wide crop) for Vertical
#   & w>h, NO rotation for Horizontal — implemented by ocr_preprocess's
#   in-graph branches below (rotate_image is CCW-positive like cv2).
ORIENT_AUTO = 0  # "Auto-Detect": skew correction from pixel moments
ORIENT_VERTICAL = 1
ORIENT_HORIZONTAL = 2
ORIENT_NONE = 3


@functools.partial(jax.jit, static_argnames=("image_size",))
def model_preprocess(
    crops_u8: jax.Array,
    sizes: jax.Array | None = None,
    image_size: int = 224,
) -> jax.Array:
    """[B, H, W, 3] uint8 BGR bucket-padded crops -> [B, S, S, 3] float32
    normalized pixels ready for the ViT encoder (the manga-ocr input
    contract).  ``sizes``: [B, 2] int32 valid (h, w) extents; None means
    every crop exactly fills the bucket.

    Grayscale happens before the resize (``convert("L")`` then
    ``convert("RGB")`` makes all channels equal, so resizing one channel and
    broadcasting is numerically identical and 3x cheaper).  A [B, H, W]
    input is accepted as already-grayscaled (the engine's gray wire format,
    ``batching.gray_u8_np`` — bit-identical to the in-graph conversion)."""
    gray = im.bgr_to_gray_u8(crops_u8) if crops_u8.ndim == 4 else crops_u8
    if sizes is None:
        b, h, w = gray.shape
        sizes = jnp.broadcast_to(jnp.asarray([h, w], jnp.int32), (b, 2))
    resized = im.resize_bilinear_valid(gray, sizes, image_size, image_size)
    norm = (resized / 255.0 - 0.5) / 0.5
    return jnp.repeat(norm[..., None], 3, axis=-1)  # convert("RGB")


@functools.partial(jax.jit, static_argnames=("orientation",))
def ocr_preprocess(
    crops_u8: jax.Array,
    orientation: int = ORIENT_AUTO,
    sizes: jax.Array | None = None,
):
    """[B, H, W, 3] uint8 BGR -> (processed [B, H, W, 3] uint8 BGR binarized,
    angles [B] float32): the reference's Latin-OCR preprocessing.

    ``sizes``: [B, 2] valid (h, w) per bucket-padded crop — skew moments,
    equalizeHist LUT and the Otsu threshold are computed over the valid
    region only (the reference preprocesses the exact crop), and rotation is
    about the valid region's center.  Callers crop the output back to the
    valid extent.  [B, H, W] input = already-grayscaled (gray wire)."""
    gray = im.bgr_to_gray_u8(crops_u8) if crops_u8.ndim == 4 else crops_u8
    b, h, w = gray.shape
    mask = None if sizes is None else im.valid_mask(gray.shape, sizes)
    if orientation == ORIENT_AUTO:
        angles = im.normalize_skew_angle(im.orientation_angle_moments(gray, mask))
    elif orientation == ORIENT_VERTICAL:
        # Per-crop rule on real extents: rotate 90 when wider than tall.
        if sizes is None:
            wide = jnp.full((b,), w > h)
        else:
            wide = sizes[:, 1] > sizes[:, 0]
        angles = jnp.where(wide, 90.0, 0.0).astype(jnp.float32)
    else:
        angles = jnp.zeros((b,), jnp.float32)
    if orientation in (ORIENT_NONE, ORIENT_HORIZONTAL):
        # angles are statically zero and zero-angle bicubic rotation is a
        # bit-exact identity (integer source coords, t=0 -> weights
        # (0,1,0,0); test_rotate_zero_angle_is_identity) — skip the 16
        # vmapped gathers per pixel
        rotated = gray
    else:
        rotated = im.rotate_image(gray, angles, interpolation="cubic", sizes=sizes)
    eq = im.equalize_hist_u8(rotated, mask)
    blurred = im.gaussian_blur3_u8(eq, sizes)
    binary = im.otsu_binarize(blurred, mask)
    return im.gray_to_bgr(binary), angles


@functools.partial(jax.jit, static_argnames=("bh", "bw"))
def unpack_packed_page(
    flat: jax.Array, meta: jax.Array, bh: int, bw: int
) -> tuple[jax.Array, jax.Array]:
    """Reconstruct the padded gray batch from the ROW-PACKED wire format
    (``parallel.batching.prep_page_packed``): ``flat`` [H_cap, bw] uint8
    holds each crop's width-padded rows height-tight; ``meta`` [B, 3]
    int32 carries (h, w, row_offset) per crop — ONE array so the wire
    costs one transfer RPC, not two.  Height edge-replication is
    row-index CLAMPING in the gather, so the result is byte-identical to
    the host-padded batch without height padding crossing the link.  Row
    granularity is the fast formulation on TPU: 0.04 ms vs 34 ms for an
    element-granular gather at [256, 128, 128]
    (scripts/perf_unpack_variants.py).  Returns (batch [B, bh, bw] uint8,
    sizes [B, 2]) — both device-resident for the bucket program.  Jitted
    per (H_cap, B, bucket) — trivial, compiles in seconds."""
    b = meta.shape[0]
    h = meta[:, 0][:, None]
    i = jnp.minimum(jax.lax.broadcasted_iota(jnp.int32, (b, bh), 1), h - 1)
    ridx = meta[:, 2][:, None] + i
    batch = jnp.take(flat, ridx.reshape(-1), axis=0).reshape(b, bh, bw)
    return batch, meta[:, :2]
