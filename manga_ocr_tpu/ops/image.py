"""Batched TPU image ops for the OCR preprocessing graph.

The reference preprocesses each crop on the host with OpenCV, one crop at a
time (``preprocess_for_ocr``, ``/root/reference/src/ui/main_window.py:4204``:
gray → orientation detect → rotate → equalizeHist → GaussianBlur(3,3) → Otsu
→ BGR), and separately prepares manga-ocr inputs as raw crops with
orientation-only 90° rotation (``/root/reference/src/core/workers.py:318``)
followed by the pip package's grayscale→RGB→resize(224)→normalize(.5/.5).

Here every op is a batched, statically-shaped JAX function so the whole
preprocessing stage compiles into ONE XLA graph feeding the encoder (no host
round-trips).  Numerics match OpenCV/PIL within test tolerances:

- grayscale uses the ITU-R 601 fixed-point coefficients (cv2-compatible),
- equalizeHist reproduces cv2's cdf-min LUT construction,
- GaussianBlur(3,3,σ=0) uses cv2's fixed small-kernel [1,2,1]/4 with
  REFLECT_101 borders,
- Otsu maximizes between-class variance over a 256-bin histogram (first
  maximum, like cv2's scan),
- rotation is inverse-mapped bilinear/bicubic sampling with BORDER_REPLICATE,
- orientation detection is reformulated as image-moment PCA (the reference's
  ``cv2.minAreaRect`` is a host-only, data-dependent-shape op; the moment
  angle feeds the same normalization rules — divergence is possible on
  degenerate point sets and is covered by tests on synthetic text layouts).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Color
# ---------------------------------------------------------------------------


def bgr_to_gray_u8(img: jax.Array) -> jax.Array:
    """[..., H, W, 3] uint8 BGR -> [..., H, W] uint8, cv2 fixed-point math."""
    b = img[..., 0].astype(jnp.int32)
    g = img[..., 1].astype(jnp.int32)
    r = img[..., 2].astype(jnp.int32)
    y = (r * 4899 + g * 9617 + b * 1868 + 8192) >> 14
    return y.astype(jnp.uint8)


def rgb_to_gray_u8(img: jax.Array) -> jax.Array:
    return bgr_to_gray_u8(img[..., ::-1])


def gray_to_bgr(gray: jax.Array) -> jax.Array:
    return jnp.repeat(gray[..., None], 3, axis=-1)


# ---------------------------------------------------------------------------
# Histograms
# ---------------------------------------------------------------------------


def _hist256(gray_u8: jax.Array, mask: jax.Array | None = None) -> jax.Array:
    """Per-image 256-bin histogram. gray: [B, H, W] uint8 -> [B, 256] int32.

    ``mask`` ([B, H, W], nonzero = counted) restricts the histogram to the
    valid region — crops live padded inside fixed shape buckets and their
    statistics must not include padding pixels (reference computes stats on
    the exact crop, ``main_window.py:4204``)."""

    def one(img, m):
        return jnp.zeros((256,), jnp.int32).at[img.ravel().astype(jnp.int32)].add(m.ravel())

    if mask is None:
        mask = jnp.ones(gray_u8.shape, jnp.int32)
    return jax.vmap(one)(gray_u8, mask.astype(jnp.int32))


def valid_mask(shape: tuple, sizes: jax.Array) -> jax.Array:
    """[B, H, W] bool mask of the valid (unpadded) region per crop.

    ``sizes``: [B, 2] int32 (h, w) valid extents."""
    b, h, w = shape[:3]
    yy = jnp.arange(h, dtype=jnp.int32)[None, :, None]
    xx = jnp.arange(w, dtype=jnp.int32)[None, None, :]
    return (yy < sizes[:, 0, None, None]) & (xx < sizes[:, 1, None, None])


def equalize_hist_u8(gray: jax.Array, mask: jax.Array | None = None) -> jax.Array:
    """cv2.equalizeHist for a batch [B, H, W] uint8.

    LUT: find the first occupied bin i0; scale = 255/(N - hist[i0]);
    lut[i] = round(cumsum(hist[i0+1..i]) * scale), lut[<=i0] = 0.
    Degenerate single-bin images pass through unchanged (cv2 behavior).
    ``mask`` restricts the LUT statistics to the valid region (the LUT is
    still applied everywhere; callers crop padding away afterwards).
    """
    b, h, w = gray.shape
    hist = _hist256(gray, mask)  # [B, 256]
    n = jnp.sum(hist, axis=1)  # [B] valid-pixel count
    cdf = jnp.cumsum(hist, axis=1)
    # first nonzero bin and its count
    i0 = jnp.argmax(hist > 0, axis=1)  # [B]
    h0 = jnp.take_along_axis(hist, i0[:, None], axis=1)[:, 0]
    denom = (n - h0).astype(jnp.float32)
    scale = 255.0 / jnp.maximum(denom, 1.0)
    shifted = (cdf - h0[:, None]).astype(jnp.float32)  # cumsum excluding bin i0
    lut = jnp.clip(jnp.round(shifted * scale[:, None]), 0, 255).astype(jnp.uint8)
    degenerate = denom <= 0  # all pixels in one bin
    out = jax.vmap(lambda l, im: l[im.astype(jnp.int32)])(lut, gray)
    return jnp.where(degenerate[:, None, None], gray, out)


def otsu_threshold(gray: jax.Array, mask: jax.Array | None = None) -> jax.Array:
    """Otsu threshold per image. [B, H, W] uint8 -> [B] float32 thresholds.

    Maximizes between-class variance; ties resolve to the first maximum
    (matching cv2's ascending scan with strict > update).  ``mask`` restricts
    the histogram to the valid region of padded crops."""
    hist = _hist256(gray, mask).astype(jnp.float32)  # [B, 256]
    n = jnp.sum(hist, axis=1, keepdims=True)
    p = hist / n
    bins = jnp.arange(256, dtype=jnp.float32)
    omega = jnp.cumsum(p, axis=1)  # P(class0) for t = bin
    mu = jnp.cumsum(p * bins, axis=1)
    mu_t = mu[:, -1:]
    denom = omega * (1.0 - omega)
    num = (mu_t * omega - mu) ** 2
    sigma_b = jnp.where(denom > 1e-12, num / jnp.maximum(denom, 1e-12), 0.0)
    return jnp.argmax(sigma_b, axis=1).astype(jnp.float32)


def threshold_binary(gray: jax.Array, thresh: jax.Array) -> jax.Array:
    """cv2 THRESH_BINARY: > thresh -> 255 else 0. thresh: [B]."""
    return jnp.where(
        gray.astype(jnp.float32) > thresh[:, None, None], jnp.uint8(255), jnp.uint8(0)
    )


def otsu_binarize(gray: jax.Array, mask: jax.Array | None = None) -> jax.Array:
    return threshold_binary(gray, otsu_threshold(gray, mask))


# ---------------------------------------------------------------------------
# Filtering
# ---------------------------------------------------------------------------


def gaussian_blur3_u8(gray: jax.Array, sizes: jax.Array | None = None) -> jax.Array:
    """cv2.GaussianBlur(ksize=(3,3), sigma=0) on uint8 [B, H, W].

    cv2 uses the fixed small kernel [1,2,1]/4 separably with REFLECT_101
    borders and round-half-away rounding on the uint8 path.

    ``sizes`` ([B, 2] valid (h, w)): reflect at each crop's VALID boundary,
    not the bucket edge, so blurred valid pixels match blurring the exact
    unpadded crop (the reference blurs exact crops)."""
    x = gray.astype(jnp.float32)
    b, h, w = x.shape
    if sizes is None:
        # REFLECT_101 pad: edge-adjacent pixel mirrored (a b c -> b | a b c | b)
        xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0)), mode="reflect")
        x = (xp[:, :-2, :] + 2.0 * xp[:, 1:-1, :] + xp[:, 2:, :]) * 0.25
        xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1)), mode="reflect")
        x = (xp[:, :, :-2] + 2.0 * xp[:, :, 1:-1] + xp[:, :, 2:]) * 0.25
    else:
        def reflect_idx(n: int, valid):
            i = jnp.arange(n, dtype=jnp.int32)[None, :]  # [1, n]
            v = valid.astype(jnp.int32)[:, None]  # [B, 1]
            up = jnp.minimum(jnp.abs(i - 1), jnp.maximum(v - 1, 0))
            dn = jnp.where(i + 1 < v, i + 1, jnp.maximum(v - 2, 0))
            return up, dn

        up, dn = reflect_idx(h, sizes[:, 0])
        take_h = lambda idx: jnp.take_along_axis(
            x, jnp.broadcast_to(idx[:, :, None], (b, h, w)), axis=1
        )
        x = (take_h(up) + 2.0 * x + take_h(dn)) * 0.25
        up, dn = reflect_idx(w, sizes[:, 1])
        take_w = lambda idx: jnp.take_along_axis(
            x, jnp.broadcast_to(idx[:, None, :], (b, h, w)), axis=2
        )
        x = (take_w(up) + 2.0 * x + take_w(dn)) * 0.25
    return jnp.clip(jnp.floor(x + 0.5), 0, 255).astype(jnp.uint8)


# ---------------------------------------------------------------------------
# Geometry
# ---------------------------------------------------------------------------


def rot90_cw(img: jax.Array) -> jax.Array:
    """cv2.ROTATE_90_CLOCKWISE on [..., H, W] or [..., H, W, C]."""
    hw = (-3, -2) if img.ndim >= 3 and img.shape[-1] <= 4 else (-2, -1)
    return jnp.flip(jnp.swapaxes(img, *hw), axis=hw[1])


def rot90_ccw(img: jax.Array) -> jax.Array:
    hw = (-3, -2) if img.ndim >= 3 and img.shape[-1] <= 4 else (-2, -1)
    return jnp.flip(jnp.swapaxes(img, *hw), axis=hw[0])


def rot180(img: jax.Array) -> jax.Array:
    hw = (-3, -2) if img.ndim >= 3 and img.shape[-1] <= 4 else (-2, -1)
    return jnp.flip(jnp.flip(img, axis=hw[0]), axis=hw[1])


def _cubic_weights(t: jax.Array, a: float = -0.75) -> tuple:
    """Keys bicubic weights for fractional offset t (cv2 INTER_CUBIC a=-0.75)."""
    t2, t3 = t * t, t * t * t
    w_m1 = a * t3 - 2 * a * t2 + a * t
    w_0 = (a + 2) * t3 - (a + 3) * t2 + 1
    w_1 = -(a + 2) * t3 + (2 * a + 3) * t2 - a * t
    w_2 = -a * t3 + a * t2
    return w_m1, w_0, w_1, w_2


def rotate_image(
    gray: jax.Array,
    angle_deg: jax.Array,
    interpolation: str = "cubic",
    sizes: jax.Array | None = None,
) -> jax.Array:
    """Rotate [B, H, W] float/uint8 images about their center by per-image
    angles (degrees, CCW-positive like cv2.getRotationMatrix2D), sampling
    with BORDER_REPLICATE.  Output dtype matches input (uint8 rounds).

    ``sizes`` ([B, 2] valid (h, w) extents): rotate each padded crop about
    the center of its *valid* region — the reference rotates the exact crop
    about its own center (``main_window.py:4204``)."""
    b, h, w = gray.shape
    x = gray.astype(jnp.float32)
    theta = jnp.deg2rad(angle_deg.astype(jnp.float32))  # [B]
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    if sizes is None:
        # cv2 center convention used by the reference
        cx = jnp.full((b,), w // 2, jnp.float32)
        cy = jnp.full((b,), h // 2, jnp.float32)
    else:
        cx = (sizes[:, 1] // 2).astype(jnp.float32)
        cy = (sizes[:, 0] // 2).astype(jnp.float32)
    cx, cy = cx[:, None, None], cy[:, None, None]
    yy, xx = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32), indexing="ij"
    )
    # Inverse map: source = R(-theta) @ (dst - c) + c
    dx = xx[None] - cx
    dy = yy[None] - cy
    sx = cos[:, None, None] * dx - sin[:, None, None] * dy + cx
    sy = sin[:, None, None] * dx + cos[:, None, None] * dy + cy

    def sample(xf, yf):
        xi = jnp.clip(xf, 0, w - 1).astype(jnp.int32)
        yi = jnp.clip(yf, 0, h - 1).astype(jnp.int32)
        return jax.vmap(lambda im, yy_, xx_: im[yy_, xx_])(x, yi, xi)

    if interpolation == "nearest":
        out = sample(jnp.round(sx), jnp.round(sy))
    elif interpolation == "linear":
        x0, y0 = jnp.floor(sx), jnp.floor(sy)
        tx, ty = sx - x0, sy - y0
        v00 = sample(x0, y0)
        v01 = sample(x0 + 1, y0)
        v10 = sample(x0, y0 + 1)
        v11 = sample(x0 + 1, y0 + 1)
        out = (
            v00 * (1 - tx) * (1 - ty)
            + v01 * tx * (1 - ty)
            + v10 * (1 - tx) * ty
            + v11 * tx * ty
        )
    else:  # cubic
        x0, y0 = jnp.floor(sx), jnp.floor(sy)
        tx, ty = sx - x0, sy - y0
        wx = _cubic_weights(tx)
        wy = _cubic_weights(ty)
        out = jnp.zeros_like(tx)
        for j, wyj in enumerate(wy):
            row = jnp.zeros_like(tx)
            for i, wxi in enumerate(wx):
                row = row + wxi * sample(x0 + (i - 1), y0 + (j - 1))
            out = out + wyj * row
    if gray.dtype == jnp.uint8:
        return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)
    return out.astype(gray.dtype)


def _triangle_resize_matrix(in_size: int, out_size: int) -> np.ndarray:
    """PIL-convention antialiased triangle (bilinear) filter as a dense
    row-stochastic matrix [out_size, in_size].

    Resizing then becomes two matmuls (rows and columns) — pure MXU work
    with trivial compile cost, unlike gather-based resize lowerings."""
    scale = in_size / out_size
    support = max(1.0, scale)  # filter footprint grows when downscaling
    mat = np.zeros((out_size, in_size), np.float32)
    for i in range(out_size):
        center = (i + 0.5) * scale
        lo = int(np.floor(center - support))
        hi = int(np.ceil(center + support))
        js = np.arange(max(lo, 0), min(hi + 1, in_size))
        w = 1.0 - np.abs((js + 0.5) - center) / support
        w = np.clip(w, 0.0, None)
        s = w.sum()
        if s <= 0:  # fallback: nearest
            j = min(in_size - 1, max(0, int(center)))
            mat[i, j] = 1.0
        else:
            mat[i, js] = w / s
    return mat


@functools.lru_cache(maxsize=64)
def _resize_mats(in_h: int, in_w: int, out_h: int, out_w: int):
    # NOTE: cache *numpy* arrays, not jnp — a jnp array created while
    # tracing would cache a tracer and leak into later traces.
    return (
        _triangle_resize_matrix(in_h, out_h),
        _triangle_resize_matrix(in_w, out_w).T,
    )


def resize_bilinear(img: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Antialiased bilinear resize (PIL-convention triangle filter), batched
    over leading dims, implemented as two separable matmuls (MXU-native).
    Matches PIL/HF image-processor resizing within test tolerance.
    Input [..., H, W] or [..., H, W, C]; returns float32."""
    x = img.astype(jnp.float32)
    channels_last = x.ndim >= 3 and img.shape[-1] <= 4
    if channels_last:
        x = jnp.moveaxis(x, -1, -3)  # [..., C, H, W]
    in_h, in_w = x.shape[-2], x.shape[-1]
    mh_np, mw_np = _resize_mats(in_h, in_w, out_h, out_w)
    mh, mw = jnp.asarray(mh_np), jnp.asarray(mw_np)
    # rows: [out_h, H] @ [..., H, W] ; cols: [..., out_h, W] @ [W, out_w]
    x = jnp.einsum("oh,...hw->...ow", mh, x)
    x = jnp.einsum("...hw,wo->...ho", x, mw)
    if channels_last:
        x = jnp.moveaxis(x, -3, -1)
    return x


def _triangle_matrix_dynamic(valid: jax.Array, full: int, out: int) -> jax.Array:
    """Per-image triangle-filter matrices [B, out, full]: resize the first
    ``valid[b]`` source pixels to ``out`` taps, same weights as
    ``_triangle_resize_matrix`` but built in-graph from per-crop extents
    (broadcasted iota + elementwise math — fuses into the matmul epilogue).
    """
    v = jnp.maximum(valid.astype(jnp.float32), 1.0)[:, None, None]  # [B,1,1]
    scale = v / float(out)
    support = jnp.maximum(scale, 1.0)
    o = jnp.arange(out, dtype=jnp.float32)[None, :, None]
    s = jnp.arange(full, dtype=jnp.float32)[None, None, :]
    center = (o + 0.5) * scale
    w = 1.0 - jnp.abs((s + 0.5) - center) / support
    w = jnp.clip(w, 0.0, None) * (s < v)
    wsum = jnp.sum(w, axis=-1, keepdims=True)
    return w / jnp.maximum(wsum, 1e-30)


def resize_bilinear_valid(
    gray: jax.Array, sizes: jax.Array, out_h: int, out_w: int
) -> jax.Array:
    """Antialiased per-crop valid-region resize for bucket-padded batches.

    ``gray``: [B, H, W]; ``sizes``: [B, 2] int32 valid (h, w) per crop.
    Each crop's valid region (not the padded bucket) is resized to
    (out_h, out_w) — numerically identical to ``resize_bilinear`` on the
    exact unpadded crop.  This is the fix for the model-input divergence of
    resizing whole padded buckets: the reference resizes the raw crop
    directly (manga_ocr pip preprocessing; SURVEY §2.2 #10).

    Two batched matmuls (MXU work); the per-crop filter matrices are cheap
    elementwise constructions.  Returns float32 [B, out_h, out_w]."""
    x = gray.astype(jnp.float32)
    b, h, w = x.shape
    mh = _triangle_matrix_dynamic(sizes[:, 0], h, out_h)  # [B, out_h, H]
    mw = _triangle_matrix_dynamic(sizes[:, 1], w, out_w)  # [B, out_w, W]
    x = jnp.einsum("boh,bhw->bow", mh, x)
    return jnp.einsum("bow,bpw->bop", x, mw)


# ---------------------------------------------------------------------------
# Orientation (moment PCA reformulation of the reference's minAreaRect angle)
# ---------------------------------------------------------------------------


def orientation_angle_moments(gray: jax.Array, valid: jax.Array | None = None) -> jax.Array:
    """Estimate per-image text-skew angle from the dark-pixel distribution.

    The reference takes cv2.minAreaRect over all pixels with gray < 255 and
    normalizes the resulting angle; minAreaRect is host-only (convex hull,
    data-dependent shapes), so on TPU we use the principal-axis angle of the
    same pixel set's second central moments.  Returns degrees in (-90, 90],
    where positive = CCW skew (to be passed to ``rotate_image`` directly,
    which rotates CCW-positive like cv2).  ``valid`` ([B, H, W]) excludes
    bucket-padding pixels from the moment sums.
    """
    b, h, w = gray.shape
    mask = (gray < 255).astype(jnp.float32)
    if valid is not None:
        mask = mask * valid.astype(jnp.float32)
    yy, xx = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32), indexing="ij"
    )
    m00 = jnp.sum(mask, axis=(1, 2))
    safe = jnp.maximum(m00, 1.0)
    mx = jnp.sum(mask * xx[None], axis=(1, 2)) / safe
    my = jnp.sum(mask * yy[None], axis=(1, 2)) / safe
    dx = xx[None] - mx[:, None, None]
    dy = yy[None] - my[:, None, None]
    mu20 = jnp.sum(mask * dx * dx, axis=(1, 2)) / safe
    mu02 = jnp.sum(mask * dy * dy, axis=(1, 2)) / safe
    mu11 = jnp.sum(mask * dx * dy, axis=(1, 2)) / safe
    # Principal axis angle in image coords (y down): positive = CW in screen
    theta = 0.5 * jnp.arctan2(2.0 * mu11, mu20 - mu02)
    deg = jnp.rad2deg(theta)
    return jnp.where(m00 > 0, deg, 0.0)


def normalize_skew_angle(angle: jax.Array, max_abs_deg: float = 45.0) -> jax.Array:
    """Fold the PCA angle into a small corrective rotation, folding ±90°
    symmetry.  ``orientation_angle_moments`` returns the y-down principal-axis
    angle (positive = visually clockwise skew); cv2-convention rotation with
    that same positive angle turns the image counter-clockwise, undoing it,
    so the corrective rotation equals the folded angle."""
    a = jnp.where(angle > 45.0, angle - 90.0, angle)
    a = jnp.where(a < -45.0, a + 90.0, a)
    return jnp.clip(a, -max_abs_deg, max_abs_deg)
