"""Padded, bucketed page batching — the TPU replacement for per-crop jobs.

The reference runs one Python worker thread per crop, each invoking the model
once (``QueueProcessorWorker``, ``/root/reference/src/core/workers.py:200``;
pool management ``main_window.py:4317``).  The TPU-native design instead
gathers every crop of a page (or several pages), pads them into a small set
of fixed shape buckets, and decodes them all in one dispatch:

- crop sizes vary wildly → each crop is padded (edge-replicate) into the
  smallest bucket that fits, so the number of distinct compiled shapes stays
  small (compile-once, reuse forever),
- the batch dim is padded to a power-of-two schedule for the same reason,
- bucket contents are preprocessed (resize to 224) *inside* the jitted graph,
  so padding cost is bounded by the resize, not the model.

Host-side code here is intentionally trivial (numpy copies only); everything
compute-shaped lives in the jitted graphs.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import numpy as np

# (h, w) buckets ordered by area; chosen to cover manga bubble crop shapes:
# near-square, tall (vertical text), wide (horizontal banners).
DEFAULT_BUCKETS: tuple[tuple[int, int], ...] = (
    (128, 128),
    (256, 128),
    (128, 256),
    (256, 256),
    (512, 256),
    (256, 512),
    (512, 512),
    (1024, 512),
    (512, 1024),
)

BATCH_SCHEDULE = (8, 16, 32, 64, 128, 256, 512)


def pick_bucket(
    h: int, w: int, buckets: Sequence[tuple[int, int]] = DEFAULT_BUCKETS
) -> tuple[int, int]:
    """Smallest bucket that contains (h, w); falls back to the largest."""
    best = None
    for bh, bw in buckets:
        if h <= bh and w <= bw:
            area = bh * bw
            if best is None or area < best[0]:
                best = (area, (bh, bw))
    if best is not None:
        return best[1]
    return max(buckets, key=lambda b: b[0] * b[1])


def pad_batch_size(n: int, schedule: Sequence[int] = BATCH_SCHEDULE) -> int:
    for s in schedule:
        if n <= s:
            return s
    # beyond schedule: round up to multiple of the largest step
    top = schedule[-1]
    return ((n + top - 1) // top) * top


def gray_u8_np(img: np.ndarray) -> np.ndarray:
    """Host replica of ``ops.image.bgr_to_gray_u8`` — the same cv2
    fixed-point math, bit-identical uint8 output (tests/test_engine.py).

    Why host-side: the manga-ocr model path grayscales every crop anyway
    (``convert("L")`` then ``convert("RGB")``, reference pip-package
    preprocessing behind ``main_window.py:9801``), so the engine can ship
    ONE channel over the host→device link instead of three.  Through the
    axon tunnel (~45 MB/s measured) that link is the full-serving-path
    bottleneck; on directly-attached hardware it is simply 3× less DMA.

    In-place accumulation: two int32 temps instead of six — the conversion
    runs on the serving host's critical path (single core)."""
    y = img[..., 2].astype(np.int32)  # r
    y *= 4899
    c = img[..., 1].astype(np.int32)  # g
    c *= 9617
    y += c
    np.multiply(img[..., 0], np.int32(1868), out=c, dtype=np.int32)  # b
    y += c
    y += 8192
    y >>= 14
    return y.astype(np.uint8)


def orient_crop(crop: np.ndarray, orientation: int) -> np.ndarray:
    """The reference's per-crop orientation rule on the REAL crop dims
    (``workers.py:318-327``): Vertical & w>h -> 90° CW; Horizontal & h>w ->
    90° CCW.  Host-side because the rule depends on each crop's own aspect
    ratio, which padded bucket shapes do not preserve.

    orientation: preprocess.ORIENT_* constant."""
    h, w = crop.shape[:2]
    if orientation == 1 and w > h:  # ORIENT_VERTICAL -> ROTATE_90_CLOCKWISE
        return np.ascontiguousarray(np.rot90(crop, k=-1))
    if orientation == 2 and h > w:  # ORIENT_HORIZONTAL -> ROTATE_90_COUNTERCLOCKWISE
        return np.ascontiguousarray(np.rot90(crop, k=1))
    return crop


def fit_within(crop: np.ndarray, bh: int, bw: int) -> np.ndarray:
    """Downscale a crop (preserving aspect) to fit inside (bh, bw).

    Oversized crops must not be truncated — text past the bucket edge would
    be silently discarded.  The model path resamples to 224 anyway, so one
    antialiased host downscale for the rare giant crop is benign."""
    h, w = crop.shape[:2]
    if h <= bh and w <= bw:
        return crop
    from PIL import Image

    s = min(bh / h, bw / w)
    nh, nw = max(1, int(h * s)), max(1, int(w * s))
    img = Image.fromarray(crop)
    return np.asarray(img.resize((nw, nh), Image.BILINEAR))


def pad_crop_to(crop: np.ndarray, bh: int, bw: int) -> np.ndarray:
    """Edge-replicate pad a [h, w, 3] uint8 crop to [bh, bw, 3].

    Edge replication (not zero/white fill) keeps border sampling benign for
    ops that read past the valid region (rotation); model statistics are
    computed over the valid region only (``sizes`` bookkeeping)."""
    h, w = crop.shape[:2]
    if h > bh or w > bw:
        crop = fit_within(crop, bh, bw)
        h, w = crop.shape[:2]
    return np.pad(crop, ((0, bh - h), (0, bw - w), (0, 0)), mode="edge")


@dataclasses.dataclass
class BucketedBatch:
    """One padded bucket: crops + bookkeeping to scatter results back."""

    bucket_hw: tuple[int, int]
    crops: np.ndarray  # [B_padded, bh, bw, 3] uint8 ([B, bh, bw] when gray)
    indices: list[int]  # original crop index per valid row
    valid: int  # number of real rows (rest are padding)
    sizes: np.ndarray = None  # [B_padded, 2] int32 valid (h, w) per row


def bucket_crops(
    crops: Sequence[np.ndarray],
    buckets: Sequence[tuple[int, int]] = DEFAULT_BUCKETS,
    gray: bool = False,
) -> list[BucketedBatch]:
    """Group variable-size crops into padded fixed-shape batches.

    Every batch carries per-row valid (h, w) extents so downstream graphs
    (resize, histogram stats) operate on real pixels only — padding never
    leaks into model inputs.  Crops that fit NO bucket are downscaled into
    the bucket costing the least resolution (never truncated); crops that
    fit any bucket are left at full resolution — downscaling into one
    arbitrary max-area bucket would throw away resolution for e.g. a wide
    400x800 crop that the equal-area (512, 1024) bucket holds exactly.

    ``gray=True`` emits single-channel batches (``gray_u8_np`` wire format,
    3× fewer host→device bytes); grayscale commutes with the edge-replicate
    padding (per-pixel transform), so converting the assembled batch in one
    vectorized pass is exact."""
    fitted = []
    for c in crops:
        c = np.ascontiguousarray(c)
        # accept 2D / single-channel grayscale crops like the page-prep
        # paths do (prep_page_gray native + numpy surfaces)
        if c.ndim == 2:
            c = np.repeat(c[..., None], 3, axis=2)
        elif c.shape[2] == 1:
            c = np.repeat(c, 3, axis=2)
        h, w = c.shape[:2]
        if not any(h <= bh and w <= bw for bh, bw in buckets):
            best = max(buckets, key=lambda b: min(b[0] / h, b[1] / w))
            c = fit_within(c, *best)
        fitted.append(c)
    groups: dict[tuple[int, int], list[int]] = {}
    for i, crop in enumerate(fitted):
        hw = pick_bucket(crop.shape[0], crop.shape[1], buckets)
        groups.setdefault(hw, []).append(i)

    out = []
    for hw, idxs in sorted(groups.items(), key=lambda kv: kv[0][0] * kv[0][1]):
        bh, bw = hw
        n = len(idxs)
        bn = pad_batch_size(n)
        arr = np.zeros((bn, bh, bw, 3), np.uint8)
        sizes = np.full((bn, 2), (bh, bw), np.int32)
        for row, i in enumerate(idxs):
            # edge-replicate pad written straight into the batch row —
            # equivalent to pad_crop_to but without a per-crop np.pad
            # allocation (this loop is on the serving host's critical path)
            c = fitted[i]
            h, w = c.shape[:2]
            dst = arr[row]
            dst[:h, :w] = c
            if w < bw:
                dst[:h, w:] = c[:, -1:]
            if h < bh:
                dst[h:] = dst[h - 1]
            sizes[row] = (h, w)
        if bn > n:
            # repeat last row (content and extents) as batch padding
            arr[n:] = arr[n - 1] if n else 0
            if n:
                sizes[n:] = sizes[n - 1]
        if gray:
            arr = gray_u8_np(arr)
        out.append(BucketedBatch(hw, arr, idxs, n, sizes))
    return out


def scatter_results(
    batches: Sequence[BucketedBatch], per_batch_results: Sequence[Sequence]
) -> list:
    """Invert ``bucket_crops``: reassemble per-crop results in input order."""
    total = sum(b.valid for b in batches)
    out = [None] * total
    for batch, results in zip(batches, per_batch_results):
        for row, idx in enumerate(batch.indices):
            out[idx] = results[row]
    return out


def _native_prep_groups(
    crops: Sequence[np.ndarray],
    orientation: int,
    buckets: Sequence[tuple[int, int]],
):
    """Shared host-prep front half for the native wire formats: coerce each
    crop, resolve the reference's per-crop rotation rule, downscale
    oversized crops, and group by bucket.  Returns ``(prepped, groups)``
    where ``prepped[i] = (contiguous crop, rot code, eff_h, eff_w)``, or
    None when a crop needs the NumPy fallback (exotic channel layout)."""
    prepped: list[tuple[np.ndarray, int, int, int]] = []
    for c in crops:
        c = np.ascontiguousarray(np.asarray(c, np.uint8))
        if c.ndim == 3 and c.shape[2] not in (1, 3):
            return None
        if c.ndim == 3 and c.shape[2] == 1:
            c = c[..., 0]
        h, w = c.shape[:2]
        rot = 0
        if orientation == 1 and w > h:  # ORIENT_VERTICAL -> 90° CW
            rot = 1
        elif orientation == 2 and h > w:  # ORIENT_HORIZONTAL -> 90° CCW
            rot = 2
        eh, ew = (w, h) if rot else (h, w)
        if not any(eh <= bh and ew <= bw for bh, bw in buckets):
            # oversized: rotate + downscale host-side (rare), then rot=0
            c = orient_crop(c, orientation)
            best = max(buckets, key=lambda b: min(b[0] / eh, b[1] / ew))
            c = np.ascontiguousarray(fit_within(c, *best))
            rot = 0
            eh, ew = c.shape[:2]
        prepped.append((c, rot, eh, ew))

    groups: dict[tuple[int, int], list[int]] = {}
    for i, (_, _, eh, ew) in enumerate(prepped):
        groups.setdefault(pick_bucket(eh, ew, buckets), []).append(i)
    return prepped, groups


def prep_page_gray(
    crops: Sequence[np.ndarray],
    orientation: int,
    buckets: Sequence[tuple[int, int]] = DEFAULT_BUCKETS,
) -> list[BucketedBatch]:
    """Host prep for the gray-wire serving path: orient + bucket + gray +
    edge-replicate pad, in ONE native C++ pass per bucket.

    Identical output to ``orient_crop`` + ``bucket_crops(gray=True)`` (the
    NumPy path, which stays as the fallback): same bit-exact cv2 gray math,
    same rotation rule, same padding.  The NumPy path costs three full
    passes with int32 temporaries (~55 ms for a 256-crop page on the serving
    host's single core — measured, docs/PERF.md); the fused pass reads each
    source pixel once and writes each batch byte once.  The rotation is
    applied to the source *read pattern*, so the ``np.rot90`` copy never
    materializes either."""
    from manga_ocr_tpu import native

    if native.load() is None:
        return _prep_page_gray_numpy(crops, orientation, buckets)
    grouped = _native_prep_groups(crops, orientation, buckets)
    if grouped is None:
        return _prep_page_gray_numpy(crops, orientation, buckets)
    prepped, groups = grouped

    out = []
    for hw, idxs in sorted(groups.items(), key=lambda kv: kv[0][0] * kv[0][1]):
        bh, bw = hw
        n = len(idxs)
        bn = pad_batch_size(n)
        arr = np.empty((bn, bh, bw), np.uint8)
        sizes = np.empty((bn, 2), np.int32)
        rots = np.fromiter((prepped[i][1] for i in idxs), np.int32, count=n)
        for row, i in enumerate(idxs):
            sizes[row] = (prepped[i][2], prepped[i][3])
        if not native.prep_gray_batch([prepped[i][0] for i in idxs], rots, arr):
            # library vanished mid-flight: stay correct
            return _prep_page_gray_numpy(crops, orientation, buckets)
        if bn > n:
            arr[n:] = arr[n - 1]
            sizes[n:] = sizes[n - 1]
        out.append(BucketedBatch(hw, arr, idxs, n, sizes))
    return out


def _prep_page_gray_numpy(
    crops: Sequence[np.ndarray],
    orientation: int,
    buckets: Sequence[tuple[int, int]],
) -> list[BucketedBatch]:
    """The NumPy fallback for ``prep_page_gray``/``prep_page_packed``.

    Accepts the same input surface as the native path — in particular 2D
    and [h, w, 1] grayscale crops, which ``bucket_crops`` (3-channel
    assignment) would reject — so behavior does not depend on whether the
    native library built."""
    expanded = []
    for c in crops:
        c = np.asarray(c, np.uint8)
        if c.ndim == 2:
            c = np.repeat(c[..., None], 3, axis=2)
        elif c.ndim == 3 and c.shape[2] == 1:
            c = np.repeat(c, 3, axis=2)
        expanded.append(orient_crop(c, orientation))
    return bucket_crops(expanded, buckets, gray=True)


# Packed wire: flat buffer row capacities are quantized to 64ths of
# the padded-batch row count, so the per-(bucket, batch) set of compiled
# device-unpack programs stays small (each is a trivial row gather,
# seconds to compile) while height-padding rows never cross the
# host->device link.
CAP_QUANTA = 64


@dataclasses.dataclass
class PackedBatch:
    """One bucket's crops in the ROW-PACKED wire format: heights tight,
    widths edge-padded to the bucket width host-side.  The device
    reconstructs the padded [B, bh, bw] batch with a per-ROW clamped
    gather — row granularity keeps the gather lane-aligned (0.04 ms vs
    34 ms element-granular; scripts/perf_unpack_variants.py), and height
    padding (the edge-replicated rows) never crosses the link.
    Batch-padding rows alias the last real crop's rows via offsets — they
    cost nothing on the wire either.

    Parity: the reconstructed batch is BYTE-identical to the gray wire's
    (verified on CPU and the real chip).  Decoded tokens are exact on CPU;
    on TPU the bucket program compiled for device-resident inputs is a
    separate executable instance whose f32 reduction order may differ by
    ulps — with random weights a near-tie argmax can flip (the established
    scheduling-ulp class, docs/PERF.md fuse_cross_kv note); real-checkpoint
    margins sit far outside it."""

    bucket_hw: tuple[int, int]
    flat: np.ndarray  # [H_cap, bw] uint8: tight crop rows + tail padding
    offsets: np.ndarray  # [B_padded] int32 ROW offsets into flat
    indices: list[int]  # original crop index per valid row
    valid: int
    sizes: np.ndarray  # [B_padded, 2] int32 valid (h, w) per row


def prep_page_packed(
    crops: Sequence[np.ndarray],
    orientation: int,
    buckets: Sequence[tuple[int, int]] = DEFAULT_BUCKETS,
) -> list:
    """Host prep for the row-PACKED wire format (see ``PackedBatch``):
    orient + bucket + gray + width-pad into a height-tight buffer per
    bucket (native C++ pass).  Ships ~10-15% fewer bytes than the gray
    wire on typical bubble-crop pages — on the tunneled runtime the
    host->device link is the full-serving-path bottleneck (docs/PERF.md);
    on directly-attached hardware it is simply less DMA.

    Returns ``PackedBatch`` items; falls back to ``prep_page_gray``'s
    output (``BucketedBatch``) when the native library is unavailable —
    callers dispatch on the type."""
    from manga_ocr_tpu import native

    if native.load() is None:
        return prep_page_gray(crops, orientation, buckets)
    grouped = _native_prep_groups(crops, orientation, buckets)
    if grouped is None:
        return prep_page_gray(crops, orientation, buckets)
    prepped, groups = grouped

    out = []
    for hw, idxs in sorted(groups.items(), key=lambda kv: kv[0][0] * kv[0][1]):
        bh, bw = hw
        n = len(idxs)
        bn = pad_batch_size(n)
        sizes = np.empty((bn, 2), np.int32)
        offsets = np.empty((bn,), np.int64)
        rots = np.fromiter((prepped[i][1] for i in idxs), np.int32, count=n)
        total_rows = 0
        for row, i in enumerate(idxs):
            eh, ew = prepped[i][2], prepped[i][3]
            sizes[row] = (eh, ew)
            offsets[row] = total_rows
            total_rows += eh
        if bn > n:
            sizes[n:] = sizes[n - 1]
            offsets[n:] = offsets[n - 1]  # alias the last crop's rows
        # quantized row capacity: CAP_QUANTA-ths of the padded batch rows
        full = bn * bh
        step = -(-full // CAP_QUANTA)
        h_cap = min(full, -(-total_rows // step) * step)
        # rows [0, total_rows) are fully written by the native pass; only
        # the quantization tail needs deterministic bytes (no full memset
        # on the single-core host's critical path)
        flat = np.empty((h_cap, bw), np.uint8)
        flat[total_rows:] = 0
        if not native.prep_gray_packed(
            [prepped[i][0] for i in idxs], rots, offsets[:n], flat
        ):
            return prep_page_gray(crops, orientation, buckets)
        out.append(
            PackedBatch(hw, flat, offsets.astype(np.int32), idxs, n, sizes)
        )
    return out
