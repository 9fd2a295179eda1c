"""Bubble/text detection orchestration — the AutoDetector equivalent.

The reference's ``AutoDetectorWorker`` (``/root/reference/src/core/
workers.py:438-485``) loops files on a QThread, runs the ONNX/YOLO mask
model per page, extracts contours, and emits ``{'polygon', 'text'}`` dicts
that become per-crop jobs.  Here detection is batched: N pages go to the
device in one ``segment_pages`` dispatch, masks come back together, and the
host traces polygons while the next page batch is in flight.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from manga_ocr_tpu.core.geometry import Rect, polygon_bounding_rect
from manga_ocr_tpu.detect import contours as cont
from manga_ocr_tpu.detect import postprocess as post
from manga_ocr_tpu.models import detector as seg


class BubbleDetector:
    """Batched DL bubble detection with classical contour fallback."""

    def __init__(
        self,
        params: dict | None = None,
        cfg: seg.DetectorConfig | None = None,
        min_area: float = 200.0,
        mesh=None,
    ):
        """``mesh``: optional ``jax.sharding.Mesh`` — page batches large
        enough to split are sharded over the data axis (params replicated
        once, lazily); smaller batches dispatch single-device (padding a
        1-page call to dp_size pages would pay n_devices× compute for
        identical masks).  At this model's size data parallelism is the
        whole multi-chip story (SURVEY §5.8)."""
        self.cfg = cfg or seg.DetectorConfig()
        self.mesh = mesh
        self.params = params
        self._params_repl = None
        self.min_area = min_area

    @staticmethod
    def from_checkpoint(
        path: str,
        cfg: seg.DetectorConfig | None = None,
        mesh=None,
        min_area: float = 200.0,
    ):
        """Load detector weights: a converted ``.npz`` pytree, or a real
        ``.onnx`` checkpoint (parsed + executed natively in JAX — the
        reference's detector family, ``main_window.py:6776-6815``).
        ``mesh`` applies to the native path only (the ONNX executor is
        single-device; it ignores the mesh with a stderr note)."""
        if str(path).lower().endswith(".onnx"):
            from manga_ocr_tpu.models.convert_onnx import OnnxBubbleDetector

            if mesh is not None:
                import sys

                print(
                    "note: mesh ignored for .onnx detector checkpoints "
                    "(single-device executor); convert to the native .npz "
                    "form for sharded dispatch",
                    file=sys.stderr,
                )
            return OnnxWrappedDetector(
                OnnxBubbleDetector.from_file(path), min_area=min_area
            )
        cfg = cfg or seg.DetectorConfig()
        return BubbleDetector(
            seg.load_params(path, cfg), cfg, min_area=min_area, mesh=mesh
        )

    # -- reference-compatible single-page mask -------------------------------

    def detect_bubble_mask(self, page_bgr: np.ndarray) -> np.ndarray | None:
        """Full-page 0/255 bubble mask (``detect_bubble_with_dl_model``
        contract, ``main_window.py:6843-6856``)."""
        if self.params is None:
            return None
        masks = self.detect_bubble_masks([page_bgr])
        return masks[0]

    # -- batched page API -----------------------------------------------------

    def detect_bubble_masks(self, pages_bgr: Sequence[np.ndarray]) -> list[np.ndarray]:
        """One device dispatch per page-shape group."""
        if self.params is None:
            raise RuntimeError("detector has no weights loaded")
        by_shape: dict[tuple, list[int]] = {}
        for i, p in enumerate(pages_bgr):
            by_shape.setdefault(p.shape[:2], []).append(i)
        out: list[Optional[np.ndarray]] = [None] * len(pages_bgr)
        from manga_ocr_tpu.parallel import mesh as meshlib

        for (h, w), idxs in by_shape.items():
            rgb = np.stack([pages_bgr[i][..., ::-1] for i in idxs])
            if self.mesh is not None and len(idxs) >= meshlib.dp_size(self.mesh):
                if self._params_repl is None:
                    self._params_repl = meshlib.dp_replicate(self.params, self.mesh)
                params = self._params_repl
                pages_dev = meshlib.dp_shard_batch(rgb, self.mesh)
            else:
                params, pages_dev = self.params, jnp.asarray(rgb)
            masks = np.asarray(
                seg.segment_pages(params, pages_dev, self.cfg, h, w)
            )
            for row, i in enumerate(idxs):
                out[i] = masks[row]
        return out  # type: ignore[return-value]

    def detect_bubbles(self, page_bgr: np.ndarray) -> list[dict]:
        """Page -> [{'polygon': [N,2], 'text': None}] (AutoDetector schema)."""
        mask = self.detect_bubble_mask(page_bgr)
        if mask is None:
            return []
        polys = cont.mask_to_polygons(mask, min_area=self.min_area)
        return [{"polygon": p, "text": None} for p in polys]

    def detect_pages(
        self,
        pages_bgr: Sequence[np.ndarray],
        split_extended: bool = True,
        progress: Callable[[int, int], None] | None = None,
    ) -> list[list[dict]]:
        """Batched multi-page detection -> per-page detection lists."""
        masks = self.detect_bubble_masks(list(pages_bgr))
        results = []
        for i, mask in enumerate(masks):
            polys = cont.mask_to_polygons(mask, min_area=self.min_area)
            dets = [{"polygon": p, "text": None} for p in polys]
            if split_extended:
                dets = post.split_extended_bubbles(dets)
            results.append(dets)
            if progress:
                progress(i + 1, len(masks))
        return results

    # -- classical fallback ----------------------------------------------------

    def find_bubble_mask(
        self, page_bgr: np.ndarray, text_rect: Rect
    ) -> np.ndarray | None:
        """DL mask restricted to the bubble containing ``text_rect``; falls
        back to the classical contour finder (``find_speech_bubble_mask``
        behavior, ``main_window.py:6858-6879``)."""
        if self.params is not None:
            mask = self.detect_bubble_mask(page_bgr)
            if mask is not None:
                picked = _component_containing(mask, text_rect)
                if picked is not None:
                    return picked
        return cont.find_speech_bubble_mask_contour(page_bgr, text_rect)


def detector_from_settings(settings: dict, dl_models: dict):
    """The reference's detector dispatch (``detect_bubble_with_dl_model``,
    ``main_window.py:6843-6856``): ``use_dl_detector`` gates the DL path;
    (``dl_provider``, ``dl_model_file``) select the model from the registry
    (the reference's ``self.dl_models``, ``:513-520``).  Returns None when
    the DL detector is off or unknown (callers fall back to the classical
    contour finder)."""
    if not settings.get("use_dl_detector"):
        return None
    key = (settings.get("dl_provider"), settings.get("dl_model_file"))
    return dl_models.get(key) or dl_models.get(settings.get("dl_model_file"))


class OnnxWrappedDetector(BubbleDetector):
    """BubbleDetector API over a real ``.onnx`` checkpoint (JAX-executed)."""

    def __init__(self, onnx_det, min_area: float = 200.0):
        super().__init__(params=None, min_area=min_area)
        self._onnx = onnx_det
        self.params = object()  # non-None: the DL path is live

    def detect_bubble_mask(self, page_bgr: np.ndarray) -> np.ndarray | None:
        return self._onnx.detect_bubble_mask(page_bgr)

    def detect_bubble_masks(self, pages_bgr: Sequence[np.ndarray]) -> list[np.ndarray]:
        return [self._onnx.detect_bubble_mask(p) for p in pages_bgr]


def _component_containing(mask: np.ndarray, rect: Rect) -> np.ndarray | None:
    """Isolate the mask component whose polygon contains the rect center."""
    cx, cy = rect.center()
    for poly in cont.mask_to_polygons(mask):
        if cont._point_in_polygon(cx, cy, poly):
            out = np.zeros_like(mask)
            cont.fill_polygon(out, poly, 255)
            return out
    return None


def crops_from_detections(
    page_bgr: np.ndarray, detections: Sequence[dict], mask_outside: bool = True
) -> tuple[list[np.ndarray], list[dict]]:
    """Detections -> crop images + job metadata (the reference's
    ``process_confirmed_polygon`` crop rule, ``main_window.py:6481-6518``:
    crop the bounding rect, white out pixels outside the polygon)."""
    h, w = page_bgr.shape[:2]
    crops, jobs = [], []
    for det in detections:
        poly = np.asarray(det["polygon"])
        rect = polygon_bounding_rect(poly).clamped(w, h)
        if rect.w < 2 or rect.h < 2:
            continue
        crop = page_bgr[rect.top : rect.bottom + 1, rect.left : rect.right + 1].copy()
        if mask_outside and len(poly) > 2:
            local = poly - np.array([rect.left, rect.top])
            m = np.zeros(crop.shape[:2], np.uint8)
            cont.fill_polygon(m, local, 255)
            crop[m == 0] = 255
        crops.append(crop)
        jobs.append({"rect": rect, "polygon": poly, "text": det.get("text")})
    return crops, jobs
